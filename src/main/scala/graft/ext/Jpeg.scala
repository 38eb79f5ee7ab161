package graft.ext

/** Pure-JVM baseline JPEG codec (both directions) — no codec library,
  * `java.lang.Math` alone.
  *
  * Completes the image-codec family next to [[Png]] and [[Gif]], with one
  * honest difference: JPEG is LOSSY and ITU T.81 §A.3.3 permits IDCT
  * implementations to differ in the low bits, so "bit-exact decode" is
  * not a defined target for ANY pair of independent JPEG decoders. The
  * verification contract is therefore tolerance-based where PNG/GIF's is
  * equality-based: ExtSpec cross-checks this decoder against
  * `javax.imageio`'s (libjpeg-derived) output within a small per-sample
  * bound, and `q_multimodal_jpeg` hash-checks exact dimensions plus
  * bounded-deviation booleans — the same reduce-to-bound pattern the
  * HLL/KLL sketch queries use for engine-opaque estimates.
  *
  * Scope (what `javax.imageio`'s writer emits and the overwhelming share
  * of real-world JPEGs use): baseline sequential DCT (SOF0), 8-bit
  * precision, Huffman entropy coding, 1 component (grayscale) or 3
  * components (JFIF YCbCr) with sampling factors ≤ 2 (4:4:4 / 4:2:2 /
  * 4:2:0), restart markers honored. Progressive (SOF2), arithmetic
  * coding, 12-bit precision and 4-component CMYK return None. The walk
  * is totality-guarded like [[Multimodal.mp4Meta]]: malformed or
  * truncated streams yield None, never a throw or a stall.
  *
  * Implementation notes: canonical Huffman tables from BITS/HUFFVAL
  * (T.81 §C.2), byte-stuffing-aware bit reader (§F.1.2.3), DC prediction
  * + EXTEND (§F.2.2.1), zigzag dequantization, separable double-precision
  * 2-D IDCT (the reference §A.3.3 definition — slower than an AAN/islow
  * integer factorization but unambiguous), nearest-neighbor chroma
  * upsampling, JFIF full-range YCbCr→RGB (§ JFIF 1.02).
  */
object Jpeg {

  /** Decoded image: row-major, `channels` ∈ {1, 3} (gray or RGB). */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33, 40, 48, 41, 34, 27,
    20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58,
    59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63
  )

  // cos((2x+1)·u·π/16) / 2, with the 1/√2 normalization folded in for u=0
  private val IdctCos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        val c = math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
        t(u * 8 + x) = if (u == 0) c / math.sqrt(2.0) else c
        x += 1
      }
      u += 1
    }
    t
  }

  /** One canonical Huffman table: MINCODE/MAXCODE/VALPTR per length. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr  = new Array[Int](17)
    locally {
      var code = 0
      var k    = 0
      var l    = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  /** Byte-stuffing-aware bit reader over the entropy-coded segment.
    * Returns -1 from `bit()` at a marker or EOF (decode then fails
    * cleanly). RSTn markers are consumed by `restart()`.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf  = 0
    private var cnt  = 0
    var markerHit    = false
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) { markerHit = true; return -1 }
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { markerHit = true; return -1 }
          val n = b(pos + 1) & 0xff
          if (n == 0x00) { buf = 0xff; pos += 2 }
          else { markerHit = true; return -1 } // a real marker ends the segment
        } else { buf = v; pos += 1 }
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }
    /** Align to a byte boundary and consume an expected RSTn marker. */
    def restart(): Boolean = {
      cnt = 0
      markerHit = false
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
    def decodeHuff(h: Huff): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) return h.value(l, code)
        val x = bit()
        if (x < 0) return -1
        code = (code << 1) | x
        l += 1
      }
      -1
    }
  }

  /** T.81 §F.2.2.1 EXTEND: map a `len`-bit magnitude to its signed value. */
  @inline private def extend(v: Int, len: Int): Int =
    if (len == 0) 0 else if (v < (1 << (len - 1))) v - (1 << len) + 1 else v

  private final case class Component(
      id: Int,
      h: Int,
      v: Int,
      tq: Int,
      var dcTable: Int,
      var acTable: Int
  )

  // ---- encode -------------------------------------------------------------

  /** Baseline JPEG encoder — completes the codec both directions (like
    * [[Png]]/[[Gif]]), optimized for SPEC VALIDITY and verifiability over
    * compression ratio: 4:4:4 (no chroma subsampling — decoder-agnostic
    * pixel mapping), a UNIFORM quantization table (value `q` everywhere —
    * any table is T.81-valid, and a constant one bounds every
    * coefficient's error by q/2 with no table-constant transcription
    * risk), and fixed one-length canonical Huffman tables (12 DC symbols
    * at 4 bits, 162 AC symbols at 8 bits — Kraft-valid, no all-ones code,
    * trivially correct at the cost of larger files). Compression is not
    * the point of this engine; producing streams that independent
    * decoders (ExtSpec: [[decode]] AND `javax.imageio`) read back within
    * the quantization bound is.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte], q: Int = 4): Array[Byte] = {
    require(channels == 1 || channels == 3, "grayscale or RGB input")
    require(width > 0 && height > 0 && pixels.length == width * height * channels)
    // q >= 2 bounds every coefficient inside the fixed tables: |F| <= 128 *
    // (sum_x |C(u)cos|/2)^2 <= 1024, so AC magnitude <= 512 (size <= 10)
    // and DC diff <= 1024 (size <= 11) — exactly what the 12-category DC /
    // size-10 AC tables encode
    require(q >= 2 && q <= 255, "uniform quant value in [2,255]")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    // DQT: table 0, uniform (zigzag order is irrelevant for a constant)
    m(0xdb, Array[Byte](0x00.toByte) ++ Array.fill(64)(q.toByte))
    // SOF0: 8-bit, n components, 4:4:4, all on quant table 0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8)
    sof.write((height >> 8) & 0xff); sof.write(height & 0xff)
    sof.write((width >> 8) & 0xff); sof.write(width & 0xff)
    sof.write(channels)
    var c = 0
    while (c < channels) { sof.write(c + 1); sof.write(0x11); sof.write(0); c += 1 }
    m(0xc0, sof.toByteArray)
    // DHT: DC table 0 = the 12 magnitude categories, all 4-bit codes;
    //      AC table 0 = EOB, ZRL, then (run 0..15)x(size 1..10), all 8-bit
    val dcVals = Array.tabulate[Byte](12)(_.toByte)
    val dcBits = Array.tabulate[Byte](16)(i => if (i == 3) 12.toByte else 0.toByte)
    m(0xc4, Array[Byte](0x00.toByte) ++ dcBits ++ dcVals)
    val acVals = (Seq(0x00, 0xf0) ++
      (for (run <- 0 until 16; sz <- 1 to 10) yield (run << 4) | sz)).map(_.toByte).toArray
    val acBits = Array.tabulate[Byte](16)(i => if (i == 7) 162.toByte else 0.toByte)
    m(0xc4, Array[Byte](0x10.toByte) ++ acBits ++ acVals)
    // SOS: every component uses DC 0 / AC 0
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(channels)
    c = 0
    while (c < channels) { sos.write(c + 1); sos.write(0x00); c += 1 }
    sos.write(0); sos.write(63); sos.write(0)
    m(0xda, sos.toByteArray)

    // canonical codes for the one-length tables: symbol i at index i
    @inline def dcCode(sym: Int): (Int, Int) = (sym, 4)
    @inline def acCode(sym: Int): (Int, Int) = {
      val idx =
        if (sym == 0x00) 0
        else if (sym == 0xf0) 1
        else 2 + (sym >> 4) * 10 + ((sym & 0x0f) - 1)
      (idx, 8)
    }
    // MSB-first bit writer with 0xFF byte stuffing
    var bitBuf = 0L
    var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      bitBuf = (bitBuf << n) | (v & ((1L << n) - 1))
      bitCnt += n
      while (bitCnt >= 8) {
        val byte = ((bitBuf >> (bitCnt - 8)) & 0xff).toInt
        out.write(byte)
        if (byte == 0xff) out.write(0x00)
        bitCnt -= 8
      }
    }
    @inline def size(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putMagnitude(v: Int, sz: Int): Unit =
      if (sz > 0) putBits(if (v < 0) v + (1 << sz) - 1 else v, sz)

    // planes in YCbCr (JFIF full range) at full resolution
    val nPix = width * height
    val planes = Array.ofDim[Byte](channels, nPix)
    if (channels == 1) System.arraycopy(pixels, 0, planes(0), 0, nPix)
    else {
      var p = 0
      while (p < nPix) {
        val r = pixels(3 * p) & 0xff
        val g = pixels(3 * p + 1) & 0xff
        val bl = pixels(3 * p + 2) & 0xff
        def clamp(x: Double): Byte = {
          val v = math.rint(x).toInt
          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        }
        planes(0)(p) = clamp(0.299 * r + 0.587 * g + 0.114 * bl)
        planes(1)(p) = clamp(-0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0)
        planes(2)(p) = clamp(0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0)
        p += 1
      }
    }

    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val pred    = new Array[Int](channels)
    val spatial = new Array[Double](64)
    val tmp     = new Array[Double](64)
    val coef    = new Array[Int](64)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        c = 0
        while (c < channels) {
          // gather the 8x8 block, replicating edges for partial blocks
          var y0 = 0
          while (y0 < 8) {
            val sy = math.min(by * 8 + y0, height - 1)
            var x0 = 0
            while (x0 < 8) {
              val sx = math.min(bx * 8 + x0, width - 1)
              spatial(y0 * 8 + x0) = (planes(c)(sy * width + sx) & 0xff) - 128.0
              x0 += 1
            }
            y0 += 1
          }
          // forward reference DCT: the same orthonormal cosine array as the
          // IDCT, applied in the transposed direction
          var u = 0
          while (u < 8) {
            var x1 = 0
            while (x1 < 8) {
              var s = 0.0
              var x = 0
              while (x < 8) { s += spatial(x1 * 8 + x) * IdctCos(u * 8 + x); x += 1 }
              tmp(x1 * 8 + u) = s
              x1 += 1
            }
            u += 1
          }
          var v = 0
          while (v < 8) {
            var u1 = 0
            while (u1 < 8) {
              var s = 0.0
              var y = 0
              while (y < 8) { s += tmp(y * 8 + u1) * IdctCos(v * 8 + y); y += 1 }
              coef(v * 8 + u1) = math.rint(s / q).toInt
              u1 += 1
            }
            v += 1
          }
          // entropy-code: DC diff then zigzag AC run-lengths
          val dc = coef(0)
          val diff = dc - pred(c)
          pred(c) = dc
          val dsz = size(diff)
          val (dcc, dcl) = dcCode(dsz)
          putBits(dcc, dcl)
          putMagnitude(diff, dsz)
          var k = 1
          var run = 0
          while (k < 64) {
            val v2 = coef(Zigzag(k))
            if (v2 == 0) run += 1
            else {
              while (run > 15) { val (zc, zl) = acCode(0xf0); putBits(zc, zl); run -= 16 }
              val sz = size(v2)
              val (ac, al) = acCode((run << 4) | sz)
              putBits(ac, al)
              putMagnitude(v2, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acCode(0x00); putBits(ec, el) }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    if (bitCnt > 0) putBits(0x7f, 8 - bitCnt) // pad with 1-bits to a byte
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    @inline def u8(i: Int): Int  = b(i) & 0xff
    @inline def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val qt  = Array.ofDim[Int](4, 64)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var width  = 0
    var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0

    var pos = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (pos + 4 > b.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { pos += 2 }
      else if (marker == 0xd9) return None // EOI before SOS
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val end = pos + 2 + len
        marker match {
          case 0xdb => // DQT
            var p = seg
            while (p < end) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              if (p + 1 + (if (pq == 1) 128 else 64) > end) return None
              var i = 0
              while (i < 64) {
                qt(tq)(i) = if (pq == 1) u16(p + 1 + 2 * i) else u8(p + 1 + i)
                i += 1
              }
              p += 1 + (if (pq == 1) 128 else 64)
            }
          case 0xc4 => // DHT
            var p = seg
            while (p < end) {
              val tc = u8(p) >> 4
              val th = u8(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > end) return None
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val n    = bits.sum
              if (p + 17 + n > end || n > 256) return None
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val t    = new Huff(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if (u8(seg) != 8) return None // 8-bit precision only
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = u8(seg + 5)
            if (width <= 0 || height <= 0 || width.toLong * height > (1 << 26)) return None
            if (nc != 1 && nc != 3) return None
            if (seg + 6 + 3 * nc > end) return None
            val cs = new Array[Component](nc)
            var i  = 0
            while (i < nc) {
              val cid = u8(seg + 6 + 3 * i)
              val hv  = u8(seg + 7 + 3 * i)
              val h   = hv >> 4
              val v   = hv & 0x0f
              val tq  = u8(seg + 8 + 3 * i)
              if (h < 1 || h > 2 || v < 1 || v > 2 || tq > 3) return None
              // T.81 §A.2.2: a single-component scan is NON-interleaved —
              // one 8x8 data unit per MCU regardless of the sampling
              // factors declared in the frame header. Force h=v=1 so a
              // grayscale SOF0 declaring 2x2 sampling decodes correctly
              // instead of being misread as a 4-block interleaved MCU.
              if (nc == 1) cs(i) = Component(cid, 1, 1, tq, 0, 0)
              else cs(i) = Component(cid, h, v, tq, 0, 0)
              i += 1
            }
            comps = cs
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline frame types
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = u8(seg)
            if (ns != comps.length || seg + 1 + 2 * ns + 3 > end) return None
            var i = 0
            while (i < ns) {
              val cid = u8(seg + 1 + 2 * i)
              val tt  = u8(seg + 2 + 2 * i)
              val k   = comps.indexWhere(_.id == cid)
              if (k < 0 || (tt >> 4) > 3 || (tt & 0x0f) > 3) return None
              comps(k).dcTable = tt >> 4
              comps(k).acTable = tt & 0x0f
              i += 1
            }
            sosAt = end
          case _ => () // APPn, COM, others: skip
        }
        if (sosAt < 0) pos = end
      }
    }

    // ---- entropy-coded scan ------------------------------------------------
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcuX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcuY = (height + 8 * maxV - 1) / (8 * maxV)
    // per-component plane at sampled resolution (padded to whole MCUs)
    val planeW = comps.map(c => mcuX * 8 * c.h)
    val planeH = comps.map(c => mcuY * 8 * c.v)
    val planes = Array.tabulate(comps.length)(i => new Array[Byte](planeW(i) * planeH(i)))
    var vi = 0
    while (vi < comps.length) {
      val c = comps(vi)
      if (dcT(c.dcTable) == null || acT(c.acTable) == null) return None
      if (qt(c.tq).forall(_ == 0)) return None
      vi += 1
    }

    val r     = new BitReader(b, sosAt)
    val pred  = new Array[Int](comps.length)
    val coef  = new Array[Int](64)
    val block = new Array[Double](64)
    val tmp   = new Array[Double](64)

    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        val mcuIdx = my * mcuX + mx
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          if (!r.restart()) return None
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // decode one 8x8 block
              java.util.Arrays.fill(coef, 0)
              val t = r.decodeHuff(dcT(c.dcTable))
              if (t < 0 || t > 15) return None
              val diff = if (t == 0) 0 else {
                val v = r.bits(t)
                if (v < 0) return None
                extend(v, t)
              }
              pred(ci) += diff
              coef(0) = pred(ci) * qt(c.tq)(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = r.decodeHuff(acT(c.acTable))
                if (rs < 0) return None
                val run = rs >> 4
                val sz  = rs & 0x0f
                if (sz == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += run
                  if (k > 63) return None
                  val v = r.bits(sz)
                  if (v < 0) return None
                  coef(Zigzag(k)) = extend(v, sz) * qt(c.tq)(k)
                  k += 1
                }
              }
              // separable reference IDCT: rows (u over x), then columns
              var y0 = 0
              while (y0 < 8) {
                var x0 = 0
                while (x0 < 8) {
                  var s = 0.0
                  var u = 0
                  while (u < 8) { s += coef(y0 * 8 + u) * IdctCos(u * 8 + x0); u += 1 }
                  tmp(y0 * 8 + x0) = s
                  x0 += 1
                }
                y0 += 1
              }
              var x1 = 0
              while (x1 < 8) {
                var y1 = 0
                while (y1 < 8) {
                  var s = 0.0
                  var v = 0
                  while (v < 8) { s += tmp(v * 8 + x1) * IdctCos(v * 8 + y1); v += 1 }
                  block(y1 * 8 + x1) = s
                  y1 += 1
                }
                x1 += 1
              }
              // level shift, clamp, place into the component plane
              val px0 = (mx * c.h + bx) * 8
              val py0 = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val v0 = math.rint(block(yy * 8 + xx) + 128.0).toInt
                  val v  = if (v0 < 0) 0 else if (v0 > 255) 255 else v0
                  planes(ci)((py0 + yy) * planeW(ci) + (px0 + xx)) = v.toByte
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }

    // ---- upsample + color convert -----------------------------------------
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), out, y * width, width)
        y += 1
      }
      Some(Image(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      val cY  = comps(0); val cCb = comps(1); val cCr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)((y * cY.v / maxV) * planeW(0) + (x * cY.h / maxH)) & 0xff
          val cb = (planes(1)((y * cCb.v / maxV) * planeW(1) + (x * cCb.h / maxH)) & 0xff) - 128
          val cr = (planes(2)((y * cCr.v / maxV) * planeW(2) + (x * cCr.h / maxH)) & 0xff) - 128
          val rr = math.rint(yy + 1.402 * cr).toInt
          val gg = math.rint(yy - 0.344136 * cb - 0.714136 * cr).toInt
          val bb = math.rint(yy + 1.772 * cb).toInt
          val o  = (y * width + x) * 3
          out(o) = (if (rr < 0) 0 else if (rr > 255) 255 else rr).toByte
          out(o + 1) = (if (gg < 0) 0 else if (gg > 255) 255 else gg).toByte
          out(o + 2) = (if (bb < 0) 0 else if (bb > 255) 255 else bb).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, 3, out))
    }
  }
}
