package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL PNG codec — pure JVM (`java.util.zip` Deflater/Inflater +
  * CRC32), no external library. This is the pixel-level decode the rest of
  * [[Multimodal]] treats as a batch stage: where `imageDims` stops at the
  * IHDR header (the 100 TB metadata path), [[Png.decode]] inflates the IDAT
  * stream and reverses the per-scanline filters to recover raw pixel bytes,
  * and [[Png.encode]] produces a spec-valid file the decoder (and
  * `javax.imageio`, cross-checked in ExtSpec) reads back bit-exactly.
  *
  * Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette,
  * expanded to RGB via the PLTE chunk), 4 (gray+alpha), 6 (RGBA),
  * non-interlaced — what `javax.imageio`'s writer emits for the standard
  * BufferedImage types. Anything else (1/2/4/16-bit depths, Adam7
  * interlace) returns None and falls back to the caller's stub path,
  * same contract as the header parsers. Layout per ISO/IEC 15948 (PNG):
  * signature, length-tagged chunks with CRC32 over type+data, scanlines
  * prefixed by a filter byte (§9: None/Sub/Up/Average/Paeth).
  */
object Png {

  /** Decoded raster: `pixels` is `height` rows × `width` × `channels`
    * unfiltered bytes in scanline order.
    */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Hard cap on decoded raster size (256 MiB) so a forged IHDR cannot make
    * the decoder allocate unbounded memory — the same totality discipline
    * as [[Multimodal.mp4Meta]]'s clamped box walk.
    */
  private val MaxRaster = 1 << 28

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 4 => 2
    case 6 => 4
    case _ => -1
  }

  /** Full pixel decode: chunk walk → IDAT inflate → filter reversal.
    * Returns None (never throws) on anything that is not a supported,
    * well-formed, complete PNG.
    */
  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < Signature.length + 12) return None
    var s = 0
    while (s < Signature.length) { if (b(s) != Signature(s)) return None; s += 1 }
    @inline def u8(i: Int): Int  = b(i) & 0xff
    @inline def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)

    var i                            = Signature.length
    var w, h, depth, interlace       = 0
    var colorType                    = -1
    var sawIhdr, sawIend             = false
    var plte: Array[Byte]            = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend && i + 8 <= b.length) {
      val len = be32(i)
      if (len < 0 || len > b.length - i - 12) return None // truncated/forged length
      val tag = new String(b, i + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(i + 8); h = be32(i + 12)
          depth = u8(i + 16); colorType = u8(i + 17); interlace = u8(i + 20)
          sawIhdr = true
        case "IDAT" => idat.write(b, i + 8, len)
        case "PLTE" =>
          if (len == 0 || len % 3 != 0 || len > 768) return None
          plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    // color type 3 (palette): the raster carries one index byte per pixel
    // (depth 8 only, like the other types) and PLTE must be present; the
    // decoded output is palette-resolved RGB, same as [[Gif]]
    val paletted = colorType == 3
    val channels = if (paletted) 1 else channelsOf(colorType)
    if (!sawIhdr || !sawIend || depth != 8 || interlace != 0 || channels < 0) return None
    if (paletted && plte == null) return None
    if (w <= 0 || h <= 0 || w.toLong * h * channels > MaxRaster) return None

    val stride = w * channels
    val rawLen = (stride + 1) * h // +1 filter byte per scanline
    // zlib expands at most ~1032:1 (raw deflate blocks); a forged IHDR
    // whose claimed raster could not possibly come out of the IDAT bytes
    // present is rejected BEFORE the raster allocation, so a 45-byte
    // payload cannot force a 512 MiB transient per row
    if (idat.size().toLong * 1032 + 64 < rawLen.toLong) return None
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // short stream
        off += n
      }
      if (off < rawLen) return None
    } catch { case _: java.util.zip.DataFormatException => return None } finally inf.end()

    val out = new Array[Byte](stride * h)
    val bpp = channels // 8-bit depth: filter distance == channel count (§9.2)
    var y   = 0
    while (y < h) {
      val f  = raw(y * (stride + 1)) & 0xff
      val rs = y * (stride + 1) + 1
      val os = y * stride
      var x  = 0
      f match {
        case 0 => System.arraycopy(raw, rs, out, os, stride)
        case 1 => // Sub
          while (x < stride) {
            val left = if (x >= bpp) out(os + x - bpp) & 0xff else 0
            out(os + x) = ((raw(rs + x) & 0xff) + left).toByte; x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val up = if (y > 0) out(os - stride + x) & 0xff else 0
            out(os + x) = ((raw(rs + x) & 0xff) + up).toByte; x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val left = if (x >= bpp) out(os + x - bpp) & 0xff else 0
            val up   = if (y > 0) out(os - stride + x) & 0xff else 0
            out(os + x) = ((raw(rs + x) & 0xff) + (left + up) / 2).toByte; x += 1
          }
        case 4 => // Paeth (§9.4)
          while (x < stride) {
            val a = if (x >= bpp) out(os + x - bpp) & 0xff else 0
            val c = if (y > 0) out(os - stride + x) & 0xff else 0
            val d = if (x >= bpp && y > 0) out(os - stride + x - bpp) & 0xff else 0
            val p  = a + c - d
            val pa = math.abs(p - a); val pb = math.abs(p - c); val pc = math.abs(p - d)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) c else d
            out(os + x) = ((raw(rs + x) & 0xff) + pred).toByte; x += 1
          }
        case _ => return None // undefined filter type
      }
      y += 1
    }
    if (!paletted) Some(Image(w, h, channels, out))
    else {
      val nColors = plte.length / 3
      val rgb     = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val idx = out(p) & 0xff
        if (idx >= nColors) return None
        rgb(3 * p) = plte(3 * idx)
        rgb(3 * p + 1) = plte(3 * idx + 1)
        rgb(3 * p + 2) = plte(3 * idx + 2)
        p += 1
      }
      Some(Image(w, h, 3, rgb))
    }
  }

  /** Spec-valid PNG encoder: filter-0 scanlines, one deflated IDAT, real
    * CRC32s — readable by any conformant decoder (ExtSpec round-trips it
    * through `javax.imageio`). `pixels` must be `height` rows of
    * `width * channels` bytes; channels ∈ {1, 2, 3, 4} map to color types
    * 0/4/2/6.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
    val colorType = channels match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
      case c => throw new IllegalArgumentException(s"unsupported channel count $c")
    }
    val stride = width * channels
    val raw    = new Array[Byte]((stride + 1) * height)
    var y      = 0
    while (y < height) { // filter byte 0 + raw scanline
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val defl = new Deflater()
    val compressed =
      try {
        defl.setInput(raw); defl.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
        buf.toByteArray
      } finally defl.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
      val crc = new CRC32()
      crc.update(bb.array(), 4, 4 + data.length) // CRC covers type + data (§5.3)
      bb.putInt(crc.getValue.toInt)
      out.write(bb.array(), 0, bb.capacity())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", compressed)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
