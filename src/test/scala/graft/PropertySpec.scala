package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.ops.{GroupStage, MapStage, ReduceStage}

/** Property tests over random corpora (FIXTURES.md §2): invariants that must
  * hold for ANY input, not just the goldens. Runs scalacheck directly (the
  * scalatestplus bridge isn't on the offline classpath).
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, minSuccessful: Int = 50): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""))).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] = Gen.listOfN(30, lineGen)

  test("word_count counts sum to the total token count of the corpus") {
    check(Prop.forAll(corpusGen) { corpus =>
      val mapped  = corpus.flatMap(MapStage.wcMap)
      val grouped = mapped.sorted
      val reduced = ReduceStage.wcReduce(grouped.iterator).toList
      val totalFromCounts = reduced.map(_.split("\t")(1).toLong).sum
      totalFromCounts == mapped.size.toLong
    })
  }

  test("grep output lines are a subset of (stripped) input lines") {
    check(Prop.forAll(corpusGen) { corpus =>
      val mapped  = corpus.flatMap(MapStage.grepMap("a"))
      val reduced = ReduceStage.grepReduce(mapped.iterator).toList
      reduced.forall(l => corpus.map(_.trim).contains(l))
    })
  }

  test("router (both modes) partitions the multiset exactly, one bucket per line") {
    check(Prop.forAll(corpusGen, Gen.choose(1, 5)) { (corpus, n) =>
      val data = corpus.flatMap(MapStage.wcMap)
      Prop.all(Seq(true, false).map { parity =>
        val lines = spark.sparkContext.parallelize(if (data.isEmpty) List("\t1") else data, 3)
        val parts = GroupStage(lines, n, parity)
          .mapPartitionsWithIndex { case (i, it) => it.map(l => (l, i)) }
          .collect()
        val multisetOk = parts.map(_._1).sorted.toSeq ==
          (if (data.isEmpty) List("\t1") else data).sorted
        val oneBucket = parts.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1)
        Prop(multisetOk && oneBucket)
      }: _*)
    }, minSuccessful = 10)
  }

  test("wcReduce output keys are the distinct input keys in order") {
    check(Prop.forAll(corpusGen) { corpus =>
      val grouped = corpus.flatMap(MapStage.wcMap).sorted
      val keys    = ReduceStage.wcReduce(grouped.iterator).map(_.split("\t")(0)).toList
      val expect  = grouped.map(l => l.substring(0, l.indexOf('\t'))).distinct
      keys == expect
    })
  }

  // ---- binary header parsers: total functions over arbitrary bytes ------

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 256).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  /** Adversarial payloads: valid magic prefixes followed by random bytes —
    * the inputs most likely to walk a parser off a cliff.
    */
  private val magicBytesGen: Gen[Array[Byte]] = for {
    magic <- Gen.oneOf(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      "GIF89a".getBytes,
      Array(0xff, 0xd8, 0xff).map(_.toByte),
      "RIFF0000WAVE".getBytes,
      Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes,
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 1) ++ "moov".getBytes
    )
    tail <- Gen.listOfN(64, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield magic ++ tail.toArray

  test("zaddrOf interleaves losslessly: deinterleave recovers both masked keys") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val xs  = List.fill(500)((rnd.nextLong().abs % 1000000L, rnd.nextLong().abs % 1000000L))
    val got = xs
      .toDF("a", "b")
      .select(col("a"), col("b"), graft.queries.Relational.zaddrOf(col("a"), col("b")).as("z"))
      .collect()
    def deinterleave(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(deinterleave(z) == (a & 0xffffL, b & 0xffffL), s"round-trip failed for ($a, $b) -> $z")
    }
  }

  test("imageDims, wavMeta, and mp4Meta never throw and terminate on arbitrary bytes") {
    check(Prop.forAll(Gen.oneOf(bytesGen, magicBytesGen)) { b =>
      // totality is the property: any exception fails the prop; a hang
      // fails the suite timeout. Returned values are checked by the
      // golden/oracle tests — here only "parses or declines cleanly".
      graft.ext.Multimodal.imageDims(b)
      graft.ext.Multimodal.wavMeta(b)
      graft.ext.Multimodal.mp4Meta(b)
      Prop.passed
    }, minSuccessful = 200)
  }

  test("Png.decode never throws on arbitrary bytes; encode∘decode is the identity") {
    // totality on garbage (incl. PNG-signature-prefixed garbage, which
    // reaches the chunk walk and inflater)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    check(Prop.forAll(Gen.oneOf(bytesGen, bytesGen.map(sig ++ _))) { b =>
      graft.ext.Png.decode(b)
      Prop.passed
    }, minSuccessful = 200)
    // round-trip: any raster of any supported geometry/channel count comes
    // back bit-exact through the real deflate + filter pipeline
    val rasterGen = for {
      w  <- Gen.choose(1, 40)
      h  <- Gen.choose(1, 24)
      ch <- Gen.oneOf(1, 2, 3, 4)
      px <- Gen.containerOfN[Array, Byte](w * h * ch, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, ch, px)
    check(Prop.forAll(rasterGen) { case (w, h, ch, px) =>
      val img = graft.ext.Png.decode(graft.ext.Png.encode(w, h, ch, px))
      img.exists(i => i.width == w && i.height == h && i.channels == ch && i.pixels.sameElements(px))
    }, minSuccessful = 100)
  }

  test("Jpeg encode∘decode stays within the analytic quantization bound on ANY raster") {
    // per-pixel error <= sum_uv (q/2)|basis_uv| <= (q/2) * (sum|IdctCos|)^2
    // = 2 * 2.829^2 ≈ 16 at q=4 — holds for arbitrary noise, not just
    // smooth images (the ExtSpec bound of 8 is for representative content)
    val rasterGen = for {
      w  <- Gen.choose(1, 32)
      h  <- Gen.choose(1, 24)
      ch <- Gen.oneOf(1, 3)
      px <- Gen.containerOfN[Array, Byte](w * h * ch, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, ch, px)
    check(Prop.forAll(rasterGen) { case (w, h, ch, px) =>
      graft.ext.Jpeg.decode(graft.ext.Jpeg.encode(w, h, ch, px, q = 4)).exists { d =>
        d.width == w && d.height == h && d.channels == ch &&
        px.indices.forall { i =>
          // color adds the YCbCr forward/back rounding on top of quant
          math.abs((d.pixels(i) & 0xff) - (px(i) & 0xff)) <= (if (ch == 1) 17 else 21)
        }
      }
    }, minSuccessful = 60)
  }

  test("Gif.decode and Jpeg.decode never throw and terminate on arbitrary bytes") {
    // same totality contract as the PNG/MP4 walks: untrusted media bytes
    // may decline (None) but never throw, hang, or index out of bounds —
    // including signature-prefixed garbage that reaches the LZW/Huffman
    // decoders, and bit-flipped mutations of VALID files whose tables and
    // length fields are then internally inconsistent
    val gifSig  = "GIF89a".getBytes.toSeq
    val jpegSig = Seq(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
    val validGif = graft.ext.Gif.encode(
      9, 7, Array.tabulate(48)(i => (i * 11).toByte), Array.tabulate(63)(i => (i % 16).toByte))
    val img = new java.awt.image.BufferedImage(9, 7, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 7; x <- 0 until 9) img.getRaster.setSample(x, y, 0, (x * 29 + y * 17) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", baos)
    val validJpeg = baos.toByteArray
    def mutGen(valid: Array[Byte]): Gen[Array[Byte]] =
      for {
        n    <- Gen.choose(1, 8)
        idxs <- Gen.listOfN(n, Gen.choose(2, valid.length - 1))
        vals <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      } yield {
        val m = valid.clone()
        idxs.zip(vals).foreach { case (i, v) => m(i) = v }
        m
      }
    check(Prop.forAll(Gen.oneOf(
      bytesGen,
      bytesGen.map(gifSig.toArray ++ _),
      bytesGen.map(jpegSig.toArray ++ _),
      mutGen(validGif),
      mutGen(validJpeg)
    )) { b =>
      graft.ext.Gif.decode(b)
      graft.ext.Jpeg.decode(b)
      Prop.passed
    }, minSuccessful = 400)
  }

  test("q_skyline equals the brute-force Pareto frontier of the fixture grid") {
    val sf  = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.qSkyline
      .fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val pts = graft.core.Tables(spark, sf).lineitem
      .selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS p",
        "CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS LONG) AS d"
      )
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    def dominated(a: (Long, Long)): Boolean = pts.exists { b =>
      b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)
    }
    val brute = pts.filterNot(dominated)
    assert(got == brute, s"frontier mismatch: got ${got.size}, brute ${brute.size}")
    assert(got.nonEmpty)
  }
}
