package graft

/** Semantics of the round-10 retrieval/graph/quality additions beyond their
  * oracle hash checks: RRF fusion cross-checked against its own rank
  * columns and the registered BM25 top-20, the char-entropy integer form
  * replayed exactly on the driver, and the mutual-k-NN triangle census
  * recounted from the materialized edge list.
  */
class RetrievalAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_rank_fusion: ranks are dense prefixes and rrf is the pinned integer form") {
    val rows = graft.queries.Registry.queries("q_rank_fusion")(spark, sf).collect()
    assert(rows.nonEmpty, "fusion produced no rows")

    def optLong(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))

    // each leg's ranks are exactly 1..len with no gaps or repeats
    val bmRanks = rows.flatMap(optLong(_, 1)).sorted.toSeq
    val tiRanks = rows.flatMap(optLong(_, 2)).sorted.toSeq
    assert(bmRanks == (1L to bmRanks.length).toSeq, s"bm25 ranks not dense: $bmRanks")
    assert(tiRanks == (1L to tiRanks.length).toSeq, s"tfidf ranks not dense: $tiRanks")
    assert(bmRanks.length <= 50 && tiRanks.length <= 50, "a leg exceeded its top-50 cut")

    // the fused score is exactly sum over present legs of 10^6 div (60+rank)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val expected =
        optLong(r, 1).map(k => 1000000L / (60L + k)).getOrElse(0L) +
          optLong(r, 2).map(k => 1000000L / (60L + k)).getOrElse(0L)
      assert(r.getLong(3) == expected, s"doc ${r.getLong(0)}: rrf ${r.getLong(3)} != $expected")
      assert(r.getLong(3) <= prev, "result not sorted by rrf desc")
      prev = r.getLong(3)
    }

    // the BM25 leg's rank order IS the registered q_bm25 ordering: the
    // top-20 docs of q_bm25 appear here with ranks 1..20 in the same order
    val bmLeg = rows
      .flatMap(r => optLong(r, 1).map(k => (k, r.getLong(0))))
      .sortBy(_._1)
      .map(_._2)
      .take(20)
      .toSeq
    val bm25Top = graft.queries.Registry
      .queries("q_bm25")(spark, sf)
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(bmLeg == bm25Top, "fusion's bm25 leg disagrees with q_bm25's ordering")
  }

  test("q_char_entropy matches an exact driver-side replay of the integer form") {
    val rows = graft.queries.Registry.queries("q_char_entropy")(spark, sf).collect()
    val docs = graft.core
      .Tables(spark, sf)
      .documents
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(rows.length == docs.size, "one output row per document expected")

    rows.foreach { r =>
      val (docId, nChars, nClasses, entMbits) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val text   = docs(docId)
      val chars  = if (text.isEmpty) Seq("") else text.map(_.toString)
      val counts = chars.groupBy(identity).map { case (_, v) => v.size.toLong }.toSeq
      val n      = counts.sum
      assert(nChars == n, s"doc $docId: n_chars $nChars != $n")
      assert(nClasses == counts.length.toLong, s"doc $docId: n_classes drifted")
      val acc = counts.map { k =>
        val bits = 63 - java.lang.Long.numberOfLeadingZeros((n * 1048576L) / k)
        k * (bits - 20L)
      }.sum
      assert(
        entMbits == (acc * 1000L) / n,
        s"doc $docId: entropy $entMbits != ${(acc * 1000L) / n}"
      )
      // sanity bounds: 0 ≤ floored entropy ≤ log2(n_classes) exactly at the
      // uniform distribution (the floor only understates)
      assert(entMbits >= 0L, s"doc $docId: negative entropy")
      val cap = (math.log(nClasses.toDouble.max(1.0)) / math.log(2.0) * 1000.0).ceil.toLong
      assert(entMbits <= cap, s"doc $docId: entropy $entMbits above log2(classes) cap $cap")
    }
  }

  test("q_graph_triangles matches a driver-side recount from the materialized k-NN graph") {
    val edges = graft.ext.Similarity
      .knnGraphFor(spark, sf)
      .select("vec_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val mutual = edges.collect {
      case (a, b) if a < b && edges.contains((b, a)) => (a, b)
    }
    val byNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- mutual
      (b2, c) <- mutual if b2 == b
      if mutual.contains((a, c))
    } {
      byNode(a) += 1; byNode(b) += 1; byNode(c) += 1
    }
    val expected = byNode.toSeq
      .sortBy { case (node, n) => (-n, node) }
      .take(50)

    val rows = graft.queries.Registry
      .queries("q_graph_triangles")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(rows == expected, s"triangle census drifted:\n got $rows\n exp $expected")
  }

  test("q_hard_negatives: exact copy and near-dup of the positive are excluded, others kept") {
    import spark.implicits._
    // synthetic corpus where the dedup filter MUST engage: the BM25 winner
    // has an exact copy (different doc_id) and a near-duplicate, both of
    // which also score high lexically — without the pair filter they would
    // be the first "negatives" (false negatives for contrastive training)
    val posText = (1 to 10).flatMap(i => Seq("scan", "join", "window", s"anchor$i")).mkString(" ")
    val nearText = posText.replace("anchor5", "edited5") // high-Jaccard near-dup
    val others = (1 to 8).map { i =>
      (10L + i, s"scan result number $i " + (1 to 10).map(j => s"filler${i}x$j").mkString(" "))
    }
    val docs = Seq((1L, posText), (2L, posText), (3L, nearText)) ++ others
    val dir  = "target/hn_corpus"
    docs.toDF("doc_id", "text").repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.queries.TextQueries.hardNegatives
      .fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))

    val kept = out.map(_._2).toSet
    assert(!kept.contains(1L), "positive leaked into its own negatives")
    assert(!kept.contains(2L), "exact copy of the positive kept as a negative")
    assert(!kept.contains(3L), "near-duplicate of the positive kept as a negative")
    assert(kept == others.map(_._1).toSet, s"expected all 8 lexical negatives, got $kept")
    assert(out.map(_._1).toSeq == (1L to 8L), "neg_rank must be a dense 1-based prefix")
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq, "bm25_rank order preserved")
  }

  test("q_span_mask matches a from-scratch span-selection replay") {
    def baseHash(x: String): Long = {
      val d   = java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.core
      .Tables(spark, sf)
      .documents
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))

    val expected = docs.map { case (id, text) =>
      val n      = text.split(" ", -1).length
      val starts = (0 until n).map(i => baseHash(s"$id:$i") % 20 == 0)
      val masked = (0 until n).map(i =>
        starts(i) || (i >= 1 && starts(i - 1)) || (i >= 2 && starts(i - 2))
      )
      val nMasked = masked.count(identity).toLong
      val nSpans  = (0 until n).count(i => masked(i) && (i == 0 || !masked(i - 1))).toLong
      (id, n.toLong, nMasked, nSpans, nMasked * 1000000L / n)
    }.sortBy(_._1).toSeq

    val got = graft.queries.TextQueries.spanMask
      .fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected, "span-mask stats diverge from the driver replay")
    // the corpus-level realized rate sits near the configured 3/20 with
    // merge sub-additivity: within [100k, 160k] ppm on any plausible fixture
    val totTok  = expected.map(_._2).sum
    val totMask = expected.map(_._3).sum
    val ppm     = totMask * 1000000L / totTok
    assert(ppm > 100000L && ppm < 160000L, s"corpus mask rate $ppm ppm implausible")
  }
}
