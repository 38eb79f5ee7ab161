package graft

import graft.ext.SetJoin

/** Exact set-similarity join (prefix filter): completeness and exactness
  * against a driver-side brute-force reference, on a corpus engineered to
  * stress the filter — near-dup pairs, partial overlaps straddling the
  * threshold, sub-3-token (setless) docs, and exact-duplicate texts that
  * exercise the rep pre-collapse path.
  */
class SetJoinSpec extends SparkSpec {

  private def shingleSet(text: String): Set[String] = {
    val toks = text.toLowerCase.split(" ", -1)
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("similarityJoin equals brute-force exact Jaccard >= 1/2 over reps") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def sentence(n: Int): String = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
    val bases = (0 until 40).map { i =>
      // lengths 0..24 words: includes setless docs (< 3 tokens)
      (i.toLong, sentence(i % 25))
    }
    // near-dups: append one word to an existing text (high but < 1 jaccard)
    val nears = (0 until 10).map { i =>
      (100L + i, bases(4 + i)._2 + " omega")
    }
    // exact duplicates of a handful of texts, new ids — the pre-collapse path
    val dups = (0 until 6).map(i => (200L + i, bases(10 + i)._2))
    val docs = (bases ++ nears ++ dups).toDF("doc_id", "text")

    // brute force over representatives (min doc_id per distinct text)
    val all = (bases ++ nears ++ dups)
    val reps = all.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSeq
    val sets = reps.map { case (id, t) => (id, shingleSet(t)) }.filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      uni = sa.size + sb.size - inter
      if 2L * inter >= uni
    } yield (a, b, inter.toLong, uni.toLong)).toSet
    assert(expected.nonEmpty, "test corpus produced no qualifying pairs")
    assert(expected.exists(p => p._3 < p._4), "want at least one non-identical pair")

    val got = SetJoin
      .similarityJoin(docs)
      .select("d1", "d2", "inter", "uni")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")

    val plan = SetJoin.similarityJoin(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)

    // salted enumeration at fan-outs beyond the session-derived one (the
    // first assertion above already covers it via similarityJoin): every
    // pair must meet exactly once regardless of saltB, so a non-dividing
    // fan-out (3) and the derivation's cap (64, larger than the corpus's
    // per-token groups) pin the meet-exactly-once invariant, not one
    // lucky modulus
    for (b <- Seq(3, 64)) {
      val salted = SetJoin
        .similarityJoinWith(docs, saltB = b)
        .select("d1", "d2", "inter", "uni")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(
        salted == expected,
        s"salted path diverges at saltB=$b: missing=${expected -- salted} extra=${salted -- expected}"
      )
    }

    // bounded-wave enumeration ≡ single wave: each pair meets at exactly
    // one salt, each salt lands in exactly one wave, so the union over
    // waves must be the same set with no pair duplicated or dropped —
    // pinned at a wave count that divides the salt space (2 of 8), one
    // that does not (3 of 8), and the degenerate full split (8 of 8)
    for (w <- Seq(2, 3, 8)) {
      val waved = SetJoin
        .similarityJoinWaved(docs, saltB = 8, wavesArg = w)
        .select("d1", "d2", "inter", "uni")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(
        waved == expected,
        s"waved path diverges at waves=$w: missing=${expected -- waved} extra=${waved -- expected}"
      )
    }

    // adaptive re-waving (round 15) ≡ fixed-wave: with a budget the
    // scheduler re-plans batch sizes from measured bytes — a tiny budget
    // keeps every batch at the planned floor, a huge one collapses the
    // remaining salts into one batch after the first — and BOTH must
    // produce exactly the fixed-wave pair set (batching is
    // output-invariant by construction). Fresh wave counts dodge the
    // (plan, saltB, waves) memo of the fixed-wave runs above.
    for ((w, b) <- Seq((4, 1L), (5, Long.MaxValue / 4))) {
      val adaptive = SetJoin
        .similarityJoinWaved(docs, saltB = 8, wavesArg = w, budget = Some(b))
        .select("d1", "d2", "inter", "uni")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(
        adaptive == expected,
        s"re-planned waves diverge at waves=$w budget=$b: " +
          s"missing=${expected -- adaptive} extra=${adaptive -- expected}"
      )
    }

    // the pre-enumeration volume estimate is a true upper bound: every
    // qualifying pair shares >= 1 prefix token (the completeness theorem),
    // so it is counted at least once in sum_tok C(cnt, 2)
    val est = SetJoin.candidateEstimate(docs)
    assert(est.prefRows > 0 && est.bytes > 0)
    assert(
      est.enumPairs >= expected.size,
      s"estimate ${est.enumPairs} below the true pair count ${expected.size} — not an upper bound"
    )
  }

  test("byte-budget parser accepts plain bytes and k/m/g suffixes") {
    assert(SetJoin.parseBytes("1000000") == 1000000L)
    assert(SetJoin.parseBytes("512m") == 512L * 1024 * 1024)
    assert(SetJoin.parseBytes("40g") == 40L * 1024 * 1024 * 1024)
    assert(SetJoin.parseBytes("0.5g") == (0.5 * (1L << 30)).toLong)
    intercept[NumberFormatException](SetJoin.parseBytes("lots"))
  }

  test("prefix filter prunes: candidate tokens per doc stay under the set size") {
    import spark.implicits._
    // a 9-shingle doc at t=1/2 keeps a 5-token prefix: the equi-join feeds
    // on strictly fewer tokens than the verify pass reads
    val docs = Seq((1L, "a b c d e f g h i j k")).toDF("doc_id", "text")
    val out = SetJoin.similarityJoin(docs)
    assert(out.count() == 0) // single doc: no pairs, but the plan builds
  }
}
