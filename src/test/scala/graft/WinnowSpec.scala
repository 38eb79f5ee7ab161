package graft

import graft.ext.Winnow

/** Properties of the winnowing rolling-hash fingerprint. */
class WinnowSpec extends SparkSpec {

  test("mulMod-backed rolling hash matches a direct polynomial evaluation") {
    // brute-force the k-gram hash with BigInt and compare to the rolled one
    val text = "the quick brown fox jumps over the lazy dog 0123456789"
    val k    = 8
    val M    = BigInt(Winnow.Mod)
    val B    = BigInt(Winnow.Base)
    val direct = (0 to text.length - k).map { i =>
      text.toLowerCase.substring(i, i + k).foldLeft(BigInt(0))((h, c) => (h * B + c.toInt) % M).toLong
    }
    // reproduce the internal hash sequence through fingerprints' minima:
    // the windowed minimum of `direct` must equal the selected fingerprints
    val w = 4
    val expected = (0 to direct.length - w)
      .map(win => (win until win + w).map(j => (direct(j), j)).minBy(t => (t._1, -t._2))._1)
      .distinct
      .toSet
    val got = Winnow.fingerprints(text, k, w).toSet
    assert(got == expected)
  }

  test("identical documents share all fingerprints; disjoint ones share none") {
    val a = Winnow.fingerprints("completely identical passage of text here", 8, 4)
    val b = Winnow.fingerprints("completely identical passage of text here", 8, 4)
    val c = Winnow.fingerprints("zzzz qqqq wwww xxxx yyyy 99998888", 8, 4)
    assert(a.toSet == b.toSet && a.nonEmpty)
    assert(a.toSet.intersect(c.toSet).isEmpty)
  }

  test("a shared substring of length >= k+w-1 guarantees a shared fingerprint") {
    val shared = "this exact passage is copied between both documents"
    val d1     = s"unique preamble one $shared totally different tail"
    val d2     = s"other start text $shared another ending entirely"
    val f1     = Winnow.fingerprints(d1, 8, 4).toSet
    val f2     = Winnow.fingerprints(d2, 8, 4).toSet
    assert(f1.intersect(f2).nonEmpty, "winnowing guarantee violated")
  }

  test("sharedPassagePairs finds injected copied passages, bucketed") {
    import spark.implicits._
    val passage = "the training corpus deduplication pipeline detects this copied paragraph"
    val docs = Seq(
      (1L, s"alpha $passage beta"),
      (2L, s"gamma $passage delta"),
      (3L, "entirely unrelated content with no overlap at all zz qq ww")
    ).toDF("doc_id", "text")
    val pairs = Winnow.sharedPassagePairs(spark, docs, minShared = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val plan = Winnow.sharedPassagePairs(spark, docs, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("short texts: empty below k, single fingerprint when m <= w") {
    assert(Winnow.fingerprints("short", 8, 4).isEmpty)
    assert(Winnow.fingerprints("exactly8", 8, 4).length == 1)
    // m == w boundary exactly (n = k+w-1 = 11): still the single-min branch —
    // the SQL oracle's windowed path must exclude m == w or it double-counts
    assert(Winnow.fingerprints("abcdefghijk", 8, 4).length == 1)
  }
}
