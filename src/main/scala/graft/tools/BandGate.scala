package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.ext.Dedup

/** Single-family scale gate for the BAND verify queries (q_contamination,
  * q_ngram_jaccard) — [[SetJoinGate]]'s predicted-vs-measured discipline
  * applied to the family whose 5M-doc runs round 13 could PREDICT over
  * budget but not bound: reads [[Dedup.bandVerifyEstimate]] (both payload
  * grains) and the contamination expansion estimate BEFORE anything runs,
  * then times each query with a listener summing shuffle-write + spill
  * bytes and the single longest task — the round-14 "no task >5 min"
  * straggler check.
  *
  * REFUSE-WITH-NUMBERS: when q_contamination's predicted member-expansion
  * OUTPUT (the quadratic part of the answer itself — a K-copy group
  * crossing the split boundary owes ~K²/10 report rows by the query's own
  * semantics) cannot fit the node's free scratch even waved (the final
  * global sort shuffles the whole answer once), the gate records the
  * prediction and skips the run instead of discovering ENOSPC at minute
  * 40. On a real cluster the same answer distributes across executor
  * disks; the refusal is a single-node capacity statement, not an engine
  * limit.
  *
  * Usage: runMain graft.tools.BandGate [base] [workDir] [mult] [variant] [only]
  *   defaults: /root/testdata/sf0.1 target/bandgate 300 clean (both queries)
  * `only` is an optional comma list of the gate's queries — the mult=1000
  * campaigns each run for 1–2 h, and a record that is missing exactly one
  * query must be completable without re-paying the other's full campaign.
  * Honors SPARK_GRAFT_SHUFFLE_BUDGET (the wave trigger inside the queries)
  * and the usual SPARK_GRAFT_CACHE_LEVEL.
  */
object BandGate {

  private final class Meter extends SparkListener {
    val shuffle   = new AtomicLong(0L)
    val spill     = new AtomicLong(0L)
    val maxTaskNs = new AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
        spill.addAndGet(m.diskBytesSpilled): Unit
        maxTaskNs.accumulateAndGet(m.executorRunTime * 1000000L, Math.max): Unit
      }
    }
    def total: Long = shuffle.get() + spill.get()
  }

  /** Poll-until-stable listener-bus drain (the SetJoinGate round-14 fix —
    * a fixed sleep undercounted on a loaded box).
    */
  private def drain(m: Meter): Unit = {
    val deadline = System.nanoTime() + 30L * 1000000000L
    var last     = -1L
    var stable   = 0
    while (stable < 4 && System.nanoTime() < deadline) {
      Thread.sleep(500)
      val cur = m.total
      if (cur == last) stable += 1 else { stable = 0; last = cur }
    }
  }

  private def timed(spark: SparkSession, name: String, dir: String): (Double, Meter) = {
    val m = new Meter
    spark.sparkContext.addSparkListener(m)
    // try/finally: this gate runs real 300x corpora where OOM/ENOSPC is an
    // EXPECTED failure mode — a listener leaked onto the shared context
    // would tax every subsequent measurement with its accumulation
    try {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      drain(m)
      (wall, m)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  def main(args: Array[String]): Unit = {
    val base    = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "target/bandgate"
    val mult    = if (args.length > 2) args(2).toInt else 300
    val variant = if (args.length > 3) args(3) else "clean"
    require(Set("clean", "hot")(variant), s"variant '$variant' must be clean or hot")
    val gateQueries = Set("q_ngram_jaccard", "q_contamination")
    val selected =
      if (args.length > 4) args(4).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else gateQueries
    require(
      selected.subsetOf(gateQueries),
      s"'only' names unknown queries: ${selected -- gateQueries} (gate runs $gateQueries)")
    val spark = graft.core.SparkEnv.session("graft-band-gate")

    val corpus = s"$workDir/docs${mult}x-$variant"
    val done   = new java.io.File(s"$corpus/GRAFT_CORPUS_DONE")
    if (!done.exists()) {
      System.err.println(s"[band-gate] building ${mult}x $variant docs-only corpus from $base")
      StressGen.writeDocsOnly(spark, base, corpus, mult, hot = variant == "hot", partsScale = 8)
      done.createNewFile(): Unit
    } else System.err.println(s"[band-gate] reusing corpus $corpus")

    // offline cache builds outside every measured window (warmUp's dedup
    // trigger matches the jaccard family)
    val arts = graft.Bench.warmUp(spark, corpus, Some(selected))

    val docs = Tables(spark, corpus).documents

    // every estimate BEFORE any measured query — their own jobs (band agg,
    // 10% sample join, member-group agg) must not pollute the meters
    val tEst0 = System.nanoTime()
    val estG  = Dedup.bandVerifyEstimate(docs, "gram")
    val estS  = Dedup.bandVerifyEstimate(docs, "shingle")
    val (expRows, expBytes) = graft.queries.Pipeline.contaminationExpansionEstimate(docs)
    val estSec = (System.nanoTime() - tEst0) / 1e9
    val free   = new java.io.File(sys.props("java.io.tmpdir")).getUsableSpace

    val budget = graft.ext.SetJoin.shuffleBudget
    // CRASH-ROBUST RECORDS (round 15): each query's record is appended to
    // workDir/records.jsonl the moment it completes — an OOM/ENOSPC abort
    // on the SECOND query must not erase the first's measurement (the
    // round-14 mult=100 hot line survived only as stderr). The final
    // stdout line still carries the merged record for the driver.
    val recordsPath = java.nio.file.Paths.get(s"$workDir/records.jsonl")
    def persist(rec: String): Unit =
      try {
        java.nio.file.Files.createDirectories(recordsPath.getParent)
        java.nio.file.Files.write(
          recordsPath,
          (s"""{"mult":$mult,"variant":"$variant",$rec}""" + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND
        ): Unit
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[band-gate] could not persist record: $e")
      }
    def wavesSnapshotJson(): String =
      graft.core.AdaptiveWaves.snapshot.toSeq.sorted
        .map { case (t, (p, r)) => s""""$t":{"planned":$p,"run":$r}""" }
        .mkString("{", ",", "}")
    def fmtQ(
        name: String,
        predicted: Long,
        run: Boolean,
        skipReason: String): String = {
      val rec =
        if (!run)
          s"""\"$name\":{"predicted_bytes":$predicted,"skipped":"$skipReason"}"""
        else {
          val (wall, m) = timed(spark, name, corpus)
          val measured  = m.total
          val ratio     = if (measured > 0) predicted.toDouble / measured else -1.0
          System.err.println(
            f"[band-gate] $name wall=$wall%.1fs shuffle=${m.shuffle.get()} spill=${m.spill.get()} " +
              f"max_task=${m.maxTaskNs.get() / 1e9}%.1fs ratio=$ratio%.2f")
          // waves snapshot AT RECORD TIME (round 16): the crash-robust
          // records.jsonl must carry the campaign's planned-vs-run wave
          // counts per query — the merged stdout line never prints when a
          // later query OOMs. The snapshot is cumulative per tag (it holds
          // each tag's LAST campaign), so a query that waved nothing
          // repeats the previous query's tags; readers key on the tags a
          // query's own family uses (ngram / neardup / setjoin).
          f"""\"$name\":{"predicted_bytes":$predicted,"wall_sec":$wall%.1f,""" +
            f""""measured_shuffle_bytes":${m.shuffle.get()},"measured_spill_bytes":${m.spill.get()},""" +
            f""""predicted_over_measured":$ratio%.2f,"max_task_sec":${m.maxTaskNs.get() / 1e9}%.1f,""" +
            s""""waves":${wavesSnapshotJson()}}"""
        }
      persist(rec)
      rec
    }
    // the estimates are a record in their own right — persist them before
    // any measured query can abort the process
    persist(
      s""""estimates":{"gram":${estG.bytes},"shingle":${estS.bytes},""" +
        s""""expansion_rows":$expRows,"expansion_bytes":$expBytes,"free":$free}""")

    // the expansion output rides ONE global sort at the end of
    // q_contamination — waves bound the verify, not the answer — so the
    // run is refused when the predicted answer's sort footprint exceeds
    // free scratch even at an optimistic 2× shuffle compression (the rows
    // are hash-distributed id pairs, LZ4 buys little; the reduce-side sort
    // spills roughly the map output AGAIN, which the margin absorbs)
    val contamFits = expBytes / 2 < free
    val rG = fmtQ(
      "q_ngram_jaccard",
      estG.bytes,
      run = selected("q_ngram_jaccard"),
      skipReason = "not selected (only=...)")
    val rC = fmtQ(
      "q_contamination",
      estS.bytes + expBytes,
      run = contamFits && selected("q_contamination"),
      skipReason =
        if (!selected("q_contamination")) "not selected (only=...)"
        else
          f"predicted expansion output $expRows rows (~$expBytes B raw) vs $free B free scratch")

    // adaptive re-waving record (round 15): waves the byte model planned vs
    // waves the measured-feedback scheduler ran, per campaign tag
    val wavesJson = wavesSnapshotJson()
    println(
      s"""{"mult":$mult,"variant":"$variant","waves":$wavesJson,""" +
        s""""budget_bytes":${budget.getOrElse(-1L)},""" +
        f""""estimate_sec":$estSec%.1f,"artifact_build_sec":${arts.values.sum}%.1f,""" +
        s""""gram_estimate":{"enum_pairs":${estG.enumPairs},"survival":${estG.survival},""" +
        s""""avg_payload":${estG.avgPayload},"bytes":${estG.bytes}},""" +
        s""""shingle_estimate":{"enum_pairs":${estS.enumPairs},"survival":${estS.survival},""" +
        s""""avg_payload":${estS.avgPayload},"bytes":${estS.bytes}},""" +
        s""""expansion_estimate":{"rows":$expRows,"bytes":$expBytes},""" +
        s"""$rG,$rC}"""
    )
    spark.stop()
  }
}
