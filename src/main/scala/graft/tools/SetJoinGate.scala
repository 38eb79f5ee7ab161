package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.core.Tables
import graft.ext.SetJoin

/** Single-query scale gate for the exact set-similarity join: builds (or
  * reuses) a docs-only blow-up corpus, reads [[SetJoin.candidateEstimate]]
  * BEFORE enumeration, then runs `q_set_join` end-to-end while a listener
  * sums actual shuffle-write bytes — the gate record is the predicted vs
  * measured pair the round-12 ENOSPC post-mortem asked for (the engine
  * must PREDICT the enumeration footprint from the prefix-token stats it
  * already computes, not discover it at minute 80).
  *
  * The listener is registered AFTER the estimate (whose own aggregate and
  * the ordered-set cache build shuffle bytes the estimate deliberately
  * does not model), so measured bytes cover exactly the stages the
  * estimate predicts: the saltB× prefix replication and the candidate
  * enumeration + verify. Calibration target: predicted within ~2× of
  * measured.
  *
  * With SPARK_GRAFT_SHUFFLE_BUDGET set below the prediction, the same run
  * exercises the bounded-wave path at scale (each wave's shuffle cleaned
  * before the next starts); the JSON line records which mode ran.
  *
  * Usage: runMain graft.tools.SetJoinGate [base] [workDir] [mult]
  *   defaults: /root/testdata/sf0.1 target/setjoingate 30
  */
object SetJoinGate {

  def main(args: Array[String]): Unit = {
    val base    = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "target/setjoingate"
    val mult    = if (args.length > 2) args(2).toInt else 30
    val spark   = graft.core.SparkEnv.session("graft-setjoin-gate")

    val corpus = s"$workDir/docs${mult}x"
    val done   = new java.io.File(s"$corpus/GRAFT_CORPUS_DONE")
    if (!done.exists()) {
      System.err.println(s"[setjoin-gate] building ${mult}x docs-only corpus from $base")
      StressGen.writeDocsOnly(spark, base, corpus, mult, hot = false, partsScale = 8)
      done.createNewFile(): Unit
    } else System.err.println(s"[setjoin-gate] reusing corpus $corpus")

    val docs = Tables(spark, corpus).documents

    // estimate first: builds the ordered-set cache + runs the one cheap
    // aggregate, all OUTSIDE the measured window
    val tEst0 = System.nanoTime()
    val est   = SetJoin.candidateEstimate(docs)
    val estSec = (System.nanoTime() - tEst0) / 1e9

    val shuffleBytes = new AtomicLong(0L)
    val spillBytes   = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          // the r12/r13 ENOSPCs died in SORT SPILL, which shuffle metrics
          // do not count — the footprint is shuffle + spill
          spillBytes.addAndGet(m.diskBytesSpilled): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // try/finally: this gate's corpora are sized so OOM/ENOSPC is an
    // expected failure mode — a leaked listener would tax every
    // measurement a retry in the same session takes
    val wall =
      try {
        val t0 = System.nanoTime()
        SetJoin.similarityJoin(docs).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        // listener events are queued; the private listenerBus.waitUntilEmpty
        // is not accessible outside org.apache.spark, so poll the
        // accumulators until they hold still for a grace period (a fixed
        // sleep undercounted on a loaded box and inflated the
        // predicted/measured ratio this gate exists to calibrate), capped
        // at 30 s
        val deadline = System.nanoTime() + 30L * 1000000000L
        var last     = -1L
        var stable   = 0
        while (stable < 4 && System.nanoTime() < deadline) {
          Thread.sleep(500)
          val cur = shuffleBytes.get() + spillBytes.get()
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        w
      } finally spark.sparkContext.removeSparkListener(listener)

    val measured = shuffleBytes.get() + spillBytes.get()
    val ratio    = if (measured > 0) est.bytes.toDouble / measured else -1.0
    val budget   = SetJoin.shuffleBudget
    val mode     = budget match {
      case Some(b) if est.bytes > b => "waved"
      case _                        => "single-wave"
    }
    // adaptive re-waving record (round 15): how many waves the byte model
    // planned vs how many the measured-feedback scheduler actually ran
    val (wp, wr) = graft.core.AdaptiveWaves.snapshot.getOrElse("setjoin", (-1, -1))
    println(
      f"""{"mult":$mult,"mode":"$mode","waves_planned":$wp,"waves_run":$wr,""" +
        f""""prefix_rows":${est.prefRows},""" +
        f""""enum_pairs":${est.enumPairs},"predicted_surviving":${est.survivingPairs},""" +
        f""""sampled_survival":${est.survival}%.3f,""" +
        f""""predicted_bytes":${est.bytes},"measured_shuffle_bytes":${shuffleBytes.get()},""" +
        f""""measured_spill_bytes":${spillBytes.get()},"predicted_over_measured":$ratio%.2f,""" +
        f""""estimate_sec":$estSec%.1f,"wall_sec":$wall%.1f,""" +
        s""""budget_bytes":${budget.getOrElse(-1L)}}"""
    )
    spark.stop()
  }
}
