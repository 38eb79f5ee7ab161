package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for compute-dense operators (optimization
  * guide §2.5: "Input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * The bench fixtures are single-file, single-ROW-GROUP parquet, so every
  * scan plans exactly ONE task no matter the core count — parquet cannot
  * split inside a row group — and all per-row compute before the first
  * exchange serializes onto one core. StageProbe (round 16) measured the
  * damage on the 32-core bench box: q_bootstrap_ci spent 2×~6 s in two
  * single-task stages (the 32× md5 fan-out), q_multimodal_jpeg ~2.1 s in
  * a single-task JPEG encode+decode, q_ann_incremental ~3 s in single-task
  * per-vector quantization.
  *
  * [[Spread.compute]] round-robin-repartitions the frame to the session's
  * default parallelism — ONLY when the planned layout cannot already
  * provide it, so it is scale-adaptive rather than a constant tuned for
  * local mode: at cluster scale (or any healthy multi-row-group layout)
  * the scan yields ≥ defaultParallelism splits and the helper returns the
  * frame unchanged — no repartition node in the plan at all. Apply it to
  * NARROW frames (a projection of the scan, a small cached grain) whose
  * downstream per-row work is expensive; never to a wide payload a later
  * exchange would move anyway (guide §2.3 — shuffle keys, not payloads).
  *
  * The partition probe (`df.rdd.getNumPartitions`) runs physical planning
  * once at query-construction time; on the scan-level/cached frames this
  * is applied to, the plan has no exchanges, so no job is triggered. A
  * frame that DOES carry an upstream exchange is returned unchanged
  * before any probe: under AQE, `df.rdd` on such a plan would materialize
  * the shuffle's query stages — i.e. silently run a job at construction
  * time — and a post-shuffle layout already has the session's partition
  * count anyway, so the spread has nothing to repair there.
  */
object Spread {
  def compute(df: DataFrame): DataFrame = {
    val shuffled = df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]
    )
    if (shuffled) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
