package graft.core

import org.apache.spark.sql.DataFrame

/** Size-derived shuffle-partition counts for the iterative-graph family
  * (optimization guide §2.2 "fewer, larger reduce partitions", §6 input
  * split sizing): a per-superstep join/aggregate over a cached edge grain
  * re-executes its exchanges K times, so the partition count of that
  * grain multiplies into EVERY round's task count. The session default
  * (shuffle.partitions == core count) is right for one-shot corpus-sized
  * shuffles but wildly oversized for a grain that is kilobytes at bench
  * scale — StageProbe r17 measured the iterative queries spending most of
  * their wall in 32-task stage scheduling over sub-MB frames, and the
  * driver's 8-cpu companion run beat the 32-cpu run on exactly those
  * queries (PERF_r16 scaling: q_pagerank 0.55, q_segment_dedup 0.67).
  *
  * [[Grain.sized]] derives the count from the OPTIMIZED PLAN'S size
  * estimate (pure metadata — file sizes propagated through projections;
  * no job runs): ceil(bytes / 64 MiB), floored at 1 and capped at 4×
  * defaultParallelism. At bench scale that is 1 partition (the whole
  * grain is one task's worth of data); at 100 TB the same formula yields
  * thousands of partitions and the cap keeps the task count proportional
  * to the cluster — a size-derived knob, not a local-mode tune.
  */
object Grain {
  /** Target input bytes per partition — the guide's 100 MB–1 GB shuffle
    * partition rule, taken at the low end because plan-stat estimates run
    * BELOW in-memory row size (parquet file bytes, not unpacked rows).
    */
  val BytesPerPartition: Long = 64L << 20

  def sized(df: DataFrame): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val cap   = BigInt(df.sparkSession.sparkContext.defaultParallelism.toLong * 4L)
    ((bytes + BigInt(BytesPerPartition - 1)) / BigInt(BytesPerPartition))
      .max(1)
      .min(cap)
      .toInt
  }
}
