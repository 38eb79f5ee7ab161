package graft

import org.apache.spark.sql.functions._

/** Misuse-proofing pins for [[graft.core.Spread]] (VERDICT r16 item 10):
  * the helper must be an IDENTITY on any frame that already parallelizes
  * (multi-split relations) and on any frame carrying an upstream exchange
  * (where probing `df.rdd` under AQE would silently materialize the
  * shuffle as a construction-time job), and must only insert its
  * round-robin repartition on the exchange-free single-split layouts it
  * exists to repair.
  */
class SpreadSpec extends SparkSpec {

  private def hasRoundRobin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.sparkPlan.toString.contains("roundrobinpartitioning") ||
      df.queryExecution.sparkPlan.toString.contains("RoundRobinPartitioning")

  test("identity on a multi-split relation") {
    val n  = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 10000, 1, numPartitions = n).toDF("id")
    val out = graft.core.Spread.compute(df)
    assert(out eq df, "Spread must return a healthy multi-split frame unchanged")
  }

  test("repairs a single-split exchange-free frame") {
    assume(spark.sparkContext.defaultParallelism > 1)
    val df  = spark.range(0, 10000, 1, numPartitions = 1).toDF("id")
    val out = graft.core.Spread.compute(df)
    assert(hasRoundRobin(out), "Spread must repartition a single-split scan-level frame")
    assert(out.count() == 10000L)
  }

  test("identity on a frame with an upstream exchange (no probe, no job)") {
    // a shuffled frame: probing .rdd here would materialize the exchange's
    // query stages under AQE — Spread must bail out on the PLAN alone
    val df  = spark.range(0, 1000, 1, numPartitions = 4).toDF("id").repartition(2, col("id"))
    val out = graft.core.Spread.compute(df)
    assert(out eq df, "Spread must return a shuffled frame unchanged without probing it")
  }
}
