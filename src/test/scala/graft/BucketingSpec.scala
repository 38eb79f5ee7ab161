package graft

import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Plan + value specs for the bucketing and salting scale helpers. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero exchange (co-located SMJ)") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    Bucketing.writeBucketed(t.orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem",
      "o_orderkey",
      8
    )
    // disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan   = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan)
      // values match the plain join
      val expected = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q_join_bucketed: join AND per-order aggregate plan zero hash exchanges") {
    // broadcast off so the strategy decision is about the bucketed layout,
    // as production fact-fact sizes would force anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df   = graft.queries.Relational.qJoinBucketed.fn(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(
        !plan.contains("Exchange hashpartitioning"),
        "bucketed join + orderkey aggregate must not hash-shuffle:\n" + plan
      )
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // pathological skew: one key holds 90% of the big side
    val big = spark
      .range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"), col("id").as("payload"))
    val small  = Seq((1L, "hot"), (42L, "cold"), (9500L, "cold2")).toDF("k", "name")
    val plain  = big.join(small, "k")
    val salted = Bucketing.saltedJoin(big, small, "k", 8)
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = plain.groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
