package graft

import graft.queries.Relational

/** Accuracy bounds for the approximate sketches. The registered queries
  * reduce each sketch to exact companions + error-bound BOOLEANS (so the
  * driver hash-checks them — see qApproxDistinct/qApproxQuantiles); this
  * spec keeps the RAW sketch values honest by recomputing them directly
  * and bounding them against the exact answers, and pins the registered
  * queries' booleans to TRUE.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 5% of exact per group; query booleans all true") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables(spark, sf).lineitem
    val both = li
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
        countDistinct(col("l_orderkey")).as("e")
      )
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      val err    = math.abs(a - e).toDouble / e
      assert(err < 0.05, s"group ${r.getString(0)}: approx $a vs exact $e (err $err)")
    }
    val q = Relational.qApproxDistinct.fn(spark, sf).collect()
    assert(q.nonEmpty && q.forall(_.getBoolean(3)), "hll_ok must be true for every group")
  }

  test("approx p50/p95 bracket the true quantiles within 2% rank error; query booleans all true") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables(spark, sf).lineitem
    val approx = li
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("a95")
      )
      .collect()
    approx.foreach { r =>
      val flag = r.getString(0)
      val vals = li
        .filter(col("l_returnflag") === flag)
        .select("l_extendedprice")
        .collect()
        .map(_.getDouble(0))
        .sorted
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(r.getDouble(1)) - 0.5) < 0.02, s"$flag p50")
      assert(math.abs(rankOf(r.getDouble(2)) - 0.95) < 0.02, s"$flag p95")
    }
    val q = Relational.qApproxQuantiles.fn(spark, sf).collect()
    assert(q.nonEmpty && q.forall(r => r.getBoolean(3) && r.getBoolean(4)), "p50_ok/p95_ok must be true")
  }
}
