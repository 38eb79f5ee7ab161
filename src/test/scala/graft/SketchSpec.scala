package graft

import graft.queries.Relational

/** Accuracy bounds for the approximate sketches (not cross-engine
  * hash-matchable — HLL/quantile sketch internals differ per engine — so
  * correctness is an error bound against the exact answer).
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = Relational.qApproxDistinct
      .fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exact = graft.core
      .Tables(spark, sf)
      .lineitem
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("d"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a   = approx(k)
      val err = math.abs(a - e).toDouble / e
      assert(err < 0.05, s"group $k: approx $a vs exact $e (err $err)")
    }
  }

  test("approx p50/p95 bracket the true quantiles within 2% rank error") {
    val rows = Relational.qApproxQuantiles.fn(spark, sf).collect()
    val li   = graft.core.Tables(spark, sf).lineitem
    rows.foreach { r =>
      val flag = r.getString(0)
      val vals = li
        .filter(org.apache.spark.sql.functions.col("l_returnflag") === flag)
        .select("l_extendedprice")
        .collect()
        .map(_.getDouble(0))
        .sorted
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(r.getDouble(1)) - 0.5) < 0.02, s"$flag p50")
      assert(math.abs(rankOf(r.getDouble(2)) - 0.95) < 0.02, s"$flag p95")
    }
  }
}
