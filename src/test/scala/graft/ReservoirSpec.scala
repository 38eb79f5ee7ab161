package graft

import org.apache.spark.sql.functions._

import graft.functions.ReservoirSample

/** Properties of the reservoir-sample aggregator: size, membership, and
  * (coarse) uniformity under Spark's partial aggregation.
  */
class ReservoirSpec extends SparkSpec {

  test("sample size is min(k, group size) and items come from the group") {
    import spark.implicits._
    val df = (1 to 500)
      .map(i => (s"g${i % 3}", s"v$i"))
      .toDF("g", "v")
      .repartition(8)
    val out = df
      .groupBy("g")
      .agg(ReservoirSample.reservoir(10)(col("v")).as("sample"), count(lit(1)).as("n"))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val g      = r.getString(0)
      val sample = r.getSeq[String](1)
      assert(sample.length == 10)
      assert(sample.distinct.length == 10, "sample must not repeat reservoir slots")
      assert(sample.forall { v => v.startsWith("v") && (v.drop(1).toInt % 3) == g.drop(1).toInt })
    }
  }

  test("small groups return all their items") {
    import spark.implicits._
    val df  = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("g", "v")
    val out = df
      .groupBy("g")
      .agg(ReservoirSample.reservoir(10)(col("v")).as("sample"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).sorted)
      .toMap
    assert(out("a") == Seq("x", "y"))
    assert(out("b") == Seq("z"))
  }

  test("coarse uniformity: across many groups every value region gets sampled") {
    import spark.implicits._
    // 50 groups x 100 values; k=4 → if sampling were head-biased the
    // high-value region would never appear
    val df = (0 until 5000).map(i => (i / 100, i % 100)).toDF("g", "v").repartition(16)
    val rows = df
      .groupBy("g")
      .agg(ReservoirSample.reservoir(4)(col("v").cast("string")).as("s"))
      .collect()
    val sampled = rows.flatMap(_.getSeq[String](1)).map(_.toInt)
    assert(sampled.count(_ < 33) > 0)
    assert(sampled.count(v => v >= 33 && v < 66) > 0)
    assert(sampled.count(_ >= 66) > 0)
    // mean of uniform [0,99] samples should be near 49.5
    val mean = sampled.sum.toDouble / sampled.length
    assert(mean > 35 && mean < 65, s"suspiciously biased mean: $mean")
  }
}
