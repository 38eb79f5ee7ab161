package graft

import org.apache.spark.sql.functions._

import graft.ops.PrefixSum
import graft.queries.StatsQueries

/** The statistics family: the hierarchical prefix-sum primitive against a
  * sequential replay (all three levels engaged), and brute-force replays
  * of the KS and Gini queries' semantics at sf0.001.
  */
class StatsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("PrefixSum.runningTotals equals the sequential prefix with all three levels engaged") {
    import spark.implicits._
    // 3 rows per bucket across buckets -12..12 (negative buckets pin the
    // floor-div chunk alignment), chunkSize=4 → ~7 chunks, so in-bucket,
    // in-chunk and triangular cross-chunk offsets are ALL non-trivial.
    val rows = for {
      b <- -12 to 12
      i <- 0 until 3
    } yield (b, b.toLong * 100 + i, ((b * 31 + i * 7) % 11).toLong, BigDecimal(s"$b.$i"))
    val df = rows
      .toDF("b", "k", "v1", "v2")
      .withColumn("v2", col("v2").cast(graft.queries.Num.Money))
    val got = PrefixSum
      .runningTotals(
        df,
        bucket = col("b"),
        order = Seq(col("k")),
        values = Seq((col("v1"), "c1"), (col("v2"), "c2")),
        chunkSize = 4
      )
      .select(col("k"), col("c1").cast("long"), col("c2").cast("double"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = rows
      .sortBy(_._2)
      .scanLeft((0L, 0L, BigDecimal(0))) { case ((_, a1, a2), r) => (r._2, a1 + r._3, a2 + r._4) }
      .drop(1)
      .map(t => (t._1, t._2, t._3.toDouble))
    assert(got.toSeq == expected, "hierarchical prefix diverges from the sequential replay")
  }

  test("q_ks_test matches the brute-force KS over collected values") {
    val r = StatsQueries.ksTest.fn(spark, sf).collect().head
    val vals = spark.read
      .parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select(
        (col("value").cast(graft.queries.Num.Money) * 100).cast("long").as("cents"),
        (col("user_id") % 2).as("side")
      )
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val a = vals.filter(_._2 == 0L).map(_._1).sorted
    val b = vals.filter(_._2 == 1L).map(_._1).sorted
    val grid = (a ++ b).distinct.sorted
    val dMax = grid.map { c =>
      math.abs(a.count(_ <= c).toLong * b.length - b.count(_ <= c).toLong * a.length)
    }.max
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    assert(r.getAs[Long]("d_num") == dMax, "KS numerator diverges from brute force")
  }

  test("q_gini matches the direct Lorenz/Gini computation") {
    val rows = StatsQueries.gini.fn(spark, sf).collect()
    val t = spark.read
      .parquet(s"$sf/documents.parquet")
      .groupBy("source")
      .agg(sum("n_chars").as("t"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(x => (x._2, x._1))
    val tot = t.map(_._2).sum
    val s   = t.length.toLong
    val srx = t.zipWithIndex.map { case ((_, x), i) => (i + 1).toLong * x }.sum
    val expGini = (2 * srx - (s + 1) * tot) * 1000000L / (s * tot)
    assert(rows.forall(_.getAs[Long]("gini_ppm") == expGini))
    val lorenz = t.scanLeft(0L) { case (acc, (_, x)) => acc + x }.drop(1)
    rows.sortBy(_.getAs[Long]("rnk")).zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("source") == t(i)._1, s"rank ${i + 1} source order")
      assert(r.getAs[Long]("cum_share_ppm") == lorenz(i) * 1000000L / tot)
    }
  }
}
