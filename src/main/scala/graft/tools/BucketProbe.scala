package graft.tools

import org.apache.spark.sql.functions._

/** Plan probe for the once-per-campaign bucketed verify payload
  * ([[graft.core.BucketedPayload]]): joins a d1-repartitioned candidate
  * frame against the bucketed payload on both id sides and prints the
  * formatted plan. The property the wave loops buy — the payload side of
  * each verify join is a bare bucketed scan with NO Exchange above it —
  * is visible here as zero Exchange operators between the payload's
  * `FileScan` and its join.
  *
  * Usage: runMain graft.tools.BucketProbe [dir]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.SparkEnv.session("graft-bucket-probe")
    // at gate scale neither side broadcasts — force the SMJ/shuffle-join
    // regime the wave loops actually run in, so the probe shows whether
    // the payload side scans exchange-free there
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs  = graft.core.Tables(spark, dir).documents
    val nb    = spark.sparkContext.defaultParallelism
    val pay = graft.core.BucketedPayload.ensure(spark, "probe", "x", "doc_id", nb)(
      graft.ext.Dedup.gramSets(docs))
    val cand = docs
      .select(col("doc_id").as("d1"), (col("doc_id") + 1).as("d2"))
      .repartition(nb, col("d1"))
    val j = cand
      .join(pay.select(col("doc_id").as("d1"), col("gsz").as("z1")), "d1")
      .join(pay.select(col("doc_id").as("d2"), col("gsz").as("z2")), "d2")
    // scalastyle:off println
    println(j.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // scalastyle:on println
    spark.stop()
  }
}
