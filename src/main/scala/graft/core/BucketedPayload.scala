package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Once-per-campaign bucketed materialization of a wave loop's verify
  * payload (round 15).
  *
  * Every bounded-wave verify joins its per-wave candidate frame against the
  * SAME full-corpus payload table (shingle/gram hash + string sets) on
  * `doc_id`-derived keys — and each wave re-paid the payload's FULL shuffle
  * exchange for those joins (round 14's 5M-doc campaign: 47 waves × ~8 min,
  * dominated by the re-shuffled d2-side payload — ~6.3 h of wall for a
  * verify whose quadratic term was already bounded). Writing the payload
  * ONCE as a bucket-sorted table hashed by `doc_id` gives every wave's
  * join the payload side exchange-free AND sort-free: the bucketed scan's
  * `HashPartitioning(doc_id, n)` (same Murmur3 hash as a shuffle exchange)
  * satisfies the join's distribution requirement directly, so wave w pays
  * a plain columnar parquet read of the payload instead of a shuffle
  * write+read of it. The scratch cost is one linear-in-corpus payload copy,
  * which the wave budget already accounts for.
  *
  * The table is registered in the session catalog with an explicit path
  * under [[WaveScratch]] management (session-unique dir, exit-time delete,
  * TTL crash sweep), and memoized per (session, tag, plan key): a
  * campaign's N waves and a bench rep's reconstruction all read the same
  * build.
  */
object BucketedPayload {

  /** memoKey → (catalog table name, scratch dir path). The dir path rides
    * along so [[ensure]] can re-validate it: the memo can outlive the
    * parquet in a long session (WaveScratch's TTL sweep, or an operator
    * clearing /tmp), and serving a catalog entry whose files are gone
    * fails confusingly on first touch instead of rebuilding.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Materialize `build` bucketed+sorted by `bucketCol` into `nBuckets`
    * buckets (once per key; later calls re-read), returning the table as a
    * DataFrame. `tag` names the consumer family, `key` the full plan hash
    * plus parameters — the same contract as [[WaveScratch.dirFor]]. A memo
    * hit whose scratch dir no longer exists drops the stale catalog table
    * and rebuilds (CoreUtilSpec pins it).
    */
  def ensure(
      spark: SparkSession,
      tag: String,
      key: String,
      bucketCol: String,
      nBuckets: Int)(build: => DataFrame): DataFrame = {
    val memoKey = s"${spark.sparkContext.applicationId}-$tag-$key-$nBuckets"
    val (tbl, _) = memo.compute(
      memoKey,
      (_, cur) => {
        if (cur != null && new java.io.File(cur._2).exists()) cur
        else {
          val name = s"graft_pay_${tag}_${key}_$nBuckets"
            .replaceAll("[^A-Za-z0-9_]", "_")
            .toLowerCase
          if (cur != null) {
            System.err.println(
              s"[payload] scratch dir ${cur._2} is gone — dropping stale table ${cur._1} and rebuilding")
            spark.sql(s"DROP TABLE IF EXISTS ${cur._1}"): Unit
          }
          val dir = WaveScratch.dirFor(spark, s"pay-$tag", s"$key-$nBuckets")
          val t0  = System.nanoTime()
          build.write
            .mode("overwrite")
            .option("path", dir)
            .bucketBy(nBuckets, bucketCol)
            .sortBy(bucketCol)
            .saveAsTable(name)
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(
            f"[payload] bucketed $tag payload built in $sec%.1f s ($nBuckets buckets at $dir)")
          BuildWalls.record(s"payload_$tag", sec)
          (name, dir)
        }
      }
    )
    spark.table(tbl)
  }
}
