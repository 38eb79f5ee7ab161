package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale helpers for the two classic shuffle killers: repeated fact-fact
  * joins (bucketing) and hot keys (salting).
  *
  * Bucketing: writing both join sides bucketed (+sorted) by the join key
  * lets every subsequent join/aggregation on that key run with ZERO
  * exchange — at 100 TB this converts the dominant cost of a recurring
  * pipeline into a one-time layout cost. Verified by BucketingSpec: the
  * joined plan contains a SortMergeJoin and no Exchange.
  *
  * Salting: AQE's skew-join splitting (enabled in SparkEnv) handles most
  * skew at runtime; explicit salting remains for the pathological case —
  * a single key holding a double-digit percentage of all rows — where even
  * a split partition's build side is one executor's problem. The salt
  * explodes the SMALL side `salt` times and randomizes the big side, so
  * the hot key spreads over `salt` reducers.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Drops any
    * previous table AND its leftover location first — a location orphaned
    * by an earlier session (in-memory catalog, on-disk warehouse) would
    * otherwise fail the Overwrite with LOCATION_ALREADY_EXISTS.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    // the metastore lowercases table identifiers — the on-disk location is
    // always lowercase regardless of the caller's casing
    Sinks.deleteRecursively(java.nio.file.Paths.get(warehouse, table.toLowerCase))
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Exchange-free equi-join of two tables bucketed on the same key with
    * the same bucket count.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  private val bucketBuilt =
    new java.util.concurrent.ConcurrentHashMap[
      String,
      java.util.concurrent.FutureTask[(String, String)]
    ]()

  /** The orders/lineitem pair written bucketed+sorted by orderkey — the
    * session-scoped LAYOUT artifact `q_join_bucketed` consumes (the
    * [[graft.core.SessionArtifact]] discipline: built once per (JVM,
    * fixture dir), read by every subsequent query). Both sides are
    * projected to the joining/aggregating columns before the write, so the
    * layout cost is paid on narrow data; lineitem's key is renamed to the
    * orders-side name because bucketed co-location requires the SAME
    * column name on both scan outputs for the planner to recognize the
    * shared distribution. At 100 TB this one-time write is what converts
    * every recurring orderkey join/aggregate from a per-run shuffle of the
    * fact table into a zero-Exchange co-located SMJ — the classic
    * fact-fact bucketing play. Returns the (orders, lineitem) table names.
    */
  def bucketedOrdersLineitemFor(spark: SparkSession, dir: String): (String, String) =
    graft.core.SessionArtifact.memo(bucketBuilt, dir) {
      val t   = graft.core.Tables(spark, dir)
      val tag = graft.core.SessionArtifact.tag(dir)
      val (ot, lt) = (s"b_orders_$tag", s"b_lineitem_$tag")
      writeBucketed(t.orders.select("o_orderkey", "o_orderstatus"), ot, "o_orderkey", 16)
      writeBucketed(
        t.lineitem.select(
          col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"),
          col("l_discount")
        ),
        lt,
        "o_orderkey",
        16
      )
      (ot, lt)
    }

  /** Salted inner equi-join for extreme single-key skew. The big side gets
    * a random salt in [0, salt); the small side is exploded `salt` times so
    * every (key, salt) combination can meet. Row-multiset result equals the
    * plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(seed = 7) * salt).cast("int"))
    val explodedSmall = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedBig
      .join(explodedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
