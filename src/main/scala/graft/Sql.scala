package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** SQL entry point: register every testdata table as a temp view and run
  * ANSI SQL through Spark's parser/Catalyst — the surface a SQL-first user
  * of the engine gets (the reference has no SQL at all; this comes free
  * with the declarative design).
  */
object Sql {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** Create (or replace) temp views for all tables under `dir`. Memoized per
    * (session, dir): repeated calls (e.g. a benchmarked query invoking
    * [[query]] every run) would otherwise re-read all ten parquet footers
    * each time.
    *
    * Staleness contract: the memoized views (and Spark's cached file
    * listings behind them) reflect the files as of the FIRST call for this
    * (session, dir). A caller that rewrites the parquet fixtures under the
    * same dir mid-session must pass `refresh = true`, which re-creates the
    * views and drops the stale file-listing caches via
    * `REFRESH TABLE` on each view.
    */
  def createViews(spark: SparkSession, dir: String, refresh: Boolean = false): Unit =
    registered.synchronized {
      if (refresh && registered.get(spark).contains(dir)) {
        tableNames.foreach(n => spark.sql(s"REFRESH TABLE $n"))
        registered.remove(spark)
      }
      if (!registered.get(spark).contains(dir)) {
        val t = Tables(spark, dir)
        tableNames.foreach { n =>
          val df = n match {
            case "events" => t.events // nanos→micros conversion applied
            case other    => t.t(other)
          }
          df.createOrReplaceTempView(n)
        }
        registered(spark) = dir
      }
    }

  private val registered = scala.collection.mutable.WeakHashMap.empty[SparkSession, String]

  /** Views + query in one call. */
  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    createViews(spark, dir)
    spark.sql(sql)
  }
}
