package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkSession factory for the graft engine.
  *
  * One session per process; all graft entry points (Verify, Bench, tests)
  * build through here so the scale-sensitive knobs are set once:
  *
  *   - `spark.sql.shuffle.partitions` sized to the local core count (the
  *     driver runs local[32]); on a real cluster this would be left to AQE
  *     coalescing from a higher initial value.
  *   - AQE on: runtime re-planning (skew-join splitting, partition
  *     coalescing, dynamic broadcast) is the main lever that lets the same
  *     declarative plans survive a 100x scale-up.
  *   - UTC session time zone + TIMESTAMP_MICROS parquet output so results
  *     hash-match the DuckDB oracle byte-for-byte.
  */
object SparkEnv {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def session(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Typed accessors for the driver-generated parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md). Scans stay lazy DataFrames so
  * Catalyst pushes filters/column pruning into the parquet reader.
  */
final class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
