package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Z-order clustered LAYOUT — the write-side half of the Morton-key story
  * `q_zorder` computes: range-partition + sort the table by the interleaved
  * (l_partkey, l_suppkey) z-address before writing, so every parquet file
  * (one row group at fixture scale) covers a contiguous z-range — a small
  * RECTANGLE in (part, supp) space — and the reader's min/max row-group
  * statistics prune 2-D range probes on EITHER key. `q_zorder_probe` reads
  * this layout; PlanSpec measures the actual scan-row reduction against an
  * unclustered control. At 100 TB this is the standard lakehouse
  * data-skipping layout: the z-sort costs one range exchange at write time
  * and replaces two single-column sort orders.
  *
  * Memoized per fixture dir for the session — the production analog is an
  * offline OPTIMIZE/compaction job whose output outlives any query (same
  * staleness contract as [[graft.ext.Ivf.indexFor]]).
  */
object ZOrder {

  /** Output file count: each file is one z-range → one bounding rectangle. */
  val Files = 32

  // Goetz-style memoizer: computeIfAbsent installs a cheap FutureTask
  // without holding any lock across the Spark write, so concurrent first
  // calls for DIFFERENT fixture dirs build in parallel while same-dir
  // callers block on one shared build.
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.FutureTask[String]]()

  // One shutdown hook for every layout this JVM ever builds — the layout
  // is a session-scoped materialization, not an artifact: without this
  // every test/bench JVM would leak a full lineitem copy under tmpdir.
  private val sweptPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    sweptPaths.forEach(p => deleteRecursively(new java.io.File(p)))
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  def layoutFor(spark: SparkSession, dir: String): String = {
    val task = built.computeIfAbsent(
      dir,
      _ =>
        new java.util.concurrent.FutureTask[String](() => {
          val tag = java.security.MessageDigest
            .getInstance("MD5")
            .digest(dir.getBytes)
            .map("%02x".format(_))
            .mkString
            .take(12)
          // pid-scoped like the IVF index: per-JVM memo must not share a
          // directory with another process working the same fixture
          val file = new java.io.File(
            System.getProperty("java.io.tmpdir"),
            s"graft-zorder-$tag-p${ProcessHandle.current().pid()}"
          )
          val path = file.getAbsolutePath
          sweptPaths.add(path)
          graft.core
            .Tables(spark, dir)
            .lineitem
            .withColumn("zaddr", graft.queries.Relational.zaddrOf(col("l_partkey"), col("l_suppkey")))
            .repartitionByRange(Files, col("zaddr"))
            .sortWithinPartitions("zaddr")
            .drop("zaddr")
            .write
            .mode("overwrite")
            .parquet(path)
          path
        })
    )
    task.run() // FutureTask runs at most once; losers of the race just wait
    try task.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        // a failed build must not be memoized: drop the entry so a later
        // call can retry (transient IO/Spark errors would otherwise replay
        // forever), and rethrow the original cause, not the wrapper —
        // the standard Goetz memoizer failure-handling refinement
        built.remove(dir, task)
        throw Option(e.getCause).getOrElse(e)
    }
  }
}
