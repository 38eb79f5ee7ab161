package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage wall/parallelism breakdown for registered queries — the
  * optimization round's "measure first" instrument (guide §1): for each
  * query it reports every stage's wall time, task count, and cumulative
  * executor run time, so a stage that runs ONE task on a 32-core box (the
  * single-row-group fixture scan pattern) is visible at a glance instead
  * of inferred from totals.
  *
  * Usage: runMain graft.tools.StageProbe <q1,q2,...> [dir]
  * Each query runs once untimed (cache/JIT warm), then once measured.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <q1,q2,...> [dir]")
    val names = args(0).split(",").map(_.trim).toSeq
    val dir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkEnv.session("graft-stage-probe")
    graft.Bench.warmUp(spark, dir, Some(names.toSet)): Unit

    final case class St(
        id: Int,
        name: String,
        tasks: Int,
        wallMs: Long,
        execMs: Long,
        gcMs: Long,
        inRec: Long,
        shRead: Long,
        shWrite: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i    = e.stageInfo
        val wall = (for {
          a <- i.submissionTime
          b <- i.completionTime
        } yield b - a).getOrElse(-1L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(
            i.stageId,
            i.name.takeWhile(_ != '\n').take(90),
            i.numTasks,
            wall,
            m.executorRunTime,
            m.jvmGCTime,
            m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten)
        }: Unit
      }
    })

    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // warm pass: caches materialize, JIT warms — mirrors Bench's min-of-N
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) => println(s"[probe] $n warm failed: $e") }
      stages.synchronized(stages.clear())
      System.gc()
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) => println(s"[probe] $n failed: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      val snap = stages.synchronized(stages.toVector)
      println(f"== $n%s total=$sec%.3f s, ${snap.size}%d stages ==")
      for (s <- snap.sortBy(st => -math.max(st.wallMs, st.execMs)).take(14))
        println(
          f"  stage ${s.id}%4d wall=${s.wallMs}%6d ms tasks=${s.tasks}%4d exec=${s.execMs}%6d ms " +
            f"gc=${s.gcMs}%5d ms rec=${s.inRec}%9d shR=${s.shRead}%9d shW=${s.shWrite}%9d")
      val oneTask = snap.filter(s => s.tasks == 1 && s.wallMs > 100)
      if (oneTask.nonEmpty)
        println(s"  [!] ${oneTask.size} single-task stages over 100 ms: " +
          oneTask.map(s => s"${s.id}(${s.wallMs}ms)").mkString(", "))
    }
    spark.stop()
  }
}
