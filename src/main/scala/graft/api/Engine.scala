package graft.api

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{ExecutionContext, ExecutionContextExecutorService, Future}

import org.apache.spark.sql.SparkSession

import graft.ops.{GroupStage, MapStage, ReduceStage, Sinks}

/** The reference's job-server surface (O8/O12) on Spark: submit a
  * [[JobSpec]], it runs the three-stage dataflow
  *
  *   read.text → map (flatMap | pipe) → group (shuffle+sort) →
  *   reduce (mapPartitions | pipe) → outputfileNN sink
  *
  * Jobs run strictly FIFO, one at a time — the reference queues new jobs
  * while BUSY (`/root/reference/mapreduce/manager/__main__.py:278-291`) —
  * via a single-threaded executor, so `submit` is async like the reference's
  * TCP submit and `await` is the client's join. Worker membership,
  * heartbeats, dead-task reassignment and shutdown (reference O9-O11) are
  * subsumed by Spark's scheduler/executor liveness machinery; `close()`
  * mirrors the manager's shutdown fan-out by draining the job queue, and
  * stops the session only when this Engine owns it (`ownsSession`).
  *
  * `parityMode` selects the golden-parity rank-mod group router
  * ([[graft.ops.GroupStage.rankMod]]) instead of the scalable hash router.
  */
final class Engine(spark: SparkSession, parityMode: Boolean = false, ownsSession: Boolean = false)
    extends AutoCloseable {

  private val jobIds                                   = new AtomicInteger(0)
  private val pool: ExecutionContextExecutorService    =
    ExecutionContext.fromExecutorService(Executors.newSingleThreadExecutor())

  /** Run one job synchronously (the internal path; `submit` queues this). */
  def runJob(spec: JobSpec): JobResult = {
    val jobId  = jobIds.getAndIncrement()
    val lines  = spark.sparkContext.textFile(spec.inputDirectory, spec.numMappers)
    val mapped = MapStage(lines, spec.mapperExecutable)
    val grouped = GroupStage(mapped, spec.numReducers, parityMode)
    val reduced = ReduceStage(grouped, spec.reducerExecutable)
    JobResult(jobId, Sinks.outputFiles(reduced, spec.outputDirectory))
  }

  /** FIFO-queued asynchronous submission (reference `new_manager_job`). */
  def submit(spec: JobSpec): Future[JobResult] = Future(runJob(spec))(pool)

  /** Block until every job queued so far has finished: a marker task on the
    * single-threaded FIFO pool completes only after all prior jobs.
    */
  def await(timeoutSec: Long = 600): Unit =
    scala.concurrent.Await.result(
      Future(())(pool),
      scala.concurrent.duration.Duration(timeoutSec, TimeUnit.SECONDS)
    )

  override def close(): Unit = {
    // drain queued/in-flight jobs before tearing down the context —
    // stop()ing mid-job would fail their Futures and leave half-written
    // output directories
    pool.shutdown()
    val drained = pool.awaitTermination(600, TimeUnit.SECONDS)
    if (!drained)
      throw new IllegalStateException(
        "Engine.close(): jobs still running after 600s drain — refusing to " +
          "stop the SparkSession under them (would fail their Futures and " +
          "leave half-written output directories)"
      )
    // only stop the (process-wide, getOrCreate-shared) session if this
    // Engine owns it — a library user's Engine must not tear down the
    // SparkSession other components are still using
    if (ownsSession) spark.stop()
  }
}
