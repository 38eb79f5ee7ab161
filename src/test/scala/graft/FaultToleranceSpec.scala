package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fault-tolerance parity (reference O10): the reference reassigns a dead
  * worker's in-flight task after missed heartbeats
  * (`/root/reference/mapreduce/manager/__main__.py:140-159`); Spark's
  * equivalent is lineage-based task re-execution. This spec injects a task
  * failure on the first attempt and asserts the job still completes with
  * correct results — requires its own session with task retries enabled
  * (`local[4,3]`; plain local[n] runs tasks with a single attempt).
  */
object FaultToleranceSpec {
  // JVM-static (local mode = one JVM): counts injection attempts including
  // the FAILED task attempt — accumulator updates from failed tasks are
  // discarded by Spark, so an accumulator would read 0 here.
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)
}

class FaultToleranceSpec extends AnyFunSuite {

  test("job survives an injected task failure via task re-execution") {
    // release the shared default session so a new master config applies
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master("local[4, 3]") // 4 threads, 3 task attempts
      .appName("graft-ft-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      FaultToleranceSpec.injected.set(0)
      val rdd = spark.sparkContext
        .parallelize(1 to 1000, 8)
        .mapPartitions { it =>
          val tc = org.apache.spark.TaskContext.get()
          if (tc.partitionId() == 3 && tc.attemptNumber() == 0) {
            FaultToleranceSpec.injected.incrementAndGet()
            throw new RuntimeException("injected worker death")
          }
          it
        }
      assert(rdd.sum() == (1 to 1000).sum.toDouble)
      assert(FaultToleranceSpec.injected.get() == 1, "the failure should have been injected exactly once")
    } finally {
      // leave a clean slate for subsequent suites (they getOrCreate lazily)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
