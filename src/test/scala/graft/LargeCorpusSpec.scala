package graft

import java.nio.file.Files

import graft.api.{Engine, JobSpec}

/** BASELINE.md parity on the reference's own large corpus
  * (`input_large`: 31,781 lines / 3.7 MB — the data behind the reference's
  * only quantified perf budget: group stage < 10 s, < 1 MiB
  * (`tests/test_manager_08.py:240-241`)). The full native job (map + group
  * + reduce + sink) must beat the reference's group-stage-only wall budget,
  * and the result must satisfy the token-conservation invariant.
  */
class LargeCorpusSpec extends SparkSpec {

  private val largeDir = "/root/reference/tests/testdata/input_large"

  test("full word_count job over input_large completes within the reference's 10s budget") {
    assume(new java.io.File(largeDir).isDirectory, s"$largeDir not available")
    val engine = new Engine(spark, parityMode = true)
    val out    = Files.createTempDirectory("wclarge").resolve("out").toString
    val t0     = System.nanoTime()
    val res    = engine.runJob(JobSpec(largeDir, out, "wc_map", "wc_reduce", 2, 2))
    val sec    = (System.nanoTime() - t0) / 1e9
    info(f"wall: $sec%.2f s (reference budget: group stage alone < 10 s, 'instructor < 1 s')")
    assert(sec < 10.0, s"took $sec s")
    // token conservation: counts sum to total tokens emitted by the mapper
    val total = res.outputFiles.flatMap(readLines).map(_.split("\t")(1).toLong).sum
    val expected = spark.sparkContext
      .textFile(largeDir)
      .flatMap(graft.ops.MapStage.wcMap)
      .count()
    assert(total == expected)
  }
}
