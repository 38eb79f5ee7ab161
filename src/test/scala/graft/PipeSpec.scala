package graft

import java.nio.file.Files

import graft.api.{Engine, JobSpec}

/** External-executable compat (reference O3/O6 via `RDD.pipe`): the
  * reference's OWN unmodified executables
  * (`/root/reference/tests/testdata/exec/`) run through the engine and must
  * reproduce both goldens. Skipped cleanly if the reference tree is absent.
  */
class PipeSpec extends SparkSpec {

  private val execDir = "/root/reference/tests/testdata/exec"

  private def tmpOut(name: String): String =
    Files.createTempDirectory(name).resolve("out").toString

  private def haveExecs: Boolean = new java.io.File(s"$execDir/wc_map.sh").canExecute

  test("reference wc_map.sh + wc_reduce.sh reproduce the word_count golden") {
    assume(haveExecs, s"$execDir not available")
    val engine = new Engine(spark, parityMode = true)
    val res = engine.runJob(
      JobSpec(resource("wc/input"), tmpOut("pipewc"), s"$execDir/wc_map.sh", s"$execDir/wc_reduce.sh", 4, 1)
    )
    val got = readLines(res.outputFiles.head)
    assert(got == readLines(resource("wc/word_count_correct.txt")))
  }

  test("reference grep_map.py + grep_reduce.py reproduce the grep golden") {
    assume(haveExecs, s"$execDir not available")
    val engine = new Engine(spark, parityMode = true)
    val res = engine.runJob(
      JobSpec(resource("wc/input"), tmpOut("pipegrep"), s"$execDir/grep_map.py", s"$execDir/grep_reduce.py", 4, 1)
    )
    val got = readLines(res.outputFiles.head)
    assert(got.sorted == readLines(resource("wc/grep_correct.txt")).sorted)
  }

  test("piped executables with 2 reducers: union of outputs equals golden") {
    assume(haveExecs, s"$execDir not available")
    val engine = new Engine(spark, parityMode = true)
    val res = engine.runJob(
      JobSpec(resource("wc/input"), tmpOut("pipewc2"), s"$execDir/wc_map.sh", s"$execDir/wc_reduce.sh", 4, 2)
    )
    assert(res.outputFiles.size == 2)
    val got = res.outputFiles.flatMap(readLines).sorted
    assert(got == readLines(resource("wc/word_count_correct.txt")).sorted)
  }

  test("mixed mode: piped mapper with native reducer") {
    assume(haveExecs, s"$execDir not available")
    val engine = new Engine(spark, parityMode = true)
    val res = engine.runJob(
      JobSpec(resource("wc/input"), tmpOut("mixed"), s"$execDir/wc_map.sh", "wc_reduce", 4, 1)
    )
    assert(readLines(res.outputFiles.head) == readLines(resource("wc/word_count_correct.txt")))
  }
}
