package graft

import graft.api.{Engine, JobSpec}
import graft.core.SparkEnv

/** Job-submission CLI (reference O12, `/root/reference/mapreduce/submit.py`):
  * run one map/group/reduce job from the command line.
  *
  * Usage:
  *   runMain graft.Submit <inputDir> <outputDir> [mapper] [reducer]
  *                        [numMappers] [numReducers] [--parity]
  *
  * mapper/reducer default to the reference's wc executables' native
  * equivalents (wc_map/wc_reduce, 4 mappers, 1 reducer — the same defaults
  * as submit.py:23-40); a mapper/reducer that names an existing file runs
  * in external pipe mode.
  */
object Submit {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    if (pos.length < 2) {
      System.err.println(
        "usage: graft.Submit <inputDir> <outputDir> [mapper] [reducer] [numMappers] [numReducers] [--parity]"
      )
      sys.exit(2)
    }
    val spec = JobSpec(
      inputDirectory = pos(0),
      outputDirectory = pos(1),
      mapperExecutable = if (pos.length > 2) pos(2) else "wc_map",
      reducerExecutable = if (pos.length > 3) pos(3) else "wc_reduce",
      numMappers = if (pos.length > 4) pos(4).toInt else 4,
      numReducers = if (pos.length > 5) pos(5).toInt else 1
    )
    val engine = new Engine(
      SparkEnv.session("graft-submit"),
      parityMode = flags.contains("--parity"),
      ownsSession = true // the CLI created this session solely for the job
    )
    try {
      val res = engine.runJob(spec)
      println(s"job ${res.jobId} done: ${res.outputFiles.mkString(", ")}")
    } finally engine.close()
  }
}
