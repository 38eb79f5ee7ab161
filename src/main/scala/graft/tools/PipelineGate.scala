package graft.tools

/** Per-STAGE scale gate for the chained curation pipeline (round 13): the
  * session memo that round 12 added to `q_pipeline_e2e` moved the staged
  * run out of bench query walls, so round-over-round diffs no longer watch
  * the stages — this gate runs the six-job DAG directly (no memo) against
  * a docs-only blow-up corpus and reports each stage's wall separately
  * (stage wall = the JobResult's execution bracket on the FIFO engine
  * pool, queue wait excluded). A stage whose wall grows faster than the
  * corpus is the finding; the per-stage split points at the mechanism
  * (stage 3's near-dup verify is the only candidate-volume-bound stage —
  * stages 1/2/4/5/6 are scans, window caps and one segment join).
  *
  * Usage: runMain graft.tools.PipelineGate [base] [workDir] [mult]
  *   defaults: /root/testdata/sf0.1 target/pipelinegate 300
  */
object PipelineGate {

  def main(args: Array[String]): Unit = {
    val base    = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "target/pipelinegate"
    val mult    = if (args.length > 2) args(2).toInt else 300
    val spark   = graft.core.SparkEnv.session("graft-pipeline-gate")

    val corpus = s"$workDir/docs${mult}x"
    val done   = new java.io.File(s"$corpus/GRAFT_CORPUS_DONE")
    if (!done.exists()) {
      System.err.println(s"[pipeline-gate] building ${mult}x docs-only corpus from $base")
      StressGen.writeDocsOnly(spark, base, corpus, mult, hot = false, partsScale = 8)
      done.createNewFile(): Unit
    } else System.err.println(s"[pipeline-gate] reusing corpus $corpus")

    val work = s"$workDir/pipework"
    val t0   = System.nanoTime()
    val rs   = graft.queries.Pipeline.pipelineJobs(spark, corpus, work)
    val wall = (System.nanoTime() - t0) / 1e9

    val names = Seq("s1_clean", "s2_segdedup", "s3_neardup", "s4_mix", "s5_pack", "s6_card")
    val stages = rs.zip(names).map { case (r, n) =>
      val sec = (r.finishedNanos - r.startedNanos) / 1e9
      System.err.println(f"[pipeline-gate] $n%-12s ${sec}%8.1f s")
      f""""$n":$sec%.1f"""
    }
    val card = spark.read.parquet(s"$work/s6_card").head()
    println(
      s"""{"mult":$mult,"stages":{${stages.mkString(",")}},""" +
        f""""total_sec":$wall%.1f,""" +
        s""""card":{"n_input":${card.getLong(0)},"n_clean":${card.getLong(1)},""" +
        s""""n_segdedup":${card.getLong(2)},"n_neardup":${card.getLong(3)},""" +
        s""""n_mix":${card.getLong(4)},"n_packs":${card.getLong(5)},""" +
        s""""n_tokens":${card.getLong(6)},"n_sources":${card.getLong(7)}}}"""
    )
    spark.stop()
  }
}
