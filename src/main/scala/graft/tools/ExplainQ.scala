package graft.tools

/** Dump a registered query's formatted physical plan against an arbitrary
  * fixture dir WITHOUT executing it — the gate-debugging counterpart of
  * `.explain("formatted")` (constructing through SparkEntry exercises the
  * exact construction-time probes and memoized routing a gate run sees).
  *
  * Usage: runMain graft.tools.ExplainQ <q1[,q2,...]> [dir] [outDir]
  * With a comma list and an outDir, writes one `<query>.txt` per query
  * (the optimization round's plan-artifact dump) instead of printing.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQ <q1[,q2,...]> [dir] [outDir]")
    val names = args(0).split(",").map(_.trim).toSeq
    val dir   = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val out   = if (args.length > 2) Some(new java.io.File(args(2))) else None
    val spark = graft.core.SparkEnv.session("graft-explain")
    out.foreach(_.mkdirs(): Unit)
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out match {
        case Some(d) =>
          java.nio.file.Files.write(
            new java.io.File(d, s"$name.txt").toPath,
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        case None =>
          // scalastyle:off println
          println(s)
        // scalastyle:on println
      }
    }
    spark.stop()
  }
}
