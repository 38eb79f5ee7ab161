package graft.tools

/** Dump a registered query's formatted physical plan against an arbitrary
  * fixture dir WITHOUT executing it — the gate-debugging counterpart of
  * `.explain("formatted")` (constructing through SparkEntry exercises the
  * exact construction-time probes and memoized routing a gate run sees).
  *
  * Usage: runMain graft.tools.ExplainQ <query> [dir]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQ <query> [dir]")
    val name  = args(0)
    val dir   = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.SparkEnv.session("graft-explain")
    val df    = graft.SparkEntry.queries(name)(spark, dir)
    // scalastyle:off println
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // scalastyle:on println
    spark.stop()
  }
}
