package graft

/** Manual plan dump (not a registered spec assertion — run with
  * `testOnly graft.PlanAuditManual` when auditing): prints the executed
  * plans of the bench-heaviest queries for eyeball review.
  */
class PlanAuditManual extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  test("dump plans of the heaviest queries") {
    for (n <- Seq("q_dedup_incremental", "q_ngram_jaccard", "q_embed_neardup")) {
      val p = graft.queries.Registry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(p).size
      val scans     = "FileScan|Scan parquet".r.findAllIn(p).size
      info(s"$n: exchanges=$exchanges scans=$scans cartesian=${p.contains("CartesianProduct")}")
    }
  }
}
