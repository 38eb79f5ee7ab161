package graft.tools

/** Heap-retainer forensics for the round-14 q_contamination OOM: re-runs
  * the PRE-round-15 plan (the answer orderBy sampling directly over the
  * salted expansion pipeline, `materialize = false`) on the hot blow-up
  * corpus while a watchdog thread logs heap occupancy every 30 s and
  * captures a `jmap -histo:live` class histogram once the climb crosses
  * 60% / 75% / 90% of max — the round-14 post-mortem had three OOM stacks
  * (allocation failing under `SamplingUtils.reservoirSampleAndCount`) but
  * no histogram, so the RETAINER was never named. Run with the same heap
  * the gate used (SPARK_DRIVER_MEM=80g/100g).
  *
  * Usage: runMain graft.tools.ContamProbe [corpusDir]
  *   default corpus: target/bandgate/docs100x-hot
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("target/bandgate/docs100x-hot")
    val spark  = graft.core.SparkEnv.session("graft-contam-probe")
    val pid    = ProcessHandle.current().pid()
    val fired  = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val watchdog = new Thread(() => {
      val rt = Runtime.getRuntime
      while (true) {
        Thread.sleep(30000)
        val used = rt.totalMemory() - rt.freeMemory()
        val pct  = (100.0 * used / rt.maxMemory()).toInt
        System.err.println(s"[contam-probe] heap ${used / (1 << 20)} MiB ($pct% of max)")
        for (gate <- Seq(60, 75, 90) if pct >= gate && fired.add(gate)) {
          System.err.println(s"[contam-probe] ==== jmap -histo:live at $pct% ====")
          val p = new ProcessBuilder("jmap", "-histo:live", pid.toString)
            .redirectErrorStream(true).start()
          val out = new String(p.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          p.waitFor()
          out.linesIterator.take(40).foreach(l => System.err.println(s"[histo-$gate] $l"))
        }
      }
    })
    watchdog.setDaemon(true)
    watchdog.start()
    val docs = graft.core.Tables(spark, corpus).documents
    val t0   = System.nanoTime()
    graft.queries.Pipeline
      .contaminationReport(docs, materialize = false)
      .write.format("noop").mode("overwrite").save()
    System.err.println(
      f"[contam-probe] completed WITHOUT OOM in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        "— the pre-r15 plan survived; retainer evidence is in the histograms above")
    spark.stop()
  }
}
