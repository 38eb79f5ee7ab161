package graft

import graft.tools.ScaleGate

/** Full-registry 10× scale gate (see [[graft.tools.ScaleGate]]): every
  * registered query runs on the clean AND pathological sf0.1×10 corpora,
  * and no query's hot/clean ratio may exceed the ceiling.
  *
  * The sweep costs tens of minutes at full width — far beyond the per-round
  * suite budget — so it runs only when explicitly requested:
  *
  *   SPARK_GRAFT_SCALE_GATE=1 sbt "testOnly graft.ScaleGateSpec"
  *
  * Otherwise the test CANCELS (visibly, not silently passes), pointing at
  * the recorded results: the most recent full run is committed as a table
  * in COVERAGE.md ("Scale gate" section). The in-suite every-run stress
  * gate remains `StressSpec` (6 heavy queries at sf0.01×10).
  */
class ScaleGateSpec extends SparkSpec {

  test("full registry holds the hot/clean ratio ceiling on the 10x corpus") {
    assume(
      sys.env.contains("SPARK_GRAFT_SCALE_GATE"),
      "set SPARK_GRAFT_SCALE_GATE=1 to run the ~30 min full sweep; " +
        "last recorded run: COVERAGE.md 'Scale gate' section"
    )
    val result = ScaleGate.run(spark, "/root/testdata/sf0.1", "target/scalegate", 10)
    info(ScaleGate.markdown(result, "/root/testdata/sf0.1", 10))
    assert(result.failed.isEmpty, s"queries failed at 10x: ${result.failed.map(_.name).mkString(", ")}")
    assert(
      result.breaches.isEmpty,
      "hot/clean ratio ceiling breached: " +
        result.breaches.map(t => f"${t.name} ${t.ratio}%.1fx").mkString(", ")
    )
  }
}
