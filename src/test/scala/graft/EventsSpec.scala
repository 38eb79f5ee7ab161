package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.EventQueries

/** Behavioral specs for the event- and text-analytics queries whose guarantees go
  * beyond what the cross-engine hash compare can express (error bounds,
  * coverage invariants). The oracle gate proves equality; these prove the
  * SEMANTIC properties the scaladocs advertise.
  */
class EventsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_mv_refresh: incremental merge equals a from-scratch rollup, delta is non-trivial") {
    // the oracle certifies this cross-engine at the gate SF; this is the
    // in-suite guard plus the engagement check that the split is real
    // (a watermark past max(event_id) would make the delta empty and the
    // "incremental" path degenerate to reading the stored snapshot)
    val b = graft.ops.MatView.baseFor(spark, sf)
    val ev = Tables(spark, sf).events
    val nDelta = ev.filter(col("event_id") >= b.watermark).count()
    val nTotal = ev.count()
    assert(nDelta > 0, "delta empty — watermark past the table end")
    assert(nDelta < nTotal / 2, s"delta is $nDelta of $nTotal rows — snapshot covers too little")
    val got = graft.ops.MatView.mvRefresh.fn(spark, sf).collect()
    val want = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(graft.queries.Num.Money)).cast("double").as("sum_value")
      )
      .orderBy("event_type", "day")
      .collect()
    assert(got.toSeq == want.toSeq, s"merged MV diverges from full recompute (got ${got.length} rows, want ${want.length})")
  }

  test("q_contribution_cap: no user exceeds K per cell after capping, and the cap engages") {
    val rows = EventQueries.contributionCap.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    var dropped = 0L
    rows.foreach { r =>
      val nRaw  = r.getLong(r.fieldIndex("n_raw"))
      val nKept = r.getLong(r.fieldIndex("n_kept"))
      val nDrop = r.getLong(r.fieldIndex("n_dropped"))
      assert(nKept + nDrop == nRaw, s"kept+dropped != raw in $r")
      assert(r.getLong(r.fieldIndex("max_user_kept")) <= 3L, s"cap violated in $r")
      dropped += nDrop
    }
    // engagement: the fixture contains at least one user over the cap —
    // a never-engaging cap would make this audit vacuous
    assert(dropped >= 1L, "cap never engaged on the fixture")
  }

  test("q_cms_topk: count-min estimate is one-sided (est >= exact) and within eps*N") {
    val rows = EventQueries.cmsTopk.fn(spark, sf).collect()
    assert(rows.length == 10, "top-10 probe must return 10 rows")
    val n = Tables(spark, sf).events.count()
    // CMS with w=32 buckets: eps = e/w ~ 0.085; the Markov bound holds per
    // row with prob 1-1/e^d, and the fixture sits far inside it
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_cnt"))
      val est   = r.getLong(r.fieldIndex("cms_est"))
      assert(est >= exact, s"CMS must never under-count: est=$est < exact=$exact")
      assert(est <= exact + (0.2 * n).toLong, s"CMS overshoot too large: est=$est exact=$exact N=$n")
    }
  }

  test("q_events_hopping: every event lands in 2-3 overlapping windows, totals reconcile") {
    val ev      = Tables(spark, sf).events
    val nEvents = ev.count()
    val hopping = EventQueries.eventsHopping.fn(spark, sf)
    val total   = hopping.agg(sum("cnt")).first().getLong(0)
    // size=25min, hop=10min: an event in the first 5 minutes of its hop
    // bucket is in 3 windows, otherwise 2 — so total replicated count is
    // strictly between 2N and 3N on any non-degenerate fixture
    assert(total > 2 * nEvents, s"replication too low: $total vs N=$nEvents")
    assert(total < 3 * nEvents, s"replication too high: $total vs N=$nEvents")
    // window starts align to the hop grid
    hopping.select("win_start").distinct().collect().foreach { r =>
      assert(r.getLong(0) % 600000000L == 0L, "win_start must sit on the hop grid")
    }
  }

  test("q_lm_score: natural text scores lower surprisal than character noise") {
    import spark.implicits._
    // score a mixed corpus through the registered query's own pipeline by
    // pointing it at a temp dir with a documents.parquet of our making
    val tmp = java.nio.file.Files.createTempDirectory("lmscore").toString
    val natural = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and the dog sleeps in the sun", "en", "web", 70L)
    )
    val noise = (20 until 40).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(70)(('a' + rnd.nextInt(26)).toChar).mkString, "en", "web", 70L)
    }
    (natural ++ noise)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val scores = graft.queries.TextQueries.lmScore
      .fn(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .toMap
    val meanNat   = natural.map(d => scores(d._1)).sum / natural.size
    val meanNoise = noise.map(d => scores(d._1)).sum / noise.size
    // the repeated English sentence compresses far better under its own
    // bigram model than uniform character noise — a wide margin, not a tie
    assert(
      meanNoise > meanNat + 1000000L,
      s"noise must score >=1 bit/bigram above natural text: noise=$meanNoise natural=$meanNat"
    )
  }

  test("q_scd2: intervals per user are disjoint, contiguous, and cover the history") {
    val scd = EventQueries.scd2.fn(spark, sf).collect()
    val ev  = Tables(spark, sf).events
    val perUser = scd.groupBy(_.getLong(0))
    perUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      // exactly one open interval (the current row), and it is the last
      assert(sorted.count(_.isNullAt(3)) == 1)
      assert(sorted.last.isNullAt(3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each interval closes exactly where the next opens
          assert(a.getLong(3) == b.getLong(2), "intervals must be contiguous")
          // consecutive intervals carry different states (else not a change)
          assert(a.getString(1) != b.getString(1), "adjacent intervals must differ in state")
        case _ => ()
      }
    }
    // every user with events has at least one interval
    val users = ev.select("user_id").distinct().count()
    assert(perUser.size.toLong == users, "every user must have an SCD2 history")
  }
}
