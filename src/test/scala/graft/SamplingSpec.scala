package graft

import org.apache.spark.sql.functions._

/** Semantics of the sampling/mixing planners beyond their oracle hashes:
  * the priority sample's weighted-inclusion property and the mix
  * schedule's feasibility invariants.
  */
class SamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("weighted sample: priorities positive, k rows, and heavier docs over-represented") {
    val got = graft.queries.Registry.queries("q_weighted_sample")(spark, sf)
    val rows = got.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getLong(2) > 0L))
    // weighted sampling must pull the sample's mean weight above the corpus
    // mean (inclusion probability ∝ weight); with 50 of 500 docs drawn by
    // w/u priority this holds by a wide margin on the fixture
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = graft.core
      .Tables(spark, sf)
      .documents
      .agg(avg("n_chars"))
      .collect()(0)
      .getDouble(0)
    assert(
      sampleMean > corpusMean,
      s"sample mean weight $sampleMean not above corpus mean $corpusMean"
    )
  }

  test("mix schedule: no source oversampled, and at least one binds exactly") {
    val plan = graft.queries.Registry.queries("q_mix_schedule")(spark, sf).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val nDocs   = r.getLong(1)
      val planned = r.getLong(4)
      val util    = r.getLong(5)
      assert(planned <= nDocs, s"${r.getString(0)} plans $planned of $nDocs docs")
      assert(util <= 1000000L, s"${r.getString(0)} utilization $util ppm > 100%")
      assert(planned >= 0L && util >= 0L)
    }
    // T is the max feasible total: the binding source uses (nearly) all its
    // docs. At sf0.001 each source holds only 25 docs, so one floored row is
    // 40000 ppm of utilization — allow two rows of flooring shave (ppm floor
    // + T floor), never more
    val maxUtil = plan.map(_.getLong(5)).max
    assert(maxUtil >= 920000L, s"binding source utilization $maxUtil ppm — T not maximal")
  }

  test("mix temperature: sqrt replay exact, flattening monotone, boosts favor small sources") {
    val rows = graft.queries.Registry.queries("q_mix_temperature")(spark, sf).collect()
    assert(rows.nonEmpty)
    val wTotal = rows.map(r => math.sqrt(r.getLong(1).toDouble).toLong).sum
    val nTotal = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, raw, temp, boost) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw == n * 1000000L / nTotal, s"${r.getString(0)} raw share drifted")
      assert(
        temp == math.sqrt(n.toDouble).toLong * 1000000L / wTotal,
        s"${r.getString(0)} temperature share not the sqrt replay"
      )
      assert(boost == temp * 1000000L / math.max(raw, 1L), s"${r.getString(0)} boost not temp/raw")
    }
    // p^(1/2) flattening crossover — the TRUE boundary is temp share vs raw
    // share (equivalently n vs (n_total/w_total)² in real math), NOT the
    // mean share: a source between the mean and the crossover legitimately
    // boosts > 1, and at 25 docs/source the isqrt flooring moves the
    // boundary by whole ppm steps, so assert the exact integer crossover
    // from the replay with a ±1 ppm guard band for the two ppm floors —
    // fixture-regeneration-proof because it assumes nothing about the
    // share distribution.
    rows.foreach { r =>
      val n       = r.getLong(1)
      val tempReal = 1e6 * math.sqrt(n.toDouble).toLong / wTotal
      val rawReal  = 1e6 * n / nTotal
      if (tempReal > rawReal + 1)
        assert(r.getLong(4) > 1000000L, s"${r.getString(0)} sub-crossover source not boosted")
      if (tempReal < rawReal - 1)
        assert(r.getLong(4) <= 1000000L, s"${r.getString(0)} super-crossover source not shrunk")
    }
    val sorted = rows.sortBy(_.getLong(2))
    assert(
      sorted.map(_.getLong(3)).sameElements(sorted.map(_.getLong(3)).sorted),
      "temperature scaling must preserve the share ordering"
    )
  }

  test("apportion: quotas sum EXACTLY to the budget, stay near-proportional, preserve order") {
    val rows = graft.queries.Registry
      .queries("q_apportion")(spark, sf)
      .collect()
    val budget = graft.queries.Pipeline.ApportionBudget
    // the Hamilton guarantee — the whole reason this beats per-stratum
    // rounding: Σ quota = N with zero drift
    assert(rows.map(_.getLong(3)).sum == budget, "quotas must sum exactly to the budget")
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val ideal = budget.toDouble * r.getLong(1) / total
      val quota = r.getLong(3)
      // quota stays within one seat of the ideal share (Hamilton satisfies
      // the quota rule: floor(ideal) <= quota <= ceil(ideal))
      assert(quota >= math.floor(ideal).toLong && quota <= math.ceil(ideal).toLong,
        s"${r.getString(0)} quota $quota violates the quota rule around $ideal")
      assert(quota <= r.getLong(1), s"${r.getString(0)} quota exceeds stratum size")
    }
    // monotone: a strictly larger stratum never gets a smaller quota than a
    // smaller one... (Hamilton can invert only across equal remainders;
    // assert the weak form on n_docs order)
    val byN = rows.sortBy(r => (r.getLong(1), r.getString(0)))
    byN.sliding(2).foreach {
      case Array(a, b) =>
        if (b.getLong(1) > a.getLong(1))
          assert(b.getLong(3) + 1L >= a.getLong(3),
            s"larger stratum ${b.getString(0)} fell more than a seat below ${a.getString(0)}")
      case _ => ()
    }
  }
}
