package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.{EventQueries, TextQueries}

/** Driver-side replays for the learned quality classifier and the
  * k-anonymity ladder — the same independent-recount discipline as
  * CollocationSpec: the DuckDB oracle proves cross-engine agreement, these
  * prove the MATH (the naive-Bayes weight formula, the ladder's monotonicity
  * law) against a from-scratch Scala implementation.
  */
class ClassifierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ilog2(x: Long): Long = {
    require(x > 0, s"ilog2($x)")
    63 - java.lang.Long.numberOfLeadingZeros(x)
  }

  test("q_quality_classifier matches a from-scratch naive-Bayes replay") {
    val rows = TextQueries.qualityClassifier.fn(spark, sf).collect()
    assert(rows.nonEmpty)

    // independent replay from the raw fixture
    val docs = spark.read
      .parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    def label(text: String): Long = {
      // replay of the integer seed rule: token count in [5, 10000] AND punct*10 < len
      val nTok  = text.split(" ", -1).length
      val punct = text.length - text.replaceAll("[^A-Za-z0-9 ]", "").length
      if (nTok >= 5 && nTok <= 10000 && punct * 10 < text.length) 1L else 0L
    }
    val labels = docs.map { case (id, t) => id -> label(t) }
    val nPos   = labels.values.count(_ == 1L).toLong
    val nNeg   = labels.size - nPos
    val terms: Map[Long, Set[String]] =
      docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSet }
    val dfPos = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val dfNeg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    terms.foreach { case (id, ts) =>
      val m = if (labels(id) == 1L) dfPos else dfNeg
      ts.foreach(t => m(t) += 1L)
    }
    def w(t: String): Long =
      (ilog2(dfPos(t) + 1) - ilog2(nPos + 2)) - (ilog2(dfNeg(t) + 1) - ilog2(nNeg + 2))

    rows.foreach { r =>
      val id       = r.getLong(0)
      val expScore = terms(id).toSeq.map(w).sum
      assert(r.getLong(1) === labels(id), s"label mismatch doc $id")
      assert(r.getLong(2) === expScore, s"score mismatch doc $id")
      assert(r.getInt(3) === (if (expScore >= 0) 1 else 0), s"pred mismatch doc $id")
    }
  }

  test("k-anonymity ladder: exact day-level recount + monotone violations up-level") {
    val out = EventQueries.kAnonymity.fn(spark, sf).collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("day", "week", "month"))

    // independent day-level recount from the raw fixture
    val dayClasses = spark.read
      .parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .count()
      .collect()
      .map(_.getLong(2))
    val day = out("day")
    assert(day.getLong(1) === dayClasses.length.toLong, "n_classes")
    assert(day.getLong(2) === dayClasses.min, "min_size")
    assert(day.getLong(3) === dayClasses.count(_ < 5).toLong, "n_violations")
    assert(day.getLong(4) === dayClasses.filter(_ < 5).sum, "rows_at_risk")

    // coarser classes are unions of finer ones, so a violating coarse class
    // is made of parts each < k — violations and rows-at-risk can only
    // shrink up the ladder
    def v(r: Row)  = r.getLong(3)
    def ar(r: Row) = r.getLong(4)
    assert(v(out("week")) <= v(out("day")), "week violations exceed day")
    assert(v(out("month")) <= v(out("week")), "month violations exceed week")
    assert(ar(out("week")) <= ar(out("day")), "week rows_at_risk exceed day")
    assert(ar(out("month")) <= ar(out("week")), "month rows_at_risk exceed week")
  }

  test("q_quality_calibration buckets recount from the classifier's own scores") {
    val scored = TextQueries.qualityClassifier
      .fn(spark, sf)
      .collect()
      .map(r => (r.getLong(2), r.getLong(1))) // (score, label)
    val expected = scored
      .groupBy { case (score, _) => (math.min(math.max(score, -400L), 399L) + 400L) / 10L * 10L - 400L }
      .map { case (lo, xs) =>
        (lo, xs.length.toLong, xs.count(_._2 == 1L).toLong,
         xs.count(_._2 == 1L).toLong * 1000000L / xs.length)
      }
      .toSeq
      .sortBy(_._1)
    val got = TextQueries.qualityCalibration
      .fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"calibration buckets diverge:\n got $got\n exp $expected")
    // buckets must partition the corpus
    assert(got.map(_._2).sum == scored.length.toLong)
  }

  test("q_quality_incremental: frozen-weight scoring replays from scratch at sf0.01") {
    // sf0.01: 500 docs, so the doc_id >= 400 batch convention yields a
    // real 100-doc batch (sf0.001 has no new batch)
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    def label(text: String): Long = {
      val nTok  = text.split(" ", -1).length
      val punct = text.length - text.replaceAll("[^A-Za-z0-9 ]", "").length
      if (nTok >= 5 && nTok <= 10000 && punct * 10 < text.length) 1L else 0L
    }
    def terms(t: String) = t.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSet
    val seen  = docs.filter(_._1 < 400L)
    val nPos  = seen.count { case (_, t) => label(t) == 1L }.toLong
    val nNeg  = seen.size - nPos
    val dfPos = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val dfNeg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    seen.foreach { case (_, t) =>
      val m = if (label(t) == 1L) dfPos else dfNeg
      terms(t).foreach(x => m(x) += 1L)
    }
    val vocab = dfPos.keySet ++ dfNeg.keySet
    def w(t: String): Long =
      (ilog2(dfPos(t) + 1) - ilog2(nPos + 2)) - (ilog2(dfNeg(t) + 1) - ilog2(nNeg + 2))
    val w0 = ilog2(nNeg + 2) - ilog2(nPos + 2) // frozen model's OOV prior ratio

    val out = TextQueries.qualityIncremental.fn(spark, dir).collect()
    assert(out.length === docs.count(_._1 >= 400L), "every new-batch doc scored")
    out.foreach { r =>
      val id = r.getLong(0)
      val ts = terms(docs(id))
      val expScore = ts.toSeq.map(t => if (vocab(t)) w(t) else w0).sum
      val expOov   = ts.count(t => !vocab(t)).toLong
      assert(r.getLong(1) === label(docs(id)), s"label mismatch doc $id")
      assert(r.getLong(2) === expScore, s"score mismatch doc $id")
      assert(r.getLong(3) === expOov, s"n_oov mismatch doc $id")
    }
    // the fixture's new batch shares the synthetic vocabulary, so exercise
    // the OOV path on a corpus where the new batch contains unseen terms
    import spark.implicits._
    val mini = (1L to 20L).map(i => (i, s"alpha beta gamma delta seen$i words here")) :+
      (400L, "alpha beta nevertrained unseenword gamma mystery tokens")
    val miniDir = "target/qi_corpus"
    mini.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$miniDir/documents.parquet")
    val miniOut = TextQueries.qualityIncremental.fn(spark, miniDir).collect()
    assert(miniOut.length === 1)
    // unseen: nevertrained, unseenword, mystery, tokens (alpha/beta/gamma trained)
    assert(miniOut(0).getLong(3) === 4L, "exactly the four unseen terms count as OOV")
  }

  test("q_dataset_card matches a driver-side recount of the corpus") {
    val card = graft.queries.Pipeline.datasetCard.fn(spark, sf).collect()(0)
    val docs = spark.read
      .parquet(s"$sf/documents.parquet")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val nDocs     = docs.length.toLong
    val nDistinct = docs.map(_._2).distinct.length.toLong
    val nTokens   = docs.map(_._2.split(" ", -1).length.toLong).sum
    assert(card.getLong(0) === nDocs)
    assert(card.getLong(1) === docs.map(_._4).distinct.length.toLong, "n_sources")
    assert(card.getLong(2) === docs.map(_._3).distinct.length.toLong, "n_langs")
    assert(card.getLong(3) === nDistinct, "n_distinct_texts")
    assert(card.getLong(4) === nDocs - nDistinct, "dup_docs")
    assert(card.getLong(5) === (nDocs - nDistinct) * 1000000L / nDocs, "dup_ppm")
    assert(card.getLong(6) === nTokens, "n_tokens")
    assert(card.getLong(7) === nTokens / nDocs, "mean_tokens")
    assert(card.getLong(8) === docs.map(_._5).sum, "n_chars")
  }
}
