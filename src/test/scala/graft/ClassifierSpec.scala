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
}
