package graft


import graft.ops.TemporalJoins

/** Value + plan specs for the as-of and bucketized range joins. */
class TemporalJoinsSpec extends SparkSpec {

  test("asOfJoin picks the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 100.0),
      (1L, 20L, 101.0),
      (1L, 30L, 102.0),
      (2L, 15L, 50.0)
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, 5L, "t1"),  // before any quote → null
      (1L, 20L, "t2"), // exactly at quote 20 → 101.0 (tie → right first)
      (1L, 25L, "t3"), // between 20 and 30 → 101.0
      (1L, 99L, "t4"), // after all → 102.0
      (2L, 16L, "t5"), // → 50.0
      (3L, 10L, "t6")  // key with no quotes → null
    ).toDF("k", "tts", "trade")
    val got = TemporalJoins
      .asOfJoin(trades, quotes, "k", "tts", "qts", Seq("price"))
      .orderBy("k", "tts")
      .collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3)))
      .toSeq
    assert(got == Seq(("t1", null), ("t2", 101.0), ("t3", 101.0), ("t4", 102.0), ("t5", 50.0), ("t6", null)))
  }

  test("asOfJoin equals the naive per-row maximum (property on random data)") {
    import spark.implicits._
    val rnd    = new scala.util.Random(11)
    val lefts  = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rights = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i * 1.0))
    val l      = lefts.toDF("k", "ts", "lid")
    val r      = rights.toDF("k", "rts", "v")
    val got = TemporalJoins
      .asOfJoin(l, r, "k", "ts", "rts", Seq("v", "rts"))
      .select("k", "ts", "lid", "asof_rts")
      .collect()
      .map(x => (x.getLong(2), if (x.isNullAt(3)) -1L else x.getLong(3)))
      .toMap
    // naive oracle computed driver-side
    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (k, ts, lid) =>
      val expect = byKey
        .getOrElse(k, Seq())
        .filter(_._2 <= ts)
        .map(_._2)
        .sorted
        .lastOption
        .getOrElse(-1L)
      assert(got(lid) == expect, s"lid=$lid k=$k ts=$ts")
    }
  }

  test("rangeJoin matches the naive theta join and plans no cartesian product") {
    import spark.implicits._
    val events = (0L until 500L).map(i => (i % 7, i * 3, i)).toDF("k", "ts", "eid")
    val intervals = Seq(
      (0L, 0L, 100L, "a"),
      (1L, 50L, 60L, "b"),
      (2L, 100L, 1000L, "c"),
      (0L, 90L, 120L, "d"),
      (6L, 0L, 1500L, "e")
    ).toDF("k", "s", "e", "tag")
    val bucketed = TemporalJoins.rangeJoin(events, intervals, "ts", "s", "e", bucketWidth = 64L, keys = Seq("k"))
    val naive = events
      .join(intervals, events("k") === intervals("k") && events("ts") >= intervals("s") && events("ts") < intervals("e"))
    assert(bucketed.count() == naive.count())
    val a = bucketed.select("eid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = naive.select("eid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("intervalJoin matches the naive overlap join exactly once per pair (multi-bucket spans)") {
    import spark.implicits._
    // left intervals deliberately span 0–20 buckets at width 64 so pairs
    // sharing MANY buckets pin the canonical-bucket single-match rule;
    // boundary-touching pairs (end == start) pin the half-open semantics
    val left = (0L until 200L)
      .map(i => (i % 5, i * 13, i * 13 + 1 + (i % 9) * 130, i))
      .toDF("k", "ls", "le", "lid")
    val right = Seq(
      (0L, 0L, 64L, "a"),
      (1L, 64L, 128L, "b"),     // exactly one bucket
      (2L, 10L, 1300L, "c"),    // spans ~20 buckets
      (3L, 63L, 65L, "d"),      // straddles a bucket edge
      (4L, 2599L, 2600L, "e"),  // tail
      (0L, 100L, 100L, "f")     // empty interval — matches nothing
    ).toDF("k", "rs", "re", "tag")
    val bucketed = TemporalJoins
      .intervalJoin(left, right, "ls", "le", "rs", "re", bucketWidth = 64L, keys = Seq("k"))
    // the naive reference must exclude empty intervals too: the pairwise
    // overlap predicate alone "matches" an empty interval it can't contain
    val naive = left
      .join(
        right.filter(right("rs") < right("re")),
        left("k") === right("k") && left("ls") < right("re") && right("rs") < left("le")
      )
    assert(bucketed.count() == naive.count(), "pair multiplicity diverges (dup or miss)")
    val a = bucketed.select("lid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = naive.select("lid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
