package graft

import org.apache.spark.sql.DataFrame

import graft.ext.{Dedup, SimHash, Similarity}
import graft.queries.{EventQueries, Relational}

/** Physical-plan shape assertions — the 100 TB posture checks. A query can
  * be value-correct at sf0.001 and still be a scale-killer; these tests pin
  * the plan properties that make each operator survive 1000 executors:
  * pushdown reaching the scan, broadcasts where intended, NO cartesian
  * products in any LSH candidate generation, top-k as TakeOrderedAndProject.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q_filter pushes predicates and prunes columns at the parquet scan") {
    val p = plan(Relational.qFilter.fn(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned read schema: only the 5 selected (+filter) columns, not all 11
    assert(!p.contains("l_returnflag"), "scan reads columns the query never uses:\n" + p)
  }

  test("q_join_broadcast plans three BroadcastHashJoins, no SortMergeJoin") {
    val p = plan(Relational.qJoinBroadcast.fn(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("z-ordered layout prunes row groups on 2-D range probes; unclustered control reads everything") {
    import org.apache.spark.sql.functions.col
    // sf0.01 so the probe rectangle is selective (~3%) against 2000 parts
    val dir   = "/root/testdata/sf0.01"
    val zpath = graft.ops.ZOrder.layoutFor(spark, dir)
    // under target/ so repeated runs overwrite instead of leaking tmpdir
    val upath = new java.io.File("target/graft-zorder-control").getAbsolutePath
    // control: identical rows, same file count, round-robin layout — every
    // file's (partkey, suppkey) min/max spans the whole domain
    graft.core
      .Tables(spark, dir)
      .lineitem
      .repartition(graft.ops.ZOrder.Files)
      .write
      .mode("overwrite")
      .parquet(upath)
    def scannedRows(path: String): Long = {
      val df = spark.read
        .parquet(path)
        .filter(col("l_partkey").between(64, 255) && col("l_suppkey").between(16, 47))
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no FileSourceScanExec in plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val total = graft.core.Tables(spark, dir).lineitem.count()
    val z     = scannedRows(zpath)
    val u     = scannedRows(upath)
    info(s"scan rows: z-ordered=$z unclustered=$u total=$total")
    assert(u > (total * 0.9).toLong, s"control unexpectedly pruned: $u of $total")
    assert(z < total / 4, s"z-order layout failed to prune: $z of $total")
  }

  test("q_topk plans TakeOrderedAndProject, not a global Sort") {
    val p = plan(Relational.qTopK.fn(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("LSH dedup candidate generation contains no cartesian product") {
    val p = plan(Dedup.candidatePairs(graft.core.Tables(spark, sf).documents))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("SimHash near-dup pair generation contains no cartesian product") {
    val p = plan(SimHash.nearDupPairs(spark, graft.core.Tables(spark, sf).documents, 3))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding near-dup pair generation joins on the LSH bucket, no cartesian") {
    val p = plan(Similarity.nearDupPairs(graft.core.Tables(spark, sf).embeddings, Similarity.NearDupTau))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("exact top-k cosine: only the single-row query vector is broadcast") {
    val df = Similarity.topKCosineScored(graft.core.Tables(spark, sf).embeddings, 0L, 10)
    val p  = plan(df)
    // the scan side must NOT be exchanged into a shuffle before the limit
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_tpch_q3 broadcasts the filtered customer dim and ends in TakeOrderedAndProject") {
    val p = plan(Relational.qTpchQ3.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), "grouped top-k must not be a global sort:\n" + p)
    assert(p.contains("PushedFilters"), p)
  }

  test("q_tpch_q5 plans exactly one fact-fact shuffle join; all dims broadcast") {
    val p = plan(Relational.qTpchQ5.fn(spark, sf))
    // lineitem ⋈ orders is the one allowed non-broadcast join
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_range_join is a bucketized equi join, never a nested loop") {
    val p = plan(EventQueries.rangeJoinFunnel.fn(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q1_agg plans partial+final hash aggregation (map-side combine)") {
    val p = plan(Relational.q1Agg.fn(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  /** Shuffle exchanges in the (pre-AQE) physical plan string. Broadcast
    * exchanges don't count ("BroadcastExchange HashedRelation..." never
    * matches the lowercase partitioning forms); ReusedExchange echoes its
    * target's description and so counts like the original — acceptable for
    * a regression pin.
    */
  private def shuffleCount(p: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)".r
      .findAllIn(p)
      .size

  /** Exchange count from the plan TREE, not the printed string: a cached
    * frame (InMemoryTableScan) prints its build plan's exchanges once per
    * REFERENCE, so string counts depend on which earlier suite happened to
    * persist a shared table — tree counts don't. Cached subtrees count 0
    * (their build cost is session-amortized by design), reused exchanges
    * count 0 (they re-read the original's output).
    */
  private def shuffleCountTree(df: DataFrame): Int =
    adaptiveNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])

  test("shuffleCount recognizes every ShuffleExchange partitioning flavor") {
    // regression guard for the counter itself: a repartition(n) plans
    // 'Exchange RoundRobinPartitioning(n)' and MUST count
    val df = graft.core.Tables(spark, sf).lineitem.repartition(4).groupBy("l_returnflag").count()
    assert(shuffleCount(plan(df)) >= 2, plan(df))
  }

  test("q_ann_ivf probe prunes the cid-partitioned index at file-listing level") {
    val p = plan(graft.ext.Ivf.annIvf.fn(spark, sf))
    assert(p.contains("graft-ivf-index"), "probe must read the persisted index:\n" + p)
    assert(
      """PartitionFilters: \[[^\]]*cid""".r.findFirstIn(p).isDefined,
      "index scan must carry a cid partition filter:\n" + p
    )
  }

  test("exchange budgets: a refactor that adds a shuffle to a heavy query fails here") {
    // budgets pin today's plan shapes (see BENCH top-5); a future change
    // that sneaks in an extra exchange should fail a test, not a bench
    // eyeball. Counts are of the pre-AQE plan at sf0.001. The dedup
    // queries' counts vary a little with cache state (a materialized
    // InMemoryRelation's size statistics flip shuffled joins to broadcast),
    // so their budgets carry cold-plan headroom; the join-shape queries are
    // pinned tight.
    val budgets = Seq(
      ("q_tpch_q17", Relational.qTpchQ17, 4),
      ("q_tpch_q18", Relational.qTpchQ18, 3),
      // Q21's decorrelated per-order supplier stats are a two-level
      // aggregate + one fact join: partial aggregation compresses the
      // shuffle the old semi/anti formulation paid in raw rows (and a
      // whole third scan) — the budget covers agg(ok,sk) + agg(ok) +
      // the l1-side join exchange + the final s_name aggregate
      ("q_tpch_q21", Relational.qTpchQ21, 4),
      // the dedup/text family budgets are measured TREE counts (+2
      // headroom for AQE broadcast/SMJ flips on cache statistics); cached
      // subtrees count 0, so these are the exchanges a WARM session
      // actually executes per query
      ("q_minhash_neardup", Dedup.minhashNearDup, 4),
      ("q_ngram_jaccard", Dedup.ngramJaccard, 4),
      ("q_edit_neardup", Dedup.editNearDup, 4),
      ("q_dedup_incremental", Dedup.dedupIncremental, 5),
      ("q_embed_neardup", Similarity.embedNearDup, 4),
      ("q_knn_join", Similarity.knnJoinQ, 5),
      ("q_lm_score", graft.queries.TextQueries.lmScore, 7),
      ("q_inverted_index", graft.queries.TextQueries.invertedIndex, 4),
      // (q_dedup_clusters is NOT budgeted: its per-round shape, one join +
      // one min-aggregate, is pinned by its scaladoc and the runtime is
      // bounded by the convergence require)
      ("q_cms_topk", graft.queries.EventQueries.cmsTopk, 4),
      ("q_clean_corpus", graft.queries.Pipeline.cleanCorpus, 7),
      ("q_shared_passages", graft.ext.Winnow.sharedPassages, 6)
    )
    budgets.foreach { case (name, q, budget) =>
      val n = shuffleCountTree(q.fn(spark, sf))
      info(s"$name: $n exchanges (budget $budget)")
      assert(n <= budget, s"$name now plans $n shuffle exchanges (budget $budget)")
    }
  }

  test("q_mv_refresh scans only the delta tail: pushed watermark predicate + artifact read") {
    val b = graft.ops.MatView.baseFor(spark, sf)
    val p = plan(graft.ops.MatView.mvRefresh.fn(spark, sf))
    assert(p.contains("graft-mv-"), "refresh must read the persisted base MV artifact:\n" + p)
    assert(
      p.contains(s"GreaterThanOrEqual(event_id,${b.watermark})"),
      s"events scan must push the event_id >= ${b.watermark} watermark predicate:\n" + p
    )
    // the base snapshot must NOT be recomputed from events inside the
    // refresh: exactly one events scan (the delta), the rest reads parquet
    // partials
    assert(
      "events\\.parquet".r.findAllIn(p).size <= 1,
      "refresh re-scans the fact table for the base side:\n" + p
    )
  }

  test("q_maxsim: partial+final max aggregate, top-5 as TakeOrderedAndProject") {
    val p = plan(Similarity.maxSim.fn(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "max must combine map-side:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort:\n" + p)
  }

  test("q_join_skew_adaptive keeps the measure+join pipeline within its exchange budget") {
    val n = shuffleCount(plan(Relational.qJoinSkewAdaptive.fn(spark, sf)))
    info(s"q_join_skew_adaptive: $n exchanges")
    assert(n <= 6, s"q_join_skew_adaptive now plans $n shuffle exchanges (budget 6)")
  }

  test("q_tpch_q6 pushes all three range predicates and prunes to 4 columns") {
    val p = plan(Relational.qTpchQ6.fn(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate)"), p)
    // pruned read schema: the 3 filter keys + the aggregate input only
    assert(!p.contains("l_orderkey") && !p.contains("l_returnflag"), "scan reads unused columns:\n" + p)
  }

  test("q_tpch_q10 broadcasts both dims; top-20 is TakeOrderedAndProject") {
    val p = plan(Relational.qTpchQ10.fn(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("TakeOrderedAndProject"), "grouped top-k must not be a global sort:\n" + p)
  }

  test("q_latest_by_key is one partial+final aggregate — a single exchange") {
    val p = plan(EventQueries.latestByKey.fn(spark, sf))
    // max(struct) may plan as hash, object-hash, or sort aggregate; the
    // scale property is partial+final (two aggregate nodes) over ONE
    // key exchange (+ the verification sort)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
    assert(shuffleCount(p) <= 2, p)
  }

  test("q_funnel keeps every stage keyed on user_id within its exchange budget") {
    val p = plan(EventQueries.funnel.fn(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val n = shuffleCount(p)
    info(s"q_funnel: $n exchanges")
    assert(n <= 7, s"q_funnel now plans $n shuffle exchanges (budget 7)")
  }

  test("q_tpch_q7 broadcasts both nation-tagged dims; one fact-fact shuffle") {
    val p = plan(Relational.qTpchQ7.fn(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q_tpch_q9 pushes the part-name filter below the broadcast, all dims broadcast") {
    val p = plan(Relational.qTpchQ9.fn(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // the LIKE '%red%' filter must run on the part side, not post-join
    assert(p.contains("StringContains(p_name,red)") || p.contains("Contains(p_name"), p)
  }

  test("q_tpch_q2/q11/q20 keep their aggregate chains on one exchange key") {
    // each derives two aggregates from the same relation and joins them
    // back; the decorrelated plans must share the partkey exchange, not
    // multiply it
    Seq(
      ("q_tpch_q2", Relational.qTpchQ2, 5),
      ("q_tpch_q11", Relational.qTpchQ11, 4),
      ("q_tpch_q20", Relational.qTpchQ20, 5)
    ).foreach { case (name, qq, budget) =>
      val n = shuffleCount(plan(qq.fn(spark, sf)))
      info(s"$name: $n exchanges (budget $budget)")
      assert(n <= budget, s"$name now plans $n shuffle exchanges (budget $budget)")
    }
  }

  test("q_tpch_q2/q11/q20 read lineitem exactly once — the decorrelated side reuses, never rescans") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val total = graft.core.Tables(spark, sf).lineitem.count()
    for (name <- Seq("q_tpch_q2", "q_tpch_q11", "q_tpch_q20")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val liScans = adaptiveNodes(df.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) =>
          s.metrics("numOutputRows").value
      }
      info(s"$name: ${liScans.size} lineitem scan node(s), rows read = ${liScans.sum} (table = $total)")
      // the NODE count is the robust pin: row totals alone would pass a
      // double scan whenever row-group pruning trimmed each pass below 50%
      assert(liScans.size == 1, s"$name plans ${liScans.size} lineitem scans (expected exactly 1)")
      assert(liScans.sum <= total, s"$name reads ${liScans.sum} of $total lineitem rows")
      assert(liScans.sum > 0, s"$name read no lineitem rows — metric wiring broke")
    }
  }

  test("q_tpch_q16 plans the NOT IN as a broadcast anti join") {
    val p = plan(Relational.qTpchQ16.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("no registered query plans a CartesianProduct") {
    // the exact top-k cosine intentionally BNLJ-broadcasts a single query
    // row; nothing may plan an actual cartesian product
    graft.queries.Registry.all.foreach { q =>
      val p = plan(q.fn(spark, sf))
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian product:\n$p")
    }
  }

  test("no registered query plans a keyless (single-partition) window") {
    // Window.partitionBy() with no keys forces the ENTIRE input through one
    // task — fine on a 9-row frame today, a 10⁸-row single-partition frame
    // after a 100× scale-up. The scale-safe idiom for "global aggregate
    // attached back to every row" is crossJoin(broadcast(df.agg(...))) over
    // a cached frame (q_tpch_q15 / q_heavy_hitters / q_benford use it); this
    // pin keeps the keyless-window pattern from coming back anywhere.
    graft.queries.Registry.all.foreach { q =>
      val keyless = q
        .fn(spark, sf)
        .queryExecution
        .optimizedPlan
        .collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
        }
      assert(
        keyless.isEmpty,
        s"${q.name} plans a keyless window (single-partition frame): ${keyless.headOption}"
      )
    }
  }
}
