package graft

import org.apache.spark.sql.functions._

/** Specs for the native vector expressions (graft_dot / graft_cosine). */
class FunctionsSpec extends SparkSpec {

  test("graft_dot matches a hand-computed dot product and the HOF formulation") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )
    val rows = df
      .select(call_function("graft_dot", col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == -2.0)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), "native != HOF"))
  }

  test("graft_cosine: identical vectors 1.0, orthogonal 0.0, zero-norm null") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 5.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val rows = df.select(call_function("graft_cosine", col("a"), col("b"))).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).getDouble(0) == 0.0)
    assert(rows(2).isNullAt(0))
  }

  test("graft_l2: zero for identical vectors, 5.0 for a 3-4-5 triangle") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(3.0f, 4.0f))
    ).toDF("a", "b")
    val rows = df.select(call_function("graft_l2", col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).getDouble(0) == 5.0)
  }

  test("functions are SQL-callable via the session extension") {
    import spark.implicits._
    Seq((Array(1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_cosine(a, b) AS c, graft_dot(a, b) AS d FROM vecs").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 2.0)
  }

  test("the scoring pipeline stays inside whole-stage codegen") {
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001").embeddings
    val df = emb.select(call_function("graft_cosine", col("embedding"), col("embedding")).as("c"))
    val p  = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(p.contains("*(1) Project") && p.contains("graft_cosine"), p)
    // a codegen'd run must produce values (smoke the generated Java path)
    assert(df.filter(col("c") > 0.99).count() > 0)
  }

  test("bloom filter: no false negatives, false-positive rate within spec") {
    import graft.functions.GraftBloom
    val words = new Array[Long](GraftBloom.NumWords)
    val keys  = (0L until 10000L).map(k => GraftBloom.mix(k * 31 + 7)) // spread keys
    keys.foreach(GraftBloom.add(words, _))
    val bits = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(words)
    // every inserted key must probe true (Bloom's hard guarantee)
    assert(keys.forall(GraftBloom.mightContain(_, bits)))
    // non-members: FP rate at 10k keys / 2^20 bits / 5 hashes is ~3e-6;
    // allow generous slack
    val probes = (1L to 20000L).map(k => GraftBloom.mix(k * 131 + 11)).filterNot(keys.toSet)
    val fp     = probes.count(GraftBloom.mightContain(_, bits))
    assert(fp.toDouble / probes.size < 0.01, s"$fp false positives in ${probes.size}")
  }

  test("bloomSemiJoin is value-identical to the plain left-semi join") {
    val t     = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val small = t.supplier.filter(col("s_acctbal") > 2000.0).select("s_suppkey")
    val viaBloom = graft.functions.GraftBloom
      .bloomSemiJoin(t.lineitem, "l_suppkey", small, "s_suppkey")
      .select("l_orderkey", "l_linenumber")
    val plain = t.lineitem
      .join(small, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() == plain.count() && plain.count() > 0)
  }

  test("the bloom probe filters the fact side BELOW the semi join") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val df = graft.functions.GraftBloom.bloomSemiJoin(
      t.lineitem,
      "l_suppkey",
      t.supplier.select("s_suppkey"),
      "s_suppkey"
    )
    val p = df.queryExecution.executedPlan.toString
    // children print after parents: the probe must appear under the join,
    // i.e. the exchange-bound side is already Bloom-reduced (the cross-join
    // formulation regresses to probe-ABOVE-join via PushDownLeftSemiAntiJoin)
    val joinAt  = p.indexOf("LeftSemi")
    val probeAt = p.indexOf("graft_bloom_contains")
    assert(joinAt >= 0 && probeAt > joinAt, p.take(2000))
  }

  test("the bloom probe fuses into whole-stage codegen at the scan") {
    val t     = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val words = new Array[Long](graft.functions.GraftBloom.NumWords)
    (1L to 10L).foreach(graft.functions.GraftBloom.add(words, _))
    val df = t.lineitem.filter(
      graft.functions.GraftBloom.bloomContains(col("l_suppkey"), typedLit(words))
    )
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter""".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("graft_bloom_contains"), p.take(2000))
    // smoke the generated-Java path end-to-end
    assert(df.count() > 0)
  }

  test("graft_bigram_tf matches the declarative split/zip/explode formulation") {
    import spark.implicits._
    // exercises: ASCII, repeats, case folding upstream, a 1-char and empty
    // string (empty map), multibyte BMP (é), and a supplementary-plane
    // emoji pair (surrogate pairs must count as ONE code point, as both
    // JVM split("") and DuckDB substr treat them)
    val docs = Seq(
      (1L, "Banana bandana"),
      (2L, "x"),
      (3L, ""),
      (4L, "héllo héllo"),
      (5L, "a😀b😀")
    ).toDF("doc_id", "text")
    val native = docs
      .select(
        col("doc_id"),
        explode(call_function("graft_bigram_tf", lower(col("text")))).as(Seq("bg", "tf"))
      )
    val chars = split(lower(col("text")), "")
    val declarative = docs
      .select(
        col("doc_id"),
        explode(
          when(
            size(chars) >= 2,
            transform(
              arrays_zip(
                slice(chars, lit(1), size(chars) - 1),
                slice(chars, lit(2), size(chars) - 1)
              ),
              p => concat(p.getField("0"), p.getField("1"))
            )
          ).otherwise(array().cast("array<string>"))
        ).as("bg")
      )
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("tf"))
    val n = native.orderBy("doc_id", "bg").collect().toSeq
    val d = declarative.orderBy("doc_id", "bg").collect().toSeq
    assert(n == d, s"native=$n declarative=$d")
    // the emoji doc: bigrams a😀, 😀b, b😀 — one each
    assert(n.count(_.getLong(0) == 5L) == 3)
    // the expression stays inside whole-stage codegen at the scan
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("graft_bigram_tf"), p.take(2000))
  }

  test("graft_bigram_tf is SQL-registered and null-safe") {
    spark.sql("SELECT CAST(null AS STRING) AS t, 'abab' AS u").createOrReplaceTempView("bg_t")
    val r = spark.sql("SELECT graft_bigram_tf(t) AS a, graft_bigram_tf(u) AS b FROM bg_t").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getMap[String, Long](1) == Map("ab" -> 2L, "ba" -> 1L))
  }
}
