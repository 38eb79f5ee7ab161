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
}
