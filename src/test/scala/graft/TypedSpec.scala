package graft

import graft.core.Schemas

/** The typed Dataset[T] surface: encoder round-trips and a typed pipeline
  * matching its untyped dual.
  */
class TypedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("case-class encoders cover every table column") {
    val t = Schemas.typed(spark, sf)
    assert(t.lineitem.head().l_orderkey >= 0)
    assert(t.orders.head().o_totalprice > 0)
    assert(t.documents.head().text.nonEmpty)
    assert(t.embeddings.head().embedding.length == 64)
  }

  test("typed filter+map pipeline equals the DataFrame dual") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val typedCount = Schemas
      .typed(spark, sf)
      .lineitem
      .filter(_.l_quantity < 10)
      .map(l => (l.l_returnflag, l.l_quantity))
      .filter(_._2 > 1)
      .count()
    val untypedCount = graft.core
      .Tables(spark, sf)
      .lineitem
      .filter(col("l_quantity") < 10 && col("l_quantity") > 1)
      .count()
    assert(typedCount == untypedCount)
  }
}
