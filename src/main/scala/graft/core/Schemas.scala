package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Case-class schemas for the typed `Dataset[T]` surface (used where
  * compile-time safety helps — pipeline code handling one table's rows;
  * the relational queries stay `DataFrame` where schemas compose
  * dynamically).
  */
object Schemas {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String, l_shipdate: Timestamp
  )

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String
  )

  final case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  /** Typed views over the parquet tables. */
  final class TypedTables(spark: SparkSession, dir: String) {
    private val t = Tables(spark, dir)
    import spark.implicits._
    def lineitem: Dataset[Lineitem]    = t.lineitem.as[Lineitem]
    def orders: Dataset[Order]         = t.orders.as[Order]
    def documents: Dataset[Document]   = t.documents.as[Document]
    def embeddings: Dataset[Embedding] = t.embeddings.as[Embedding]
  }

  def typed(spark: SparkSession, dir: String): TypedTables = new TypedTables(spark, dir)
}
