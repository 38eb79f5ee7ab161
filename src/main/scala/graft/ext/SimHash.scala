package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** SimHash near-duplicate detection (Charikar 2002, as used in web-scale
  * dedup): one 64-bit signature per document; near-dups have small Hamming
  * distance. Banding the 64 bits into 4x16-bit chunks gives LSH buckets —
  * any pair within Hamming distance 3 shares at least one intact chunk
  * (pigeonhole), so candidate generation is a self-join on chunk values,
  * never all-pairs.
  *
  * The signature itself is genuine per-row imperative bit math, so it runs
  * as a typed Dataset map (documented mapPartitions-class exception, not a
  * hot-path UDF inside a relational plan); everything after the signature
  * is declarative.
  */
object SimHash {

  /** First 8 bytes of md5(token) as a big-endian long. */
  private def hash64(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Classic simhash: per bit, sum +1/-1 votes across token hashes. */
  def simhash64(tokens: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = hash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b   = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def tokenize(text: String): Iterator[String] =
    text.toLowerCase.split(" ", -1).iterator

  /** documents -> (doc_id, simhash) via a typed map. */
  def signatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, simhash64(tokenize(text))) }
      .toDF("doc_id", "simhash")
  }

  /** Near-dup pairs within Hamming distance `maxDist` (<= 3 guaranteed
    * recall with 4 chunks), generated via chunk-value hash joins.
    */
  def nearDupPairs(spark: SparkSession, docs: DataFrame, maxDist: Int): DataFrame = {
    val sig = signatures(spark, docs)
    // 4 chunks of 16 bits each as join keys
    val chunks = (0 until 4).map { c =>
      (shiftright(col("simhash"), 16 * c).bitwiseAND(lit(0xffffL))).as(s"c$c")
    }
    val keyed = sig.select(col("doc_id") +: col("simhash") +: chunks: _*)
    val pairs = (0 until 4)
      .map { c =>
        keyed
          .alias("a")
          .join(
            keyed.alias("b"),
            col(s"a.c$c") === col(s"b.c$c") && col("a.doc_id") < col("b.doc_id")
          )
          .select(
            col("a.doc_id").as("d1"),
            col("b.doc_id").as("d2"),
            col("a.simhash").as("s1"),
            col("b.simhash").as("s2")
          )
      }
      .reduce(_ union _)
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= maxDist)
      .select("d1", "d2", "hamming")
  }

  // ---- registered queries (no SQL oracle: signature is engine-local bit
  //      math; correctness is covered by SimHashSpec property tests) -------

  val simhashSig: Q = Q(
    "q_simhash",
    (s, dir) =>
      signatures(s, Tables(s, dir).documents)
        .select(col("doc_id"), format_string("%016x", col("simhash")).as("simhash_hex"))
        .orderBy("doc_id"),
    None
  )

  val simhashNearDup: Q = Q(
    "q_simhash_neardup",
    (s, dir) => nearDupPairs(s, Tables(s, dir).documents, 3).orderBy("d1", "d2"),
    None
  )

  val all: Seq[Q] = Seq(simhashSig, simhashNearDup)
}
