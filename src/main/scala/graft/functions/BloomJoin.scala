package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter semi-join reduction — the runtime-filter pattern.
  *
  * A plain `fact LEFT SEMI JOIN keys` shuffles BOTH sides when `keys` is too
  * large to broadcast. At 100 TB the fact-side exchange dominates; but the
  * key SET of a non-broadcastable table usually fits a few-hundred-KB Bloom
  * filter. So: aggregate the key side into a fixed-size bit array (mergeable
  * partial aggregation — each task ORs its local bits), broadcast the
  * single-row result (the Q22 scalar posture, never a driver collect), and
  * pre-filter the fact side with a codegen'd membership probe BEFORE its
  * shuffle. False positives are culled by the exact semi join that follows,
  * so the composite is value-identical to the plain semi join — the Bloom
  * pass only moves work from the exchange to the scan. This is what Spark's
  * own `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` does
  * opportunistically; here it is an explicit, testable operator.
  *
  * Hashing is splitmix64-based Kirsch–Mitzenmacher double hashing: bit_i =
  * (h1 + i·h2) mod m with h2 forced odd — k probe positions from two mixes,
  * the standard construction with no measurable FP penalty. All math is
  * pure Long arithmetic, identical in interpreted eval and generated Java.
  *
  * Reference analog: `/root/reference/mapreduce/manager/__main__.py:560-593`
  * exposes only generic map/group/reduce; a membership pre-filter like this
  * is how its grep-style selective pipelines would scale past one node.
  */
object GraftBloom {

  /** 2^20 bits = 128 KiB — comfortably broadcastable, <1% FP at 100k keys
    * with 5 hashes.
    */
  val NumBits: Int  = 1 << 20
  val NumWords: Int = NumBits / 64
  val NumHashes: Int = 5

  /** splitmix64 finalizer — the avalanche stage used by SplittableRandom. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for `key` in `words` (build side). */
  def add(words: Array[Long], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5deece66dL) | 1L
    var i  = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % NumBits
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe side; called from both interpreted eval and generated code (the
    * Scala object emits a static forwarder, so codegen references
    * `graft.functions.GraftBloom.mightContain` directly).
    */
  def mightContain(key: Long, words: ArrayData): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5deece66dL) | 1L
    var i  = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % NumBits
      if ((words.getLong((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Mergeable Bloom build: zero = empty bit array, reduce = set k bits,
    * merge = bitwise OR. Each map task ships one 128 KiB buffer regardless
    * of its row count — the shuffle carries O(tasks) bytes, not O(rows).
    */
  class Agg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](NumWords)
    override def reduce(b: Array[Long], key: Long): Array[Long] = { add(b, key); b }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form of the build aggregate. */
  def bloomAgg(key: Column): Column = udaf(new Agg).apply(key)

  /** Column form of the probe: `graft_bloom_contains(key, bits)`. */
  def bloomContains(key: Column, bits: Column): Column =
    call_function("graft_bloom_contains", key, bits)

  /** `fact LEFT SEMI JOIN small ON fact(factKey) = small(smallKey)`, with a
    * Bloom pre-filter on the fact side. Value-identical to the plain semi
    * join (the exact join culls Bloom false positives); at scale the probe
    * runs in the scan's codegen stage and the fact exchange shrinks to the
    * matching keys (+ FP noise) only.
    *
    * The bit array is built by a DISTRIBUTED partial-OR aggregate and then
    * executed eagerly: only the fixed-size 128 KiB filter ever reaches the
    * driver — the same contract as Spark's own runtime-filter subquery
    * (whose executed Bloom also lands in the plan as a literal), and the
    * same bounded-index-artifact exception the IVF centroid build documents.
    * Embedding the bits as a literal (rather than a broadcast-and-cross
    * join) matters for plan shape: a plain `Filter` on the fact side can
    * never be reordered ABOVE the semi join, whereas the cross-join
    * formulation invites `PushDownLeftSemiAntiJoin` to sink the exact join
    * below the probe — running the expensive exchange on unfiltered rows,
    * exactly backwards.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String, small: DataFrame, smallKey: String): DataFrame = {
    val words: Array[Long] =
      small.agg(bloomAgg(col(smallKey)).as("graft_bloom_bits")).head().getSeq[Long](0).toArray
    fact
      .filter(bloomContains(col(factKey), typedLit(words)))
      .join(
        small.select(col(smallKey).as("graft_bloom_key")),
        col(factKey) === col("graft_bloom_key"),
        "left_semi"
      )
  }
}

/** `graft_bloom_contains(key BIGINT, bits ARRAY<BIGINT>) → BOOLEAN` —
  * codegen'd k-probe membership test. Generates a single static call inside
  * whole-stage codegen (no CodegenFallback, no per-row boxing).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes            = Seq(LongType, ArrayType(LongType))
  override def dataType: DataType    = BooleanType
  override def prettyName: String    = "graft_bloom_contains"

  override def nullSafeEval(key: Any, bits: Any): Any =
    GraftBloom.mightContain(key.asInstanceOf[Long], bits.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (key, bits) => s"${ev.value} = graft.functions.GraftBloom.mightContain($key, $bits);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
