package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text helpers behind the native expressions.
  *
  * Scala top-level object ⇒ the compiler emits a mirror class with static
  * forwarders, so generated Java references `graft.functions.GraftText.…`
  * directly (same linkage trick as [[GraftBloom]]).
  */
object GraftText {

  /** Per-document character-bigram term frequencies in ONE pass over the
    * string: map(bigram → occurrences), bigrams taken over consecutive
    * Unicode code points (surrogate pairs never split — the same unit as
    * `split(text, "")` on the JVM and DuckDB's `substr`, which both walk
    * code points). A <2-code-point string yields an empty map, mirroring
    * the declarative formulation's `when(size(chars) >= 2, …)` guard.
    *
    * Replaces the 6-allocations-per-row declarative pipeline (per-char
    * `split` array, two `slice` copies, `arrays_zip` structs, per-element
    * HigherOrderFunction lambda dispatch, then an explode + hash-aggregate
    * exchange of one row PER CHARACTER): here the tf grain is computed
    * inside the scan stage, so what reaches the first exchange is one row
    * per DISTINCT (doc, bigram) — for natural-language text an order of
    * magnitude fewer rows, with zero intermediate arrays.
    */
  def tfMap(s: UTF8String): MapData = {
    val str = s.toString
    val n   = str.length
    // insertion-ordered so the expression is deterministic row-for-row
    // (map equality downstream never depends on hash iteration order)
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    var j = if (n > 0) Character.charCount(str.codePointAt(0)) else 0
    while (j < n) {
      val step = Character.charCount(str.codePointAt(j))
      val bg   = str.substring(i, j + step)
      val prev = m.get(bg)
      m.put(bg, if (prev == null) java.lang.Long.valueOf(1L) else java.lang.Long.valueOf(prev.longValue + 1L))
      i = j
      j += step
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var k    = 0
    val it   = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** `graft_bigram_tf(text)` — map<string,bigint> of character-bigram
  * counts, computed in a single fused pass inside whole-stage codegen.
  * The LM-scoring hot path ([[graft.queries.TextQueries.lmScore]]) uses it
  * to keep the doc×bigram tf table a NARROW computation: no per-character
  * explode ever reaches an exchange, which at 100 TB is the difference
  * between shuffling the corpus's character count and its (docs ×
  * alphabet²)-bounded tf grain.
  */
case class BigramTf(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  // return type intentionally inferred, as in VectorBinaryExpression
  override def inputTypes         = Seq(StringType)
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def nullSafeEval(s: Any): Any =
    GraftText.tfMap(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.GraftText.tfMap($c);")

  override protected def withNewChildInternal(newChild: Expression): BigramTf =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_tf"
}
