package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Uniform per-group reservoir sample — a training-data-pipeline aggregate
  * Spark lacks natively ("give me k random documents per (lang, source)
  * cell" without sorting or materializing the groups).
  *
  * Classic Algorithm R, made MERGEABLE for Spark's partial aggregation:
  * each partial buffer keeps its reservoir plus the count of items it has
  * seen. Merging draws k slots without replacement, each draw weighted by
  * the input mass a reservoir slot represents (seen/|reservoir|). The
  * sequential weighted draws condition each pick on the previous removals,
  * so merged inclusion probabilities are APPROXIMATELY uniform (an exact
  * merge would hypergeometrically split the k slots between the two
  * reservoirs first); concatenation is exact when the combined buffers fit
  * in k. State per group is O(k) — the aggregation
  * shuffles one k-element buffer per group per map partition, never the
  * group's rows.
  *
  * Randomness is seeded per buffer from the first element's hash, making
  * runs deterministic for a fixed input partitioning (tests pin
  * parallelism); the UNIFORMITY property is partitioning-independent.
  */
object ReservoirSample {

  final case class Buf(var seen: Long, var items: Array[String], var seed: Long)

  class Agg(k: Int) extends Aggregator[String, Buf, Array[String]] {
    require(k > 0)

    private def rng(b: Buf): scala.util.Random = new scala.util.Random(b.seed ^ b.seen)

    override def zero: Buf = Buf(0L, Array.empty, 0L)

    override def reduce(b: Buf, x: String): Buf = {
      if (b.seen == 0) b.seed = x.hashCode.toLong
      b.seen += 1
      if (b.items.length < k) b.items = b.items :+ x
      else {
        val j = rng(b).nextLong() % b.seen
        // compare as Long BEFORE narrowing: for groups past 2^31 rows the
        // Int truncation of a large index could wrap negative (passing
        // `< k` and crashing) or alias into [0, k) with the wrong probability
        val idxLong = if (j < 0) j + b.seen else j
        if (idxLong < k) b.items(idxLong.toInt) = x
      }
      b
    }

    override def merge(a: Buf, c: Buf): Buf = {
      if (a.seen == 0) return c
      if (c.seen == 0) return a
      val total = a.seen + c.seen
      if (a.items.length + c.items.length <= k)
        return Buf(total, a.items ++ c.items, a.seed ^ c.seed)
      // k draws without replacement, weighted by the input mass each slot
      // represents — P(first pick from a) = seen_a/total, exactly
      val r = new scala.util.Random(a.seed ^ c.seed ^ total)
      val pool = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      a.items.foreach(x => pool += ((x, a.seen.toDouble / a.items.length)))
      c.items.foreach(x => pool += ((x, c.seen.toDouble / c.items.length)))
      var mass   = pool.iterator.map(_._2).sum
      val chosen = Array.newBuilder[String]
      var taken  = 0
      while (taken < k && pool.nonEmpty) {
        var u = r.nextDouble() * mass
        var i = 0
        while (i < pool.length - 1 && u > pool(i)._2) { u -= pool(i)._2; i += 1 }
        mass -= pool(i)._2
        chosen += pool.remove(i)._1
        taken += 1
      }
      Buf(total, chosen.result(), a.seed ^ c.seed)
    }

    override def finish(b: Buf): Array[String] = b.items

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Column form: `reservoir(k)` usable in groupBy().agg(...). */
  def reservoir(k: Int)(c: Column): Column = udaf(new Agg(k)).apply(c)
}
