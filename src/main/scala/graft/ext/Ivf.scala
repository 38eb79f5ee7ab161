package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to sign-LSH ([[Similarity]]):
  *
  *   1. index build: pick `nCentroids` coarse centroids, assign every
  *      vector to its nearest centroid (one scan; per row `C` codegen'd
  *      cosines against a broadcast centroid literal array, then argmax).
  *      At production scale the assigned table is WRITTEN PARTITIONED BY
  *      `cid` (see [[graft.sources.Sources.writeParquet]]) so probing
  *      prunes whole partitions at the file-listing level.
  *   2. query: score the query vector against the centroids (driver-side —
  *      `C` values), probe the `nProbe` nearest cells, exact-cosine re-rank
  *      only the vectors in those cells: a filter + TakeOrderedAndProject,
  *      scanning `nProbe/C` of the data.
  *
  * Centroids: [[kmeansFit]] runs Lloyd's iterations in-engine (deterministic
  * head-sample initialization); the registered query uses it, and a
  * production pipeline would persist the fitted centroids + assignments
  * offline and reuse them per query. Recall vs brute force and k-means
  * convergence are asserted in ExtSpec.
  */
object Ivf {

  /** (cid, vector) centroids: deterministic head sample of the table. */
  def sampleCentroids(emb: DataFrame, nCentroids: Int): Array[(Int, Array[Float])] =
    emb
      .orderBy("vec_id")
      .limit(nCentroids)
      .select("embedding")
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).toArray) }

  /** Lloyd's k-means over the vectors (the real IVF index build): assign
    * with the codegen'd L2 expression, recompute means declaratively
    * (posexplode → groupBy (cid, dim) avg — a partial+final aggregate whose
    * shuffle carries C·dim partial sums, not vectors). Only the C·dim
    * centroid table ever reaches the driver, once per iteration.
    */
  def kmeansFit(emb: DataFrame, nCentroids: Int, iters: Int = 3): Array[(Int, Array[Float])] = {
    var centroids = sampleCentroids(emb, nCentroids)
    val dim       = centroids.headOption.map(_._2.length).getOrElse(0)
    var it        = 0
    while (it < iters) {
      val assigned = assignL2(emb, centroids)
      val means = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(avg("v").as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val vec = new Array[Float](dim)
            rows.foreach(r => vec(r.getInt(1)) = r.getDouble(2).toFloat)
            (cid, vec)
          case None => (cid, old) // empty cell keeps its previous centroid
        }
      }
      it += 1
    }
    centroids
  }

  /** argmax-by-score centroid pick: array_max over (score, cid) structs
    * (struct ordering compares score first) — shared by both metrics so the
    * tie/ordering behavior can never diverge between them.
    */
  private def assignBy(emb: DataFrame, centroids: Array[(Int, Array[Float])])(
      score: Column => Column
  ): DataFrame = {
    val scored = transform(
      centroidArrayLit(centroids),
      c => struct(score(c.getField("cvec")).as("score"), c.getField("cid").as("cid"))
    )
    emb.withColumn("cid", array_max(scored).getField("cid"))
  }

  /** Assignment by L2 (k-means metric): argmin distance == argmax of
    * negated distance.
    */
  def assignL2(emb: DataFrame, centroids: Array[(Int, Array[Float])]): DataFrame =
    assignBy(emb, centroids)(cvec => -call_function("graft_l2", col("embedding"), cvec))

  private def centroidArrayLit(centroids: Array[(Int, Array[Float])]): Column =
    array(scala.collection.immutable.ArraySeq.unsafeWrapArray(centroids.map { case (i, v) =>
      struct(lit(i).as("cid"), array(scala.collection.immutable.ArraySeq.unsafeWrapArray(v.map(lit)): _*).as("cvec"))
    }): _*)

  /** Assign every vector to its nearest centroid by cosine. Adds a `cid`
    * column.
    */
  def assign(emb: DataFrame, centroids: Array[(Int, Array[Float])]): DataFrame =
    assignBy(emb, centroids)(cvec => call_function("graft_cosine", col("embedding"), cvec))

  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IVF top-k: probe the `nProbe` cells nearest to the query, exact
    * re-rank inside them.
    */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = kmeansFit(emb, nCentroids, iters = 2)
    val qVec = emb
      .filter(col("vec_id") === queryId)
      .select("embedding")
      .collect()(0)
      .getSeq[Float](0)
      .toArray
    val probes: Seq[Int] = centroids
      .map { case (i, v) => (i, cosineLocal(qVec, v)) }
      .sortBy(-_._2)
      .take(nProbe)
      .map(_._1)
      .toSeq
    // the query vector is already on the driver — score against a literal
    // array instead of re-scanning the table for a 1-row broadcast
    val qvLit = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(qVec.map(lit)): _*)
    assign(emb, centroids)
      .filter(col("cid").isInCollection(probes))
      .withColumn("cos", call_function("graft_cosine", col("embedding"), qvLit))
      .select("vec_id", "label", "cos")
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "label")
  }

  /** Registered query (rows-only: cell assignment is engine-local; recall
    * bound asserted in ExtSpec).
    */
  val annIvf: Q = Q(
    "q_ann_ivf",
    (s, dir) => ivfTopK(Tables(s, dir).embeddings, 0L, 10),
    None
  )

  val all: Seq[Q] = Seq(annIvf)
}
