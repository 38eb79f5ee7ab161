package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to sign-LSH ([[Similarity]]):
  *
  *   1. index build: Lloyd's k-means picks `nCentroids` coarse centroids;
  *      every vector is assigned to its nearest centroid and the assigned
  *      table is WRITTEN PARTITIONED BY `cid`
  *      ([[graft.sources.Sources.writeParquetCompacted]]) so probing prunes
  *      whole partitions at the file-listing level (asserted in PlanSpec).
  *   2. query: score the query vector against the centroids (driver-side —
  *      `C` values), probe the `nProbe` nearest cells, exact-cosine re-rank
  *      only the vectors in those cells: a pruned scan +
  *      TakeOrderedAndProject, reading ~`nProbe/C` of the data.
  *
  * Determinism (what makes the DuckDB oracle possible): the fit runs on the
  * integer grid `round(x·10^6)`. Assignment is exact int64 squared-L2 with
  * ties to the smallest cid; the mean recompute is an exact integer
  * per-(cid,dim) SUM — order-free, unlike a double sum — followed by ONE
  * IEEE double division and a round back to the grid. Every step is
  * bit-identical regardless of partitioning or engine, so the oracle
  * replays the entire fit (init → 2 Lloyd's iterations → probe → exact
  * cosine re-rank) with unrolled SQL CTEs, the same way the LSH oracles
  * replay hyperplane literals ([[Similarity.annLshOracleSql]]). Recall and
  * convergence bounds are asserted in ExtSpec.
  */
object Ivf {

  /** Quantization scale: the fit lives on the integer grid round(x·10^6).
    * Fixture embeddings are |x| < 1, so components stay < 2·10^6, squared
    * diffs < 1.6·10^13, and a 64-dim distance sum < 2^51 — exact in int64.
    */
  val Scale = 1000000L

  val NCentroids = 16
  val NProbe     = 4
  val Iters      = 2

  /** embeddings + `qv`: int64-quantized embedding. `round` is
    * half-away-from-zero on ties in BOTH engines (Spark HALF_UP on the
    * shortest-decimal double, DuckDB on the binary double — these agree:
    * a shortest-repr tie ".5" implies the binary value IS the exact tie).
    */
  def quantized(emb: DataFrame): DataFrame =
    emb.withColumn(
      "qv",
      transform(col("embedding"), x => round(x.cast("double") * Scale).cast("long"))
    )

  /** Exact int64 squared-L2 between the row's `qv` and a centroid literal. */
  private def qdist(cvec: Column): Column =
    aggregate(
      zip_with(col("qv"), cvec, (a, b) => (a - b) * (a - b)),
      lit(0L),
      (acc, x) => acc + x
    )

  private def centroidArrayLit(centroids: Array[(Int, Array[Long])]): Column =
    array(centroids.toIndexedSeq.map { case (i, v) =>
      struct(lit(i).as("cid"), array(v.toIndexedSeq.map(lit): _*).as("cvec"))
    }: _*)

  /** Nearest-centroid assignment: adds `cid` (argmin squared-L2) and `d2`
    * (the winning distance). array_min over (d, cid) structs compares d
    * first, then cid — ties go to the smallest cid, the exact ordering the
    * oracle replays with `ORDER BY d, cid LIMIT 1`.
    */
  def assignScored(q: DataFrame, centroids: Array[(Int, Array[Long])]): DataFrame = {
    val scored = transform(
      centroidArrayLit(centroids),
      c => struct(qdist(c.getField("cvec")).as("d"), c.getField("cid").as("cid"))
    )
    q.withColumn("__best", array_min(scored))
      .withColumn("cid", col("__best.cid"))
      .withColumn("d2", col("__best.d"))
      .drop("__best")
  }

  /** Assignment only (no distance column). */
  def assignQ(q: DataFrame, centroids: Array[(Int, Array[Long])]): DataFrame =
    assignScored(q, centroids).drop("d2")

  /** Deterministic head sample (vec_id order) of quantized vectors. */
  def sampleCentroids(q: DataFrame, nCentroids: Int): Array[(Int, Array[Long])] =
    q.orderBy("vec_id")
      .limit(nCentroids)
      .select("qv")
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](0).toArray) }

  /** round-half-away-from-zero: matches Spark's `round()` and DuckDB's
    * `round()`. (`math.round` is floor(x+0.5) — half-toward-positive — and
    * disagrees on negative ties.)
    */
  private def roundHalfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Lloyd's k-means on the integer grid (the real IVF index build):
    * assignment with exact int64 L2, mean recompute as posexplode →
    * partial+final integer SUM per (cid, dim) — the shuffle carries C·dim
    * partial sums, not vectors — then one double division by the exact
    * count and a round back to the grid, on the driver. Only C·dim rows
    * reach the driver per iteration; empty cells keep their previous
    * centroid.
    */
  def kmeansFit(q: DataFrame, nCentroids: Int, iters: Int): Array[(Int, Array[Long])] = {
    var centroids = sampleCentroids(q, nCentroids)
    val dim       = centroids.headOption.map(_._2.length).getOrElse(0)
    var it        = 0
    while (it < iters) {
      val sums = assignQ(q, centroids)
        .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val vec = new Array[Long](dim)
            rows.foreach(r => vec(r.getInt(1)) = roundHalfAway(r.getLong(2).toDouble / r.getLong(3)))
            (cid, vec)
          case None => (cid, old) // empty cell keeps its previous centroid
        }
      }
      it += 1
    }
    centroids
  }

  // ---- persisted index: build once, probe many --------------------------

  /** A built IVF index: the fitted centroids plus the path of the assigned
    * table, written partitioned by `cid`.
    */
  final case class Index(path: String, centroids: Array[(Int, Array[Long])])

  private val built = scala.collection.mutable.Map.empty[String, Index]

  /** Fit + write the index for the embeddings under `dir` (memoized per
    * fixture dir for the session — the production analog is an offline
    * index-build job whose output outlives any single query). The assigned
    * table is written `PARTITIONED BY (cid)` through the compacted writer
    * (one file per cell at fixture scale), so a probe's
    * `cid IN (...)` filter prunes non-probed cells at file-listing time.
    *
    * Staleness contract (same as [[graft.Sql.createViews]]): the memoized
    * index reflects the embeddings as of the first call for `dir` in this
    * JVM; a caller that rewrites the fixture must drop the entry (restart
    * or a new dir) — exactly the semantics of a production index that is
    * rebuilt on a schedule, not per write.
    */
  def indexFor(spark: SparkSession, dir: String): Index = built.synchronized {
    built.getOrElseUpdate(
      dir, {
        val q         = quantized(Tables(spark, dir).embeddings)
        val centroids = kmeansFit(q, NCentroids, Iters)
        val digest    = java.security.MessageDigest.getInstance("MD5")
        val tag       = digest.digest(dir.getBytes).map("%02x".format(_)).mkString.take(12)
        // pid in the path: the index is per-JVM (the memo above is), so two
        // processes working the same fixture dir must not Overwrite/scan one
        // shared directory concurrently — and on a multi-user box one user
        // must not collide with another's files
        val path = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft-ivf-index-$tag-p${ProcessHandle.current().pid()}"
        ).getAbsolutePath
        graft.sources.Sources.writeParquetCompacted(
          assignQ(q, centroids).select("vec_id", "label", "embedding", "cid"),
          path,
          partitionBy = Seq("cid"),
          maxRecordsPerFile = 1000000L
        )
        Index(path, centroids)
      }
    )
  }

  private def d2Local(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Probe-only query over a built index: pick the `nProbe` cells nearest
    * to the query (C integer distances on the driver), scan ONLY those cid
    * partitions, exact-cosine re-rank (codegen'd `graft_cosine`) into a
    * TakeOrderedAndProject top-k.
    */
  def probe(
      spark: SparkSession,
      index: Index,
      queryEmb: Array[Float],
      queryQ: Array[Long],
      k: Int,
      nProbe: Int = NProbe
  ): DataFrame = {
    val probes = index.centroids
      .map { case (cid, v) => (d2Local(queryQ, v), cid) }
      .sorted // (distance, cid): ties to the smallest cid
      .take(nProbe)
      .map(_._2)
      .toSeq
    val qvLit = array(queryEmb.toIndexedSeq.map(lit): _*)
    spark.read
      .parquet(index.path)
      .filter(col("cid").isInCollection(probes))
      .withColumn("cos", call_function("graft_cosine", col("embedding"), qvLit))
      .select("vec_id", "label", "cos")
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "label")
  }

  /** Inline IVF top-k (fit + assign + probe in one lineage, no persisted
    * index) — the ExtSpec surface; the registered query goes through
    * [[indexFor]]/[[probe]] instead so the bench pays probe cost only.
    */
  def ivfTopK(
      emb: DataFrame,
      queryId: Long,
      k: Int,
      nCentroids: Int = NCentroids,
      nProbe: Int = NProbe,
      iters: Int = Iters
  ): DataFrame = {
    val q         = quantized(emb)
    val centroids = kmeansFit(q, nCentroids, iters)
    val qRow      = q.filter(col("vec_id") === queryId).select("embedding", "qv").collect()(0)
    val qEmb      = qRow.getSeq[Float](0).toArray
    val qQ        = qRow.getSeq[Long](1).toArray
    val probes = centroids
      .map { case (cid, v) => (d2Local(qQ, v), cid) }
      .sorted
      .take(nProbe)
      .map(_._2)
      .toSeq
    val qvLit = array(qEmb.toIndexedSeq.map(lit): _*)
    assignQ(q, centroids)
      .filter(col("cid").isInCollection(probes))
      .withColumn("cos", call_function("graft_cosine", col("embedding"), qvLit))
      .select("vec_id", "label", "cos")
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "label")
  }

  // ---- DuckDB oracle: full k-means replay -------------------------------

  /** The oracle replays the ENTIRE approximate path in SQL: quantization,
    * head-sample init, `iters` unrolled Lloyd's iterations (integer sums,
    * one double division, round), probe selection, pruned candidate set,
    * and the exact-cosine re-rank — so a regression anywhere in the fit or
    * the probe flips the hash compare. Integer arithmetic is exact in both
    * engines; the only floating-point steps (mean division + cosine) are
    * single IEEE ops on identical inputs.
    */
  private def d2Sql(v: String, c: String) =
    s"list_sum(list_transform(range(1, len($v)+1), i -> ($v[i]-$c[i])*($v[i]-$c[i])))"

  /** The shared fit-replay prefix (quantize → head-sample init → `iters`
    * unrolled Lloyd's iterations): the CTE body both IVF oracles compose.
    * Returns (cte text, name of the fitted-centroid CTE).
    */
  private def fitCtesSql(nCentroids: Int, iters: Int): (String, String) = {
    def assignCte(prev: String) =
      s"""SELECT vec_id, qv, cid FROM (
         |    SELECT q.vec_id, q.qv, c.cid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${d2Sql("q.qv", "c.cv")}, c.cid) AS rn
         |    FROM q, $prev c) WHERE rn = 1""".stripMargin
    val iterCtes = (0 until iters).flatMap { it =>
      Seq(
        s"a$it AS (${assignCte(s"c$it")})",
        s"""m$it AS (
           |  SELECT cid, generate_subscripts(qv, 1) AS d, unnest(qv) AS v FROM a$it)""".stripMargin,
        s"""c${it + 1} AS (
           |  SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
           |  FROM c$it p LEFT JOIN (
           |    SELECT cid, list(CAST(round(CAST(s AS DOUBLE)/n) AS BIGINT) ORDER BY d) AS cv
           |    FROM (SELECT cid, d, SUM(v) AS s, COUNT(*) AS n FROM m$it GROUP BY cid, d)
           |    GROUP BY cid) m ON m.cid = p.cid)""".stripMargin
      )
    }
    val prefix =
      s"""q AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS qv
         |  FROM embeddings),
         |c0 AS (
         |  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT $nCentroids)),
         |${iterCtes.mkString(",\n")}""".stripMargin
    (prefix, s"c$iters")
  }

  def oracleSql(queryId: Long, k: Int, nCentroids: Int, nProbe: Int, iters: Int): String = {
    def d2(v: String, c: String) = d2Sql(v, c)
    def assignCte(prev: String) =
      s"""SELECT vec_id, qv, cid FROM (
         |    SELECT q.vec_id, q.qv, c.cid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${d2("q.qv", "c.cv")}, c.cid) AS rn
         |    FROM q, $prev c) WHERE rn = 1""".stripMargin
    val (fitPrefix, fitted) = fitCtesSql(nCentroids, iters)
    s"""WITH $fitPrefix,
       |qq AS (SELECT qv FROM q WHERE vec_id = $queryId),
       |probes AS (
       |  SELECT c.cid FROM $fitted c, qq
       |  ORDER BY ${d2("qq.qv", "c.cv")}, c.cid LIMIT $nProbe),
       |af AS (${assignCte(fitted)}),
       |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |qe AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = $queryId),
       |sc AS (
       |  SELECT e.vec_id, e.label,
       |    list_dot_product(e.v, qvec)
       |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qvec, qvec))) AS cos
       |  FROM af JOIN e ON e.vec_id = af.vec_id, qe
       |  WHERE af.cid IN (SELECT cid FROM probes))
       |SELECT vec_id, label FROM sc ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin
  }

  /** Registered query: probe of the persisted cid-partitioned index,
    * hash-checked against the full k-means-replay oracle.
    */
  val annIvf: Q = Q(
    "q_ann_ivf",
    (s, dir) => {
      val index = indexFor(s, dir)
      val qRow = quantized(Tables(s, dir).embeddings)
        .filter(col("vec_id") === 0L)
        .select("embedding", "qv")
        .collect()(0)
      probe(s, index, qRow.getSeq[Float](0).toArray, qRow.getSeq[Long](1).toArray, k = 10)
    },
    Some(oracleSql(0L, 10, NCentroids, NProbe, Iters))
  )

  /** Oracle for [[topicClusters]]: the same full k-means replay as the ANN
    * oracle, ending in the final assignment joined back to labels and a
    * (cid, label) count — a fit regression changes the mixture and flips
    * the hash.
    */
  def topicOracleSql(nCentroids: Int, iters: Int): String = {
    val (fitPrefix, fitted) = fitCtesSql(nCentroids, iters)
    s"""WITH $fitPrefix,
       |af AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT q.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${d2Sql("q.qv", "c.cv")}, c.cid) AS rn
       |    FROM q, $fitted c) WHERE rn = 1)
       |SELECT CAST(af.cid AS INTEGER) AS cid, q.label, COUNT(*) AS n_vecs
       |FROM af JOIN q USING (vec_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Topic/cluster mixture over the corpus embeddings: k-means cluster ×
    * label counts — the "what topics is my training mix made of, and how do
    * they correlate with the known labels" audit every data-curation
    * pipeline runs before sampling. Reads the PERSISTED cid-partitioned
    * index ([[indexFor]] — the offline-build analog), so the query itself
    * is a groupBy over an already-clustered table: partial+final counts,
    * one exchange of at most C·|labels| rows, no vector math in the query
    * path at all. At 100 TB the index is the artifact a production
    * curation pipeline maintains anyway; the mixture audit stays a
    * metadata-sized aggregate no matter the corpus size.
    */
  val topicClusters: Q = Q(
    "q_topic_clusters",
    (s, dir) => {
      val index = indexFor(s, dir)
      s.read
        .parquet(index.path)
        .groupBy(col("cid").cast("int").as("cid"), col("label"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy("cid", "label")
    },
    Some(topicOracleSql(NCentroids, Iters))
  )

  val all: Seq[Q] = Seq(annIvf, topicClusters)
}
