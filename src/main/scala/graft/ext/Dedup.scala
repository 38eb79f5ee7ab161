package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** Training-data deduplication over the `documents` table.
  *
  * Three tiers, all shuffle-bounded (no crossJoin anywhere — the candidate
  * generation is a hash join on LSH band values, which is the property that
  * keeps this viable at 100 TB):
  *
  *   1. exact     — md5 over whitespace-normalized lowercase text, groupBy.
  *   2. MinHash   — k=8 signature over 3-word shingles. Each hash function
  *                  is `min(substr(md5(seed:shingle),1,16))`: a fixed-width
  *                  hex string, whose lexicographic min equals the numeric
  *                  min — deterministic and identically computable in any
  *                  engine (the DuckDB oracles use the same construction).
  *                  The signature is computed PER ROW with higher-order
  *                  array functions (transform/array_min): no explode, no
  *                  shuffle — the scan stage emits finished signatures.
  *   3. LSH       — signatures split into 4 bands x 2 rows; docs sharing a
  *                  band value become candidate pairs via a self-join ON
  *                  (band_id, band_val) — a plain shuffled hash join keyed
  *                  on the band, so only same-bucket docs ever meet.
  *                  Candidates are then verified with exact Jaccard over
  *                  distinct shingle sets (array_intersect/array_union —
  *                  per-row, no extra shuffle).
  *
  * The reference has no dedup surface; this is north-star scope
  * (SURVEY.md §7.2 step 8).
  */
object Dedup {

  /** Whitespace tokens of lowercased text (empties kept, like the
    * reference's tokenizer — see TextQueries).
    */
  def tokens(text: Column): Column = split(lower(text), " ", -1)

  /** 3-word shingles; empty array (not a descending `sequence` artifact!)
    * when the doc has fewer than 3 tokens.
    */
  def shingles3(toks: Column): Column =
    when(
      size(toks) >= 3,
      transform(
        sequence(lit(1), size(toks) - 2),
        i =>
          concat_ws(
            " ",
            element_at(toks, i),
            element_at(toks, i + lit(1)),
            element_at(toks, i + lit(2))
          )
      )
    ).otherwise(array().cast("array<string>"))

  /** One MinHash value: min over shingles of a seeded md5, as a fixed-width
    * hex prefix (lexicographic min == numeric min). NULL for empty sets.
    */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, x => substring(md5(concat(lit(s"$seed:"), x).cast("binary")), 1, 16)))

  private val K = 8 // signature length; 4 bands x 2 rows

  /** documents -> (doc_id, mh0..mh7). */
  def signatures(docs: DataFrame): DataFrame = {
    val sh = shingles3(tokens(col("text")))
    val mhs = (0 until K).map(i => minhash(col("sh"), i).as(s"mh$i"))
    docs.select(col("doc_id"), sh.as("sh")).select(col("doc_id") +: mhs: _*)
  }

  /** (doc_id, band_id, band_val): 4 bands of 2 signature rows each. */
  def bands(sig: DataFrame): DataFrame = {
    val bandCols = (0 until K / 2).map(b => concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")))
    sig
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_id", "band_val")))
      .filter(col("band_val").isNotNull)
  }

  /** Candidate pairs (d1 < d2) sharing at least one LSH band — a hash join
    * on (band_id, band_val), never a cartesian product.
    */
  def candidatePairs(docs: DataFrame): DataFrame = {
    val b = bands(signatures(docs))
    b.alias("a")
      .join(
        b.alias("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Candidates verified with exact Jaccard over distinct 3-shingle sets. */
  def nearDuplicates(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = docs
      .select(col("doc_id"), array_distinct(shingles3(tokens(col("text")))).as("sset"))
    candidatePairs(docs)
      .join(sets.select(col("doc_id").as("d1"), col("sset").as("s1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sset").as("s2")), "d2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("uni", size(array_union(col("s1"), col("s2"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "uni", "jaccard")
  }

  // ---- SQL fragments shared by the DuckDB oracles -------------------------

  private val sqlShingles =
    """SELECT doc_id,
      |  list_transform(range(1, greatest(len(t)-2, 0)+1),
      |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS sh
      |FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)""".stripMargin

  private def sqlMh(seed: Int): String =
    s"list_aggregate(list_transform(sh, x -> substr(md5('$seed:' || x), 1, 16)), 'min') AS mh$seed"

  private val sqlSig =
    s"""SELECT doc_id, ${(0 until K).map(sqlMh).mkString(",\n  ")}
       |FROM ($sqlShingles)""".stripMargin

  private val sqlBands =
    (0 until K / 2)
      .map(b => s"SELECT doc_id, $b AS band_id, mh${2 * b} || mh${2 * b + 1} AS band_val FROM sig WHERE mh${2 * b} IS NOT NULL")
      .mkString("\nUNION ALL\n")

  // ---- registered queries -------------------------------------------------

  /** Exact dedup: group identical normalized texts, keep the smallest id. */
  val dedupExact: Q = Q(
    "q_dedup_exact",
    (s, dir) =>
      Tables(s, dir).documents
        .groupBy(
          md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("fp")
        )
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
        .orderBy("fp"),
    Some(
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin
    )
  )

  /** MinHash signatures (cross-engine-checkable sketch computation). */
  val minhashSig: Q = Q(
    "q_minhash_sig",
    (s, dir) => signatures(Tables(s, dir).documents).orderBy("doc_id"),
    Some(s"$sqlSig\nORDER BY doc_id")
  )

  /** LSH candidate pairs — the bucketed (joinable) half of near-dup. */
  val lshCandidates: Q = Q(
    "q_lsh_candidates",
    (s, dir) => candidatePairs(Tables(s, dir).documents).orderBy("d1", "d2"),
    Some(
      s"""WITH sig AS ($sqlSig),
         |bands AS ($sqlBands)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.band_val = b.band_val
         | AND a.doc_id < b.doc_id
         |ORDER BY d1, d2""".stripMargin
    )
  )

  /** LSH candidates verified by exact Jaccard >= 0.2 over shingle sets. */
  val minhashNearDup: Q = Q(
    "q_minhash_neardup",
    (s, dir) => nearDuplicates(Tables(s, dir).documents, 0.2).orderBy("d1", "d2"),
    Some(
      s"""WITH sig AS ($sqlSig),
         |bands AS ($sqlBands),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list_distinct(sh) AS sset FROM ($sqlShingles))
         |SELECT d1, d2,
         |  CAST(len(list_intersect(s1.sset, s2.sset)) AS BIGINT) AS inter,
         |  CAST(len(list_distinct(list_concat(s1.sset, s2.sset))) AS BIGINT) AS uni,
         |  CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
         |    / len(list_distinct(list_concat(s1.sset, s2.sset))) AS jaccard
         |FROM cand
         |JOIN sets s1 ON s1.doc_id = d1
         |JOIN sets s2 ON s2.doc_id = d2
         |WHERE CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
         |    / len(list_distinct(list_concat(s1.sset, s2.sset))) >= 0.2
         |ORDER BY d1, d2""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(dedupExact, minhashSig, lshCandidates, minhashNearDup)
}
