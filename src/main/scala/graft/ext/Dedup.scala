package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  *   2. MinHash   — k=8 signature over 3-word shingles, computed the
  *                  Spark-idiomatic way: explode shingles → ONE codegen'd
  *                  md5 per shingle → a 28-bit integer base hash → the 8
  *                  hash functions are cheap universal-hash transforms
  *                  `(a_i·h + b_i) mod p` → 8 partial+final `min`
  *                  aggregates. The shuffle carries one 8-long partial
  *                  signature per doc per map partition, never raw
  *                  shingles. (A per-row higher-order-function formulation
  *                  would recompute md5 per hash function and run as
  *                  CodegenFallback — 8× the hashing off the codegen path.)
  *   3. LSH       — signatures split into 4 bands x 2 rows; docs sharing a
  *                  band value become candidate pairs via a plain shuffled
  *                  hash join keyed on (band_id, band_val), so only
  *                  same-bucket docs ever meet. Candidates are then
  *                  verified with exact Jaccard over distinct shingle sets.
  *
  * All hashing is md5-based and mirrored exactly in the DuckDB oracles
  * (`CAST('0x'||substr(md5(x),1,7) AS BIGINT)` ≡ Spark
  * `conv(substring(md5(x),1,7),16,10)`), so signatures are cross-engine
  * checkable. The reference has no dedup surface; this is north-star scope
  * (SURVEY.md §7.2 step 8).
  */
object Dedup {

  /** Signature length; 4 bands x 2 rows. */
  private val K = 8

  /** Universal-hash constants: mh_i = (A(i)·h + B(i)) mod P over the 28-bit
    * base hash h. Products stay < 2^58 — exact in both engines' int64.
    */
  private val P = 2147483647L // 2^31 - 1
  private val A = Seq(1000000007L, 998244353L, 754974721L, 167772161L, 469762049L, 1004535809L, 663224321L, 985661441L)
  private val B = Seq(12289L, 40961L, 65537L, 786433L, 5767169L, 7340033L, 23068673L, 104857601L)

  /** Whitespace tokens of lowercased text (empties kept, like the
    * reference's tokenizer — see TextQueries).
    */
  def tokens(text: Column): Column = split(lower(text), " ", -1)

  /** See [[graft.core.Cached.frame]] — the shared persist-if-not-cached guard. */
  private def cached(df: DataFrame): DataFrame = graft.core.Cached.frame(df)

  /** 3-word shingles; empty array when the doc has fewer than 3 tokens.
    *
    * Shape matters: an `element_at(toks, i)` lambda would re-evaluate the
    * `toks` subtree (the split of the whole text) PER SHINGLE — O(tokens²)
    * string splitting per document. Zipping three shifted slices evaluates
    * `toks` a constant number of times per row and the lambda touches only
    * its own struct argument.
    */
  def shingles3(toks: Column): Column =
    when(
      size(toks) >= 3,
      transform(
        arrays_zip(
          slice(toks, lit(1), size(toks) - 2),
          slice(toks, lit(2), size(toks) - 2),
          slice(toks, lit(3), size(toks) - 2)
        ),
        s => concat_ws(" ", s.getField("0"), s.getField("1"), s.getField("2"))
      )
    ).otherwise(array().cast("array<string>"))

  /** 28-bit base hash of one shingle: first 7 hex digits of md5. */
  private[graft] def baseHash(x: Column): Column =
    conv(substring(md5(x.cast("binary")), 1, 7), 16, 10).cast("long")

  /** Cached (doc_id, sset) distinct-3-shingle sets — the ONE `documents`
    * scan each batch dedup query pays. Signatures, bands, and the
    * exact-Jaccard verification all derive from this table, where the
    * previous shape re-ran the scan+tokenize+shingle lineage 3-4× per query
    * (Catalyst does not dedup common subtrees). `.persist()` is the
    * test-scale stand-in for the production shape — a materialized
    * append-only feature/band index, bucketed by band_val, as described on
    * [[incrementalNearDups]]; Spark's CacheManager dedupes identical plans,
    * so every dedup query in a session shares one entry per fixture dir.
    */
  def shingleSets(docs: DataFrame): DataFrame =
    cached(
      docs.select(col("doc_id"), array_distinct(shingles3(tokens(col("text")))).as("sset"))
    )

  /** (doc_id[, passthrough...], mh0..mh7) from a shingle-set table: explode,
    * hash once, 8 min-aggregates. `min` is duplicate-insensitive, so mins
    * over the DISTINCT set equal mins over the raw shingle multiset — the
    * cached [[shingleSets]] table serves signatures and Jaccard alike.
    * Set-less docs keep a row with null mins (explode_outer).
    */
  private def signaturesFromSets(sets: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val keep = passthrough.map(col)
    val exploded = sets
      .select(col("doc_id") +: keep :+ explode_outer(col("sset")).as("x"): _*)
      .select(col("doc_id") +: keep :+ baseHash(col("x")).as("h"): _*)
    val mins = (0 until K).map(i => min((col("h") * A(i) + B(i)) % P).as(s"mh$i"))
    exploded.groupBy("doc_id", passthrough: _*).agg(mins.head, mins.tail: _*)
  }

  /** documents -> (doc_id, mh0..mh7), computed over the cached
    * [[shingleSets]] table and cached itself: the md5+min work runs once per
    * session per fixture, not once per downstream use.
    */
  def signatures(docs: DataFrame): DataFrame =
    cached(signaturesFromSets(shingleSets(docs)))

  /** Shuffle-free signature computation: same VALUES as [[signatures]]
    * (asserted in ExtSpec) but per-row — no explode, no groupBy exchange.
    * The md5 runs inside HOF lambdas (CodegenFallback, interpreted), which
    * measured ~1.7x SLOWER than the codegen'd explode+groupBy path at
    * sf0.1 — so the BATCH queries keep [[signatures]]. This variant exists
    * for STREAMING ingest: a streaming source cannot run the stateful
    * explode+groupBy without watermark-managed aggregation state, while a
    * per-row projection is stateless per micro-batch. Empty-shingle docs
    * yield null mins, matching explode_outer + min.
    */
  def signaturesNarrow(docs: DataFrame): DataFrame = {
    val withHashes = docs.select(
      col("doc_id"),
      transform(shingles3(tokens(col("text"))), x => baseHash(x)).as("hs")
    )
    val mins = (0 until K).map { i =>
      when(size(col("hs")) > 0, array_min(transform(col("hs"), h => (h * A(i) + B(i)) % P)))
        .as(s"mh$i")
    }
    withHashes.select(col("doc_id") +: mins: _*)
  }

  /** (doc_id, band_id, band_val): 4 bands of 2 signature rows each. Docs
    * with null signatures (no shingles) are excluded — an empty doc is not
    * a near-dup candidate of other empty docs by shingle definition.
    */
  def bands(sig: DataFrame, passthrough: Seq[String] = Nil): DataFrame =
    sig
      .filter(col("mh0").isNotNull)
      .select(
        col("doc_id") +: passthrough.map(col) :+
          posexplode(array(bandValCols: _*)).as(Seq("band_id", "band_val")): _*
      )

  /** Band values over the mh0..mh7 columns: 4 bands of 2 signature rows. */
  private def bandValCols: Seq[Column] =
    (0 until K / 2).map(b => concat_ws("_", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")))

  /** One-row driver-side probe over the cached [[exactGroups]] table: does
    * any text occur more than once? The same bounded measure-then-decide
    * discipline as the adaptive skew join — the answer routes the whole
    * pair family between the plain path and the pre-collapsed path.
    *
    * Memoized per analyzed-plan semantic hash: ~10 pair-family queries run
    * the probe at CONSTRUCTION time, and even over the cached group table
    * each head() is a scheduled job (~0.1-0.2 s of pure latency × reps in
    * Bench — measured ~0.5 s/query of probe tax before the memo). Same
    * staleness contract as Spark's own CacheManager and the family caches:
    * a fixture dir rewritten mid-session must not reuse the session.
    */
  private val dupProbeMemo =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()

  /** Memoized max exact-copy multiplicity — the boolean routes the pair
    * family between the plain and pre-collapsed paths; the MAGNITUDE
    * (round 14) sizes the member-expansion spread in q_contamination (a
    * 300k-copy group's quadratic expansion must not land on one task; an
    * 8-copy group must not pay a salted plan for it).
    */
  private[graft] def maxCopies(docs: DataFrame): Long =
    dupProbeMemo
      .computeIfAbsent(
        docs.queryExecution.analyzed.semanticHash(),
        _ =>
          exactGroups(docs)
            .agg(coalesce(max("copies"), lit(0L)).as("m"))
            .head()
            .getLong(0)
      )
      .longValue()

  private[graft] def hasExactDups(docs: DataFrame): Boolean = maxCopies(docs) > 1L

  /** Representative doc ids (min doc_id per distinct text). */
  private[graft] def repIds(docs: DataFrame): DataFrame =
    exactGroups(docs).select(col("rep").as("doc_id"))

  /** Every document with its exact-text representative — the expansion
    * table that maps the pre-collapsed rep-level pair grain back to member
    * grain. `extra` columns (e.g. `source`) ride the SAME documents scan,
    * so consumers never pay a second corpus pass for member attributes.
    * On a dup-free corpus this is the identity mapping (rep = doc_id).
    * Cached like the other family tables: q_contamination references the
    * mapping six times (two split sides × three pair branches), which
    * uncached would be six documents scans.
    */
  private[graft] def members(docs: DataFrame, extra: Column*): DataFrame =
    cached(
      docs
        .select(col("doc_id") +: md5(col("text").cast("binary")).as("tkey") +: extra: _*)
        .join(exactGroups(docs).select("tkey", "rep"), "tkey")
        .drop("tkey")
    )

  /** Reps whose text has at least one 3-shingle — the banding-eligibility
    * predicate (`mh0 IS NOT NULL` on the oracle side): setless docs are
    * never LSH candidates, so their exact-dup groups get no within-group
    * pair expansion either. A plain filter over the FAMILY-SHARED cached
    * shingle table.
    */
  private[graft] def eligibleReps(docs: DataFrame): DataFrame =
    shingleSets(docs).filter(size(col("sset")) > 0).select(col("doc_id").as("rep"))

  /** Candidate pairs (d1 < d2) sharing at least one LSH band — a hash join
    * on (band_id, band_val), never a cartesian product.
    *
    * EXACT-DUPLICATE PRE-COLLAPSE (family-wide): when the corpus contains
    * exact-duplicate texts, banding runs over ONE representative (min
    * doc_id) per distinct text, so a document duplicated 100k× contributes
    * one band row instead of 100k — the within-group candidate clique
    * (~5·10⁹ pairs at 100k copies; the uncollapsed shape measured 972 s
    * hot vs 4.8 s clean in the 10× scale gate via q_clean_corpus) never
    * exists. Identical text ⟹ identical signature and bands ⟹ a member is
    * a candidate of exactly the docs its representative partners with, so
    * rep-level pairs carry the full cross-text candidate structure;
    * exact-duplicate multiplicity is the exact-dedup tier's job
    * ([[exactGroups]] / q_dedup_exact), which production pipelines run
    * BEFORE MinHash (the C4/CCNet ordering this engine documents for the
    * boilerplate defense). Every consumer's DuckDB oracle replays the
    * identical collapse (`sqlSigRep`), and on a dup-free corpus the
    * [[hasExactDups]] probe keeps the plain path with zero overhead —
    * where collapse and no-collapse are output-identical anyway.
    */
  def candidatePairs(docs: DataFrame): DataFrame = {
    // the collapsed signature table is cached in its own right: ~10 pair
    // queries route through here, and an uncached (signatures ⋈ reps)
    // join re-paid a per-query shuffle over the signature table (measured
    // q_edit_neardup 0.53 s → 2.7 s at sf0.1, which holds 8 dup texts).
    // Cached.frame keys on the plan, so the whole family shares ONE
    // materialization — the rep-level signature index production keeps
    // next to the full one.
    val sigs =
      if (hasExactDups(docs)) cached(signatures(docs).join(repIds(docs), "doc_id"))
      else signatures(docs)
    candidatePairsFrom(sigs)
  }

  /** The band self-join itself, over whatever signature table the caller
    * chose — [[candidatePairs]] feeds it the collapsed grain; tests feed it
    * the raw grain to prove the collapse output-equivalent. `d1Wave`
    * (round 14) restricts the D1 side to one hash(doc_id) residue class
    * BEFORE any pair exists — the band family's bounded-wave partition:
    * every emitted pair has d1 = a.doc_id, so each pair lands in exactly
    * the wave owning its d1 and the union over waves is the full set.
    */
  private[graft] def candidatePairsFrom(
      sigs: DataFrame,
      d1Wave: Option[(Int, Seq[Int])] = None): DataFrame =
    bandSelfJoin(bands(sigs), d1Wave).distinct()

  /** The raw (pre-distinct) band-bucket pair enumeration over an arbitrary
    * band-row frame — split out so the saturation re-route can run it over
    * the NON-saturated buckets only. The wave filter sits on the A side
    * (the d1 producer), so a waved run's enumeration join INPUT is already
    * 1/waves — the filter never waits for pairs to exist.
    */
  private def bandSelfJoin(b: DataFrame, d1Wave: Option[(Int, Seq[Int])] = None): DataFrame = {
    val a = d1Wave match {
      case Some((n, ws)) => b.filter(pmod(hash(col("doc_id")), lit(n)).isin(ws: _*))
      case None          => b
    }
    a.alias("a")
      .join(
        b.alias("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
  }

  /** Band-bucket occupancy histogram over the (collapsed-grain) band
    * table — the telemetry the 100× gates record (round 13): one row per
    * log₂ occupancy class with the bucket count, the total within-bucket
    * pair enumeration Σ n·(n−1)/2 that class feeds the candidate join, and
    * the class max. The enumeration column is the quantitative form of
    * "band saturation": on a fixed synthetic vocabulary it rises
    * superlinearly with corpus size, and this histogram pins the growth to
    * occupancy instead of arguing it.
    */
  def bandOccupancy(docs: DataFrame): DataFrame = {
    val sigs =
      if (hasExactDups(docs)) cached(signatures(docs).join(repIds(docs), "doc_id"))
      else signatures(docs)
    bands(sigs)
      .groupBy("band_id", "band_val")
      .agg(count(lit(1)).as("n"))
      .select(floor(log(2.0, col("n"))).cast("int").as("log2_occupancy"), col("n"))
      .groupBy("log2_occupancy")
      .agg(
        count(lit(1)).as("buckets"),
        expr("sum(n * (n - 1)) div 2").as("enum_pairs"),
        max(col("n")).as("max_occupancy")
      )
      .orderBy("log2_occupancy")
  }

  /** Saturation threshold for the ngram verify's bucket re-route: buckets
    * with more members than this route their enumeration through the exact
    * prefix principle instead of the |B|² band join. 4096 members means
    * ≥ 8.4M enumerated pairs from ONE bucket — far beyond anything a
    * non-pathological corpus produces at the collapsed grain, so the
    * default keeps every fixture/bench plan on the certified band join;
    * the scale gates lower it via SPARK_GRAFT_BAND_SAT to engage the
    * re-route on saturation corpora.
    */
  private[graft] def bandSatThreshold: Int =
    sys.env.get("SPARK_GRAFT_BAND_SAT").map(_.toInt).getOrElse(4096)

  private val satProbeMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), java.lang.Boolean]()

  /** Memoized measure-then-decide probe (the [[hasExactDups]] discipline):
    * does any band bucket exceed `sat` members? One agg over the cached
    * band grain at construction time; on every fixture corpus the answer
    * is no and the query plan is EXACTLY the pre-round-13 one.
    */
  private def hasSaturatedBuckets(docs: DataFrame, sigs: DataFrame, sat: Int): Boolean =
    satProbeMemo
      .computeIfAbsent(
        (docs.queryExecution.analyzed.semanticHash(), sat),
        _ =>
          bands(sigs)
            .groupBy("band_id", "band_val")
            .agg(count(lit(1)).as("n"))
            .agg(coalesce(max("n"), lit(0L)).as("m"))
            .head()
            .getLong(0) > sat
      )
      .booleanValue()

  /** Candidate pairs for the n-gram verifier with the band-SATURATION
    * re-route (round 13): buckets whose occupancy exceeds `sat` skip the
    * |B|² band self-join; their members' pairs are enumerated by the exact
    * prefix principle over the SAME distinct char-4-gram sets the verify
    * reads, at the verify threshold 3/10 ([[SetJoin.groupedPrefixCandidates]]).
    *
    * Output-identical to [[candidatePairs]] FOR THE NGRAM CONSUMER, by
    * construction: every within-bucket pair is a band candidate, the
    * prefix filter only drops pairs that cannot reach gram-Jaccard ≥ 3/10
    * (the completeness theorem), and those pairs fail the verify filter
    * anyway. (Zero-gram docs never survive the verify on either route:
    * their jaccard is 0 or null.) NOT reusable by consumers that verify a
    * different measure — containment's one-sided ≥ 0.6 admits pairs the
    * 3/10 Jaccard prefix would prune — which is why the re-route lives
    * here and not in the shared [[candidatePairs]].
    */
  private[graft] def ngramCandidatePairs(
      docs: DataFrame,
      sat: Int,
      d1Wave: Option[(Int, Seq[Int])] = None): DataFrame = {
    val sigs =
      if (hasExactDups(docs)) cached(signatures(docs).join(repIds(docs), "doc_id"))
      else signatures(docs)
    if (!hasSaturatedBuckets(docs, sigs, sat)) candidatePairsFrom(sigs, d1Wave)
    else {
      val b = bands(sigs)
      val occ = b.groupBy("band_id", "band_val").agg(count(lit(1)).as("n"))
      // pathological buckets are few by definition — broadcast the keys
      val satKeys = broadcast(
        occ.filter(col("n") > sat).select("band_id", "band_val"))
      val bKeys   = Seq("band_id", "band_val")
      val candN   = bandSelfJoin(b.join(satKeys, bKeys, "left_anti"), d1Wave)
      val satDocs = b.join(satKeys, bKeys)
      // rare-first canonical gram order over the saturated members (any
      // global order preserves completeness; df over this subset is the
      // pruning-power choice)
      val g = gramSets(docs)
        .join(satDocs.select("doc_id").distinct(), "doc_id")
        .select(col("doc_id"), explode(col("gset")).as("tok"))
      val dfs = g.groupBy("tok").agg(count(lit(1)).as("df"))
      val ordered = g
        .join(dfs, "tok")
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
        .select(
          col("doc_id"),
          transform(col("ord"), x => x.getField("tok")).as("toks"),
          size(col("ord")).as("sz")
        )
      val sets = satDocs
        .join(ordered, "doc_id")
        .select(
          concat_ws("#", col("band_id"), col("band_val")).as("gid"),
          col("doc_id"),
          col("toks"),
          col("sz")
        )
      val saltB = SetJoin.saltBFor(docs)
      candN
        .union(SetJoin.groupedPrefixCandidates(sets, NgTNum, NgTDen, saltB, d1Wave))
        .distinct()
    }
  }

  /** UNCOLLAPSED verified pairs — the quadratic clique shape, retained for
    * the equivalence proofs in StressSpec (never a registered query's
    * path). On a dup-free corpus equals [[nearDuplicates]] exactly.
    */
  private[graft] def nearDuplicatesUncollapsed(docs: DataFrame, threshold: Double): DataFrame =
    verifiedPairs(candidatePairsFrom(signatures(docs)), docs, threshold)

  /** Character 4-grams of lowercased text (empty array below 4 chars) —
    * same zip-of-shifted-slices shape as [[shingles3]] so the char split
    * evaluates O(1) times per row, not per gram.
    */
  def charGrams4(text: Column): Column = {
    val chars = split(lower(text), "")
    when(
      size(chars) >= 4,
      transform(
        arrays_zip(
          slice(chars, lit(1), size(chars) - 3),
          slice(chars, lit(2), size(chars) - 3),
          slice(chars, lit(3), size(chars) - 3),
          slice(chars, lit(4), size(chars) - 3)
        ),
        s => concat(s.getField("0"), s.getField("1"), s.getField("2"), s.getField("3"))
      )
    ).otherwise(array().cast("array<string>"))
  }

  /** Cached (doc_id, gset, hg, hok, gsz) distinct char-4-gram sets —
    * [[shingleSets]]'s analog for the n-gram verifier, so `q_ngram_jaccard`
    * pays one `documents` scan for its gram sets (its candidates reuse the
    * shingle cache). Round 12 carries [[SetJoin]]'s verify-tier columns:
    * `hg` is the xxhash64 image of `gset` (long-array intersection is
    * several times cheaper than string-array — no per-element string
    * hashing/equality in the hot loop), `hok` records that the hashes are
    * collision-free WITHIN this doc (a cross-doc collision only inflates
    * the hash intersect, which the exact string tier discards; an intra-doc
    * collision collapses two grams to one hash and could DEFLATE it, so the
    * cheap tier is only trusted when both sides are `hok` — the ~2⁻⁶⁴
    * fall-through re-verifies on strings unpruned), and `gsz` is the
    * distinct-gram count the size prefilters read without touching arrays.
    */
  def gramSets(docs: DataFrame): DataFrame =
    cached(
      docs
        .select(col("doc_id"), array_distinct(charGrams4(col("text"))).as("gset"))
        .select(
          col("doc_id"),
          col("gset"),
          transform(col("gset"), g => xxhash64(g)).as("hg"),
          (size(array_distinct(transform(col("gset"), g => xxhash64(g)))) ===
            size(col("gset"))).as("hok"),
          size(col("gset")).as("gsz")
        )
    )

  /** Predicted footprint of a band-candidate verify, computed BEFORE any
    * pair is enumerated — [[SetJoin.CandidateEstimate]]'s analog for the
    * band family (round 14; the 5M-doc telemetry predicted >100 GB of
    * verify traffic against 78 GB free, and unlike set-join the family
    * could SEE the ceiling but not bound it).
    *
    *   - `enumPairs`: Σ n·(n−1)/2 over band buckets at the collapsed grain
    *     — one aggregate over the cached band table, an upper bound on the
    *     rows entering the candidate distinct (for the saturation-re-routed
    *     buckets the prefix principle enumerates FEWER, so the bound only
    *     over-predicts — the safe side for a wave decision);
    *   - `survival`: distinct-candidates / raw-enumeration measured on a
    *     deterministic ~10% doc sample through the REAL band self-join +
    *     distinct (pair volume scales as the sample rate squared, so the
    *     sample join costs ~1% of the real enumeration);
    *   - `bytes`: the three exchanges every verify pays — raw pairs into
    *     the candidate distinct, distinct pairs through the numbered d1
    *     spread, and the d2-routing exchange carrying the xxhash64 payload
    *     (whose SMJ sort also spills ~that volume; raw bytes kept, LZ4 is
    *     the margin — the exact model SetJoinGate validated at three
    *     scales, ratios 0.93/1.18/1.25).
    */
  final case class VerifyEstimate(
      enumPairs: Long,
      survival: Double,
      avgPayload: Double,
      bytes: Long) {
    def distinctPairs: Long = (enumPairs * survival).toLong
  }

  private val verifyEstMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), VerifyEstimate]()

  /** Memoized per (documents plan, payload grain). `grain` picks the
    * verify payload the d2 exchange carries: "gram" (char-4-gram hashes,
    * [[ngramVerifiedPairs]]) or "shingle" (3-word-shingle hashes,
    * [[verifiedPairs]] consumers). Runs Spark jobs at construction — only
    * called when a [[SetJoin.shuffleBudget]] is set (gates), never on the
    * plain bench/correctness path.
    */
  private[graft] def bandVerifyEstimate(docs: DataFrame, grain: String): VerifyEstimate = {
    val sigs =
      if (hasExactDups(docs)) cached(signatures(docs).join(repIds(docs), "doc_id"))
      else signatures(docs)
    verifyEstMemo.computeIfAbsent(
      (docs.queryExecution.analyzed.semanticHash(), grain),
      _ => {
        def enumOf(b: DataFrame): Long =
          b.groupBy("band_id", "band_val")
            .agg(count(lit(1)).as("n"))
            .agg(coalesce(expr("sum(n * (n - 1)) div 2"), lit(0L)).as("p"))
            .first()
            .getLong(0)
        val enumPairs = enumOf(bands(sigs))
        val sB        = bands(sigs.filter(pmod(xxhash64(col("doc_id")), lit(10)) === 0))
        val sEnum     = enumOf(sB)
        val survival =
          if (sEnum == 0L) 1.0
          else math.min(1.0, bandSelfJoin(sB).distinct().count().toDouble / sEnum)
        val avgPayload = {
          val c = if (grain == "gram") gramSets(docs).agg(avg(col("gsz")))
                  else shingleHashes(docs).agg(avg(col("ssz")))
          Option(c.first().get(0)).fold(0.0)(_.asInstanceOf[Double])
        }
        val surviving = (enumPairs * survival).toLong
        val bytes = enumPairs * SetJoin.CandRowBytes +
          surviving * SetJoin.CandRowBytes +
          surviving * (SetJoin.VerifyRowOverhead + (avgPayload * SetJoin.HashTokBytes).toLong)
        val est = VerifyEstimate(enumPairs, survival, avgPayload, bytes)
        System.err.println(
          f"[dedup] $grain verify estimate: enum_pairs=$enumPairs " +
            f"sampled_survival=$survival%.3f distinct_pairs=${est.distinctPairs} " +
            f"avg_payload=$avgPayload%.1f predicted_bytes=$bytes (~${bytes / 1048576.0}%.0f MiB)"
        )
        est
      }
    )
  }

  /** Wave count for a budgeted verify: ⌈bytes/budget⌉ capped like
    * set-join's; None when the predicted footprint fits in one wave.
    */
  private def verifyWaves(est: VerifyEstimate, budget: Long): Option[Int] =
    if (est.bytes > budget) Some(math.min(1024L, (est.bytes + budget - 1) / budget).toInt)
    else None

  /** Predicted volume of a CROSS-corpus candidate enumeration (seen×new,
    * train×test — the grain the self-join estimators above do not cover):
    * Σ_key |left|·|right| over the join-key groups, each key's counts from
    * one aggregate per side — no pair is enumerated. Logged so every verify
    * consumer states its footprint before enumerating; returns the
    * predicted bytes. Only called when a budget is set (construction-time
    * Spark jobs).
    */
  private[graft] def logCrossVerifyEstimate(
      name: String,
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      perRowBytes: Double): Long = {
    val lc = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("nl"))
    val rc = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("nr"))
    val pairs = lc
      .join(rc, keys)
      .agg(coalesce(sum(col("nl") * col("nr")), lit(0L)).as("p"))
      .first()
      .getLong(0)
    val bytes = (pairs * perRowBytes).toLong
    System.err.println(
      f"[dedup] $name cross-verify estimate: enum_pairs=$pairs " +
        f"predicted_bytes=$bytes (~${bytes / 1048576.0}%.0f MiB)")
    bytes
  }

  /** Candidates verified with exact Jaccard over distinct 3-shingle sets.
    * Candidate generation and verification share the cached [[shingleSets]]
    * table — one `documents` scan for the whole query. Pairs are at the
    * DISTINCT-TEXT grain ([[candidatePairs]]' exact-dup pre-collapse):
    * exact copies never re-verify, so a 100k-copy group costs nothing here
    * instead of 5·10⁹ Jaccard evaluations; its multiplicity lives in
    * [[exactGroups]] and the member star of [[nearDupEdges]].
    *
    * Round 14: with a [[SetJoin.shuffleBudget]] configured and the
    * [[bandVerifyEstimate]] above it, the candidate enumeration + verify
    * runs as bounded hash(d1)-residue waves ([[nearDuplicatesWaved]]) —
    * output-identical, per-wave footprint under the budget. Unset ⇒ the
    * unchanged single-wave plan every fixture/bench run takes.
    */
  def nearDuplicates(docs: DataFrame, threshold: Double): DataFrame =
    SetJoin.shuffleBudget match {
      case Some(budget) =>
        val est = bandVerifyEstimate(docs, "shingle")
        verifyWaves(est, budget) match {
          case Some(waves) =>
            System.err.println(
              s"[dedup] predicted ${est.bytes} B exceeds budget $budget B — " +
                s"verifying shingle candidates in $waves bounded waves")
            nearDuplicatesWaved(docs, threshold, waves, est.bytes / waves, Some(budget))
          case None => verifiedPairs(candidatePairs(docs), docs, threshold)
        }
      case None => verifiedPairs(candidatePairs(docs), docs, threshold)
    }

  /** Bounded-wave shingle verify: each batch of hash(d1) residue classes
    * owns the candidate pairs whose d1 falls in it — the wave filter sits
    * on the band join's A side, so each wave's enumeration, distinct, and
    * verify exchanges all carry only its batch's share of the volume; each
    * wave is its own materialized action with shuffle files GC-cleaned
    * before the next (the [[SetJoin.similarityJoinWaved]] machinery,
    * applied to the band candidate grain). Union over waves ≡ the
    * single-wave output because every pair has exactly one d1. Memoized per
    * (docs plan, threshold, waves) so repeated constructions re-read the
    * parquet. Round 15: the verify payload (shingle hash + string arrays)
    * is materialized once per campaign as a doc_id-bucketed table so each
    * wave's verify joins read it exchange-free ([[graft.core
    * .BucketedPayload]]), and the wave count re-plans from measured bytes
    * ([[graft.core.AdaptiveWaves]]; `budget` None ⇒ fixed batches, the
    * spec entry point).
    */
  private[graft] def nearDuplicatesWaved(
      docs: DataFrame,
      threshold: Double,
      waves: Int,
      perWaveBytes: Long = 0L,
      budget: Option[Long] = None): DataFrame = {
    val spark = docs.sparkSession
    val key   = (docs.queryExecution.analyzed.semanticHash(), threshold, waves)
    val sigs =
      if (hasExactDups(docs)) cached(signatures(docs).join(repIds(docs), "doc_id"))
      else signatures(docs)
    val dir = nearDupWavedMemo.computeIfAbsent(
      key,
      _ => {
        // full threshold BITS in the dir key: the memo keys on the exact
        // Double, so a truncated decimal here would let two thresholds
        // equal at 3 decimals share one directory while holding distinct
        // memo entries — the masked-key collision WaveScratch forbids.
        // freshDirFor (round 16): the waves APPEND into this dir, so a
        // retry after a mid-campaign failure must start from empty or the
        // failed attempt's waves get duplicated (WaveRetrySpec pins it)
        val out = graft.core.WaveScratch.freshDirFor(
          spark,
          "neardup",
          f"${key._1}%08x-${java.lang.Double.doubleToLongBits(threshold).toHexString}-$waves")
        val payKey = f"${key._1}%08x"
        val nb     = spark.sparkContext.defaultParallelism
        val hpay =
          graft.core.BucketedPayload.ensure(spark, "shhash", payKey, "doc_id", nb)(
            shingleHashes(docs))
        val spay =
          graft.core.BucketedPayload.ensure(spark, "shset", payKey, "doc_id", nb)(
            shingleSets(docs))
        val tAll = System.nanoTime()
        graft.core.AdaptiveWaves.run(
          spark, "neardup", 0 until waves, waves, perWaveBytes, budget) { ws =>
          verifiedPairs(
            candidatePairsFrom(sigs, Some((waves, ws))), docs, threshold,
            Some((hpay, spay)))
            .write.mode("append").parquet(out)
        }
        graft.core.BuildWalls.record("neardup_verify_waves", (System.nanoTime() - tAll) / 1e9)
        out
      }
    )
    spark.read.parquet(dir)
  }

  private val nearDupWavedMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double, Int), String]()

  /** Exact-Jaccard verification of a (d1, d2) candidate set against the
    * cached shingle-set table — the ONE definition both the collapsed and
    * the uncollapsed pair paths share.
    *
    * Round-12 verify discipline (the 100× spot gate caught q_contamination
    * grinding ~40 min with 2 of 32 cores in this very intersect): the
    * candidate frame is BYTE-small, so AQE's size-based coalescing packs it
    * onto a handful of partitions and the per-pair array work runs nearly
    * serial — the identical mechanism SetJoin/ngramJaccard already defuse.
    * A user-NUMBERED repartition (exempt from AQE coalescing), keyed by d1
    * so the first verify join reuses the exchange, restores full-width
    * parallelism; and a length-ratio prefilter (J ≥ t forces t ≤
    * |s1|/|s2| ≤ 1/t) drops grossly mismatched pairs before any array is
    * touched. The 1e-9 margin keeps the prune provably conservative
    * against the final double comparison (double rounding is ≤ ~1e-16
    * relative; the pruning power loses nothing at 1e-9).
    */
  private def verifiedPairs(
      cand: DataFrame,
      docs: DataFrame,
      threshold: Double,
      payload: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    // `payload` (round 15): (hash-tier, string-tier) frames to read the
    // verify columns from instead of the session caches — the wave loop
    // passes once-per-campaign doc_id-bucketed tables so each wave's four
    // verify joins scan them exchange-free instead of re-shuffling the
    // full payload per wave (the round-14 per-wave fixed term)
    val sets  = payload.fold(shingleSets(docs))(_._2)
    val hsets = payload.fold(shingleHashes(docs))(_._1)
    val tm    = threshold - 1e-9
    // HASH-FIRST topology (round 13; SetJoin/ngram precedent): the
    // exchange that routes each candidate row to its d2 side used to carry
    // the d1 side's full STRING shingle array — at the 5M-doc saturation
    // gate that exchange's sort spill ENOSPC'd a 78-GB-free node inside
    // q_contamination. The narrow hash cache rides that exchange instead
    // (~8 B/shingle vs ~20+), and the string arrays attach only to hash-
    // tier survivors (≈ true pairs: the bound below restates J ≥ t exactly
    // under `hok`; collisions and the 1e-9 margin only over-admit).
    val hashTier = cand
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("d1"))
      .join(
        hsets.select(col("doc_id").as("d1"), col("hs").as("h1"), col("hok").as("hok1"),
          col("ssz").as("z1")), "d1")
      .join(
        hsets.select(col("doc_id").as("d2"), col("hs").as("h2"), col("hok").as("hok2"),
          col("ssz").as("z2")), "d2")
      .filter(
        col("z1").cast("double") >= lit(tm) * col("z2") &&
          col("z2").cast("double") >= lit(tm) * col("z1")
      )
      // J ≥ t ⟺ (1+t)·|∩| ≥ t·(|s1|+|s2|); evaluated at tm < t the bound
      // only widens, and a non-hok side falls through unpruned
      .filter(
        !col("hok1") || !col("hok2") ||
          size(array_intersect(col("h1"), col("h2"))).cast("double") * lit(1.0 + tm) >=
          lit(tm) * (col("z1") + col("z2")).cast("double")
      )
      .select(col("d1"), col("d2"))
    hashTier
      .join(sets.select(col("doc_id").as("d1"), col("sset").as("s1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sset").as("s2")), "d2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("uni", size(array_union(col("s1"), col("s2"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "uni", "jaccard")
  }

  /** Narrow hash-tier companion of [[shingleSets]]: per doc, the xxhash64
    * image of the shingle set, the intra-doc collision-free marker, and
    * the set size — the columns the verify's heavy exchange carries so the
    * string arrays never ride it (see [[verifiedPairs]]). Cached
    * separately and WITHOUT the strings: the family cache keeps one copy
    * of the text-derived arrays, this one only longs.
    */
  private def shingleHashes(docs: DataFrame): DataFrame =
    cached(
      shingleSets(docs).select(
        col("doc_id"),
        transform(col("sset"), x => xxhash64(x)).as("hs"),
        (size(array_distinct(transform(col("sset"), x => xxhash64(x)))) ===
          size(col("sset"))).as("hok"),
        size(col("sset")).as("ssz")
      )
    )

  /** Incremental near-dedup: flag NEW docs that near-duplicate the SEEN
    * corpus — the shape of a production ingest gate, where each day's batch
    * is checked against everything already accepted. Candidates come from a
    * band hash join of the new side against the seen side only (new⋈new
    * pairs are deliberately out of scope here — run [[nearDuplicates]] on
    * the batch for those), then exact-Jaccard verify, keeping each flagged
    * doc's best seen partner (max jaccard, ties to the smallest id). At
    * 100 TB the seen side's band table is a materialized incremental index
    * (append-only, bucketed by band_val) and the day's batch is small enough
    * that its band side broadcasts.
    */
  def incrementalNearDups(docs: DataFrame, isNew: Column, threshold: Double): DataFrame =
    if (!hasExactDups(docs)) incrementalNearDupsPlain(docs, isNew, threshold)
    else {
      // EXACT-DUPLICATE PRE-COLLAPSE, SIDE-LOCAL — the ingest-gate analog
      // of [[candidatePairs]]' family collapse, which the 10× scale gate
      // showed this query was missing (clean 2.2 s vs hot 92.7 s, ratio
      // 42.6: a 100k-copy text puts ~80k new copies and ~20k seen copies
      // in ONE band bucket, and the new⋈seen band join emits their ~1.6·10⁹
      // cross pairs before the verify tier sees any of them). Banding and
      // verification run over one representative per (distinct text, SIDE)
      // — side-LOCAL because the same text on both sides must keep a rep
      // on each side for the cross-boundary jaccard-1.0 match to exist.
      // Output-identical to the raw grain: identical text ⟹ identical
      // bands and jaccard, so (a) a member is a band candidate of exactly
      // the docs its rep partners with, and (b) the best-partner argmax
      // (jaccard DESC, seen_id ASC) always lands on a seen REP — equal-
      // jaccard exact copies lose the id tiebreak to their group's min-id
      // rep by construction. New members then inherit their rep's
      // (dup_of, jaccard) through a pair-bounded broadcast join.
      // StressSpec pins collapsed ≡ plain on a dup-heavy corpus; the
      // dup-free fixtures (sf0.001/sf0.01) keep the plain path via the
      // memoized [[hasExactDups]] probe, zero overhead.
      val mem      = members(docs, isNew.as("__new"))
      val sideReps = mem.groupBy("rep", "__new").agg(min("doc_id").as("srep"))
      val repFrame = docs.join(sideReps.select(col("srep").as("doc_id")), "doc_id")
      val repRes   = incrementalNearDupsPlain(repFrame, isNew, threshold)
      mem
        .filter(col("__new"))
        .join(sideReps.filter(col("__new")).select(col("rep"), col("srep")), "rep")
        .join(repRes, col("srep") === col("new_id"))
        .select(col("doc_id").as("new_id"), col("dup_of"), col("jaccard"))
    }

  /** The uncollapsed ingest-gate pipeline — [[incrementalNearDups]] routes
    * here directly on dup-free corpora, and over the side-collapsed rep
    * frame otherwise.
    */
  private[graft] def incrementalNearDupsPlain(docs: DataFrame, isNew: Column, threshold: Double): DataFrame = {
    // ONE tagged feature projection, cached: the predicate is evaluated at
    // the single `documents` scan, signatures are computed once for the
    // whole corpus with the side tag carried through (a doc's signature is
    // identical whichever side computes it), and the cached band index is
    // split by the tag afterwards — no per-side re-scan, no per-side
    // re-hash. At 100 TB the cached band table becomes the materialized
    // append-only band index (bucketed by band_val) and only the new
    // batch's bands are computed per run.
    val feats = cached(
      docs.select(
        col("doc_id"),
        array_distinct(shingles3(tokens(col("text")))).as("sset"),
        isNew.as("__is_new")
      )
    )
    val bt = cached(bands(signaturesFromSets(feats, Seq("__is_new")), Seq("__is_new")))
    // budget-gated footprint statement (round 14): the seen×new candidate
    // grain has its own volume model — Σ_bucket |new|·|seen| — logged
    // before any pair is enumerated, like every other verify consumer
    if (SetJoin.shuffleBudget.isDefined) {
      val avgSz =
        Option(feats.agg(avg(size(col("sset")))).first().get(0)).fold(0.0)(_.asInstanceOf[Double])
      logCrossVerifyEstimate(
        "incremental_neardup",
        bt.filter(col("__is_new")),
        bt.filter(!col("__is_new")),
        Seq("band_id", "band_val"),
        SetJoin.VerifyRowOverhead + avgSz * 20.0
      ): Unit
    }
    val cand = bt
      .filter(col("__is_new"))
      .select(col("doc_id").as("new_id"), col("band_id"), col("band_val"))
      .join(
        bt.filter(!col("__is_new"))
          .select(col("doc_id").as("seen_id"), col("band_id"), col("band_val")),
        Seq("band_id", "band_val")
      )
      .select("new_id", "seen_id")
      .distinct()
    val sets = feats
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("new_id")
      .orderBy(col("jaccard").desc, col("seen_id"))
    cand
      // spread before the per-pair array work (verifiedPairs discipline);
      // keyed by new_id so both the first verify join AND the best-partner
      // window reuse the exchange
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("new_id"))
      .join(sets.select(col("doc_id").as("new_id"), col("sset").as("s1")), "new_id")
      .join(sets.select(col("doc_id").as("seen_id"), col("sset").as("s2")), "seen_id")
      .withColumn(
        "jaccard",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))
      )
      .filter(col("jaccard") >= threshold)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("new_id"), col("seen_id").as("dup_of"), col("jaccard"))
  }

  /** STREAMING ingest gate: [[incrementalNearDups]] as a continuously
    * running pipeline — `newDocs` is a STREAMING DataFrame of documents,
    * `seen` the static accepted corpus. Every stage is stateless per
    * micro-batch, so the query runs in append mode with NO state store:
    * per-row [[signaturesNarrow]] + band explode on the stream, then two
    * stream-static joins (band index, then shingle sets — re-planned per
    * batch), then the exact-Jaccard filter.
    *
    * The static side carries NO broadcast hint on purpose: the accepted
    * corpus grows without bound in an ingest-gate deployment, and a forced
    * broadcast (which overrides autoBroadcastJoinThreshold) would
    * eventually OOM the driver. The planner broadcasts while `seen` is
    * small and falls back to a shuffled join when it is not; at production
    * scale the seen band table is a materialized bucketed index (the
    * [[incrementalNearDups]] scale story) and only the per-batch stream
    * side stays small.
    *
    * Emits one row per (new_id, dup_of, jaccard) per MATCHING BAND — the
    * per-pair dedup that batch mode does with `distinct()` would be a
    * stateful stream aggregation, so it is deliberately left to the
    * consumer (an idempotent sink keyed on the pair, or a per-batch
    * `dropDuplicates` inside foreachBatch).
    *
    * SCALE INVARIANT: `seen` must be the ACCEPTED corpus — i.e. already
    * deduplicated, which an ingest-gate deployment guarantees by
    * construction (a doc flagged here never joins `seen`). That is what
    * bounds the fan-out: a new doc matches at most a handful of unique
    * near-dup partners. Feeding a seen side that itself contains a text
    * duplicated N× would multiply every matching new doc's output by N —
    * the hot-band pathology [[nearDupEdges]] pre-collapses for the batch
    * cluster path, prevented here by the accepted-corpus contract instead.
    */
  def streamingIngestGate(newDocs: DataFrame, seen: DataFrame, threshold: Double): DataFrame = {
    val seenBands = bands(signatures(seen))
      .select(col("doc_id").as("seen_id"), col("band_id"), col("band_val"))
    val seenSets = seen
      .select(col("doc_id").as("seen_id2"), array_distinct(shingles3(tokens(col("text")))).as("s2"))
    // ONE per-row projection carries the shingle set alongside the
    // signature (joining bands back to newDocs would be a stateful
    // stream-stream self-join — exactly what this pipeline must avoid)
    val sh = shingles3(tokens(col("text")))
    val hashed = newDocs.select(
      col("doc_id"),
      array_distinct(sh).as("s1"),
      transform(sh, x => baseHash(x)).as("hs")
    )
    val mins = (0 until K).map { i =>
      when(size(col("hs")) > 0, array_min(transform(col("hs"), h => (h * A(i) + B(i)) % P)))
        .as(s"mh$i")
    }
    val newKeyed = hashed
      .select(col("doc_id") +: col("s1") +: mins: _*)
      .filter(col("mh0").isNotNull)
      .select(col("doc_id"), col("s1"), posexplode(array(bandValCols: _*)).as(Seq("band_id", "band_val")))
    newKeyed
      .join(seenBands, Seq("band_id", "band_val"))
      .join(seenSets, col("seen_id") === col("seen_id2"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))
      )
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id").as("new_id"), col("seen_id").as("dup_of"), col("jaccard"))
  }

  // ---- SQL fragments shared by the DuckDB oracles -------------------------

  /** Shingle CTE body over an arbitrary (doc_id, text) relation — the
    * staged-pipeline oracles (q_pipeline_e2e) near-dedup an INTERMEDIATE
    * corpus, not `documents`, so the fragments are parametrized on the
    * source name; the fixed-name vals below keep every existing oracle
    * byte-identical.
    */
  private[graft] def sqlShinglesOver(src: String): String =
    s"""SELECT doc_id,
       |  list_transform(range(1, greatest(len(t)-2, 0)+1),
       |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS sh
       |FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM $src)""".stripMargin

  private[graft] val sqlShingles = sqlShinglesOver("documents")

  private def sqlMh(i: Int): String =
    s"list_aggregate(list_transform(sh, x -> (CAST('0x' || substr(md5(x), 1, 7) AS BIGINT) * ${A(i)} + ${B(i)}) % $P), 'min') AS mh$i"

  private[graft] def sqlSigOver(src: String): String =
    s"""SELECT doc_id, ${(0 until K).map(sqlMh).mkString(",\n  ")}
       |FROM (${sqlShinglesOver(src)})""".stripMargin

  private[graft] val sqlSig = sqlSigOver("documents")

  /** Exact-duplicate collapse for the PAIR oracles: one representative
    * (min doc_id) per distinct text — the oracle replay of the
    * [[candidatePairs]] pre-collapse. MIN(text) is the group's one text.
    */
  private[graft] val sqlRepDocs =
    "SELECT MIN(doc_id) AS doc_id, MIN(text) AS text FROM documents GROUP BY md5(text)"

  private[graft] val sqlShinglesRep =
    s"""SELECT doc_id,
       |  list_transform(range(1, greatest(len(t)-2, 0)+1),
       |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS sh
       |FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM ($sqlRepDocs))""".stripMargin

  /** Signature CTE body over the COLLAPSED doc set — what every pair-family
    * oracle binds its `sig` name to, so band join + verification replay
    * the rep-level computation exactly. Per-doc oracles (q_minhash_sig)
    * keep [[sqlSig]] over all docs.
    */
  private[graft] val sqlSigRep =
    s"""SELECT doc_id, ${(0 until K).map(sqlMh).mkString(",\n  ")}
       |FROM ($sqlShinglesRep)""".stripMargin

  private[graft] val sqlBands =
    (0 until K / 2)
      .map(b =>
        s"SELECT doc_id, $b AS band_id, CAST(mh${2 * b} AS VARCHAR) || '_' || CAST(mh${2 * b + 1} AS VARCHAR) AS band_val FROM sig WHERE mh0 IS NOT NULL"
      )
      .mkString("\nUNION ALL\n")

  /** Shared near-dup CTE bodies (expect `sig`/`bands`/`cand`/`sets` in
    * scope per each fragment's note) — ONE definition of "candidate pair",
    * "shingle set", and "verified pair" for every oracle that reasons
    * about near-duplicates, so a threshold or hash tweak can never make
    * two oracles disagree about what a near-dup is.
    */
  private[graft] val sqlCand =
    """SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_val = b.band_val
      |   AND a.doc_id < b.doc_id""".stripMargin

  private[graft] def sqlSetsOver(src: String): String =
    s"SELECT doc_id, list_distinct(sh) AS sset FROM (${sqlShinglesOver(src)})"

  private[graft] val sqlSets = sqlSetsOver("documents")

  /** Jaccard-verified (d1, d2, jaccard) pairs at `threshold`. */
  private[graft] def sqlPairs(threshold: Double): String =
    s"""SELECT d1, d2,
       |    CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
       |      / len(list_distinct(list_concat(s1.sset, s2.sset))) AS jaccard
       |  FROM cand
       |  JOIN sets s1 ON s1.doc_id = d1
       |  JOIN sets s2 ON s2.doc_id = d2
       |  WHERE CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
       |      / len(list_distinct(list_concat(s1.sset, s2.sset))) >= $threshold""".stripMargin

  // ---- registered queries -------------------------------------------------

  /** Exact dedup: group identical normalized texts (shared
    * [[graft.queries.Fingerprint]] key), keep the smallest id.
    */
  val dedupExact: Q = Q(
    "q_dedup_exact",
    (s, dir) =>
      Tables(s, dir).documents
        .groupBy(graft.queries.Fingerprint.of(col("text")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
        .orderBy("fp"),
    Some(
      s"""SELECT ${graft.queries.Fingerprint.sql} AS fp,
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
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand)
         |SELECT d1, d2 FROM cand ORDER BY d1, d2""".stripMargin
    )
  )

  /** LSH candidates verified by exact Jaccard >= 0.2 over shingle sets. */
  val minhashNearDup: Q = Q(
    "q_minhash_neardup",
    (s, dir) => nearDuplicates(Tables(s, dir).documents, 0.2).orderBy("d1", "d2"),
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets)
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

  /** n-gram Jaccard threshold 3/10 as an exact rational — the prefilters
    * below are integer cross-multiplications of this, never doubles.
    */
  private val NgTNum = 3L
  private val NgTDen = 10L

  /** The `q_ngram_jaccard` verify pipeline, with [[SetJoin]]'s verify
    * discipline ported in (round 12 — the round-11 10× sweep measured the
    * naive string-array verify drifting 11.8 → 40.1 s with an unchanged
    * plan, because per-candidate cost is corpus-shaped, not plan-shaped):
    *
    *  1. numbered repartition of the byte-small candidate frame before the
    *     CPU-heavy verify (`SetJoin.similarityJoinWith` precedent: AQE's
    *     byte-based coalescing packs small-byte/heavy-CPU stages onto a
    *     handful of tasks; a user-NUMBERED repartition is exempt, and
    *     keying by d1 lets the first verify join reuse the exchange);
    *  2. length-ratio prefilter in exact integers: J ≥ t forces
    *     t ≤ |g1|/|g2| ≤ 1/t, i.e. 3·|g1| ≤ 10·|g2| ∧ 3·|g2| ≤ 10·|g1| —
    *     evaluated on the `gsz` counts before any array is touched;
    *  3. xxhash64 cheap tier: |∩h|·(3+10) ≥ 3·(|g1|+|g2|) is EXACTLY
    *     J ≥ 3/10 restated (via |∪| = |g1|+|g2|−|∩|) when both sides are
    *     intra-doc collision-free (`hok`); otherwise the pair falls
    *     through to the exact tier unpruned. Long-array intersection
    *     replaces most string-array intersections at a fraction of the
    *     cost; cross-doc collisions only over-admit.
    *  4. exact string-gram tier — unchanged semantics, but |∪| is now
    *     computed as |g1|+|g2|−|∩| (the sets are distinct by
    *     construction), saving the second O(n) array op per survivor.
    *
    * Steps 2–3 are output-neutral work savers; the final double-division
    * filter is byte-identical to the oracle's. The integer forms coincide
    * with the double `>= 0.3` comparison for every realizable set size
    * (a disagreement needs |∪| within ~1e-17 relative of 3/10 without
    * equaling it — a denominator > 10¹⁶, far beyond any document's gram
    * count), and DedupSpec pins pruned ≡ unpruned on a collision-rich
    * corpus. `pruned = false` preserves the round-11 naive path for that
    * equivalence proof.
    */
  private[graft] def ngramVerifiedPairs(
      docs: DataFrame,
      pruned: Boolean = true,
      sat: Int = bandSatThreshold): DataFrame = {
    // Round 14: budget-aware routing — the pruned path switches to bounded
    // hash(d1)-residue waves when the estimator predicts the verify
    // footprint above SPARK_GRAFT_SHUFFLE_BUDGET (the 5M-doc telemetry
    // showed the family SEEING its >100 GB ceiling but not bounding it).
    // Unset budget (every fixture/bench/correctness run) ⇒ the unchanged
    // single-wave plan.
    val waved =
      if (pruned) SetJoin.shuffleBudget.flatMap { budget =>
        val est = bandVerifyEstimate(docs, "gram")
        verifyWaves(est, budget).map { waves =>
          System.err.println(
            s"[dedup] predicted ${est.bytes} B exceeds budget $budget B — " +
              s"verifying gram candidates in $waves bounded waves")
          (waves, est.bytes / waves, budget)
        }
      }
      else None
    waved match {
      case Some((waves, perWave, budget)) =>
        ngramVerifiedPairsWaved(docs, sat, waves, perWave, Some(budget))
      case None =>
        // saturation-aware candidate tier (round 13): identical output, but
        // over-occupied band buckets enumerate through the exact prefix
        // filter
        val cand0 = if (pruned) ngramCandidatePairs(docs, sat) else candidatePairs(docs)
        ngramVerify(docs, cand0, pruned).orderBy("d1", "d2")
    }
  }

  /** Bounded-wave gram verify — [[nearDuplicatesWaved]]'s shape over the
    * [[ngramVerify]] tiers: wave w verifies the candidates whose d1 falls
    * in hash(d1) residue class w (the filter rides the band join's A side
    * and the prefix re-route's A side, so every wave exchange carries
    * ~1/waves), each wave its own materialized action. Union ≡ single
    * wave; ExtSpec pins it.
    */
  private[graft] def ngramVerifiedPairsWaved(
      docs: DataFrame,
      sat: Int,
      waves: Int,
      perWaveBytes: Long = 0L,
      budget: Option[Long] = None): DataFrame = {
    val spark = docs.sparkSession
    val key   = (docs.queryExecution.analyzed.semanticHash(), sat, waves)
    val dir = ngramWavedMemo.computeIfAbsent(
      key,
      _ => {
        // freshDirFor: the waves append — retry-after-failure must not
        // re-append the failed attempt's waves (WaveRetrySpec)
        val out =
          graft.core.WaveScratch.freshDirFor(spark, "ngram", f"${key._1}%08x-$sat-$waves")
        // once-per-campaign doc_id-bucketed gram payload: each wave's
        // verify joins scan it exchange-free (round 15 — the per-wave d2
        // re-exchange was the dominant fixed term at 5M docs)
        val gpay = graft.core.BucketedPayload.ensure(
          spark,
          "gram",
          f"${key._1}%08x",
          "doc_id",
          spark.sparkContext.defaultParallelism)(gramSets(docs))
        val tAll = System.nanoTime()
        graft.core.AdaptiveWaves.run(
          spark, "ngram", 0 until waves, waves, perWaveBytes, budget) { ws =>
          ngramVerify(
            docs, ngramCandidatePairs(docs, sat, Some((waves, ws))), pruned = true,
            payload = Some(gpay))
            .write.mode("append").parquet(out)
        }
        graft.core.BuildWalls.record("ngram_verify_waves", (System.nanoTime() - tAll) / 1e9)
        out
      }
    )
    spark.read.parquet(dir).orderBy("d1", "d2")
  }

  private val ngramWavedMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), String]()

  /** The tiered gram verify over an arbitrary candidate frame — the
    * [[ngramVerifiedPairs]] body shared verbatim by the single-wave path
    * (which appends the orderBy) and the wave loop (which materializes
    * each wave unsorted and sorts the union).
    */
  private def ngramVerify(
      docs: DataFrame,
      cand0: DataFrame,
      pruned: Boolean,
      payload: Option[DataFrame] = None): DataFrame = {
    // `payload`: a gramSets-schema frame to read the verify columns from
    // instead of the session cache — the wave loop passes the
    // once-per-campaign doc_id-bucketed table (see nearDuplicatesWaved)
    val sets = payload.getOrElse(gramSets(docs))
    val gated =
      if (pruned) {
        // HASH-FIRST topology (round 13, SetJoin.verifiedForSalts
        // precedent): the exchange that routes candidate rows to their d2
        // side used to carry the d1 side's string gram array AND hash
        // array per row — the disk term the single-node ENOSPCs died in.
        // Attach only the long-hash columns before that exchange; the
        // string arrays join after the hash tier has pruned candidates to
        // ~true-pair volume.
        val h1 = sets.select(
          col("doc_id").as("d1"), col("hg").as("h1"), col("hok").as("hok1"),
          col("gsz").as("sz1"))
        val h2 = sets.select(
          col("doc_id").as("d2"), col("hg").as("h2"), col("hok").as("hok2"),
          col("gsz").as("sz2"))
        cand0
          .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("d1"))
          .join(h1, "d1")
          .join(h2, "d2")
          .filter(
            col("sz1") * NgTNum <= col("sz2") * NgTDen &&
              col("sz2") * NgTNum <= col("sz1") * NgTDen
          )
          .filter(
            !col("hok1") || !col("hok2") ||
              size(array_intersect(col("h1"), col("h2"))) * (NgTNum + NgTDen) >=
              (col("sz1").cast("long") + col("sz2")) * NgTNum
          )
          .select(col("d1"), col("d2"), col("sz1"), col("sz2"))
          .join(sets.select(col("doc_id").as("d1"), col("gset").as("g1")), "d1")
          .join(sets.select(col("doc_id").as("d2"), col("gset").as("g2")), "d2")
      } else {
        val s1 = sets.select(
          col("doc_id").as("d1"), col("gset").as("g1"), col("gsz").as("sz1"))
        val s2 = sets.select(
          col("doc_id").as("d2"), col("gset").as("g2"), col("gsz").as("sz2"))
        cand0.join(s1, "d1").join(s2, "d2")
      }
    gated
      .withColumn("inter", size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("sz1").cast("long") + col("sz2") - col("inter"))
      )
      .filter(col("jaccard") >= 0.3)
      .select("d1", "d2", "jaccard")
  }

  /** n-gram Jaccard near-dup: LSH band candidates verified by CHARACTER
    * 4-gram Jaccard (robust to word-boundary edits, unlike the word-shingle
    * verify of [[minhashNearDup]]). Same bucketed candidate generation;
    * the verification is per-pair array math behind the tiered prune of
    * [[ngramVerifiedPairs]], no extra shuffle.
    */
  val ngramJaccard: Q = Q(
    "q_ngram_jaccard",
    (s, dir) => ngramVerifiedPairs(Tables(s, dir).documents),
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |gsets AS (
         |  SELECT doc_id, list_distinct(
         |    list_transform(range(1, greatest(length(lower(text))-3, 0)+1),
         |                   i -> substr(lower(text), CAST(i AS INT), 4))) AS gset
         |  FROM documents)
         |SELECT d1, d2,
         |  CAST(len(list_intersect(s1.gset, s2.gset)) AS DOUBLE)
         |    / len(list_distinct(list_concat(s1.gset, s2.gset))) AS jaccard
         |FROM cand
         |JOIN gsets s1 ON s1.doc_id = d1
         |JOIN gsets s2 ON s2.doc_id = d2
         |WHERE CAST(len(list_intersect(s1.gset, s2.gset)) AS DOUBLE)
         |    / len(list_distinct(list_concat(s1.gset, s2.gset))) >= 0.3
         |ORDER BY d1, d2""".stripMargin
    )
  )

  /** Broder containment (Broder 1997, "On the resemblance and containment
    * of documents" — the SECOND of the paper's two measures, next to the
    * resemblance/Jaccard every other dedup query uses): per candidate
    * pair, |S1∩S2|/|S1| and |S1∩S2|/|S2|. Containment catches ASYMMETRIC
    * duplication that Jaccard dilutes — a short document quoted whole
    * inside a much longer one has jaccard ≈ |small|/|large| (arbitrarily
    * low) but containment ≈ 1 on the small side; exactly the
    * excerpt/quotation/boilerplate-inclusion class a training-data
    * pipeline must catch separately from whole-document near-dups.
    * Emits candidate pairs where EITHER side's containment ≥ 0.6, with
    * both directions reported.
    *
    * Scale shape: identical to [[ngramJaccard]] — the same family-shared
    * cached shingle sets and band-bucketed candidate generation (never
    * all-pairs), per-pair array math with no extra shuffle. The LSH
    * recall caveat is inherited and documented: banding is tuned for
    * resemblance, so a small-in-huge inclusion whose signature bands
    * never collide is not a candidate; production containment scans pair
    * the band index with the [[graft.ext.Winnow]] fingerprint index,
    * which q_shared_passages covers.
    */
  /** Directional-containment pairs over the band-bucketed candidates —
    * the [[containment]] query body, callable on any documents frame
    * (StressSpec feeds a constructed quote-inclusion corpus).
    */
  def containmentPairs(docs: DataFrame, tau: Double): DataFrame = {
    val sets = shingleSets(docs)
    candidatePairs(docs)
      // numbered-repartition spread before the per-pair array work (the
      // shared verify discipline — see verifiedPairs); no length prefilter
      // here: containment's two ratios are reciprocal, so one of them
      // always clears any tau < 1 on sizes alone
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("d1"))
      .join(sets.select(col("doc_id").as("d1"), col("sset").as("s1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sset").as("s2")), "d2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("c12", col("inter").cast("double") / size(col("s1")))
      .withColumn("c21", col("inter").cast("double") / size(col("s2")))
      .filter(col("c12") >= tau || col("c21") >= tau)
      .select("d1", "d2", "inter", "c12", "c21")
      .orderBy("d1", "d2")
  }

  val containment: Q = Q(
    "q_containment",
    (s, dir) => containmentPairs(Tables(s, dir).documents, 0.6),
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets)
         |SELECT d1, d2,
         |  CAST(len(list_intersect(s1.sset, s2.sset)) AS BIGINT) AS inter,
         |  CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE) / len(s1.sset) AS c12,
         |  CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE) / len(s2.sset) AS c21
         |FROM cand
         |JOIN sets s1 ON s1.doc_id = d1
         |JOIN sets s2 ON s2.doc_id = d2
         |WHERE CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE) / len(s1.sset) >= 0.6
         |   OR CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE) / len(s2.sset) >= 0.6
         |ORDER BY d1, d2""".stripMargin
    )
  )

  /** Connected components over the near-duplicate graph: each doc that
    * appears in any verified near-dup pair gets the MIN doc_id of its
    * component as `cluster_id` — the canonical "keep one per cluster" step
    * after pairwise dedup (pairs alone under-dedup: a~b and b~c must
    * collapse to ONE survivor even when a~c was never a candidate).
    *
    * Min-label propagation: every iteration each node takes the min of its
    * own label and its neighbors' labels — one join + one partial+final
    * min-aggregate per iteration, converging in graph-diameter steps
    * (near-dup components are shallow; `maxIters` caps pathological
    * chains — NOTE a cap hit before convergence returns partial labels
    * that differ from the true components/oracle, so size `maxIters`
    * above the expected diameter; the loop exits early on convergence,
    * which the fixtures reach in 2-3 steps). Labels are integers, the
    * fixpoint is partitioning- and
    * engine-independent, and the driver sees only a changed-row count per
    * iteration — the same bounded-driver-loop discipline as
    * [[graft.ext.Ivf.kmeansFit]]. The oracle computes the identical
    * fixpoint as a recursive reachability CTE (min reachable node id).
    * Edges come from [[nearDupEdges]], which pre-collapses exact-duplicate
    * texts to a representative + star so a massively-duplicated document
    * cannot inflate the edge set quadratically.
    */
  /** Edge set the cluster fixpoint consumes, with the EXACT-DUPLICATE
    * PRE-COLLAPSE defense every production dedup pipeline runs before
    * MinHash: docs are grouped by identical raw text (md5 key, so the
    * shuffle carries a 32-char hash instead of the text), LSH + Jaccard
    * verification runs over ONE representative per distinct text, and each
    * duplicate group contributes a linear rep→member STAR instead of its
    * quadratic clique. Identical text ⟹ identical shingle set ⟹ identical
    * signature, bands, and Jaccard against any third doc, so (a) a member
    * is a verified partner of exactly the docs its representative partners
    * with, and (b) same-group members are pairwise verified (jaccard 1)
    * whenever they have any shingle at all — which is precisely what the
    * star edges (gated on a non-empty shingle set) encode. Connected
    * components and min-ids over star+rep edges therefore equal those over
    * the raw pair graph — the q_dedup_clusters ORACLE still replays the
    * UNCOLLAPSED graph and stays hash-green — while the edge count drops
    * from O(Σ|group|²) to O(Σ|group| + pairs(reps)): a document duplicated
    * 100k× costs 100k star edges, not 5·10⁹ clique pairs (StressSpec
    * pins this bound on a pathological corpus). The representative list
    * rides a broadcast-size (doc_id, rep) frame; at 100 TB the md5 groupBy
    * is the same partial+final exchange as q_dedup_exact.
    */
  /** Exact-duplicate group table (raw-text md5 → representative id + copy
    * count) — a FAMILY-SHARED cache like [[shingleSets]]/[[signatures]]:
    * production dedup maintains this exact-dup index as an offline
    * artifact next to the signature index, and Bench's warm-up
    * materializes it with them so per-query timings measure the
    * steady-state probe, not the index build. The md5 key keeps the
    * shuffle at 32 chars/row regardless of document size.
    */
  private[graft] def exactGroups(docs: DataFrame): DataFrame = cached(
    docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("tkey"))
      .groupBy("tkey")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("copies"))
  )

  private[graft] def nearDupEdges(docs: DataFrame, threshold: Double): DataFrame = {
    // rep-level verified pairs: since the pre-collapse moved INTO
    // [[candidatePairs]] (family-wide), [[nearDuplicates]] already emits
    // one representative per distinct text — this function only adds the
    // member star on top. On a dup-free corpus the pair set IS the full
    // verified-pair set and no star exists.
    val repPairs = nearDuplicates(docs, threshold).select("d1", "d2")
    if (!hasExactDups(docs)) return repPairs
    val keyed   = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("tkey"))
    val members = keyed
      .join(exactGroups(docs), "tkey")
      .select(col("doc_id"), col("rep"), col("copies"))
    // identical SETLESS docs (< 3 tokens ⟹ no shingles ⟹ null jaccard)
    // are not pairwise-verified in the clique shape, so their groups get
    // no star either. Restricting the FAMILY-SHARED cached shingle table
    // to reps is a plain filter over the cache (recomputing features from
    // a (docs ⋈ reps) frame would be a different plan the CacheManager
    // can't dedup — measured: 8.5 s vs 3 s at sf0.1).
    val eligible = shingleSets(docs)
      .join(repIds(docs), "doc_id")
      .filter(size(col("sset")) > 0)
      .select(col("doc_id").as("rep"))
    val star = members
      .filter(col("copies") > 1 && col("doc_id") =!= col("rep"))
      .join(eligible, "rep")
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    repPairs.union(star)
  }

  def nearDupClusters(docs: DataFrame, threshold: Double, maxIters: Int = 10): DataFrame = {
    val pairs = nearDupEdges(docs, threshold)
    // both directions PLUS a self-loop per endpoint: min over (neighbors ∪
    // self) IS the whole propagation step, so each iteration is ONE join +
    // ONE min-aggregate (the earlier shape needed a second join to merge
    // the node's own label back in, and a third to count changed rows).
    // `min` is duplicate-insensitive, so the repeated self-loops need no
    // distinct pass. The 4 directed/self variants come from ONE explode
    // over the pair rows, NOT a 4-way union of `pairs` projections: union
    // branches are separate subtrees Catalyst does not dedup, so the
    // union form re-evaluated the whole uncached edge pipeline (LSH
    // candidate join + Jaccard verify + star build) four times while this
    // cache materialized — measured 4x this form's build time at sf0.1.
    val edgesGrain = cached(
      pairs
        .select(
          explode(
            array(
              struct(col("d1").as("src"), col("d2").as("dst")),
              struct(col("d2").as("src"), col("d1").as("dst")),
              struct(col("d1").as("src"), col("d1").as("dst")),
              struct(col("d2").as("src"), col("d2").as("dst"))
            )
          ).as("e")
        )
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    )
    // Plan truncation UNDER the cache (round 17, guide §3.3/§7.3 "very
    // large plans: planning time itself becomes the bottleneck"): the
    // cached edge frame still CARRIES the whole LSH+verify+star lineage
    // in its logical plan — the q_cluster_survivors formatted plan was
    // 21k lines — and every loop iteration re-analyzes that tree twice
    // (the stepped cache + the labelSum action). StageProbe r17: only
    // ~0.8 s of q_cluster_survivors' 3.3 s was stage wall; the rest was
    // the driver planning. The eager localCheckpoint reads the tiny
    // pair-bounded grain out of the cache once and hands the loop a
    // constant-depth LogicalRDD; the cache itself stays keyed on the
    // logical plan, so the family sharing across queries is unchanged.
    val edges = edgesGrain.localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
        .first()
        .getDecimal(0) // null on an empty graph — the null==null compare below converges it
    // Initialization IS the first propagation step: with self-loops in the
    // edge set, min(dst) per src equals min(own id, neighbor ids) — so the
    // groupBy that would otherwise seed labels with identity does one real
    // iteration's work for free (one fewer distributed round per query).
    var labels = cached(edges.groupBy(col("src").as("id")).agg(min("dst").as("label")))
    // Convergence via the label-sum fixpoint: labels only ever DECREASE
    // under min-propagation, so the (exact decimal — no int64 overflow at
    // any corpus size) sum strictly decreases on every changing iteration
    // and is stationary exactly at the fixpoint. One scalar action per
    // iteration on the already-materialized frame, no compare join.
    // (Superstep batching — two propagation rounds per materialization to
    // halve the barriers — was MEASURED and rejected: near-dup components
    // are shallow (diameter 2-3), so the mandatory overshoot round costs
    // more join work than the saved barrier: 4.3 s → 5.2 s at sf0.1.
    // It would win only on deep-chain graphs this operator never sees.)
    var prevSum: Option[java.math.BigDecimal] = Some(labelSum(labels))
    var prevCached: DataFrame                 = labels
    var it                                    = 0
    var converged                             = false
    while (it < maxIters && !converged) {
      val stepped = cached(
        edges
          .join(labels.select(col("id").as("dst"), col("label")), "dst")
          .groupBy(col("src").as("id"))
          .agg(min("label").as("label"))
      )
      val s = labelSum(stepped)
      converged = prevSum.exists { p =>
        if (p == null || s == null) p == s else p.compareTo(s) == 0
      }
      if (prevCached != null) prevCached.unpersist()
      prevCached = stepped
      labels = stepped
      prevSum = Some(s)
      it += 1
    }
    // a cap hit before convergence means PARTIAL labels that disagree with
    // the true components (and the oracle's recursive fixpoint) — fail
    // loudly rather than return silently wrong clusters
    require(
      converged,
      s"nearDupClusters did not converge in $maxIters iterations — component diameter exceeds the cap"
    )
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id")).orderBy("doc_id")
  }

  /** MinHash-estimator quality, AS a query: for every LSH candidate pair,
    * the sketch's Jaccard estimate (fraction of agreeing signature
    * components — the textbook MinHash estimator) next to the exact
    * Jaccard it estimates. Everything is deterministic — signatures replay
    * exactly in SQL — so even the ESTIMATE is hash-checked, unlike
    * engine-opaque sketches (HLL/KLL) which reduce to bound booleans.
    * This is the per-pair evidence behind the band-count tuning: with k=8
    * the estimator's σ = sqrt(J(1−J)/8) ≈ 0.17 at J=0.5.
    */
  val minhashEstimate: Q = Q(
    "q_minhash_estimate",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val sig  = signatures(docs)
      val sets = shingleSets(docs)
      val agree = (0 until K)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      candidatePairs(docs)
        // spread before the per-pair signature/array work (verifiedPairs
        // discipline): the candidate frame is byte-small and AQE would
        // coalesce the exact-Jaccard columns onto a handful of tasks
        .repartition(s.sparkContext.defaultParallelism, col("d1"))
        .join(
          sig.select(col("doc_id").as("d1") +: (0 until K).map(i => col(s"mh$i").as(s"a$i")): _*),
          "d1"
        )
        .join(
          sig.select(col("doc_id").as("d2") +: (0 until K).map(i => col(s"mh$i").as(s"b$i")): _*),
          "d2"
        )
        .join(sets.select(col("doc_id").as("d1"), col("sset").as("s1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("sset").as("s2")), "d2")
        .select(
          col("d1"),
          col("d2"),
          (agree.cast("double") / K).as("est_jaccard"),
          (size(array_intersect(col("s1"), col("s2"))).cast("double") /
            size(array_union(col("s1"), col("s2")))).as("jaccard")
        )
        .orderBy("d1", "d2")
    },
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets)
         |SELECT d1, d2,
         |  CAST(${(0 until K).map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")} AS DOUBLE) / $K AS est_jaccard,
         |  CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
         |    / len(list_distinct(list_concat(s1.sset, s2.sset))) AS jaccard
         |FROM cand
         |JOIN sig a ON a.doc_id = d1
         |JOIN sig b ON b.doc_id = d2
         |JOIN sets s1 ON s1.doc_id = d1
         |JOIN sets s2 ON s2.doc_id = d2
         |ORDER BY d1, d2""".stripMargin
    )
  )

  /** Edit-distance near-dup tier: the same bucketed LSH candidates verified
    * by RELATIVE Levenshtein distance (dist / max(len)) — the
    * character-level verifier that catches reorder-free edits shingle
    * Jaccard underweights. Both engines implement the classic DP edit
    * distance, so dist is exactly equal cross-engine ON ASCII TEXT — which
    * the fixtures are (verified octet_length == length at all scales).
    * CAVEAT for non-ASCII corpora: Spark edits CODE POINTS while DuckDB's
    * levenshtein edits UTF-8 BYTES ('ä'→'b' is distance 1 vs 2), so this
    * oracle is only valid for single-byte text; a multilingual deployment
    * would normalize or use a code-point-consistent verifier. The ratio is
    * one IEEE division of equal ints. Cost is O(len²) per CANDIDATE pair —
    * bounded by the band join's output, never all-pairs, which is what
    * keeps a quadratic verifier viable at 100 TB (τ=0.4 keeps 25/31
    * candidates at sf0.01 — the threshold does real filtering work and no
    * fixture pair sits near the boundary).
    */
  val editNearDup: Q = Q(
    "q_edit_neardup",
    (s, dir) => {
      val docs  = Tables(s, dir).documents
      val texts = docs.select(col("doc_id"), col("text"))
      // rel <= 0.4 with integer dist is EXACTLY dist <= (4*maxlen) div 10,
      // so the banded/early-abandon Levenshtein (threshold variant —
      // O(len*bound) instead of O(len^2), returning -1 beyond the bound)
      // computes the same kept set with the same exact distances; the -1
      // sentinel rows are the pairs the unbounded version would have
      // filtered on rel. The double filter is kept for the emitted rel.
      candidatePairs(docs)
        // spread before the O(len²) per-pair verify (the minhashEstimate
        // discipline): the candidate frame is byte-small, so AQE coalesces
        // it onto a handful of tasks and the banded Levenshtein then runs
        // nearly serial (measured r17: 0.57 → 2.28 s when the family
        // caches narrowed under AQE). A user-NUMBERED repartition is
        // exempt from coalescing; keying by d1 lets the first text join
        // reuse the exchange.
        .repartition(s.sparkContext.defaultParallelism, col("d1"))
        .join(texts.select(col("doc_id").as("d1"), col("text").as("t1")), "d1")
        .join(texts.select(col("doc_id").as("d2"), col("text").as("t2")), "d2")
        .withColumn(
          "bound",
          expr("CAST((greatest(length(t1), length(t2)) * 4L) div 10L AS INT)")
        )
        .withColumn("dist", expr("levenshtein(t1, t2, bound)").cast("long"))
        .filter(col("dist") >= 0L)
        .withColumn(
          "rel",
          col("dist").cast("double") / greatest(length(col("t1")), length(col("t2")))
        )
        .filter(col("rel") <= 0.4)
        .select("d1", "d2", "dist", "rel")
        .orderBy("d1", "d2")
    },
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand)
         |SELECT d1, d2,
         |  CAST(levenshtein(t1.text, t2.text) AS BIGINT) AS dist,
         |  CAST(levenshtein(t1.text, t2.text) AS DOUBLE)
         |    / greatest(length(t1.text), length(t2.text)) AS rel
         |FROM cand
         |JOIN documents t1 ON t1.doc_id = d1
         |JOIN documents t2 ON t2.doc_id = d2
         |WHERE CAST(levenshtein(t1.text, t2.text) AS DOUBLE)
         |    / greatest(length(t1.text), length(t2.text)) <= 0.4
         |ORDER BY d1, d2""".stripMargin
    )
  )

  /** Near-dup clusters as a registered query; the oracle replays the
    * fixpoint as recursive reachability (min reachable node) over the same
    * verified pair set.
    */
  val dedupClusters: Q = Q(
    "q_dedup_clusters",
    (s, dir) => nearDupClusters(Tables(s, dir).documents, 0.2),
    Some(
      s"""WITH RECURSIVE sig AS ($sqlSig),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets),
         |pairs AS (${sqlPairs(0.2)}),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2, d1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
         |SELECT id AS doc_id, MIN(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
    )
  )

  /** Keep-best-per-cluster survivor selection — the step AFTER clustering
    * that every production dedup actually ships: within each near-dup
    * cluster keep the highest-QUALITY member (here: longest text by
    * n_chars, ties to the smallest doc_id), not the arbitrary min-id the
    * cluster label happens to use. SemDeDup-style pipelines (Abbas et al.
    * 2023 — public method) keep one representative per semantic cluster
    * by exactly this kind of scoring rule; min-id keeps whichever copy
    * was ingested first, which for truncated/expanded near-dups is often
    * the WORST copy. Docs in no cluster are their own singleton and
    * survive trivially.
    *
    * Scale shape: the cluster labels come from [[nearDupClusters]]
    * (pair-bounded fixpoint); the full-corpus attach is one left join on
    * doc_id; the survivor per cluster is a partial+final
    * `max(struct(n_chars, -doc_id))` aggregate — a hot 100k-member
    * cluster collapses map-side, never through a single window task —
    * joined back on the same cluster_id exchange.
    */
  val clusterSurvivors: Q = Q(
    "q_cluster_survivors",
    (s, dir) => {
      val docs   = Tables(s, dir).documents
      val labels = nearDupClusters(docs, 0.2)
      val full = docs
        .select(col("doc_id"), col("n_chars"))
        .join(labels, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val surv = full
        .groupBy("cluster_id")
        .agg(
          max(struct(col("n_chars").as("nc"), (-col("doc_id")).as("nid"))).as("best"),
          count(lit(1)).as("n_members")
        )
        .select(
          col("cluster_id"),
          (-col("best.nid")).as("survivor_id"),
          col("n_members")
        )
      full
        .join(surv, "cluster_id")
        .withColumn("keep", when(col("doc_id") === col("survivor_id"), 1).otherwise(0))
        .select("doc_id", "cluster_id", "survivor_id", "n_members", "keep")
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE sig AS ($sqlSig),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets),
         |pairs AS (${sqlPairs(0.2)}),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2, d1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |f AS (
         |  SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id, d.n_chars
         |  FROM documents d LEFT JOIN lab USING (doc_id)),
         |surv AS (
         |  SELECT cluster_id, doc_id AS survivor_id, n_in AS n_members FROM (
         |    SELECT cluster_id, doc_id, COUNT(*) OVER (PARTITION BY cluster_id) AS n_in,
         |      ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM f) WHERE rn = 1)
         |SELECT f.doc_id, f.cluster_id, surv.survivor_id, surv.n_members,
         |  CASE WHEN f.doc_id = surv.survivor_id THEN 1 ELSE 0 END AS keep
         |FROM f JOIN surv USING (cluster_id)
         |ORDER BY f.doc_id""".stripMargin
    )
  )

  /** Incremental ingest gate over the fixture: docs with id >= 400 are "the
    * new batch", everything below is the seen corpus.
    */
  val dedupIncremental: Q = Q(
    "q_dedup_incremental",
    (s, dir) =>
      incrementalNearDups(Tables(s, dir).documents, col("doc_id") >= 400, 0.2)
        .orderBy("new_id"),
    Some(
      s"""WITH sig AS ($sqlSig),
         |bands AS ($sqlBands),
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_id, s.doc_id AS seen_id
         |  FROM bands n JOIN bands s
         |    ON n.band_id = s.band_id AND n.band_val = s.band_val
         |   AND n.doc_id >= 400 AND s.doc_id < 400),
         |sets AS ($sqlSets),
         |scored AS (
         |  SELECT new_id, seen_id AS dup_of,
         |    CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
         |      / len(list_distinct(list_concat(s1.sset, s2.sset))) AS jaccard
         |  FROM cand
         |  JOIN sets s1 ON s1.doc_id = new_id
         |  JOIN sets s2 ON s2.doc_id = seen_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY new_id
         |                               ORDER BY jaccard DESC, dup_of) AS rn
         |  FROM scored WHERE jaccard >= 0.2)
         |SELECT new_id, dup_of, jaccard FROM ranked WHERE rn = 1
         |ORDER BY new_id""".stripMargin
    )
  )

  /** Dedup ROI audit — the headline metric a dedup pipeline reports
    * before anyone green-lights the storage/compute spend: total docs,
    * unique texts, duplicate rows, corpus characters, and characters
    * saved by keep-one-per-fingerprint (CHARACTER counts from `n_chars`,
    * not UTF-8 octets — for non-ASCII text the byte savings are larger;
    * the columns are named `chars_*` to say exactly what they measure).
    * One fingerprint aggregate (the same [[graft.queries.Fingerprint]]
    * as q_dedup_exact, so the two can't diverge) reaggregated to a
    * single row. The fingerprint NORMALIZES whitespace/case, so group
    * members can differ in n_chars: chars are the true per-group sum,
    * and the kept chars are the arg-min-doc_id survivor's (exactly the
    * row q_dedup_exact keeps) — saved = Σ(group chars − survivor chars).
    * All exact integers; at 100 TB this is the same one partial+final
    * exchange as the dedup itself.
    */
  val dedupStats: Q = Q(
    "q_bytes_saved",
    (s, dir) =>
      Tables(s, dir).documents
        .groupBy(graft.queries.Fingerprint.of(col("text")).as("fp"))
        .agg(
          count(lit(1)).as("copies"),
          // the Fingerprint is whitespace/case-NORMALIZED, so group
          // members can differ in n_chars — chars must be the true sum,
          // and the kept chars the arg-min-doc_id row's (the survivor
          // q_dedup_exact actually keeps), not min(n_chars)
          sum("n_chars").as("grp_chars"),
          min(struct(col("doc_id"), col("n_chars"))).getField("n_chars").as("kept_chars")
        )
        .agg(
          sum("copies").as("n_docs"),
          count(lit(1)).as("n_unique"),
          sum(col("copies") - 1).as("dup_docs"),
          sum(col("grp_chars")).as("chars_total"),
          sum(col("grp_chars") - col("kept_chars")).as("chars_saved")
        ),
    Some(
      s"""WITH g AS (
         |  SELECT ${graft.queries.Fingerprint.sql} AS fp,
         |    COUNT(*) AS copies,
         |    CAST(SUM(n_chars) AS BIGINT) AS grp_chars,
         |    arg_min(n_chars, doc_id) AS kept_chars
         |  FROM documents GROUP BY 1)
         |SELECT CAST(SUM(copies) AS BIGINT) AS n_docs,
         |  COUNT(*) AS n_unique,
         |  CAST(SUM(copies - 1) AS BIGINT) AS dup_docs,
         |  CAST(SUM(grp_chars) AS BIGINT) AS chars_total,
         |  CAST(SUM(grp_chars - kept_chars) AS BIGINT) AS chars_saved
         |FROM g""".stripMargin
    )
  )

  /** Degree distribution of the LSH candidate graph — the graph-shape
    * audit run before the [[nearDupClusters]] fixpoint: how many
    * candidate partners each document has (undirected degree over the
    * band-join pair set) histogrammed into (degree → n_docs). A heavy
    * tail here is what predicts slow cluster convergence and band-key
    * skew, the same way q_heavy_hitters predicts join skew. Reuses the
    * cached signature/band tables (no extra corpus scan); two tiny
    * aggregates over the pair-bounded candidate set.
    */
  val graphDegree: Q = Q(
    "q_graph_degree",
    (s, dir) => {
      val cand = candidatePairs(Tables(s, dir).documents)
      cand
        .select(col("d1").as("doc_id"))
        .union(cand.select(col("d2").as("doc_id")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("degree"))
        .groupBy("degree")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("degree")
    },
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |deg AS (
         |  SELECT doc_id, COUNT(*) AS degree FROM (
         |    SELECT d1 AS doc_id FROM cand UNION ALL SELECT d2 FROM cand)
         |  GROUP BY 1)
         |SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY 1 ORDER BY 1""".stripMargin
    )
  )

  /** Cross-source near-dup overlap matrix — the provenance contamination
    * audit ("how much of source A is already in source B") run before
    * mixing corpora: verified near-dup pairs (same bucketed candidates +
    * exact-Jaccard tier as q_minhash_neardup) tagged with each side's
    * `source` and counted per UNORDERED source pair (least/greatest
    * canonicalization, so (web,books) and (books,web) are one cell).
    *
    * EXACT-DUPLICATE EXPANSION BY COUNTING: a document copied verbatim
    * across two sources is exactly what this matrix exists to measure, and
    * the rep-level pre-collapse would fold it into one representative (one
    * source). Instead of re-materializing member pairs (quadratic for a
    * hot group), the member grain enters as MULTIPLICITIES — per-group
    * per-source member counts c(g, s), a |groups|·|sources|-bounded
    * aggregate:
    *   - cross-group rep pair (g1, g2): cell (s1, s2) gains c(g1,s1)·c(g2,s2)
    *     — the rep pair joins the count table twice, fan-out |sources|² per
    *     pair, never |members|²;
    *   - within an eligible group (rep has ≥ 1 shingle — the banding
    *     eligibility of the uncollapsed pipeline): same-source pairs are
    *     C(c,2), cross-source pairs c(g,sa)·c(g,sb) via a |sources|-wide
    *     self-join per group. All Jaccard-1.0 exact copies, ≥ any threshold.
    * Pure integer products/sums — identical to brute-force pair counting,
    * which the UNCOLLAPSED oracle (`sqlSig` over all docs) verifies from
    * first principles. On a dup-free corpus every c = 1: the within
    * branches are empty and cross products are all 1 — the plain matrix.
    * The split-boundary analog is q_contamination.
    */
  val sourceOverlap: Q = Q(
    "q_source_overlap",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      // per-group per-source member counts — the ONE documents scan, with
      // `source` riding the member projection
      val gs = graft.core.Cached.frame(
        members(docs, col("source"))
          .groupBy("rep", "source")
          .agg(count(lit(1)).as("cnt"))
      )
      val cross = nearDuplicates(docs, 0.2)
        .select("d1", "d2")
        .join(gs.select(col("rep").as("d1"), col("source").as("src1"), col("cnt").as("c1")), "d1")
        .join(gs.select(col("rep").as("d2"), col("source").as("src2"), col("cnt").as("c2")), "d2")
        .select(
          least(col("src1"), col("src2")).as("source_a"),
          greatest(col("src1"), col("src2")).as("source_b"),
          (col("c1") * col("c2")).as("n")
        )
      val gsElig = gs.join(eligibleReps(docs), "rep")
      val withinSame = gsElig
        .filter(col("cnt") >= 2)
        .select(
          col("source").as("source_a"),
          col("source").as("source_b"),
          expr("(cnt * (cnt - 1)) div 2").as("n")
        )
      val withinCross = gsElig
        .alias("a")
        .join(
          gsElig.alias("b"),
          col("a.rep") === col("b.rep") && col("a.source") < col("b.source")
        )
        .select(
          col("a.source").as("source_a"),
          col("b.source").as("source_b"),
          (col("a.cnt") * col("b.cnt")).as("n")
        )
      cross
        .union(withinSame)
        .union(withinCross)
        .groupBy("source_a", "source_b")
        .agg(sum("n").as("n_pairs"))
        .orderBy("source_a", "source_b")
    },
    Some(
      s"""WITH sig AS ($sqlSig),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets),
         |pairs AS (${sqlPairs(0.2)})
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b,
         |  COUNT(*) AS n_pairs
         |FROM pairs
         |JOIN documents a ON a.doc_id = d1
         |JOIN documents b ON b.doc_id = d2
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
  )

  /** LSH tuning audit — the one-row scorecard behind the band/row choice:
    * candidate pairs generated, pairs surviving exact-Jaccard
    * verification at the production threshold, and the resulting
    * precision (one integer division — what fraction of the quadratic
    * verify budget was well spent). Re-tune bands/rows when precision
    * sags; recall needs labeled truth and is bounded analytically in
    * ExtSpec instead. Reuses the shared cached signature/set tables, so
    * the audit adds two counts over pair-bounded sets, no corpus scan.
    */
  val lshQuality: Q = Q(
    "q_lsh_quality",
    (s, dir) => {
      val docs  = Tables(s, dir).documents
      val cand  = candidatePairs(docs).agg(count(lit(1)).as("n_candidates"))
      val pairs = nearDuplicates(docs, 0.2).agg(count(lit(1)).as("n_verified"))
      cand
        .crossJoin(pairs) // two 1-row frames
        .select(
          col("n_candidates"),
          col("n_verified"),
          // explicit NULL on an empty candidate set: Spark's non-ANSI x/0
          // is NULL but DuckDB's double 0/0 is NaN — pin the degenerate
          // case to NULL in BOTH engines
          when(
            col("n_candidates") === 0,
            lit(null).cast("double")
          ).otherwise(col("n_verified").cast("double") / col("n_candidates")).as("precision")
        )
    },
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets),
         |pairs AS (${sqlPairs(0.2)})
         |SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         |  (SELECT COUNT(*) FROM pairs) AS n_verified,
         |  CASE WHEN (SELECT COUNT(*) FROM cand) = 0 THEN NULL
         |       ELSE CAST((SELECT COUNT(*) FROM pairs) AS DOUBLE)
         |            / (SELECT COUNT(*) FROM cand) END AS precision""".stripMargin
    )
  )

  /** Candidate-pair Jaccard histogram — the threshold-TUNING audit: bucket
    * every LSH candidate pair by exact shingle Jaccard in 0.05 steps and
    * count. Reading the histogram answers "where should the near-dup
    * threshold sit on THIS corpus" (the valley between the background-noise
    * mass near 0 and the duplicate mass near 1) before committing a
    * full-corpus dedup pass to it.
    *
    * Cross-engine determinism: the bucket is the pure-integer
    * `(inter · 20) div uni` — never a double multiply whose rounding could
    * straddle a bucket edge (exact Jaccard 1.0 lands in its own bucket 20).
    *
    * Scale shape: everything derives from the band-bucketed candidate set
    * (pair-bounded, never all-pairs) and the cached shingle-set table the
    * whole dedup family shares; the histogram itself is a ≤ 21-row
    * partial+final aggregate.
    */
  val jaccardHistogram: Q = Q(
    "q_jaccard_histogram",
    (s, dir) =>
      nearDuplicates(Tables(s, dir).documents, 0.0)
        .withColumn("bucket", expr("(inter * 20L) div uni"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("bucket"),
    Some(
      s"""WITH sig AS ($sqlSigRep),
         |bands AS ($sqlBands),
         |cand AS ($sqlCand),
         |sets AS ($sqlSets),
         |p AS (
         |  SELECT CAST(len(list_intersect(s1.sset, s2.sset)) AS BIGINT) AS inter,
         |         CAST(len(list_distinct(list_concat(s1.sset, s2.sset))) AS BIGINT) AS uni
         |  FROM cand
         |  JOIN sets s1 ON s1.doc_id = d1
         |  JOIN sets s2 ON s2.doc_id = d2)
         |SELECT (inter * 20) // uni AS bucket, COUNT(*) AS n_pairs
         |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin
    )
  )

  /** SoftDeDup-style duplicate downweighting (He et al. 2024, "SoftDedup:
    * an Efficient Data Reweighting Method for Speeding Up Language Model
    * Pre-training" — public method): instead of DROPPING exact duplicates,
    * keep every copy but weight it 1/copies, so each distinct text
    * contributes unit total mass to the training distribution. Emits, per
    * document, its group's copy count and the integer sampling weight
    * (ppm) a weighted sampler like q_weighted_sample then draws against.
    * On a dup-free corpus every weight is exactly 1.0 (10⁶ ppm).
    *
    * Scale shape: the copy count is the FAMILY-SHARED cached
    * [[exactGroups]] aggregate (32-char md5 keys on the shuffle, never
    * raw text), attached back to the member grain via the cached
    * [[members]] mapping on the group-unique `rep` key — a plain hash
    * join with no fan-out. Zero extra corpus scans beyond the family's
    * one.
    */
  val softDedup: Q = Q(
    "q_softdedup",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      members(docs)
        .join(exactGroups(docs).select(col("rep"), col("copies")), "rep")
        .withColumn("weight_ppm", expr("1000000L div copies"))
        .select("doc_id", "copies", "weight_ppm")
        .orderBy("doc_id")
    },
    Some(
      """WITH g AS (SELECT md5(text) AS tkey, COUNT(*) AS copies
        |           FROM documents GROUP BY 1)
        |SELECT doc_id, copies, 1000000 // copies AS weight_ppm
        |FROM documents d JOIN g ON md5(d.text) = g.tkey
        |ORDER BY doc_id""".stripMargin
    )
  )

  /** Per-SOURCE MinHash union signatures + the pairwise source-similarity
    * matrix they imply — the corpus-level companion to the per-document
    * sketch ([[minhashSig]]): each source's signature is the MinHash of the
    * UNION of all its documents' shingle sets, and component-match counts
    * between two sources estimate the Jaccard similarity of their whole
    * shingle vocabularies ("how much does src3's content universe overlap
    * src7's"), the source-curation screen run before the expensive
    * doc-level cross-source audit ([[sourceOverlap]]) is pointed anywhere.
    *
    * The scale story IS the query: `min` is associative, commutative and
    * duplicate-insensitive, so the union sketch needs NO doc-level grain,
    * no distinct, and no pre-collapse — one documents scan, per-partition
    * partial mins, and a |sources|·K final state (map-side combine absorbs
    * everything; an exact cross-source vocabulary Jaccard would cost a
    * |vocab|-sized shuffle PER PAIR). Cross-source exact duplicates — the
    * blind spot the member re-expansion fixes in [[sourceOverlap]] — are
    * naturally correct here: a copied text contributes the same shingle
    * mins to BOTH sources' sketches. The pair matrix is a self-join of a
    * |sources|-row frame: metadata at any corpus scale. Component equality
    * uses null-safe compare so a hypothetical all-short-doc source (empty
    * shingle union ⇒ null mins) pairs as 0 matches, not null.
    */
  val sourceMinhash: Q = Q(
    "q_source_minhash",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val hs = docs
        .select(col("source"), explode(shingles3(tokens(col("text")))).as("x"))
        .select(col("source"), baseHash(col("x")).as("h"))
      val mins = (0 until K).map(i => min((col("h") * A(i) + B(i)) % P).as(s"mh$i"))
      val sig  = hs.groupBy("source").agg(mins.head, mins.tail: _*)
      val matches = (0 until K)
        .map(i => when(col(s"a.mh$i") <=> col(s"b.mh$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      sig
        .alias("a")
        .join(broadcast(sig.alias("b")), col("a.source") < col("b.source"))
        .select(
          col("a.source").as("source_a"),
          col("b.source").as("source_b"),
          matches.as("matching"),
          (matches * (1000000L / K)).as("est_jaccard_ppm")
        )
        .orderBy("source_a", "source_b")
    },
    Some {
      val mh = (0 until K)
        .map(i => s"MIN((h * ${A(i)} + ${B(i)}) % $P) AS mh$i")
        .mkString(",\n    ")
      val m = (0 until K)
        .map(i => s"CASE WHEN a.mh$i IS NOT DISTINCT FROM b.mh$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH h AS (
         |  SELECT source, CAST('0x' || substr(md5(x), 1, 7) AS BIGINT) AS h
         |  FROM (
         |    SELECT source,
         |      unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
         |                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS x
         |    FROM (SELECT source, string_split(lower(text), ' ') AS t FROM documents))),
         |sig AS (
         |  SELECT source,
         |    $mh
         |  FROM h GROUP BY 1)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST($m AS BIGINT) AS matching,
         |  CAST(($m) * ${1000000L / K} AS BIGINT) AS est_jaccard_ppm
         |FROM sig a JOIN sig b ON a.source < b.source
         |ORDER BY source_a, source_b""".stripMargin
    }
  )

  val all: Seq[Q] =
    Seq(dedupExact, minhashSig, lshCandidates, minhashNearDup, minhashEstimate, ngramJaccard, editNearDup, dedupClusters, dedupIncremental, dedupStats, graphDegree, sourceOverlap, lshQuality, jaccardHistogram, softDedup, containment, clusterSurvivors, sourceMinhash)
}
