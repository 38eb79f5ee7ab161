package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages as per-partition batch transforms.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`): it fabricates plausible
  * metadata purely from the bytes. Everything around it — the schema, the
  * Dataset encoders, the mapPartitions batch shape (one reusable
  * MessageDigest per partition, streaming iterator, no materialization) —
  * is the real 100 TB-shaped plumbing a production decode would drop into.
  */
object Multimodal {

  /** An opaque media payload: `media` is the raw bytes (image/audio/video). */
  final case class MediaRecord(id: Long, kind: String, media: Array[Byte])

  /** Typed metadata extracted by the decode stage. */
  final case class MediaMeta(
      id: Long,
      kind: String,
      nBytes: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      sha: String
  )

  /** STUB decode: derives fake-but-deterministic dimensions from the
    * payload bytes. A real implementation would replace ONLY the
    * width/height/nFrames computation with an actual codec call; the
    * partition-batched shape stays identical.
    */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md = MessageDigest.getInstance("SHA-256") // one per partition, reused
      it.map { r =>
        md.reset()
        val sha  = md.digest(r.media).map("%02x".format(_)).mkString
        val b0   = if (r.media.nonEmpty) r.media(0) & 0xff else 0
        val b1   = if (r.media.length > 1) r.media(1) & 0xff else 0
        MediaMeta(
          id = r.id,
          kind = r.kind,
          nBytes = r.media.length.toLong,
          width = 16 + (b0 % 16) * 16,
          height = 16 + (b1 % 16) * 16,
          nFrames = if (r.kind == "video") 1 + (r.media.length % 120) else 1,
          sha = sha
        )
      }
    }
  }

  /** STUB resize: in a real pipeline this re-encodes pixels; the stub keeps
    * the batch shape (binary in → binary out, bounded memory per row).
    */
  def resizeStub(meta: Dataset[MediaMeta], maxDim: Int): Dataset[MediaMeta] = {
    import meta.sparkSession.implicits._
    meta.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      m.copy(
        width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt)
      )
    }
  }

  /** A fixed-width feature vector extracted from a media payload. */
  final case class MediaFeature(id: Long, kind: String, feature: Array[Float])

  /** STUB feature-extract: a deterministic pseudo-embedding derived from
    * the payload's sha bytes (a real pipeline would run a vision/audio
    * encoder here; the output shape — fixed-dim float vector per row,
    * batch-friendly — is exactly what [[Similarity]]/[[Ivf]] consume
    * downstream).
    */
  def featureStub(meta: Dataset[MediaMeta], dim: Int = 16): Dataset[MediaFeature] = {
    import meta.sparkSession.implicits._
    require(dim <= 32, "sha256 provides 32 bytes of stub entropy")
    meta.map { m =>
      val f = Array.tabulate(dim) { i =>
        (Integer.parseInt(m.sha.substring(2 * i, 2 * i + 2), 16) / 255.0f) - 0.5f
      }
      MediaFeature(m.id, m.kind, f)
    }
  }

  /** Frame sampling for video: every `stride`-th frame index. Declarative —
    * a sequence + filter, no UDF.
    */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta
      .filter(col("kind") === "video")
      .withColumn(
        "sampled_frames",
        filter(
          sequence(lit(0), col("nFrames") - 1),
          i => i % stride === 0
        )
      )
      .select(col("id"), col("nFrames"), col("sampled_frames"))

  /** Registered query: treat `documents.text` bytes as an opaque binary
    * payload and extract byte-level metadata — exercises the binary-column
    * path end-to-end and is SQL-checkable (octet_length / md5 exist in both
    * engines).
    */
  val multimodalMeta: Q = Q(
    "q_multimodal_meta",
    (s, dir) =>
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          md5(col("text").cast("binary")).as("fp")
        )
        .orderBy("doc_id"),
    Some(
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
    )
  )

  /** Registered query: full stub pipeline (encode text bytes → decode →
    * resize) over documents. The stub's byte arithmetic is deterministic,
    * so the DuckDB oracle replicates it exactly (fixture text is ASCII:
    * `ord(substr(text,i,1))` == byte i; identical IEEE double ops give
    * identical truncations).
    */
  val multimodalPipeline: Q = Q(
    "q_multimodal_pipeline",
    (s, dir) => {
      import s.implicits._
      val recs = Tables(s, dir).documents
        .select(col("doc_id").as("id"), lit("image").as("kind"), col("text").cast("binary").as("media"))
        .as[MediaRecord]
      resizeStub(decodeStub(recs), 64).toDF().orderBy("id")
    },
    Some(
      """SELECT id, kind, "nBytes", "width", "height", "nFrames", sha FROM (
        |  SELECT doc_id AS id, 'image' AS kind,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS "nBytes",
        |    GREATEST(1, CAST(trunc(w0 * LEAST(1.0, 64.0 / GREATEST(w0, h0))) AS INT)) AS "width",
        |    GREATEST(1, CAST(trunc(h0 * LEAST(1.0, 64.0 / GREATEST(w0, h0))) AS INT)) AS "height",
        |    1 AS "nFrames",
        |    sha256(text) AS sha
        |  FROM (
        |    SELECT *,
        |      16 + (CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END % 16) * 16 AS w0,
        |      16 + (CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END % 16) * 16 AS h0
        |    FROM documents))
        |ORDER BY id""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(multimodalMeta, multimodalPipeline)
}
