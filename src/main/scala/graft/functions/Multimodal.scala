package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** A decoded media asset: id + typed metadata + the extracted feature
  * vector. The decode itself is STUBBED (no image/audio codecs in this
  * environment) — the Spark-side contract (schema, batching, partitioning)
  * is the real deliverable. */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
    n_frames: Int, features: Array[Double])

/** Multimodal-column operators (SURVEY.md §7.3 M5): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus
  * decode / frame-sample / feature-extract plumbing.
  *
  * The corpus has no real media, so payloads are derived deterministically
  * from `documents.text` (`encode(text, 'utf-8')`) — an opaque byte stream
  * as far as every operator here is concerned. The DECODE step is a
  * deterministic fake (per-chunk byte statistics standing in for pixel
  * decoding) and is clearly marked as the stub; everything around it —
  * binary slicing, metadata structs, typed `Dataset` batching through
  * `mapPartitions` — is real and oracle-/spec-tested.
  *
  * Scale notes: media payloads dominate row size, so the operators keep
  * them un-exploded until the last step (frame sampling slices lazily via
  * `substring`, never materializing per-frame rows before the filter), and
  * the feature extractor is a `mapPartitions` pass — one iterator per
  * partition, the Scala-native equivalent of `mapInPandas` batch UDFs, no
  * per-row closure dispatch.
  */
object Multimodal {

  private val FrameBytes = 32  // fake "frame" stride in the byte stream
  private val SampleEvery = 4  // keep every 4th frame
  private val FeatureDim = 8

  /** The media table: opaque binary payload + typed metadata struct.
    * Metadata is derived (mime from the source system, byte length from the
    * payload) — the schema a real ingest would carry. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        struct(
          when(col("source").isin("src0", "src1", "src2"), "image/png")
            .when(col("source").isin("src3", "src4", "src5"), "audio/wav")
            .otherwise("video/mp4").as("mime"),
          length(encode(col("text"), "utf-8")).as("n_bytes"),
          col("lang").as("lang")).as("meta"))

  // === m01 — payload metadata ================================================

  /** Binary-column metadata scan: digest, size, leading-bytes magic — the
    * "what is in this blob" pass that runs before any decode. */
  def m01BinaryMeta(s: SparkSession, d: String): DataFrame =
    media(s, d).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("payload")).as("digest"),
      lower(hex(substring(col("payload"), 1, 8))).as("magic"))
      .orderBy(col("doc_id"))

  /** DuckDB 1.0 has no md5/substr over BLOB; the corpus text is pure ASCII
    * (verified: octet_length(encode(text)) = length(text) at every SF), so
    * the byte-level semantics are expressed losslessly on the VARCHAR. */
  val m01Sql: String =
    """SELECT doc_id,
      |  CASE WHEN source IN ('src0', 'src1', 'src2') THEN 'image/png'
      |       WHEN source IN ('src3', 'src4', 'src5') THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  length(text) AS n_bytes,
      |  md5(text) AS digest,
      |  lower(hex(encode(substr(text, 1, 8)))) AS magic
      |FROM documents ORDER BY doc_id""".stripMargin

  // === m02 — frame sampling ==================================================

  /** Frame sampling over the byte stream: 32-byte frames, every 4th kept.
    * The sequence of kept frame indexes is generated first and the payload
    * sliced per kept frame — the pre-filter frames never exist as rows. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .withColumn("frame_no", explode(expr(
        s"sequence(0, int(floor((meta.n_bytes - 1) / $FrameBytes)), $SampleEvery)")))
      .select(col("doc_id"), col("frame_no"),
        md5(substring(col("payload"), col("frame_no") * FrameBytes + 1, lit(FrameBytes)))
          .as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_no"))

  val m02Sql: String =
    s"""SELECT doc_id, frame_no,
       |  md5(substr(text, frame_no * $FrameBytes + 1, $FrameBytes)) AS frame_digest
       |FROM documents,
       |  (SELECT unnest(range(0, 100000, $SampleEvery)) AS frame_no)
       |WHERE frame_no <= floor((length(text) - 1) / $FrameBytes)
       |ORDER BY doc_id, frame_no""".stripMargin

  // === m03 — decode + feature extraction (STUBBED decode) ====================

  /** The decode stub: a real pipeline would decode pixels/samples here
    * (libpng/ffmpeg behind a batch UDF). Stand-in: mean byte value per
    * 1/FeatureDim-th slice of the payload — deterministic, shape-correct
    * (fixed-length Array[Double] per asset), and honest about being fake. */
  private[graft] def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val n = payload.length
    Array.tabulate(FeatureDim) { i =>
      val lo = i * n / FeatureDim
      val hi = math.max(lo + 1, (i + 1) * n / FeatureDim)
      var sum = 0L
      var j = lo
      while (j < hi) { sum += payload(j) & 0xff; j += 1 }
      sum.toDouble / (hi - lo)
    }
  }

  /** Typed-Dataset feature extraction: one `mapPartitions` pass (iterator
    * in, iterator out — the batch shape; swap `fakeDecodeFeatures` for a
    * real codec and nothing else changes). Rows-only oracle; determinism
    * and shape are spec-tested. */
  def m03Features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[MediaFeatures] = media(s, d)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[(Long, Array[Byte], String, Int)]
      .mapPartitions(_.map { case (id, payload, mime, nBytes) =>
        MediaFeatures(id, mime, nBytes,
          n_frames = (nBytes + FrameBytes - 1) / FrameBytes,
          features = fakeDecodeFeatures(payload))
      })
    ds.toDF()
      .select(col("doc_id"), col("mime"), col("n_frames"),
        round(expr("aggregate(features, CAST(0 AS DOUBLE), (a, v) -> a + v)"), 6)
          .as("feature_sum"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta"     -> m01BinaryMeta _,
    "m02_frame_sample"    -> m02FrameSample _,
    "m03_media_features"  -> m03Features _)

  val oracles: Map[String, String] = Map(
    "m01_binary_meta"  -> m01Sql,
    "m02_frame_sample" -> m02Sql)
}
