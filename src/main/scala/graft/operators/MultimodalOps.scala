package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.F).
  *
  * Media decode libraries are not available in this container, so the
  * DECODE step is a deterministic stub — but everything Spark-side is
  * real and tested: binary columns as opaque payloads with typed
  * metadata, deterministic frame-sampling plans, and batched
  * mapPartitions feature extraction shaped exactly like a model-server
  * call (fixed-size batches amortizing per-call overhead).
  *
  * At 100 TB: binary payloads ride in parquet as BYTE_ARRAY; metadata
  * extraction is a narrow projection; feature extraction is a
  * mapPartitions stage whose parallelism is the scan's partitioning —
  * no shuffle anywhere in this module.
  */
object MultimodalOps {

  /** Deterministic fake media payload: the document text's UTF-8 bytes
    * standing in for image/audio bytes. */
  private def payload = col("text").cast("binary")

  // ---------------------------------------------------------------- F1
  /** Binary column + typed metadata: byte length, content digest,
    * leading-bytes "magic", derived frame count. */
  def mmMeta(spark: SparkSession, sfDir: String): DataFrame = {
    // metadata only in the comparable output — the opaque payload
    // itself stays a plan-side binary column (exercised in specs);
    // emitting raw BLOBs into the oracle compare invites
    // representation skew for zero value
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      octet_length(payload).as("n_bytes"),
      md5(payload).as("digest"),
      upper(hex(substring(payload, 1, 4))).as("magic"),
      (col("n_chars") / 10).cast("int").as("n_frames"))
  }

  // Oracle stays at VARCHAR level (DuckDB 1.0 lacks blob md5/substring);
  // the corpus is ASCII so bytes == chars.
  val mmMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS digest,
      |  upper(hex(encode(substring(text, 1, 4)))) AS magic,
      |  CAST(n_chars // 10 AS INT) AS n_frames
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- F2
  /** Deterministic frame sampling: every 10th frame index of each
    * media item, exploded to one row per sampled frame — the plan
    * shape for "pull frames out of videos" at scale (explode is
    * pipelined, no shuffle). */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("n_chars") / 10).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(10))).as("frame_idx"))
      .withColumn("frame_key",
        concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string")))
  }

  val mmFrameSampleSql: String =
    """SELECT doc_id, n_frames, frame_idx,
      |  doc_id || ':' || frame_idx AS frame_key
      |FROM (
      |  SELECT doc_id, CAST(n_chars // 10 AS INT) AS n_frames,
      |    unnest(range(0, CAST(n_chars // 10 AS INT), 10)) AS frame_idx
      |  FROM documents WHERE n_chars // 10 > 0)""".stripMargin

  // ---------------------------------------------------------------- F3
  /** Batched feature extraction over binary payloads via mapPartitions:
    * the decode/model step is the deterministic `fakeDecode` stub (???
    * replaced by a real decoder in production), but the batching
    * structure — accumulate `batchSize` payloads, one "model call" per
    * batch — is the real plumbing a GPU/model-server stage needs. */
  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class FeatureRow(doc_id: Long, features: Array[Float], batch_id: Long)

  /** STUB decode: real implementation would decode image/audio bytes;
    * here: deterministic byte statistics standing in for an embedding. */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  def extractFeatures(media: Dataset[MediaRow], batchSize: Int): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      var batchId = -1L
      it.grouped(batchSize).flatMap { batch =>
        batchId += 1
        // one simulated model call per batch
        batch.map(r => FeatureRow(r.doc_id, fakeDecode(r.media), batchId))
      }
    }
  }

  def mediaDataset(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), payload.as("media")).as[MediaRow]
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> mmMeta _,
    "mm_frame_sample" -> mmFrameSample _
  )

  def oracleSql: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql
  )
}
