package graft.analytics

import graft.functions.Portable._
import graft.ops.MediaPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.6 — multimodal binary-column statistics. */
object Multimodal {

  /** #32 mm_binary_stats: run the typed media pipeline (binary payloads →
    * batched stub decode → features), then aggregate per source. The
    * decode stub's arithmetic is mirrored in the oracle SQL, so the whole
    * mapPartitions stage is exact-hash gated.
    */
  def mmBinaryStats(spark: SparkSession, dir: String): DataFrame = {
    val feats = MediaPipeline.extractFeatures(MediaPipeline.asMedia(spark, dir))
    feats.toDF()
      .groupBy("source")
      .agg(count(lit(1)).as("n_objects"),
        sum(col("byte_len")).as("total_bytes"),
        round(sum(col("width")) / count(lit(1)), 4).as("avg_width"),
        round(sum(col("height")) / count(lit(1)), 4).as("avg_height"),
        max(col("n_frames")).as("max_frames"))
      .orderBy("source")
  }

  /** #36 mm_frame_sample: per-object frame sampling — every 4th frame of
    * each (stub-decoded) video payload becomes a row with a deterministic
    * frame signature; the explode runs distributed after the batched
    * decode stage, exactly how a real frame extractor fans out work.
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val feats = MediaPipeline.extractFeatures(MediaPipeline.asMedia(spark, dir))
    feats.toDF()
      .select(col("doc_id"), col("source"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("source"), lit("#"), col("doc_id").cast("string"),
          lit("#"), col("frame_idx").cast("string"))).as("frame_sig"))
      .orderBy("doc_id", "frame_idx")
  }

  val mmFrameSampleSql: String = {
    val h = polyHashSql("text")
    s"""WITH feats AS (
      |  SELECT doc_id, source, 1 + ($h) % 24 AS n_frames FROM documents),
      |frames AS (
      |  SELECT doc_id, source, unnest(range(n_frames)) AS frame_idx FROM feats)
      |SELECT doc_id, frame_idx,
      |       md5(source || '#' || CAST(doc_id AS VARCHAR) || '#' || CAST(frame_idx AS VARCHAR)) AS frame_sig
      |FROM frames WHERE frame_idx % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** #48 mm_resize: the resize stage — every object's target dimensions
    * fitted into 256×256 (aspect preserved, never upscaled) in exact
    * integer math through the typed pipeline; see
    * [[graft.ops.MediaPipeline.planResize]].
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    MediaPipeline.planResize(
      MediaPipeline.extractFeatures(MediaPipeline.asMedia(spark, dir)))
      .toDF()
      .orderBy("doc_id")
  }

  val mmResizeSql: String = {
    val h = polyHashSql("text")
    s"""WITH feats AS (
      |  SELECT doc_id,
      |         1 + ($h) % 1920 AS width,
      |         1 + (($h) * 31 + 7) % $P % 1080 AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |       CASE WHEN width <= 256 AND height <= 256 THEN width
      |            WHEN width >= height THEN 256
      |            ELSE greatest(1, (width * 256) // height) END AS out_w,
      |       CASE WHEN width <= 256 AND height <= 256 THEN height
      |            WHEN width >= height THEN greatest(1, (height * 256) // width)
      |            ELSE 256 END AS out_h,
      |       CAST(NOT (width <= 256 AND height <= 256) AS INT) AS scaled
      |FROM feats ORDER BY doc_id""".stripMargin
  }

  val mmBinaryStatsSql: String = {
    val h = polyHashSql("text")
    s"""WITH feats AS (
      |  SELECT doc_id, source, length(text) AS byte_len,
      |         1 + ($h) % 1920 AS width,
      |         1 + (($h) * 31 + 7) % $P % 1080 AS height,
      |         1 + ($h) % 24 AS n_frames
      |  FROM documents)
      |SELECT source, count(*) AS n_objects,
      |       CAST(sum(byte_len) AS BIGINT) AS total_bytes,
      |       round(CAST(sum(width) AS BIGINT) / count(*), 4) AS avg_width,
      |       round(CAST(sum(height) AS BIGINT) / count(*), 4) AS avg_height,
      |       max(n_frames) AS max_frames
      |FROM feats GROUP BY source ORDER BY source""".stripMargin
  }
}
