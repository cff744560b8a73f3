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
