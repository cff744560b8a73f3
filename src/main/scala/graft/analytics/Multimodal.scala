package graft.analytics

import graft.functions.Portable._
import graft.ops.MediaPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.6 — multimodal binary-column pipeline over REAL image bytes.
  *
  * Each document synthesizes a spec-conformant P6 PPM payload (geometry
  * and frame manifest derived from the text's portable polyhash); the
  * extraction stage genuinely parses the container and reads the pixel
  * plane (see [[graft.ops.PpmCodec]]). The oracle re-derives every feature
  * in closed form from the same polyhash, so the entire encode → decode →
  * aggregate path is exact-hash gated.
  */
object Multimodal {

  /** Shared oracle CTEs: per-document image spec (the encoder's inputs)
    * and the derived container/raster features (the decoder's outputs).
    * `byte_len` is the exact P6 container size — header `P6\n# frames=N\nW
    * H\n255\n` plus the 3·W·H pixel plane; `px_sum` is the closed form of
    * the encoder's byte-ramp plane sum (JVM twin:
    * [[graft.ops.PpmCodec.pxSumClosedForm]]).
    */
  private def featsCte: String = {
    val h = polyHashSql("text")
    s"""WITH spec AS (
      |  SELECT doc_id, source, $h AS hh FROM documents),
      |dims AS (
      |  SELECT doc_id, source,
      |         1 + hh % 320 AS width,
      |         1 + ((hh * 31 + 7) % $P) % 240 AS height,
      |         1 + hh % 24 AS n_frames,
      |         hh % 256 AS fill
      |  FROM spec),
      |feats AS (
      |  SELECT doc_id, source, width, height, n_frames,
      |         19 + length(CAST(n_frames AS VARCHAR))
      |            + length(CAST(width AS VARCHAR))
      |            + length(CAST(height AS VARCHAR))
      |            + 3 * width * height AS byte_len,
      |         (3 * width * height // 256) * 32640
      |         + CASE WHEN fill + (3 * width * height % 256) <= 256
      |                THEN (3 * width * height % 256) * fill
      |                     + (3 * width * height % 256) * (3 * width * height % 256 - 1) // 2
      |                ELSE (256 - fill) * fill + (256 - fill) * (255 - fill) // 2
      |                     + (3 * width * height % 256 - 256 + fill)
      |                       * (3 * width * height % 256 - 257 + fill) // 2
      |           END AS px_sum
      |  FROM dims)""".stripMargin
  }

  /** #32 mm_binary_stats: run the typed media pipeline (synthesize P6
    * payloads → batched real decode → features), then aggregate per
    * source. `total_px` witnesses the pixel plane was actually read.
    */
  def mmBinaryStats(spark: SparkSession, dir: String): DataFrame =
    MediaPipeline.features(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_objects"),
        sum(col("byte_len")).as("total_bytes"),
        round(sum(col("width")) / count(lit(1)), 4).as("avg_width"),
        round(sum(col("height")) / count(lit(1)), 4).as("avg_height"),
        max(col("n_frames")).as("max_frames"),
        sum(col("px_sum")).as("total_px"))
      .orderBy("source")

  val mmBinaryStatsSql: String =
    s"""$featsCte
      |SELECT source, count(*) AS n_objects,
      |       CAST(sum(byte_len) AS BIGINT) AS total_bytes,
      |       round(CAST(sum(width) AS BIGINT) / count(*), 4) AS avg_width,
      |       round(CAST(sum(height) AS BIGINT) / count(*), 4) AS avg_height,
      |       max(n_frames) AS max_frames,
      |       CAST(sum(px_sum) AS BIGINT) AS total_px
      |FROM feats GROUP BY source ORDER BY source""".stripMargin

  /** #36 mm_frame_sample: per-object frame sampling — every 4th frame of
    * each payload's decoded frame manifest becomes a row with a
    * deterministic frame signature; the explode runs distributed after the
    * batched decode stage, exactly how a real frame extractor fans out.
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    MediaPipeline.features(spark, dir)
      .select(col("doc_id"), col("source"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("source"), lit("#"), col("doc_id").cast("string"),
          lit("#"), col("frame_idx").cast("string"))).as("frame_sig"))
      .orderBy("doc_id", "frame_idx")

  val mmFrameSampleSql: String =
    s"""$featsCte,
      |frames AS (
      |  SELECT doc_id, source, unnest(range(n_frames)) AS frame_idx FROM feats)
      |SELECT doc_id, frame_idx,
      |       md5(source || '#' || CAST(doc_id AS VARCHAR) || '#' || CAST(frame_idx AS VARCHAR)) AS frame_sig
      |FROM frames WHERE frame_idx % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** #48 mm_resize: the resize stage — every object's decoded dimensions
    * fitted into 128×128 (aspect preserved, never upscaled) in exact
    * integer math through the typed pipeline; see
    * [[graft.ops.MediaPipeline.planResize]].
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    MediaPipeline.planResize(
      MediaPipeline.features(spark, dir).as[MediaPipeline.MediaFeatures])
      .toDF()
      .orderBy("doc_id")
  }

  val mmResizeSql: String =
    s"""$featsCte
      |SELECT doc_id, width, height,
      |       CASE WHEN width <= 128 AND height <= 128 THEN width
      |            WHEN width >= height THEN 128
      |            ELSE greatest(1, (width * 128) // height) END AS out_w,
      |       CASE WHEN width <= 128 AND height <= 128 THEN height
      |            WHEN width >= height THEN greatest(1, (height * 128) // width)
      |            ELSE 128 END AS out_h,
      |       CAST(NOT (width <= 128 AND height <= 128) AS INT) AS scaled
      |FROM feats ORDER BY doc_id""".stripMargin

  /** #126 mm_fingerprint: DECODED-content fingerprint + duplicate-group
    * stats — the multimodal dedup primitive. The fingerprint folds the
    * decoder's outputs (container size, geometry, frame count, pixel-plane
    * sum — the witnesses the raster was actually read), NOT the raw bytes,
    * so byte-identical re-encodings and container-comment differences
    * collapse while any pixel-plane change separates. Groups carry the
    * keeper (min doc_id, the standard dedup-survivor rule) and member
    * count; downstream drops `n_copies > 1` members ≠ keeper exactly like
    * `dedup_exact` over text.
    *
    * All fold inputs are < P, so every intermediate product stays within
    * Long in BOTH engines — the fingerprint is exact integer math on the
    * closed-form features the oracle re-derives. Scale shape: the decode
    * runs once per dataset (zone-backed [[MediaPipeline.features]]);
    * this query is one hash-agg on the five-feature key — map-side
    * combined, output ∝ distinct images.
    */
  def mmFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.functions.Portable.P
    val seed = graft.functions.Portable.Seed
    val fold = Seq("byte_len", "px_sum", "width", "height", "n_frames")
      .foldLeft(lit(seed)) { (acc, c) => (acc * 31L + col(c)) % p }
    MediaPipeline.features(spark, dir)
      .groupBy("byte_len", "width", "height", "n_frames", "px_sum")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .withColumn("fingerprint", fold)
      .select("fingerprint", "keeper", "n_copies", "byte_len", "width",
        "height", "n_frames", "px_sum")
      .orderBy("keeper")
  }

  val mmFingerprintSql: String = {
    val p = graft.functions.Portable.P
    val seed = graft.functions.Portable.Seed
    val fold = Seq("byte_len", "px_sum", "width", "height", "n_frames")
      .foldLeft(s"$seed") { (acc, c) => s"(($acc) * 31 + $c) % $p" }
    s"""$featsCte
      |SELECT $fold AS fingerprint,
      |       min(doc_id) AS keeper, count(*) AS n_copies,
      |       byte_len, width, height, n_frames, px_sum
      |FROM feats
      |GROUP BY byte_len, width, height, n_frames, px_sum
      |ORDER BY keeper""".stripMargin
  }
}
