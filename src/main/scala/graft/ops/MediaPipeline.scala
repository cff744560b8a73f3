package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY §2.6): image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata alongside; feature
  * extraction runs as a batched per-partition stage over a typed Dataset
  * — the Spark-side contract (schema, encoders, partition-level batching,
  * no driver involvement) is exactly what a real decoder needs, while the
  * decode itself is a deterministic stub (this container ships no
  * image/audio codecs).
  */
object MediaPipeline {

  /** A carried media object: opaque payload + typed envelope. */
  case class MediaRecord(doc_id: Long, source: String, payload: Array[Byte])

  /** Decoder output: per-object features a real codec would produce. */
  case class MediaFeatures(doc_id: Long, source: String, byte_len: Long,
                           width: Long, height: Long, n_frames: Long)

  /** STUB DECODER — stands in for e.g. a JPEG/ffmpeg decode. Deterministic
    * pure function of the payload bytes (a portable polynomial hash drives
    * the fake dimensions) so the pipeline is testable end-to-end; swap the
    * body for a real codec call without touching any Spark plumbing.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val h = payload.foldLeft(Portable.Seed)((acc, b) =>
      (acc * 31L + (b & 0xff).toLong) % Portable.P)
    (1L + h % 1920L, 1L + (h * 31L + 7L) % Portable.P % 1080L, 1L + h % 24L)
  }

  /** The batched extraction stage: one decoder invocation stream per
    * partition (where a real implementation amortizes codec init /
    * native-buffer reuse across the batch), never a per-row UDF call and
    * never a `collect()`.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // real decoders initialize their native context once per batch here
      batch.map { m =>
        val (w, hgt, fr) = decodeStub(m.payload)
        MediaFeatures(m.doc_id, m.source, m.payload.length.toLong, w, hgt, fr)
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
  def planResize(feats: Dataset[MediaFeatures], box: Long = 256L): Dataset[ResizePlan] = {
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

  /** Load the `documents` table as a media carrier: `text` re-cast to an
    * opaque binary payload (the synthetic corpus is ASCII, so payload
    * bytes == polyhash input chars, which the oracle reproduces in SQL).
    */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }
}
