package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}

/** Continuous metadata ingestion: journal events → parsed, filtered,
  * partitioned parquet landing zone
  * (reference: src/main/scala/com/scality/clueso/MetadataIngestionPipeline.scala:143-186).
  *
  * The transform stage is source-agnostic ([[EventParser.parse]] is a plain
  * `DataFrame => DataFrame`), so the same code serves:
  *  - a file-based journal (used here — this container has no Kafka), and
  *  - a Kafka source in production (`readStream.format("kafka")`, value
  *    cast to string) — one line changes.
  *
  * The sink partitions by `(bucket, opGroup)`: searches prune to one
  * bucket, compaction prunes to closed op-groups, and the newest op-group
  * is the only partition with in-flight appends.
  */
object IngestPipeline {

  private val rawSchema = new StructType().add("value", StringType)

  /** One JSON envelope per line under `inputDir` → landing. */
  def fileJournalStream(spark: SparkSession, inputDir: String, landingDir: String,
                        checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow(),
                        excludeBucket: String = "",
                        groupInterval: Long = 10000L): StreamingQuery = {
    val raw = spark.readStream
      .schema(rawSchema)
      .text(inputDir)
    val parsed = EventParser.parse(raw, "value", excludeBucket, groupInterval)
    parsed.writeStream
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .format("parquet")
      .partitionBy("bucket", "opGroup")
      .option("checkpointLocation", checkpointDir)
      .option("path", landingDir)
      .start()
  }

  /** Batch backfill of the same pipeline (identical transform + layout). */
  def batchIngest(spark: SparkSession, raw: DataFrame, landingDir: String,
                  excludeBucket: String = "", groupInterval: Long = 10000L): Unit = {
    EventParser.parse(raw, "value", excludeBucket, groupInterval)
      .write
      .partitionBy("bucket", "opGroup")
      .mode("append")
      .parquet(landingDir)
  }
}
