package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange source/sink surface beyond parquet (SURVEY §2.1, spec row).
  *
  * The engine's native storage is parquet (columnar, footer stats,
  * predicate pushdown — see `ops/Layout`), but a metadata engine lives in
  * a pipeline: ORC for warehouse interchange, CSV/JSONL for export and
  * operator-facing dumps. Reference equivalent: clueso's Spark session
  * reads/writes only parquet on S3A
  * (`/root/reference/src/main/scala/com/scality/clueso/MetadataStorage
  * .scala`-adjacent paths); this widens the same DataFrame surface to the
  * formats Spark ships built-in.
  *
  * Scale rules encoded here, not left to callers:
  *  - **Schema is always pinned on read.** CSV/JSON schema inference is a
  *    full extra pass over the data (at 100 TB: a second 100 TB scan) and
  *    can silently widen types between runs; every reader takes an
  *    explicit [[StructType]].
  *  - **Malformed rows quarantine, not crash.** Readers run PERMISSIVE
  *    with a `_corrupt` capture column so one bad export line doesn't
  *    kill a multi-hour job, and [[corruptRows]] surfaces the quarantine
  *    for auditing (the same garbage-tolerance posture as
  *    `ingest/EventParser`).
  *  - **ORC keeps pushdown.** ORC carries file/stripe min-max stats like
  *    parquet; `FormatsSpec` asserts a key predicate reaches the ORC scan
  *    as a pushed filter, so switching interchange format doesn't
  *    silently turn range scans into full scans.
  */
object Formats {

  /** Column capturing unparseable source lines in [[readCsv]]/[[readJsonl]]. */
  val CorruptCol = "_corrupt"

  // ------------------------------------------------------------- ORC
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ------------------------------------------------------------- CSV
  /** Header + explicit quoting/escape; gzip shards (text formats only
    * ship the hadoop codecs — no zstd, unlike parquet/ORC). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip")
      .csv(path)

  /** PERMISSIVE read against a pinned schema; malformed lines land in
    * [[CorruptCol]] instead of failing the job (or, worse, being dropped
    * silently — DROPMALFORMED — where row counts drift unobserved).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, "string"))
      .csv(path)

  // ----------------------------------------------------------- JSONL
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, "string"))
      .json(path)

  /** Is this frame already a materialized (checkpointed) scan? Both view
    * helpers use this so a caller following the one-checkpoint-for-both-
    * views pattern (`val ck = df.localCheckpoint(); corruptRows(ck);
    * cleanRows(ck)`) is never checkpointed a second time.
    */
  private def isMaterialized(df: DataFrame): Boolean =
    df.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD]

  /** The quarantined lines of a PERMISSIVE read (for audit/replay).
    *
    * Spark refuses a raw-file scan whose referenced columns are ONLY the
    * corrupt-record capture (`QUERY_ONLY_CORRUPT_RECORD_COLUMN`) — the
    * parse must be materialized first. `localCheckpoint` is that
    * materialization with a SELF-MANAGED lifetime: unlike `cache()` (which
    * a caller had to remember to `unpersist()`, and a long-running audit
    * service would otherwise accumulate full-table parse results in
    * executor storage), the checkpoint's blocks are reaped by the
    * ContextCleaner as soon as the returned frame is unreferenced.
    *
    * The checkpoint is LAZY (`eager = false`): building this view costs
    * nothing until it is consumed, and a pre-checkpointed input is used
    * as-is. An audit that wants the corrupt AND clean views off ONE parse
    * checkpoints once itself (`val ck = df.localCheckpoint()`) and passes
    * `ck` to both this and [[cleanRows]] — one table scan total.
    */
  def corruptRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val base = if (isMaterialized(df)) df else df.localCheckpoint(eager = false)
    base.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
  }

  /** Parquet read that survives corrupt/truncated files: at 100 TB and
    * billions of objects, a handful of bad files is a WHEN, not an IF,
    * and the default behavior (fail the whole multi-hour scan on one bad
    * footer) is operationally wrong for batch analytics. Scoped to this
    * read (an option, not a session conf) so correctness-critical paths
    * keep failing loudly. Skipped files surface in Spark's scan metrics;
    * callers needing an audit should reconcile row counts upstream.
    */
  def readParquetLenient(spark: SparkSession, path: String): DataFrame =
    spark.read.option("ignoreCorruptFiles", "true").parquet(path)

  /** Rows that parsed cleanly, with the capture column dropped.
    *
    * Caveat (same Spark restriction as [[corruptRows]]): a bare
    * `count()` on this frame prunes every data column, leaving only the
    * corrupt-record reference, which Spark rejects on raw JSON/CSV scans
    * — count a data column (`agg(count(col))`) or cache first. Any real
    * consumption that reads data columns is unaffected.
    *
    * One-checkpoint-for-both-views: an audit that also wants
    * [[corruptRows]] should checkpoint the parse once
    * (`val ck = df.localCheckpoint()`) and pass `ck` to both helpers —
    * this view adds no materialization of its own, so the shared
    * checkpoint is the single table scan behind both.
    */
  def cleanRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)
  }
}
