package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All tables are plain parquet under `{sfDir}/{name}.parquet`. Loading is
  * declarative (`spark.read.parquet`) so Catalyst gets full predicate
  * pushdown / column pruning on every query built on top.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  /** The engine's canonical event-time representation: `ts` as an
    * epoch-nanos LONG. Event-time math downstream is exact integer
    * arithmetic (`ts div 1e9` → seconds), which matches the DuckDB
    * oracle's `epoch_ns(ts)` bit-for-bit regardless of how the parquet
    * writer encoded the column.
    *
    * The loader is **physical-type-robust** — the driver has regenerated
    * testdata with different encodings across rounds (TIMESTAMP(NANOS) →
    * TIMESTAMP(MICROS, isAdjustedToUTC=false)), so we normalize by the
    * schema Spark surfaces rather than assuming one encoding:
    *  - LONG (NANOS via the `nanosAsLong` escape hatch, or already
    *    canonical, e.g. ScaleData output): kept as-is;
    *  - TIMESTAMP (LTZ, isAdjustedToUTC=true): `unix_micros * 1000`,
    *    timezone-independent;
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false): wall clock interpreted as
    *    UTC — exactly DuckDB's `epoch_ns` convention for naive timestamps.
    *    The session timezone is pinned to UTC before the NTZ→LTZ cast is
    *    analyzed so the conversion is deterministic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark, load(spark, dir, "events"))
  }

  /** [[events]] over an explicit subset of the table's data files — the
    * append-aware op-log refresh parses ONLY newly landed files
    * ([[graft.ops.DerivedZone.getAppendAware]]); same `ts` normalization
    * as the full loader so delta generations are schema-identical. */
  def eventsFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark, spark.read.parquet(files: _*))
  }

  /** Normalize an events frame's `ts` column to epoch-nanos long (see
    * [[events]]). Micros→nanos is `*1000`: exact 64-bit math, no overflow
    * until year 2262.
    */
  def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // NTZ wall clock ≡ UTC (the oracle's convention). Pin the session
        // tz so the NTZ→LTZ cast below resolves against UTC at analysis —
        // Dataset analysis is eager, so the cast's zone is fixed inside
        // this window — then restore the caller's timezone: loading a
        // table must not permanently flip later tz-dependent expressions
        // (date_format, timestamp→string casts) in a non-UTC session.
        val prevTz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
        finally spark.conf.set("spark.sql.session.timeZone", prevTz)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected LONG (epoch " +
            "nanos), TIMESTAMP, or TIMESTAMP_NTZ; testdata encoding changed?")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Snap a 2-decimal-valued double column to exact integer cents.
    *
    * The synthetic money/quantity columns are 2-decimal values stored as
    * doubles, so `x*100` always lands within ~1e-9 of an integer — far from
    * any .5 rounding tie. From here on all aggregation is exact 64-bit
    * integer math, which makes results bit-identical between Spark and the
    * DuckDB oracle (float sums are accumulation-order-dependent; `round()`
    * tie-breaking also differs between engines — integer math sidesteps
    * both).
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Deterministic second-resolution timestamp rendering (string output
    * avoids tz-awareness mismatches between Spark-written parquet and
    * DuckDB result frames).
    */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view and the `graft_*` functions, so a
    * session can drive the whole engine from plain `spark.sql(...)` — the
    * surface a SQL-only user of the reference engine lands on. Views are
    * lazy (no scan happens here) and inherit full pushdown/pruning.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    All.foreach { t =>
      val df = if (t == "events") events(spark, sfDir) else load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
    graft.functions.GraftFunctions.register(spark)
  }
}
