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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads via
    * the `nanosAsLong` escape hatch. We keep it as an epoch-nanos long —
    * event-time math stays exact integer arithmetic (and matches the
    * DuckDB oracle bit-for-bit).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
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
