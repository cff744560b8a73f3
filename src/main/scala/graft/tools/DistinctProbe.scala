package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures `q_distinct_agg`'s two candidate physical shapes head-to-head
  * (VERDICT r14 #7: attribute the 126.7 s ×1000 cost — is Spark's
  * multi-distinct Expand plan actually optimal? Measured ×1000 best-of-3:
  * NO — Expand 140.3 s vs two-level 86.8 s, so the registry keeps the
  * two-level shape):
  *
  *  - **expand**: `agg(countDistinct(p), countDistinct(s), count(*))` —
  *    Catalyst's multi-distinct rewrite, ONE scan, each row fanned ×3
  *    through Expand, then the two-phase aggregate on the widened keys;
  *  - **two-level** (the registered [[graft.analytics.Relational.distinctAgg]]
  *    shape since round 15): three independent branches — `(flag,
  *    partkey)` distinct-then-count, `(flag, suppkey)` likewise, and the
  *    plain row count — joined on the 3-row flag key. THREE scans (each
  *    pruned to 2 columns), but no Expand tripling and each partial
  *    aggregate dedupes its own narrow key space map-side.
  *
  * Usage: runMain graft.tools.DistinctProbe <sfDir> [reps]
  * Prints one JSON line with best-of-reps for both shapes (attribution
  * committed in BENCH_SCALING.md).
  */
object DistinctProbe {

  /** The Expand candidate (not registered; see the head comment). */
  def expandShape(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      graft.ops.Tuning.benchWidth(graft.Bench.dirBytes(dir), cpus.toInt).toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def consume(df: DataFrame): Unit = {
      df.agg(bit_xor(xxhash64(df.columns.map(col).toIndexedSeq: _*))).collect()
      ()
    }
    // warm the scan path once, untimed
    consume(graft.Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_partkey", "l_suppkey"))
    val shapes = Seq[(String, () => DataFrame)](
      "expand" -> (() => expandShape(spark, dir)),
      "two_level" -> (() => graft.analytics.Relational.distinctAgg(spark, dir)))
    // correctness cross-check before timing: both shapes must agree
    val a = expandShape(spark, dir).collect().toSeq
    val b = graft.analytics.Relational.distinctAgg(spark, dir).collect().toSeq
    require(a == b, s"shape disagreement:\n$a\n$b")
    val timed = shapes.map { case (name, mk) =>
      var best = Double.MaxValue
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        consume(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        dt
      }
      System.err.println(f"[distinct-probe] $name best=$best%.3fs runs=${runs.mkString(",")}")
      (name, best, runs)
    }
    val js = timed.map { case (n, bst, runs) =>
      s""""$n":{"best":$bst,"runs":[${runs.mkString(",")}]}""" }.mkString(",")
    println(s"""{"probe":"distinct_agg","sf":"$dir","reps":$reps,$js}""")
    spark.stop()
  }
}
