package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the shared-counts build's intrinsic volumes WITHOUT
  * materializing the pair table: capped posting count and the exact
  * candidate-pair count Σ_s df·(df−1)/2 — the numbers that size the
  * build's one unavoidable shuffle (the disk high-water of the ×1000
  * full-suite runs). Usage: runMain graft.tools.PairProbe <sfDir>
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val ex = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.ngrams(
          split(col("text"), " "), 3, distinct = true)).as("s"))
    val dfs = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= graft.analytics.Dedup.ShingleDfCap)
    val r = dfs.agg(
      sum(col("df")).as("postings"),
      sum(col("df") * (col("df") - 1) / 2).cast("long").as("pairs"),
      count(lit(1)).as("shingles")).first()
    println(s"[pair-probe] dir=$dir postings=${r.getLong(0)} " +
      s"pairs=${r.getLong(1)} shingles=${r.getLong(2)}")
    spark.stop()
  }
}
