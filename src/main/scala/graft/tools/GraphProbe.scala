package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnosis for the kNN-graph build at a scale point: code
  * counts, cell-size distribution under the cap (is the similarity-aware
  * split actually bounding cells?), raw vs distinct pair volume, and
  * per-stage wall — the numbers that attribute a super-linear graph wall
  * to its cause (cell blowout vs shuffle spill vs scoring).
  *
  * Usage: `runMain graft.tools.GraphProbe <sfDir>`
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    val cells = t("cells") {
      graft.analytics.Similarity.knnGraphCellsForSpec(
        graft.Tables.embeddings(spark, dir),
        graft.analytics.Similarity.GraphCell).localCheckpoint()
    }
    println(s"[probe] code rows: ${cells.count()}")
    val sizes = cells.groupBy("tbl", "bucket", "cell").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    t("cell histogram") {
      sizes.agg(count(lit(1)).as("cells"), max("n").as("max_cell"),
          expr("percentile(n, 0.5)").as("p50"),
          expr("percentile(n, 0.99)").as("p99"),
          sum(col("n") * col("n")).as("sum_sq")).show(false)
      sizes.orderBy(col("n").desc).show(10, false)
    }
    val pairsRaw = t("raw pair count") {
      sizes.agg(sum(col("n") * (col("n") - 1))).first().getLong(0)
    }
    println(s"[probe] raw pairs: $pairsRaw")
    val slim = cells.select(col("vec_id"), col("tbl"), col("bucket"), col("cell"))
    val pairs = slim.select(col("vec_id").as("q_id"), col("tbl"), col("bucket"), col("cell"))
      .join(slim.select(col("vec_id").as("n_id"), col("tbl"), col("bucket"), col("cell")),
        Seq("tbl", "bucket", "cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id")).distinct()
    t("distinct pairs")(println(s"[probe] distinct pairs: ${pairs.count()}"))
    t("full knn_graph build") {
      val g = graft.analytics.Similarity.knnGraph(spark, dir)
      g.agg(bit_xor(xxhash64(g.columns.map(col).toIndexedSeq: _*))).collect()
    }
    spark.stop()
  }
}
