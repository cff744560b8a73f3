package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic embedding corpus WITH planted cluster structure, for
  * measuring ANN recall on realistic (curation-shaped) data.
  *
  * The driver-generated `embeddings.parquet` is near-uniform on the
  * sphere — its exact top-5 cosines sit around 0.5, i.e. every "nearest
  * neighbor" is barely closer than a random vector. That corpus is the
  * right ADVERSARIAL floor for LSH (`knn_graph_recall` measures it), but
  * it cannot answer the question a curation pipeline actually asks: "of
  * the pairs that MATTER (near-dups and same-topic documents at
  * cos ≥ 0.9), how many does the capped graph find?" — on it such pairs
  * do not exist, so that recall was previously COMPUTED from the
  * per-plane agreement model rather than measured (VERDICT r9 #3). This
  * generator plants the structure so the number can be measured:
  *
  *  - `clusters` Gaussian clusters: unit centers drawn from seeded
  *    per-coordinate `randn`, each point = center(vec_id % clusters) +
  *    σ·noise with E‖noise‖² = σ². Intra-cluster cosine concentrates at
  *    1/(1+σ²) — the default σ = 1/3 gives ≈ 0.90, the "same topic"
  *    regime.
  *  - every 10th vector (vec_id % 10 == 9) is a planted NEAR-DUP of its
  *    predecessor: x = prev + ε·noise with ε² = 0.02 → cos ≈ 0.99, the
  *    dedup regime.
  *
  * Everything is seeded-`randn` deterministic (same output for the same
  * (n, clusters, seed) at the same partitioning), distributed (no
  * driver-side vectors), and schema-identical to the driver corpus
  * (`vec_id` long, `embedding` float[64], `label` int = cluster id), so
  * [[graft.analytics.Similarity.knnGraphRecall]] /
  * [[graft.analytics.Similarity.knnGraphRefineRecall]] run on its output
  * directory unchanged.
  */
object ClusteredCorpus {

  val Dim = 64

  private def gaussArray(seedBase: Long): Column =
    array((0 until Dim).map(k => randn(seedBase + k)): _*)

  private def l2(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def generate(spark: SparkSession, dst: String, n: Long, clusters: Int,
               sigma: Double = 1.0 / 3.0, seed: Long = 7L): Unit = {
    require(clusters >= graft.analytics.Similarity.GraphRecallNQ,
      s"need >= ${graft.analytics.Similarity.GraphRecallNQ} clusters so the " +
        "recall sample (vec_id < 30) spans distinct clusters")
    // the near-dup plant rewrites vec_id+1 for every id % 10 == 8; with
    // n % 10 != 0 the last plant would emit vec_id == n, breaking the
    // documented dense-ids-0..n-1 contract (n+1 rows)
    require(n % 10 == 0, s"n must be a multiple of 10 (got $n)")
    // unit centers; tiny frame, broadcast below
    val centers = spark.range(0, clusters.toLong, 1, 1)
      .select(col("id").as("cid"), gaussArray(seed + 1000).as("c0"))
      .select(col("cid"),
        transform(col("c0"), x => x / l2(col("c0"))).as("center"))
    // per-coordinate noise std σ/√d makes E‖noise‖² = σ²
    val sd = sigma / math.sqrt(Dim.toDouble)
    val base = spark.range(0, n, 1, 32)
      .select(col("id").as("vec_id"), (col("id") % clusters).as("cid"),
        gaussArray(seed).as("g"))
      .join(broadcast(centers), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("center"), col("g"), (c, g) => c + lit(sd) * g).as("v"))
    // plant near-dups: vec_id % 10 == 9 becomes predecessor + ε·noise
    // (the predecessor is always itself a base point, so one hop suffices)
    val eps = math.sqrt(0.02) / math.sqrt(Dim.toDouble)
    val keep = base.filter(col("vec_id") % 10 =!= 9)
    val dups = base.filter(col("vec_id") % 10 === 8)
      .select((col("vec_id") + 1).as("vec_id"), col("cid"),
        zip_with(col("v"), gaussArray(seed + 2000), (x, g) => x + lit(eps) * g)
          .as("v"))
    keep.unionByName(dups)
      .select(col("vec_id"),
        transform(col("v"), x => x.cast("float")).as("embedding"),
        col("cid").cast("int").as("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  /** `runMain graft.tools.ClusteredCorpus <dstDir> <n> <clusters>` */
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ClusteredCorpus <dstDir> <n> <clusters>")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[16]"))
      .appName("graft-clustered-corpus")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, args(0), args(1).toLong, args(2).toInt)
    spark.stop()
  }
}
