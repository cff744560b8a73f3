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
    val refineMode = args.contains("--refine")
    val dir = args.filterNot(_ == "--refine").headOption
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle width defaults to the core count but can be pinned
    // independently — variance attribution runs mirror Bench's session
    // (local[32] with the Tuning-derived width, 192 at x1000), and the
    // spread under test may itself be a function of that width
    val sp = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    if (refineMode) {
      // Stage-decomposed replay of Similarity.refineRound for the ×1000
      // variance attribution: the counts are DETERMINISTIC (same inputs →
      // same adjacency, same two-hop pair space), so if repeated runs
      // report identical counts but spread wall time, the spread is
      // scheduling/IO, not data; per-stage walls + GC say which stage
      // absorbs it.
      import graft.analytics.Similarity
      val gc0 = gcMillis
      val vectors = graft.Tables.embeddings(spark, dir)
      val base = Similarity.vecBase(vectors).localCheckpoint()
      val edges = t("graph build") {
        Similarity.knnGraphFrame(spark, vectors)
          .select(col("q_id"), col("n_id"), col("cosine")).localCheckpoint()
      }
      println(s"[probe] edges: ${edges.count()}  gc=${(gcMillis - gc0) / 1e3}s")
      val fwd = edges.select(col("q_id").as("src"), col("n_id").as("dst"))
      val revCapped = edges
        .select(col("n_id").as("src"), col("q_id").as("dst"), col("cosine"))
        .groupBy("src")
        .agg(graft.functions.GraftFunctions
          .topk(struct(col("cosine"), col("dst")), Similarity.K).as("tk"))
        .select(col("src"), explode(col("tk")).as("tt"))
        .select(col("src"), col("tt.id").as("dst"))
      val adj = t("adjacency")(
        fwd.unionByName(revCapped).distinct().localCheckpoint())
      t("degree histogram") {
        adj.groupBy("src").agg(count(lit(1)).as("d"))
          .agg(count(lit(1)).as("nodes"), max("d").as("max_deg"),
            expr("percentile(d, 0.99)").as("p99"),
            sum(col("d") * col("d")).as("twohop_upper")).show(false)
      }
      val paths = t("two-hop paths (with multiplicity)") {
        adj.as("a").join(adj.as("b"),
            col("a.dst") === col("b.src") && col("a.src") =!= col("b.dst"))
          .count()
      }
      println(s"[probe] two-hop paths: $paths")
      val gc1 = gcMillis
      val wall = t("full refineRound") {
        val r = Similarity.refineRound(base,
          edges.select(col("q_id"), col("n_id"), col("cosine")))
        r.agg(bit_xor(xxhash64(r.columns.map(col).toIndexedSeq: _*))).collect()
      }
      println(s"[probe] refine gc: ${(gcMillis - gc1) / 1e3}s")
      val _ = wall
      spark.stop()
      return
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
