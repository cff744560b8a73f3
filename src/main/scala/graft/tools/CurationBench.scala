package graft.tools

import graft.{CurationPipeline, Tables}
import org.apache.spark.sql.SparkSession

/** End-to-end wall time of the assembled curation pipeline — users run
  * [[graft.CurationPipeline]], not 113 separate queries, so the facade
  * gets its own measured cost at a large scale point, per stage:
  *
  *  1. `exact` — content-hash duplicate ids (one shuffle on the hash);
  *  2. `near` — MinHash-LSH cluster losers minus stage-1's ids (first
  *     touch pays the shared-stage DerivedZone builds: signatures, pair
  *     table, pointer-jumped components);
  *  3. `curate_write` — anti-join both drop lists, quality floor, write
  *     the curated corpus partitioned by lang;
  *  4. `audit` — re-read + count the published output.
  *
  * The chain runs TWICE: run 1 is the cold cost (zone builds included —
  * the number a first-time user pays), run 2 is the steady state a
  * resident deployment sees (zones served from disk). Per-stage wall,
  * rows in/out and the audit counts print as one JSON line; the audit
  * must tile (stage counts sum to total) or the run fails loudly.
  *
  * Usage: `runMain graft.tools.CurationBench <corpusDir> [minQuality]
  * [minLmScore]` — a positive `minLmScore` adds the LM fluency floor
  * (stage 3 then also anti-filters on [[graft.analytics.TextOps
  * .textLmScore]], served from the `lm_doc_score` DerivedZone since
  * round 15; the floor's zone build lands in the cold run, the warm run
  * reads it back).
  */
object CurationBench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def once(spark: SparkSession, corpus: String, minQuality: Double,
                   minLmScore: Double, outDir: String): (String, Map[String, Long]) = {
    val p = new CurationPipeline(spark, corpus)
    val (total, tTotal) = timed(Tables.documents(spark, corpus).count())
    // localCheckpoint is EAGER — build it inside the timed block so the
    // stage wall includes the actual dedup work (and, cold, the
    // DerivedZone builds), not just a count over materialized partitions
    val (exactIds, tExact) = timed(p.exactDupIds().localCheckpoint())
    val exact = exactIds.count()
    val (nearIds, tNear) = timed(p.nearDupIds()
      .join(exactIds, Seq("doc_id"), "left_anti").localCheckpoint())
    val near = nearIds.count()
    val out = p.curated(minQuality, minLmScore)
    val (_, tWrite) = timed {
      out.write.mode("overwrite").partitionBy("lang").parquet(outDir)
    }
    // explicit schema: an everything-filtered run writes no data files and
    // inference would fail — kept=0 is the honest answer (CurationPipeline
    // .run applies the same rule)
    val (kept, tAudit) =
      timed(spark.read.schema(out.schema).parquet(outDir).count())
    // INDEPENDENT quality count — recomputed from the inputs (dedup
    // survivors scoring under the quality floor, or — when the LM
    // fluency floor is on — under either floor), NOT derived as
    // total-minus-the-rest, so the tiling require genuinely cross-checks
    // the curated write+read-back against the stage counts instead of
    // holding by construction.
    import org.apache.spark.sql.functions.col
    val survivors = graft.Tables.documents(spark, corpus).select("doc_id")
      .join(exactIds.unionByName(nearIds), Seq("doc_id"), "left_anti")
      .join(graft.analytics.TextOps.textQuality(spark, corpus)
        .select("doc_id", "quality"), "doc_id")
    val quality = (if (minLmScore > 0)
      survivors
        .join(graft.analytics.TextOps.textLmScore(spark, corpus)
          .select("doc_id", "lm_score"), "doc_id")
        .filter(col("quality") < minQuality || col("lm_score") < minLmScore)
    else survivors.filter(col("quality") < minQuality)).count()
    require(exact + near + quality + kept == total,
      s"audit does not tile: total=$total exact=$exact near=$near " +
        s"quality=$quality kept=$kept")
    val stages = Seq(
      ("scan", tTotal, total), ("exact", tExact, exact),
      ("near", tNear, near), ("curate_write", tWrite, kept),
      ("audit", tAudit, kept))
    val stagesJson = stages.map { case (n, t, r) =>
      s"""{"stage":"$n","wall_sec":${"%.2f".format(t)},"rows":$r}"""
    }.mkString("[", ",", "]")
    (stagesJson, Map("total_docs" -> total, "exact_dups_removed" -> exact,
      "near_dups_removed" -> near, "quality_filtered" -> quality,
      "kept" -> kept))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CurationBench <corpusDir> [minQuality] [minLmScore]")
    val corpus = args(0)
    val minQuality = if (args.length > 1) args(1).toDouble else 0.35
    // optional LM fluency floor (0 = off, the historical shape): when on,
    // the chain exercises the lm_doc_score DerivedZone end-to-end
    val minLmScore = if (args.length > 2) args(2).toDouble else 0.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Same width discipline as graft.Bench: Tuning's prescription for
    // the corpus' on-disk bytes (override honored) — a pinned core-count
    // width is the shape that OOM'd the ×1000 full suite in round 11.
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      graft.ops.Tuning.benchWidth(graft.Bench.dirBytes(corpus), cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curation-bench")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_curation_bench").resolve("out").toString
      val t0 = System.nanoTime()
      val (coldStages, audit) = once(spark, corpus, minQuality, minLmScore, outDir)
      val coldWall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (warmStages, audit2) = once(spark, corpus, minQuality, minLmScore, outDir)
      val warmWall = (System.nanoTime() - t1) / 1e9
      require(audit == audit2, s"non-deterministic audit: $audit vs $audit2")
      val auditJson = audit.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val json =
        s"""{"metric":"curation_bench","corpus":"$corpus","min_quality":$minQuality,"min_lm_score":$minLmScore,""" +
          s""""shuffle_partitions":$width,""" +
          s""""cold_wall_sec":${"%.2f".format(coldWall)},""" +
          s""""warm_wall_sec":${"%.2f".format(warmWall)},""" +
          s""""cold_stages":$coldStages,"warm_stages":$warmStages,""" +
          s""""audit":$auditJson,""" +
          s""""generated_at":"${java.time.Instant.now()}","commit":"${graft.Bench.gitCommit()}"}"""
      println(json)
      sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    } finally spark.stop()
  }
}
