package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI face for the curation half of the engine — the training-data
  * counterpart of `bin/search.sh`/`bin/info.sh` on the search half.
  * Wraps [[graft.CurationPipeline]]:
  *
  *  - audit-only (one arg): print the corpus-health dashboard
  *    ([[graft.CurationPipeline.audit]]) — the read an operator takes
  *    BEFORE committing a curation run;
  *  - curate (two+ args): run the full pipeline (exact dedup → near-dup
  *    keep-best → quality floor) to a lang-partitioned output corpus,
  *    printing the per-stage removal accounting and the output's own
  *    health audit, so the run's effect is measured by the same tiles
  *    that motivated it.
  *
  * Every line is `key=value` on stdout (the bin/ CLI contract —
  * machine-parsable, no JSON library needed in the wrapper).
  *
  * `runMain graft.tools.CurateTool <corpusDir> [<outDir>] [minQuality]`
  */
object CurateTool {

  private def printAudit(spark: SparkSession, dir: String, tag: String): Unit = {
    val pipe = new graft.CurationPipeline(spark, dir)
    pipe.audit().collect().foreach { r =>
      println(s"[$tag] ${r.getString(0)}=${r.getLong(1)}")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CurateTool <corpusDir> [<outDir>] [minQuality]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      printAudit(spark, args(0), "audit")
      if (args.length >= 2) {
        val minQ = if (args.length >= 3) args(2).toDouble else 0.0
        val counts = new graft.CurationPipeline(spark, args(0)).run(args(1), minQ)
        counts.toSeq.sortBy(_._1).foreach { case (k, v) =>
          println(s"[curate] $k=$v")
        }
        printAudit(spark, args(1), "audit-out")
      }
    } finally spark.stop()
  }
}
