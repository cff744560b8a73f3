package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints, for every registered query, how many times its ADAPTIVE-FINAL
  * executed plan scans each big base table (events / lineitem /
  * documents / embeddings) — the measurement behind `ScanCountSpec`'s
  * declared budgets ([[graft.search.PlanGuard.factScanCounts]]).
  *
  * Usage: runMain graft.tools.ScanAudit [sfDir] [query ...]
  *
  * A query whose count exceeds its declared budget is the events_rfm
  * defect class (round 10: a fact aggregate silently re-derived under
  * every branch, 4× the scan+agg cost of the right plan); run this tool
  * after restructuring a query to re-derive the number the spec should
  * pin.
  */
object ScanAudit {
  val BigTables = Seq("events", "lineitem", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args.tail.toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter { case (n, _) => which.isEmpty || which.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val counts = graft.search.PlanGuard.factScanCounts(fn(spark, dir), BigTables)
          val shown = BigTables.filter(counts(_) > 0)
            .map(t => s"$t=${counts(t)}").mkString(" ")
          println(s"[scan-audit] $name ${if (shown.isEmpty) "-" else shown}")
        } catch {
          case e: Throwable => println(s"[scan-audit] $name ERROR ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
