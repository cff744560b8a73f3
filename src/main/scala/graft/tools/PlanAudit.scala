package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the headline queries so shuffle /
  * broadcast / pushdown regressions are visible at a glance.
  *
  * Usage: runMain graft.tools.PlanAudit [--final] [sfDir] [query ...]
  *
  * `--final` EXECUTES each query first and prints the adaptive plan
  * AFTER AQE finalized every stage (`isFinalPlan=true`) — the plan that
  * actually ran, with runtime broadcast/skew decisions resolved. The
  * static `explain` is what the planner guessed from stats; at the large
  * scale points the two can differ (AQE demoting a broadcast that no
  * longer fits, coalescing shuffle partitions), and scale audits must
  * read the final one. Parallelism via SPARK_GRAFT_CPUS (default 4;
  * use 32 to reproduce the bench's runtime decisions at sf10).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val showFinal = args.contains("--final")
    val rest = args.filterNot(_ == "--final")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val which = if (rest.length > 1) rest.tail.toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter { case (n, _) => which.isEmpty || which.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n########## $name ##########")
        try {
          val df = fn(spark, dir)
          if (showFinal) {
            // execute THIS dataset's own QueryExecution (wrapping it in an
            // agg would finalize a different plan object): toRdd triggers
            // the adaptive execution; count() drains it without collecting
            // rows to the driver. The executedPlan afterwards is the
            // adaptive FINAL plan (isFinalPlan=true).
            df.queryExecution.toRdd.count()
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        }
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
