package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scan-side pruning evidence: partition pruning on partitioned layouts
  * and predicate/column pushdown into the parquet reader. These are the
  * properties SURVEY §3 claims ("pruned scans") — asserted on real plans
  * so a regression (e.g. a cast that breaks pushdown) fails loudly.
  */
class PruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("partition filter prunes a partitioned layout to the matching directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = scanOf(q)
    assert(scan.partitionFilters.nonEmpty,
      "partition predicate did not become a PartitionFilter")
    // execute THIS QueryExecution (count() would plan a fresh one) so the
    // captured scan node's metrics populate
    assert(q.queryExecution.toRdd.count() > 0)
    // the pruned scan must touch only the matching partition's files:
    // the scan's numFiles metric stays below the full layout's file count
    val allFiles = new java.io.File(dir).listFiles().count(_.isDirectory)
    assert(allFiles > 1, "layout should have several partition dirs")
    val scanned = scan.metrics("numFiles").value
    val clickFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.contains("event_type=click") &&
        p.toString.endsWith(".parquet"))
      .count()
    assert(scanned == clickFiles,
      s"scan read $scanned files, matching partition has $clickFiles")
  }

  test("predicate and projection push down into the parquet scan") {
    val q = Tables.documents(spark, sf)
      .filter(col("doc_id") < 10).select("doc_id", "lang")
    val scan = scanOf(q)
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("LessThan(doc_id,10)"),
      s"filter not pushed to parquet: $pushed")
    val schema = scan.requiredSchema.fieldNames.toSet
    assert(schema == Set("doc_id", "lang"),
      s"column pruning failed, scan reads: $schema")
  }
}
