package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pair-space-sharded shared-counts build must be a pure resource
  * decision: whatever pass count the scratch budget induces, the
  * published zone content is identical (every pair lands in exactly one
  * pass, keyed by its smaller doc id, and each pass's aggregate sees the
  * whole b-side posting list). This is the regression net for the
  * round-11→12 portability fix — `passes` went from a hard-coded host
  * constant to [[graft.ops.Tuning.pairShardPasses]] over the configured
  * `spark.graft.scratch.bytes` budget (default: no budget → 1 pass, the
  * cluster shape).
  */
class DedupShardSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Run both shared-counts consumers under `budgetBytes`, against a
    * fresh zone root so the build actually executes (a published zone
    * would otherwise serve the previous configuration's artifact). */
  private def runWithBudget(budgetBytes: Long): (Seq[String], Seq[String]) = {
    val spark = SparkTestSession.spark
    val savedRoot = spark.conf.getOption("spark.graft.derived.dir")
    spark.conf.set("spark.graft.derived.dir",
      SparkTestSession.tempDir("graft-shard-zone"))
    spark.conf.set(GraftConfig.ScratchBytesConf, budgetBytes.toString)
    graft.analytics.Dedup.clearMemos()
    try {
      val jac = graft.analytics.Dedup.dedupNgramJaccard(spark, dir)
        .collect().map(_.toString).toSeq
      val cont = graft.analytics.Dedup.dedupContainment(spark, dir)
        .collect().map(_.toString).toSeq
      (jac, cont)
    } finally {
      spark.conf.set(GraftConfig.ScratchBytesConf, "0")
      savedRoot match {
        case Some(r) => spark.conf.set("spark.graft.derived.dir", r)
        case None => spark.conf.unset("spark.graft.derived.dir")
      }
      graft.analytics.Dedup.clearMemos()
    }
  }

  test("passes=1 (cluster) and multi-pass (scratch-bounded) publish identical zones") {
    // no budget -> Tuning prescribes 1 pass (asserted in TuningSpec);
    // a 1-byte budget -> the 8-pass cap. Content must be bit-identical.
    val (jac1, cont1) = runWithBudget(0L)
    val (jacN, contN) = runWithBudget(1L)
    assert(jac1.nonEmpty, "fixture must produce near-dup pairs")
    assert(jac1 == jacN)
    assert(cont1 == contN)
  }
}
