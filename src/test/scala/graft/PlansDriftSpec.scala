package graft

import graft.tools.PlanAudit
import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md must describe the CURRENT tree's plans (round-11 finding:
  * the artifact silently predated three plan-changing rounds). The
  * generated block embeds a manifest of normalized plan hashes; this
  * spec recomputes each covered query's hash on the live code and the
  * same session shape the generator uses (local[4], 4 shuffle
  * partitions), so any change to a covered plan fails here until
  * `runMain graft.tools.PlanAudit --md` is re-run in the same commit.
  */
class PlansDriftSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  test("PLANS.md fingerprints the FULL registry; full sections are registered queries") {
    val manifest = PlanAudit.readManifest("PLANS.md")
    assert(manifest.keySet == SparkEntry.queries.keySet,
      "the fingerprint manifest must cover every registered query — " +
        s"missing ${SparkEntry.queries.keySet -- manifest.keySet}, " +
        s"stale ${manifest.keySet -- SparkEntry.queries.keySet}")
    assert(PlanAudit.PlansMdQueries.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("PLANS.md plan fingerprints match the live code's plans") {
    val spark = SparkTestSession.spark
    // cached tables from earlier suites would swap scans for
    // InMemoryRelation and fail the comparison spuriously
    spark.catalog.clearCache()
    val manifest = PlanAudit.readManifest("PLANS.md")
    val drifted = manifest.keySet.toSeq.sorted.flatMap { name =>
      val live = PlanAudit.planHash(spark, dir, name)
      if (manifest.get(name).contains(live)) None
      else Some(s"$name (manifest ${manifest.get(name).getOrElse("?")} vs live $live)")
    }
    assert(drifted.isEmpty,
      s"PLANS.md is stale for: ${drifted.mkString(", ")} — " +
        "regenerate with `runMain graft.tools.PlanAudit --md`")
  }
}
