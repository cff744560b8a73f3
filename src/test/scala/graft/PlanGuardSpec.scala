package graft

import graft.search.PlanGuard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("keyed search query admits; audit sees pushed filters") {
    val q = Tables.documents(spark, sf)
      .filter(col("doc_id") < 100).select("doc_id", "lang")
    val a = PlanGuard.audit(q)
    assert(!a.cartesian && !a.nestedLoop)
    assert(a.scanBytes > 0, "scan size must be accounted")
    assert(a.unfilteredScans.isEmpty, "pushed filter must be visible to the audit")
    PlanGuard.admit(q) // must not throw
  }

  test("degenerate cross join is rejected before execution") {
    val a = Tables.documents(spark, sf).select("doc_id")
    val b = Tables.embeddings(spark, sf).select("vec_id")
    val cross = a.crossJoin(b)
    val audit = PlanGuard.audit(cross)
    assert(audit.cartesian || audit.nestedLoop)
    intercept[IllegalStateException](PlanGuard.admit(cross))
  }

  test("a join whose condition is not an equi-join is caught too") {
    val d = Tables.documents(spark, sf).select("doc_id")
    val e = Tables.embeddings(spark, sf).select("vec_id")
    val theta = d.join(e, d("doc_id") < e("vec_id")) // range theta-join → BNLJ
    assert(PlanGuard.audit(theta).nestedLoop)
    intercept[IllegalStateException](PlanGuard.admit(theta))
  }

  test("one-row scalar-aggregate broadcast is NOT a degenerate join") {
    // "value above the global mean" — plans as BroadcastNestedLoopJoin
    // with a one-row build side; a legitimate search shape that must admit
    val docs = Tables.documents(spark, sf)
    val m = docs.agg(avg(length(col("text"))).as("m"))
    val q = docs.join(broadcast(m)).filter(length(col("text")) > col("m"))
      .select("doc_id")
    val a = PlanGuard.audit(q)
    assert(!a.nestedLoop && !a.cartesian,
      "scalar broadcast must be exempt from the nested-loop rejection")
    PlanGuard.admit(q) // must not throw
  }

  test("scan-byte budget rejects oversized inputs") {
    val q = Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
    intercept[IllegalStateException](PlanGuard.admit(q, maxScanBytes = BigInt(1)))
    PlanGuard.admit(q, maxScanBytes = BigInt(Long.MaxValue))
  }

  test("unpushed full scan is flagged when strict") {
    val full = Tables.documents(spark, sf) // no predicate at all
      .select("doc_id", "lang")
    val a = PlanGuard.audit(full)
    assert(a.unfilteredScans.nonEmpty)
    intercept[IllegalStateException](
      PlanGuard.admit(full, allowUnfiltered = false))
    PlanGuard.admit(full) // default tolerates listing-style scans
  }
}
