package graft

import graft.analytics.{EventOps, Relational}
import org.scalatest.funsuite.AnyFunSuite

/** Structural + semantic checks for the round-8 operators. Value-level
  * correctness is gated by the DuckDB crosscheck; these specs assert the
  * properties the oracle can't see (plan shapes, invariants).
  */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_shipmode classifies every joined 1996 line exactly once") {
    val df = Relational.shipMode(spark, sf).collect()
    assert(df.nonEmpty && df.length <= 3) // at most one row per return flag
    val classified = df.map(r => r.getLong(1) + r.getLong(2)).sum
    val joined = Tables.lineitem(spark, sf)
      .filter("l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'")
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    assert(classified == joined,
      s"high+low counts ($classified) must partition the joined rows ($joined)")
  }

  test("q_shipmode pushes the date range to the parquet scan") {
    val plan = Relational.shipMode(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"),
      s"shipdate range must appear in PushedFilters:\n$plan")
  }

  test("q_supplier_parts never counts a blocklisted supplier") {
    // recompute one group's distinct suppliers without the anti join and
    // confirm the blocklist members are exactly what the query excluded
    val out = Relational.supplierParts(spark, sf)
    assert(out.count() > 0)
    val blockedCount = Tables.supplier(spark, sf)
      .filter("s_name LIKE '%7'").count()
    assert(blockedCount > 0, "blocklist must be non-empty for the test to bite")
    val maxCnt = out.agg(org.apache.spark.sql.functions.max("supplier_cnt"))
      .first().getLong(0)
    val nSupp = Tables.supplier(spark, sf).count()
    assert(maxCnt <= nSupp - blockedCount,
      "a group counted more suppliers than exist outside the blocklist")
  }

  test("events_top_paths emits well-formed trigrams ordered by count") {
    val rows = EventOps.topPaths(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val types = Set("click", "signup", "error", "view", "purchase")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length == 3 && parts.forall(types.contains),
        s"malformed path: ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1), "n_users cannot exceed n")
    }
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse, "paths must be ordered by count desc")
  }

  test("events_top_paths plans ONE user shuffle and a top-k, no self-joins") {
    val plan = EventOps.topPaths(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-20 must be a heap top-k")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"path mining must not plan adjacency self-joins:\n$plan")
  }

  test("events_funnel scans the event log once and shuffles it once") {
    // regression pin for the round-8 rewrite: the old stage-chain form
    // planned a cascade that re-scanned and re-shuffled events per stage
    // (10 stage evaluations for 4 stages). The recurrence form must keep
    // ONE scan of the events source and ONE user-keyed hash exchange
    // (plus the final presentation range exchange for orderBy).
    val plan = EventOps.funnel(spark, sf).queryExecution.executedPlan.toString
    val eventScans = "(?i)filescan parquet [^\\n]*events".r.findAllIn(plan).size
    assert(eventScans == 1, s"expected ONE events scan, got $eventScans:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected ONE user-keyed hash exchange, got $hashExchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"funnel must not plan stage joins at all:\n$plan")
  }

  test("corpus_dsir covers every raw doc, excludes the target, splits on the mean") {
    import org.apache.spark.sql.functions.col
    val out = graft.analytics.TextOps.corpusDsir(spark, sf)
    val rows = out.collect()
    val rawIds = Tables.documents(spark, sf)
      .filter(col("source") =!= "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == rawIds,
      "output must be exactly the raw (non-target) docs")
    assert(rows.forall(_.getLong(1) >= 0L), "integer scores are non-negative")
    val kept = rows.count(_.getInt(2) == 1)
    assert(kept > 0 && kept < rows.length,
      s"above-mean keep must split the corpus ($kept of ${rows.length})")
    // above-mean rule, re-derived independently
    val mean = rows.map(_.getLong(1)).sum / rows.length
    rows.foreach(r => assert((r.getInt(2) == 1) == (r.getLong(1) > mean)))
  }

  test("corpus_dsir: kappa broadcasts in the zone BUILD; the query serves the zone") {
    // the once-per-dataset build is where the occurrence stream lives —
    // the bounded kappa table must broadcast into it
    val build = graft.analytics.TextOps.dsirScores(spark, sf)
      .queryExecution.executedPlan.toString
    assert(build.contains("BroadcastHashJoin"),
      s"the bounded kappa table must broadcast into the occurrence stream:\n$build")
    assert(!build.contains("CartesianProduct"), s"no cartesian:\n$build")
    // the registered query reads the published per-doc zone (r15) and
    // joins only the broadcast 1-row mean — never a corpus-wide rebuild
    val served = graft.analytics.TextOps.corpusDsir(spark, sf)
      .queryExecution.executedPlan.toString
    assert(served.contains("dsir_doc_score"),
      s"query must serve the published dsir_doc_score zone:\n$served")
    assert(!served.contains("CartesianProduct"), s"no cartesian:\n$served")
  }
}
