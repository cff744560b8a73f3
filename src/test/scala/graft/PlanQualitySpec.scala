package graft

import graft.search.PlanGuard
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression net: every SparkEntry query's physical plan is
  * audited for join degenerations. A refactor that silently turns an
  * equi-join into a cartesian/nested-loop (lost join key, casted column,
  * renamed attribute) fails HERE, not on the cluster.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop is the intended plan:
    *  - `knn_brute`/`knn_recall`/`knn_range`: exact-baseline scan IS the
    *    broadcast nested loop (every query × every vector by design);
    *  - single-row scalar broadcasts (threshold / global-total / max
    *    joins) plan as BroadcastNestedLoopJoin with a one-row build side
    *    — constant work, not a degeneration.
    */
  private val nestedLoopByDesign = Set(
    "knn_brute", "knn_recall", "knn_range",
    "knn_graph_recall", "knn_graph_refine_recall",
    "knn_filtered", "knn_hard_negatives",
    "knn_lsh", "knn_pq", "knn_pq_recall", "knn_ivf_pq", "centroid_ivf", "kmeans_iter",
    "q_wealthy_inactive", "q_important_parts", "q_top_supplier",
    "q_avg_yearly", "text_decontaminate", "corpus_mixture",
    "dedup_semantic", "dedup_embedding",
    // one-row scalar INEQUALITY broadcasts (op-index watermark / max
    // compaction group): build side is a single row, so the "nested loop"
    // is one comparison per probe row
    "mvcc_asof", "mvcc_diff", "compaction_merge")

  test("no registered query plans a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try { if (PlanGuard.audit(fn(spark, sf)).cartesian) Some(name) else None }
      catch { case _: Throwable => None } // build failures are other specs' job
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.sorted}")
  }

  /** Round-8 regression net for the two plans the round-7 audit flagged:
    * both formerly forced a broadcast of a fact-derived (SF-scaled)
    * relation, which at 100× means driver OOM / broadcast timeout. The
    * fix is hint-free joins (AQE broadcasts only what measures small at
    * runtime) and, for NOT IN, a decomposition that avoids Spark's
    * broadcast-only null-aware anti join entirely.
    */
  test("q_min_cost_supplier / q_not_in force no broadcast of a fact-derived relation") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    for (name <- Seq("q_min_cost_supplier", "q_not_in")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val hinted = df.queryExecution.optimizedPlan.collect {
        case j: Join if j.hint.leftHint.nonEmpty || j.hint.rightHint.nonEmpty => j
      }
      assert(hinted.isEmpty, s"$name: joins carry forced hints:\n${hinted.mkString("\n")}")
      val planStr = df.queryExecution.sparkPlan.toString
      assert(!planStr.contains("isNullAware=true"),
        s"$name: broadcast-only null-aware anti join present")
    }
  }

  test("nested-loop joins appear only where they are the intended plan") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        if (PlanGuard.audit(fn(spark, sf)).nestedLoop &&
          !nestedLoopByDesign.contains(name)) Some(name)
        else None
      } catch { case _: Throwable => None }
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins (degenerated equi-join?): ${offenders.sorted}")
  }
}
