package graft

import graft.analytics.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural + semantic checks for the round-9 operators. Value-level
  * correctness is gated by the DuckDB crosscheck; these specs assert the
  * properties the oracle can't see (measures-the-shipped-graph identity,
  * recall ordering invariants, plan shapes).
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("knn_graph_recall covers every cap × every sampled node") {
    val rows = Similarity.knnGraphRecall(spark, sf).collect()
    val caps = rows.map(_.getInt(0)).distinct.sorted
    assert(caps.toSeq == Similarity.GraphRecallCaps.sorted,
      s"cap column must enumerate GraphRecallCaps, got ${caps.toSeq}")
    val perCap = rows.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(perCap.values.forall(_ == Similarity.GraphRecallNQ),
      s"each cap must report all ${Similarity.GraphRecallNQ} sampled nodes: $perCap")
    assert(rows.forall { r =>
      val (hits, recall) = (r.getLong(2), r.getDouble(3))
      hits >= 0 && hits <= 5 && recall >= 0.0 && recall <= 1.0
    }, "n_hits must be in [0,5] and recall in [0,1]")
  }

  test("uncapped setting is the recall ceiling over every finite cap") {
    // s=1 everywhere makes each node's candidate set the full bucket — a
    // superset of any cell — and a candidate superset can only add exact
    // top-k members to the approximate top-k (anything that displaces an
    // exact-top-k candidate has a higher cosine, hence is itself exact
    // top-k). Aggregate hits must therefore be maximal at the uncapped
    // setting; a violation means the cell split changed semantics, not
    // just recall.
    val totals = Similarity.knnGraphRecall(spark, sf)
      .groupBy("cap").agg(sum("n_hits").as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ceiling = totals(Similarity.GraphRecallCaps.max)
    for ((cap, h) <- totals)
      assert(h <= ceiling, s"cap=$cap hits $h exceed uncapped ceiling $ceiling")
  }

  test("recall eval at cap=GraphCell replays the shipped knn_graph edges exactly") {
    // The whole point of the gate: it must measure the graph knnGraph
    // ships, not a reimplementation that could drift. Edge sets for the
    // sampled nodes must be identical.
    val (bv, sample) = Similarity.graphRecallFrames(spark, sf)
    val evalEdges = Similarity.graphSampleEdges(bv, sample, Similarity.GraphCell)
    val shipped = Similarity.knnGraph(spark, sf)
      .filter(col("q_id") < Similarity.GraphRecallNQ)
      .select("q_id", "n_id")
    assert(evalEdges.exceptAll(shipped).isEmpty && shipped.exceptAll(evalEdges).isEmpty,
      "cap=GraphCell eval edges must equal knn_graph's own edges for the sample")
  }

  test("knn_graph_recall ground truth is one broadcast pass, no wide shuffle of the corpus") {
    // The exact side must stay a broadcast of the 30-node sample against
    // the corpus scan: a proportional sample or a lost broadcast would
    // show up as an Exchange hashpartitioning of the embeddings scan
    // before any aggregate.
    val plan = Similarity.knnGraphRecall(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"sample side must broadcast:\n${plan.take(2000)}")
  }
}
