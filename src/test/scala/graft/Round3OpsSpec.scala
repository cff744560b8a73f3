package graft

import graft.analytics.{Dedup, EventOps, Relational, Similarity, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Structural + semantic checks for the round-3 operators. Value-level
  * correctness is gated by the DuckDB crosscheck; these specs assert the
  * properties the oracle can't see (plan shapes, invariants).
  */
class Round3OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_custdist histogram accounts for every customer") {
    val df = Relational.custDist(spark, sf)
    val total = df.selectExpr("sum(custdist)").first().getLong(0)
    val nCust = Tables.customer(spark, sf).count()
    assert(total == nCust)
  }

  test("q_not_in decomposes to a PLAIN LeftAnti — never the broadcast-only null-aware form") {
    // Round-8 change: the literal NOT IN plan (null-aware anti join) is
    // broadcast-ONLY in Spark, and the subquery side scales with SF — a
    // 100× scale-killer. The decomposition null-probes the subquery side
    // and routes to a distinct + plain LeftAnti that AQE is free to
    // shuffle. BroadcastHashJoinExec renders the isNullAwareAntiJoin flag
    // as a trailing boolean after the build side: it must be `false` (or
    // the join not broadcast at all), and a LeftAnti must exist.
    val plan = Relational.notInAnti(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.matches("(?s).*LeftAnti, Build\\w+, true.*"),
      s"null-aware anti join (broadcast-only) reappeared:\n$plan")
  }

  test("kmeans_iter assigns every vector to exactly one of the seed centroids") {
    val df = Similarity.kmeansIter(spark, sf)
    val rows = df.collect()
    assert(rows.length <= 8 && rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sf).count())
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
  }

  test("approx_distinct_kmv estimate tracks the exact count") {
    val rows = EventOps.approxDistinctKmv(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1)
      if (!r.isNullAt(2)) {
        val est = r.getDouble(2)
        // KMV with k=32 has ~18% relative standard error; 2.5x is a loose
        // sanity band that still catches a broken estimator (off by 10x)
        assert(est > exact / 2.5 && est < exact * 2.5,
          s"${r.getString(0)}: est $est vs exact $exact")
      }
    }
  }

  test("pii_scrub finds exactly the injected PII and removes it") {
    val rows = TextOps.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) == 1 && r.getInt(2) == 1))
    // scrubbed text must not retain an email (hash differs from unscrubbed)
    import org.apache.spark.sql.functions._
    val unscrubbed = Tables.documents(spark, sf)
      .select(md5(concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))).as("h"))
      .collect().map(_.getString(0)).toSet
    assert(rows.forall(r => !unscrubbed.contains(r.getString(3))))
  }

  test("knn_hard_negatives never returns a same-label neighbor") {
    val df = Similarity.knnHardNegatives(spark, sf)
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(2)),
        s"query ${r.getLong(0)} got same-label negative ${r.getLong(2)}")
    }
  }

  test("text_decontaminate flags no benchmark doc and only true overlaps") {
    val df = TextOps.textDecontaminate(spark, sf)
    val rows = df.collect()
    // benchmark slice itself must never appear in the flagged output
    assert(rows.forall(_.getLong(0) % 97 != 0))
    // every flagged doc reports at least one contaminated shingle
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("knn_pq returns k non-self neighbors per query with admissible ADC sums") {
    val rows = Similarity.knnPq(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} rows")
      assert(rs.forall(_.getLong(2) != q), s"query $q returned itself")
      assert(rs.forall(_.getLong(3) >= 0L))
      // ranked ascending by ADC distance
      val ds = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(ds.sameElements(ds.sorted), s"query $q ranks not distance-ordered")
    }
  }

  test("dedup_semantic labels are cluster minima and keeper flags match") {
    val rows = Dedup.dedupSemantic(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid,
        s"cluster $cid label is not its minimum member")
      assert(members.count(_.getInt(2) == 1) == 1,
        s"cluster $cid must have exactly one keeper")
    }
  }

  test("knn_ivf_pq searches only the probed lists (subset of knn_pq candidates)") {
    val ivf = Similarity.knnIvfPq(spark, sf).collect()
    assert(ivf.nonEmpty)
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.forall(_.getLong(2) != q), s"query $q returned itself")
      assert(rs.length <= 5)
    }
  }

  test("corpus_mixture downsamples over-budget languages and keeps the tail") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = TextOps.corpusMixture(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    import org.apache.spark.sql.functions._
    val totals = Tables.documents(spark, sf01)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(size(split(col("text"), " "))).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, (kept, keptToks, ppm)) =>
      val (allDocs, allToks) = totals(lang)
      if (ppm == 1000000L) {
        assert(kept == allDocs, s"$lang at rate 1.0 must keep everything")
        assert(keptToks == allToks)
      } else {
        assert(kept < allDocs, s"$lang rate $ppm ppm must drop documents")
      }
    }
  }

  test("seq_pack streams are gapless within each language") {
    val rows = TextOps.seqPack(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val sorted = docs.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"$lang stream must start at token 0")
      sorted.sliding(2).foreach {
        case Array((_, n, start), (_, _, nextStart)) =>
          assert(nextStart == start + n,
            s"$lang stream has a gap: $start+$n != $nextStart")
        case _ =>
      }
    }
  }

  test("corpus_overlap emits each source pair once, ordered") {
    val rows = Dedup.corpusOverlap(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) > 0)
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length)
  }

  test("events_moving_avg stays within the user's value envelope") {
    val df = EventOps.movingAvg(spark, sf)
    import org.apache.spark.sql.functions._
    val bad = df.join(
        Tables.events(spark, sf).groupBy("user_id")
          .agg(min("value").as("lo"), max("value").as("hi")),
        "user_id")
      .filter(col("avg_value") < col("lo") - 0.01 ||
        col("avg_value") > col("hi") + 0.01)
    assert(bad.count() == 0)
  }

  test("q_wealthy_inactive returns rows and no kept customer has an urgent order") {
    val rows = Relational.wealthyInactive(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("dedup_chunks finds the shared banner chunk across all wrapped docs") {
    val df = Dedup.dedupChunks(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    val maxShared = df.selectExpr("max(n_docs)").first().getLong(0)
    // the banner chunk occurs in every wrapped doc (one per original)
    assert(maxShared == nDocs)
    // and every original full chunk recurs in its wrapped twin
    assert(df.count() > nDocs)
  }
}
