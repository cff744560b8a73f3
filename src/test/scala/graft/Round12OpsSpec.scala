package graft

import graft.analytics.{EventOps, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural + semantic checks for the round-12 operators. Value-level
  * correctness is gated by the DuckDB crosscheck; these assert the
  * invariants the oracle can't see (probability-mass identities, exact
  * tiling against independently computed totals, threshold semantics).
  */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("events_markov rows are a probability distribution per current type") {
    val rows = EventOps.markov(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    for ((t, rs) <- byType) {
      val mass = rs.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"P(next|$t) sums to $mass, not 1")
    }
    // transition count conservation: every event with a successor is
    // counted exactly once — totals must equal events minus each user's
    // final event
    val nTransitions = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nTransitions == expected,
      s"transition mass $nTransitions != events - users = $expected")
  }

  test("events_value_histogram tiles the event count and the value total") {
    val rows = EventOps.valueHistogram(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(rows.map(_.getLong(3)).sum == ev.count(),
      "histogram bucket counts must tile the event count exactly")
    // exact-cents identity: Σ bucket totals == Σ cents / 100 (both exact
    // longs until the single final division)
    val totalCents = ev.select(sum(Tables.cents(col("value")))).head().getLong(0)
    val bucketCents = rows.map(r => math.round(r.getDouble(4) * 100)).sum
    assert(bucketCents == totalCents,
      s"bucket value mass $bucketCents != corpus total $totalCents")
    // buckets are $10 wide: bucket_lo must be 10 × bucket
    assert(rows.forall(r => r.getDouble(2) == r.getLong(1) * 10.0))
  }

  test("text_zipf decade masses tile the top-999 token mass exactly") {
    val rows = TextOps.textZipf(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(r => Seq(1, 2, 3).contains(r.getInt(0))))
    // n_terms per decade can never exceed the decade's rank capacity
    val cap = Map(1 -> 9L, 2 -> 90L, 3 -> 900L)
    assert(rows.forall(r => r.getLong(1) <= cap(r.getInt(0))))
    // decade mass must equal an independent naive computation: total
    // occurrences of the top-999 terms by frequency
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("term")).limit(999).collect()
    assert(rows.map(_.getLong(2)).sum == vocab.map(_.getLong(1)).sum,
      "decade total_occurrences must tile the naive top-999 token mass")
    assert(rows.map(_.getLong(1)).sum == vocab.length.toLong)
    // within-decade frequency bounds nest monotonically across decades
    val sorted = rows.sortBy(_.getInt(0))
    for (Seq(a, b) <- sorted.toSeq.sliding(2) if sorted.length > 1)
      assert(a.getLong(4) >= b.getLong(3),
        "min_freq of an earlier decade must dominate max_freq of a later one")
  }

  test("text_boilerplate ppm is exact integer division and df-threshold-consistent") {
    val rows = TextOps.textBoilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, c, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      c <= n && ppm == c * 1000000L / n && ppm >= 0 && ppm <= 1000000
    })
    // every document with >= 3 tokens appears exactly once
    val expected = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(rows.length.toLong == expected)
  }

  test("events_inactivity: dormancy is anchored to the stream head and gaps to real events") {
    val rows = EventOps.inactivity(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(rows.length.toLong == ev.select("user_id").distinct().count())
    assert(rows.map(_.getLong(1)).sum == ev.count(), "per-user counts must tile")
    // at least one user is active at the head (dormant 0); none negative
    assert(rows.exists(_.getLong(3) == 0L), "head user must be 0-dormant")
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(3) >= 0))
    // a single-event user (if any) must report gap 0; max_gap bounded by span
    val span = {
      val mm = ev.agg(min(expr("ts div 1000000000")), max(expr("ts div 1000000000"))).head()
      mm.getLong(1) - mm.getLong(0)
    }
    assert(rows.forall(_.getLong(2) <= span))
  }

  test("mm_fingerprint collapses duplicate decoded content to one keeper") {
    val rows = graft.analytics.Multimodal.mmFingerprint(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == docs, "group sizes must tile the corpus")
    // fingerprint is a pure function of the grouped features: no two rows
    // may share all five features, and fingerprints must be within [0, P)
    val keys = rows.map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < graft.functions.Portable.P))
    // keepers are distinct real documents (min of disjoint groups)
    val keepers = rows.map(_.getLong(1))
    assert(keepers.distinct.length == keepers.length)
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(keepers.forall(ids.contains))
  }

  test("knn_range returns exactly the pairs at or above the threshold") {
    val rows = Similarity.knnRange(spark, sf).collect()
    assert(rows.forall(_.getDouble(2) >= 0.35), "below-threshold row leaked")
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    // cross-check against the exact brute top-k: any knn_brute neighbor
    // scoring >= tau must be in the range result (same round-6 cosine)
    val fromBrute = Similarity.knnBrute(spark, sf).collect()
      .filter(_.getDouble(3) >= 0.35)
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromBrute.subsetOf(got),
      s"brute-force matches missing from range result: ${fromBrute.diff(got)}")
  }
}
