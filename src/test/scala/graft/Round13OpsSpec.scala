package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: the NN-descent rounds knob compounds the refine
  * operator exactly (round r+1 = refineRound over round r's edges), and
  * the constant-vocabulary scale corpus preserves the source key space
  * while multiplying rows — the control experiment for the n-gram
  * key-growth attribution.
  */
class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("refine rounds knob: rounds=2 is exactly refineRound applied twice") {
    import graft.analytics.Similarity
    graft.functions.GraftFunctions.register(spark)
    val vectors = Tables.embeddings(spark, dir)
    val base = Similarity.vecBase(vectors)
    val e1 = Similarity.knnGraphFrame(spark, vectors)
      .select(col("q_id"), col("n_id"), col("cosine"))
    val r1 = Similarity.refineRound(base, e1)
    val expected = Similarity.refineRound(base,
        r1.select(col("q_id"), col("n_id"), col("cosine")))
      .collect().map(_.toString).sorted
    assert(expected.nonEmpty)
    spark.conf.set("spark.graft.refine.rounds", "2")
    try {
      val got = Similarity.knnGraphRefine(spark, dir)
        .collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq)
    } finally spark.conf.unset("spark.graft.refine.rounds")
    // default (knob unset) stays the oracle-gated single round
    val single = Similarity.knnGraphRefine(spark, dir)
      .collect().map(_.toString).sorted
    assert(single.toSeq == r1.collect().map(_.toString).sorted.toSeq)
    // a nonsensical round count fails loudly
    spark.conf.set("spark.graft.refine.rounds", "0")
    try intercept[IllegalArgumentException](
      Similarity.knnGraphRefine(spark, dir))
    finally spark.conf.unset("spark.graft.refine.rounds")
  }

  test("corpus_dup_by_source: per-source tallies reconcile with the cluster labels") {
    import graft.analytics.Dedup
    val out = Dedup.corpusDupBySource(spark, dir).collect()
    assert(out.nonEmpty)
    // per-source invariants: removable ⊆ cluster members ⊆ docs
    out.foreach { r =>
      val (n, dup, rem) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dup_docs"), r.getAs[Long]("n_removable"))
      assert(rem <= dup && dup <= n)
      assert(r.getAs[Long]("dup_ppm") == rem * 1000000L / n)
    }
    // global reconciliation against the label frame itself
    val labels = Dedup.dedupClusters(spark, dir)
    assert(out.map(_.getAs[Long]("n_dup_docs")).sum == labels.count())
    assert(out.map(_.getAs[Long]("n_removable")).sum ==
      labels.filter(col("is_keeper") === 0).count())
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
  }

  test("dedup_threshold_sweep: cumulative counts reconcile with the pair frame") {
    import graft.analytics.Dedup
    val sweep = Dedup.dedupThresholdSweep(spark, dir)
      .collect() // ordered threshold DESC
    assert(sweep.nonEmpty)
    val pairs = Dedup.dedupEmbedding(spark, dir).collect()
    // bottom row's cumulative count = every enumerated pair
    assert(sweep.last.getAs[Long]("cum_pairs") == pairs.length.toLong)
    // cum is the running sum of n_pairs from the top
    val running = sweep.scanLeft(0L)(_ + _.getAs[Long]("n_pairs")).tail
    assert(sweep.map(_.getAs[Long]("cum_pairs")).toSeq == running.toSeq)
    // each bucket's count matches a direct recount at its edges
    sweep.foreach { r =>
      val lo = r.getAs[Double]("threshold")
      val n = pairs.count { p =>
        val c6 = math.round(p.getAs[Double]("cosine") * 1e6)
        c6 / 50000 == math.round(lo * 20)
      }
      assert(n.toLong == r.getAs[Long]("n_pairs"))
    }
  }

  test("constVocab corpus: rows x factor, key space constant, ids disjoint") {
    val dst = SparkTestSession.tempDir("graft-constvocab")
    graft.tools.ScaleData.constVocab(spark, dir, dst, factor = 3)
    val src = spark.read.parquet(s"$dir/documents.parquet")
    val out = spark.read.parquet(s"$dst/documents.parquet")
    assert(out.count() == 3 * src.count())
    // doc ids stay unique across copies (shifted by the copy offset)
    assert(out.select("doc_id").distinct().count() == out.count())
    // the whole point: the distinct token/n-gram key space does NOT grow —
    // every text in the scaled corpus is a verbatim source text
    val srcTexts = src.select("text").distinct()
    val novel = out.select("text").distinct()
      .join(srcTexts, Seq("text"), "left_anti").count()
    assert(novel == 0L, "constVocab must introduce no new text")
    assert(out.select("text").distinct().count() == srcTexts.count())
    // distinct 3-gram keys: scaled corpus == source corpus (the suffixed
    // ScaleData.scale corpus grows this ~x factor; this one must not)
    def ngrams(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(expr(
        "transform(sequence(1, size(split(text, ' ')) - 2), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")).as("g"))
        .distinct().count()
    assert(ngrams(out) == ngrams(src))
  }
}
