package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("end-to-end curation removes exact dups, near-dup losers and low-quality docs") {
    // corpus: 0/1 exact dups; 2/3 near-dups (3 longer = higher quality);
    // 4 unique low-quality; 5 unique high-quality
    val rich = "the quick brown fox jumps over the lazy dog near the misty river bank today"
    val docs = Seq(
      (0L, "same words in this exact duplicate document body", "en"),
      (1L, "same words in this exact duplicate document body", "en"),
      (2L, rich, "en"),
      (3L, rich + " again and again it runs through the green field", "en"),
      (4L, "x9 z7 q2", "en"),
      // unique doc phrased from recurring corpus bigrams (shares 2-grams
      // with `rich` but its 3-gram Jaccard stays ~0.26, under the 0.5
      // near-dup confirm) — the "fluent" probe for the LM floor below
      (5L, "the quick brown fox rests while the lazy dog naps near the misty river today", "en"))
    val dir = SparkTestSession.tempDir("curation")
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pipe = new CurationPipeline(spark, dir)
    assert(pipe.exactDupIds().as[Long].collect().toSet == Set(1L))
    // exact dups are inevitably near-dups of each other too (doc 1 may
    // appear); beyond that, exactly one of the 2/3 pair must lose
    val near = pipe.nearDupIds().as[Long].collect().toSet - 1L
    assert(near.subsetOf(Set(2L, 3L)) && near.size == 1,
      s"exactly one of the near-dup pair must lose, got $near")

    val out = SparkTestSession.tempDir("curated")
    val audit = pipe.run(out, minQuality = 0.2)
    assert(audit("total_docs") == 6)
    assert(audit("exact_dups_removed") == 1)
    assert(audit("near_dups_removed") == 1)
    assert(audit("kept") + audit("quality_filtered") == 4)
    assert(audit("kept") >= 2, "the rich unique docs must survive")
    val keptIds = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(!keptIds.contains(1L))
    assert(keptIds.contains(5L))
    // lang partitioning present on disk
    assert(new java.io.File(out).list().exists(_.startsWith("lang=")))

    // LM-fluency floor stacks on top. The vocab is corpus-relative, so a
    // discriminating test needs |vocab| ≪ |distinct bigrams|: with the
    // vocab capped to the REPEATED bigrams (count ≥ 2 ≈ the duplicated
    // passages), doc 4's one-off gibberish bigrams score 0 while doc 5 —
    // unique, but phrased from recurring corpus bigrams — scores high.
    val fluent = pipe.curated(minQuality = 0.0, minLmScore = 0.3,
        lmVocabSize = 24)
      .select("doc_id").as[Long].collect().toSet
    assert(!fluent.contains(4L), "gibberish doc must fail the LM floor")
    assert(fluent.contains(5L), "fluent doc must pass the LM floor")

    // Gopher hard-rule gate stacks BEFORE the scores: the gated output is
    // exactly the ungated survivors whose rule row says pass — the
    // pipeline must reuse textGopherRules verbatim, not reimplement it
    val ungated = pipe.curated(minQuality = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val passing = graft.analytics.TextOps.textGopherRules(spark, dir)
      .filter(col("pass") === 1).select("doc_id").as[Long].collect().toSet
    val gated = pipe.curated(minQuality = 0.0, gopherRules = true)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == (ungated intersect passing),
      s"gated=$gated ungated=$ungated passing=$passing")
    assert(!gated.contains(4L), "the 3-token gibberish doc fails word-count rule")

    // corpus-health audit: every tile reconciles with the operator frame
    // it summarizes (the facade must re-aggregate, never re-implement)
    val tiles = pipe.audit().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiles("total_docs") == 6)
    assert(tiles("exact_dup_ppm") == 1000000L / 6)
    assert(tiles("near_dup_ppm") == pipe.nearDupIds().count() * 1000000L / 6)
    val agree = graft.analytics.TextOps.textLangid(spark, dir)
      .agg(sum(col("agree"))).first().getLong(0)
    assert(tiles("langid_agree_ppm") == agree * 1000000L / 6)
    val cs = graft.analytics.TextOps.textCharsetProfile(spark, dir).collect()
    assert(tiles("charset_other_ppm") ==
      cs.map(_.getAs[Long]("n_other")).sum * 1000000L /
        cs.map(_.getAs[Long]("n_chars")).sum)
    assert(tiles("tokens_per_mchar") > 0 && tiles("boilerplate_ppm") >= 0)
  }

  test("a floor that filters EVERYTHING reports kept=0, not a schema-inference error") {
    // round-15 catch: an over-aggressive threshold (here an unreachable
    // quality floor) writes a data-file-less curated dir; the read-back
    // must count 0 under the write's explicit schema instead of dying
    // with UNABLE_TO_INFER_SCHEMA
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en"),
      (1L, "epsilon zeta eta theta", "en"))
    val dir = SparkTestSession.tempDir("curation-allfiltered")
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkTestSession.tempDir("curated-empty")
    val audit = new CurationPipeline(spark, dir).run(out, minQuality = 2.0)
    assert(audit("kept") == 0L, s"nothing can clear quality>=2.0: $audit")
    assert(audit("quality_filtered") == audit("total_docs") -
      audit("exact_dups_removed") - audit("near_dups_removed"))
  }

  test("audit on an empty corpus fails with a clear message, not a div-by-zero") {
    val dir = SparkTestSession.tempDir("curation-empty")
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      new CurationPipeline(spark, dir).audit()
    }
    assert(e.getMessage.contains("empty corpus"),
      s"expected an 'empty corpus' message, got: ${e.getMessage}")
  }
}
