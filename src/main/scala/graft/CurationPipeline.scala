package graft

import graft.analytics.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-call corpus curation: the LLM-training-data counterpart of
  * [[GraftEngine]]'s search facade. Chains the library's pieces the way a
  * production pipeline would run them:
  *
  *  1. exact dedup (content hash) — cheap, removes byte-identical copies;
  *  2. MinHash-LSH near-dup clustering → keep each cluster's
  *     highest-quality document ([[Dedup.dedupKeepBest]] semantics);
  *  3. quality floor — drop surviving docs scoring under `minQuality`;
  *  4. deterministic output: the curated corpus plus a per-stage audit.
  *
  * Every stage is a declarative DataFrame transform over the same
  * `documents` schema, so Catalyst fuses the scans and the whole run is a
  * handful of shuffles regardless of corpus size. Outputs are written
  * partitioned by `lang` — downstream training-data loaders prune by
  * language for free.
  */
class CurationPipeline(spark: SparkSession, corpusDir: String) {

  /** Doc ids removed as exact duplicates (all copies but the smallest id). */
  def exactDupIds(): DataFrame =
    Tables.documents(spark, corpusDir)
      .groupBy(md5(col("text")).as("h"))
      .agg(collect_list(col("doc_id")).as("ids"), min(col("doc_id")).as("keep"))
      .select(explode(col("ids")).as("doc_id"), col("keep"))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")

  /** Doc ids removed as near-duplicates (cluster members that are not the
    * cluster's keep-best survivor). */
  def nearDupIds(): DataFrame = {
    val best = Dedup.dedupKeepBest(spark, corpusDir)
    Dedup.dedupClusters(spark, corpusDir)
      .join(best, "cluster_id")
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id")
  }

  /** The curated corpus: exact dups out, near-dup losers out, quality
    * floor applied, optionally the Gopher hard-rule gate
    * ([[TextOps.textGopherRules]] — production chains run the cheap rule
    * filter BEFORE any model-based score), and (when `minLmScore` > 0)
    * the LM-table fluency floor ([[TextOps.textLmScore]]) on top — the
    * KenLM-filter stage of a production curation chain. */
  def curated(minQuality: Double = 0.0, minLmScore: Double = 0.0,
              lmVocabSize: Int = 1000,
              gopherRules: Boolean = false): DataFrame = {
    val docs = Tables.documents(spark, corpusDir)
    val drop = exactDupIds().unionByName(nearDupIds()).distinct()
    val deduped = docs.join(drop, Seq("doc_id"), "left_anti")
    val ruled =
      if (!gopherRules) deduped
      else deduped.join(TextOps.textGopherRules(spark, corpusDir)
          .filter(col("pass") === 1).select("doc_id"), "doc_id")
    val base = ruled
      .join(TextOps.textQuality(spark, corpusDir).select("doc_id", "quality"), "doc_id")
      .filter(col("quality") >= minQuality)
    if (minLmScore <= 0.0) base
    else base
      .join(TextOps.textLmScore(spark, corpusDir, lmVocabSize)
        .select("doc_id", "lm_score"), "doc_id")
      .filter(col("lm_score") >= minLmScore)
  }

  /** Corpus-health dashboard: the one-frame read an operator takes BEFORE
    * committing a curation run (and again after, on the curated output
    * directory, to verify the run moved the needles). One row per metric,
    * exact-integer values (counts or ppm):
    *
    *  - `total_docs`,
    *  - `exact_dup_ppm` / `near_dup_ppm` — duplication pressure,
    *  - `langid_agree_ppm` — label vs n-gram language-ID agreement
    *    ([[TextOps.textLangid]]); a drop flags mislabeled feeds,
    *  - `boilerplate_ppm` — corpus-level common-shingle share
    *    ([[TextOps.textBoilerplate]] aggregated exactly),
    *  - `charset_other_ppm` — non letter/digit/space character share
    *    ([[TextOps.textCharsetProfile]] aggregated): encoding damage,
    *  - `tokens_per_mchar` — corpus tokenizer fertility
    *    ([[TextOps.textFertility]] aggregated).
    *
    * Every tile reuses a registered operator's frame (zones and session
    * memos shared), re-aggregated to corpus level in exact longs — the
    * audit adds NO new scan shapes, so its cost profile is the operators'
    * own, and the facade can never disagree with the ops it summarizes.
    */
  def audit(): DataFrame = {
    import spark.implicits._
    val total = Tables.documents(spark, corpusDir).count()
    require(total > 0,
      s"empty corpus: no documents under '$corpusDir' — nothing to audit")
    // sums over zero rows come back null; a doc corpus can legitimately
    // produce empty operator frames (e.g. zero shingles on tiny docs), so
    // read them null-safely instead of throwing an opaque NPE
    def ratioPpm(df: DataFrame): Long =
      Option(df.first().getAs[java.lang.Long](0)).map(_.longValue).getOrElse(0L)
    val exact = exactDupIds().count()
    val near = nearDupIds().count()
    val langAgree = ratioPpm(TextOps.textLangid(spark, corpusDir)
      .agg(sum(col("agree"))))
    val boiler = ratioPpm(TextOps.textBoilerplate(spark, corpusDir)
      .agg(sum(col("n_common")).as("c"), sum(col("n_shingles")).as("s"))
      .select(expr("c * 1000000L div s")))
    val charset = ratioPpm(TextOps.textCharsetProfile(spark, corpusDir)
      .agg(sum(col("n_other")).as("o"), sum(col("n_chars")).as("c"))
      .select(expr("o * 1000000L div c")))
    val fertility = ratioPpm(TextOps.textFertility(spark, corpusDir)
      .agg(sum(col("n_tokens")).as("t"), sum(col("n_chars")).as("c"))
      .select(expr("t * 1000000L div c")))
    Seq(
      "total_docs" -> total,
      "exact_dup_ppm" -> exact * 1000000L / total,
      "near_dup_ppm" -> near * 1000000L / total,
      "langid_agree_ppm" -> langAgree * 1000000L / total,
      "boilerplate_ppm" -> boiler,
      "charset_other_ppm" -> charset,
      "tokens_per_mchar" -> fertility,
    ).toDF("metric", "value")
  }

  /** Run the pipeline: write the curated corpus (partitioned by lang) and
    * return the audit counts per stage. Counts are DISJOINT: an exact
    * duplicate that is (inevitably) also a near-dup loser is charged to
    * the exact stage only, so the four stage counts sum to `total_docs`.
    */
  def run(outDir: String, minQuality: Double = 0.0): Map[String, Long] = {
    val total = Tables.documents(spark, corpusDir).count()
    val exactIds = exactDupIds()
    val exact = exactIds.count()
    val near = nearDupIds().join(exactIds, Seq("doc_id"), "left_anti").count()
    val out = curated(minQuality)
    out.write.mode("overwrite").partitionBy("lang").parquet(outDir)
    // explicit schema on the read-back: a floor aggressive enough to drop
    // EVERYTHING writes a data-file-less output dir, and schema inference
    // would then fail with UNABLE_TO_INFER_SCHEMA — a user's miscalibrated
    // threshold must surface as kept=0, not as an analysis error
    val kept = spark.read.schema(out.schema).parquet(outDir).count()
    Map(
      "total_docs" -> total,
      "exact_dups_removed" -> exact,
      "near_dups_removed" -> near,
      "quality_filtered" -> (total - exact - near - kept),
      "kept" -> kept)
  }
}
