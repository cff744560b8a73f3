package graft.analytics

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis suite for corpus curation (SURVEY §2.5): token counting,
  * quality scoring, stopword-profile language ID, and corpus n-gram
  * statistics. Everything is a single codegen'd projection (+ one agg for
  * the corpus stats) — per-document work never shuffles.
  */
object TextOps {

  /** Word regex shared by both engines: runs of letters, runs of digits,
    * or single other non-space symbols (a BPE-ish pre-tokenizer shape). */
  private val WordRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  // ------------------------------------------------------- #28 token stats
  /** Per-document token counts: whitespace tokens, regex word tokens, and
    * distinct-token vocabulary size. */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // Fused native kernel ([[graft.functions.Sig.tokenStats]]): one byte
    // pass per doc instead of two split arrays + a regex match array —
    // spec-checked equal to the declarative form below and to the oracle.
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenStats(col("text")).as("ts"))
      .select(col("doc_id"), col("ts.n_ws_tokens").as("n_ws_tokens"),
        col("ts.n_words").as("n_words"), col("ts.n_vocab").as("n_vocab"),
        col("ts.n_chars").as("n_chars"))
      .orderBy("doc_id")
  }

  val textTokensSql: String =
    s"""SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_ws_tokens,
      |       len(regexp_extract_all(lower(text), '$WordRe')) AS n_words,
      |       len(list_distinct(string_split(text, ' '))) AS n_vocab,
      |       length(text) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- #29 quality score
  /** Heuristic quality scoring: stopword ratio, alphabetic-character
    * ratio, and a length cap, combined with fixed weights. The arithmetic
    * (and its association order) is written identically in both engines so
    * the rounded score is bit-stable.
    */
  /** Per-document quality profile, published once per corpus
    * ([[graft.ops.DerivedZone]] `doc_quality`). The projection itself is
    * one map-side pass, but FOUR consumers otherwise re-run it over the
    * full corpus — `text_quality`, [[Dedup.dedupKeepBest]]'s per-cluster
    * argmax, and [[graft.CurationPipeline]]'s quality floor and audit.
    * At ×1000 each pass costs ~18 s of scan+kernel (measured round 14,
    * `bench_keepbest_x1000_isolated_r14.json`), so the second consumer
    * already pays the build back; the zone row is 5 narrow columns —
    * ~1/400th of the text it summarizes.
    */
  private[graft] val qualityMemo =
    new graft.ops.DerivedZone("doc_quality", Seq("documents.parquet"))

  private def qualityFrame(spark: SparkSession, dir: String): DataFrame =
    qualityMemo.get(spark, dir) {
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val stopCnt = size(filter(toks, t =>
        Stopwords.map(s => t === s).reduce(_ || _)))
      val alphaLen = length(regexp_replace(col("text"), "[^a-z]", ""))
      val stopRatio = stopCnt / nTok
      val alphaRatio = alphaLen / length(col("text"))
      val lenCap = least(nTok / lit(100), lit(1.0))
      Tables.documents(spark, dir).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(stopRatio, 6).as("stop_ratio"),
        round(alphaRatio, 6).as("alpha_ratio"),
        round((lit(0.4) * stopRatio + lit(0.3) * alphaRatio) + lit(0.3) * lenCap, 6)
          .as("quality"))
    }

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    qualityFrame(spark, dir).orderBy("doc_id")

  val textQualitySql: String = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_tokens,
      |       round(len(list_filter(string_split(text, ' '), t -> t IN ($inList)))
      |             / len(string_split(text, ' ')), 6) AS stop_ratio,
      |       round(length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text), 6) AS alpha_ratio,
      |       round((0.4 * (len(list_filter(string_split(text, ' '), t -> t IN ($inList)))
      |                     / len(string_split(text, ' ')))
      |              + 0.3 * (length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)))
      |             + 0.3 * least(len(string_split(text, ' ')) / 100, 1.0), 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- #30 language ID
  /** Stopword-profile language ID: score each language by its marker-word
    * hit count; highest score wins, ties broken by a fixed language
    * priority. Reported next to the table's `lang` label (the synthetic
    * corpus shares one vocabulary, so this gauges the *plumbing*, and the
    * agreement flag is part of the checked output).
    */
  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "is", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "les", "est", "et", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "he2", "zai4"))

  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    // hot path: ONE compiled pass over the text scores all profiles at
    // once (graft_profile_scores kernel) — the declarative per-profile
    // `filter(toks, OR-chain)` ran interpreted per token per profile and
    // was a top-3 CPU scaler at sf10. [[textLangidDeclarative]] keeps the
    // HOF form; FunctionsSpec pins both-ways equivalence on real docs.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_langid_scores",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ProfileScores(args.head, Profiles.map(_._2)),
      "built-in")
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      call_function("graft_langid_scores", col("text")).as("sc"))
    val withScores = Profiles.zipWithIndex.foldLeft(scored) {
      case (df, ((l, _), i)) => df.withColumn(s"s_$l", col("sc").getItem(i))
    }
    // argmax with fixed priority: first profile with score == max wins
    val maxScore = greatest(Profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = Profiles.foldRight(lit("und")) { case ((l, _), els) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, lit(l)).otherwise(els)
    }
    withScores.select(
      col("doc_id"), col("lang"),
      predicted.as("predicted"),
      (col("lang") === predicted).cast("int").as("agree"))
      .orderBy("doc_id")
  }

  /** The higher-order-function formulation of [[textLangid]] — the
    * kernel's reference semantics, kept for the both-ways spec. */
  private[graft] def textLangidDeclarative(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    def score(words: Seq[String]): Column =
      size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))
    val withScores = Profiles.foldLeft(Tables.documents(spark, dir)) {
      case (df, (l, words)) => df.withColumn(s"s_$l", score(words))
    }
    val maxScore = greatest(Profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = Profiles.foldRight(lit("und")) { case ((l, _), els) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, lit(l)).otherwise(els)
    }
    withScores.select(
      col("doc_id"), col("lang"),
      predicted.as("predicted"),
      (col("lang") === predicted).cast("int").as("agree"))
      .orderBy("doc_id")
  }

  val textLangidSql: String = {
    def scoreSql(words: Seq[String]): String = {
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($inList)))"
    }
    val scores = Profiles.map { case (l, ws) => s"${scoreSql(ws)} AS s_$l" }.mkString(",\n  ")
    val maxExpr = "greatest(" + Profiles.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
    val predicted = Profiles.foldRight("'und'") { case ((l, _), els) =>
      s"CASE WHEN s_$l = m AND m > 0 THEN '$l' ELSE $els END"
    }
    s"""WITH s AS (
      |  SELECT doc_id, lang,
      |  $scores
      |  FROM documents),
      |m AS (SELECT *, $maxExpr AS m FROM s)
      |SELECT doc_id, lang, $predicted AS predicted,
      |       CAST(lang = ($predicted) AS INT) AS agree
      |FROM m ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------- #34 stratified sample
  /** Deterministic stratified sampling: per-language keep rates applied by
    * content-hash bucket (`polyhash(text) mod 10 < rate`). Hash-mod
    * sampling is reproducible across runs, clusters and engines — the
    * curation property rejection-sampling with RNGs can't give — and the
    * per-stratum audit counts ride along in the same pass.
    */
  private val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 2, "de" -> 5, "es" -> 5, "fr" -> 5, "zh" -> 5) // of 10

  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val rate = SampleRates.foldRight(lit(0)) { case ((l, r), els) =>
      when(col("lang") === l, lit(r)).otherwise(els)
    }
    // native polyhash: one compiled loop per row instead of the
    // interpreted per-char lambda fold (same arithmetic, same oracle)
    val bucket = pmod(graft.functions.GraftFunctions.polyhash(col("text")), lit(10L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), bucket.as("h10"), rate.as("rate"))
      .filter(col("h10") < col("rate"))
      .select(col("doc_id"), col("lang"), col("h10").cast("long").as("h10"))
      .orderBy("doc_id")
  }

  val sampleStratifiedSql: String = {
    val rate = SampleRates.foldRight("0") { case ((l, r), els) =>
      s"CASE WHEN lang = '$l' THEN $r ELSE $els END"
    }
    s"""SELECT doc_id, lang, (${graft.functions.Portable.polyHashSql("text")}) % 10 AS h10
      |FROM documents
      |WHERE (${graft.functions.Portable.polyHashSql("text")}) % 10 < ($rate)
      |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ #53 repetition signal
  /** Within-document repetition signals — the classic quality filters for
    * generated/boilerplate text: the fraction of duplicate word 3-grams
    * (1 − distinct/total) and the share of the single most frequent
    * token. Both are pure integer counts inside one native-kernel
    * projection + one small agg; ratios round to 6 dp in both engines.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val toks = split(col("text"), " ")
    // Round 15 (guide §2.4): per-doc n_tokens/max_tf come from the
    // graft_gopher_stats compiled kernel — ONE linear pass per document
    // inside the scan projection. The previous shape exploded the token
    // stream and aggregated it twice ((doc,tok) tf, then per-doc
    // max/sum): two fact-sized exchanges plus a join back to the gram
    // projection, all to recover two integers the kernel already
    // maintains. The kernel's token contract (split(-1) byte-equality,
    // empties kept) is spec-pinned bit-identical to the exploded form;
    // n_tokens casts back to long so the output schema is unchanged.
    // Zero exchanges remain except the final ORDER BY.
    Tables.documents(spark, dir).select(
        col("doc_id"),
        graft.functions.GraftFunctions.gopherStats(col("text")).as("st"),
        size(graft.functions.GraftFunctions.ngrams(toks, 3, distinct = false)).as("n_g3"),
        size(graft.functions.GraftFunctions.ngrams(toks, 3, distinct = true)).as("n_g3_distinct"))
      .select(col("doc_id"), col("st.n_tokens").cast("long").as("n_tokens"),
        when(col("n_g3") > 0,
          round(lit(1.0) - col("n_g3_distinct") / col("n_g3"), 6)).otherwise(0.0)
          .as("dup_g3_frac"),
        round(col("st.max_tf") / col("st.n_tokens"), 6).as("top_token_share"))
      .orderBy("doc_id")
  }

  val textRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |         greatest(len(toks) - 2, 0) AS n_g3,
      |         len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                            for i in range(1, len(toks) - 1)])) AS n_g3_distinct,
      |         unnest(toks) AS tok
      |  FROM t),
      |tf AS (
      |  SELECT doc_id, n_tokens, n_g3, n_g3_distinct, tok, count(*) AS tf
      |  FROM g GROUP BY 1, 2, 3, 4, 5),
      |agg AS (
      |  SELECT doc_id, n_tokens, n_g3, n_g3_distinct, max(tf) AS max_tf
      |  FROM tf GROUP BY 1, 2, 3, 4)
      |SELECT doc_id, n_tokens,
      |       CASE WHEN n_g3 > 0
      |            THEN round(1.0 - n_g3_distinct / n_g3, 6) ELSE 0.0 END AS dup_g3_frac,
      |       round(max_tf / n_tokens, 6) AS top_token_share
      |FROM agg ORDER BY doc_id""".stripMargin

  // --------------------------------------------- #47 exact stratum median
  /** Exact per-language median document length (lower median, integer
    * position `(n+1) div 2` — no interpolation, so both engines agree
    * exactly). Computed from the LENGTH HISTOGRAM, not a per-doc sort:
    * the first aggregation collapses to (lang, n_chars) bins map-side,
    * and the cumulative window runs over distinct length values only — at
    * 100 TB that is a few thousand rows per stratum instead of sorting
    * every document.
    */
  def textLengthMedian(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(spark, dir)
      .groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_docs", sum(col("c")).over(wTot))
      // the bin whose cumulative range covers the median position
      .filter(col("cum") - col("c") < expr("(n_docs + 1) div 2") &&
        expr("(n_docs + 1) div 2") <= col("cum"))
      .select(col("lang"), col("n_docs"), col("n_chars").as("median_chars"))
      .orderBy("lang")
  }

  val textLengthMedianSql: String =
    """WITH ranked AS (
      |  SELECT lang, doc_id, n_chars,
      |         row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS rk,
      |         count(*) OVER (PARTITION BY lang) AS n_docs
      |  FROM documents)
      |SELECT lang, n_docs, n_chars AS median_chars
      |FROM ranked WHERE rk = (n_docs + 1) // 2
      |ORDER BY lang""".stripMargin

  // ------------------------------------------ #45 fixed-k stratum sample
  /** Deterministic exactly-k-per-language sample: rank docs inside each
    * stratum by content hash (reproducible across runs/engines, unlike an
    * RNG) and keep the k smallest. Selection runs through the bounded-heap
    * `graft_topk` aggregate — each map task keeps ≤ k candidates per
    * stratum, so a 100 TB stratum never funnels through one task's window
    * sort (`row_number` would); the oracle recomputes the same ranking
    * with a window.
    */
  private val FixedK = 20

  def sampleFixedK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // topk keeps the LARGEST scores; negate the hash so "k smallest
    // hashes" wins (hash < 2^31, exact in double)
    val scored = Tables.documents(spark, dir).select(col("lang"), col("doc_id"),
      (-graft.functions.GraftFunctions.polyhash(col("text"))).cast("double").as("score"))
    scored.groupBy("lang")
      .agg(graft.functions.GraftFunctions
        .topk(struct(col("score"), col("doc_id")), FixedK).as("tk"))
      .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).as("rank"),
        col("t.id").as("doc_id"), (-col("t.score")).cast("long").as("h"))
      .orderBy("lang", "rank")
  }

  val sampleFixedKSql: String =
    s"""WITH h AS (
      |  SELECT lang, doc_id, ${graft.functions.Portable.polyHashSql("text")} AS h
      |  FROM documents)
      |SELECT lang, rank, doc_id, h FROM (
      |  SELECT lang, doc_id, h,
      |         row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rank
      |  FROM h) t
      |WHERE rank <= $FixedK
      |ORDER BY lang, rank""".stripMargin

  // ------------------------------------------- #35 winnowing fingerprint
  /** Rolling-hash document fingerprinting (winnowing): hash every word
    * 3-gram, slide a window of 4 consecutive hashes, keep each window's
    * minimum — the classic plagiarism/near-dup fingerprint scheme whose
    * selected-hash density is guaranteed ≥ 1 per window. Output is the
    * per-document fingerprint profile; matching profiles across docs are
    * containment near-dups.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // whole pipeline (gram hash → sliding window min → distinct) in one
    // native compiled kernel: the declarative transform/slice form was
    // interpreted per element and cost ~49 s at sf0.1 under full
    // evaluation (graft.functions.Sig.winnow, parity-specced)
    val fps = graft.functions.GraftFunctions.winnow(
      graft.functions.GraftFunctions.ngrams(split(col("text"), " "), 3, distinct = false), 4)
    Tables.documents(spark, dir)
      .select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"),
        size(col("fps")).as("n_fps"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy("doc_id")
  }

  val textFingerprintSql: String = {
    val hs = s"list_transform(grams, s -> ${graft.functions.Portable.polyHashSql("s")})"
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                  for i in range(1, len(t) - 1)] AS grams
      |  FROM toks),
      |hashed AS (SELECT doc_id, $hs AS hs FROM grams),
      |fps AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(hs) >= 4
      |         THEN [list_min(hs[j:j+3]) for j in range(1, len(hs) - 2)]
      |         WHEN len(hs) > 0 THEN [list_min(hs)]
      |         ELSE [] END) AS fps
      |  FROM hashed)
      |SELECT doc_id, len(fps) AS n_fps, list_min(fps) AS min_fp, list_max(fps) AS max_fp
      |FROM fps ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------- #41 top distinctive term
  /** The `(doc_id, term, tf, df)` term-frequency/document-frequency
    * frame, published once per corpus ([[graft.ops.DerivedZone]]
    * `text_tf_df`): the shared heavy stage of the keyword family —
    * [[textTopTerm]] (the #2 ×1000 query at 141 s, round 14) and
    * [[textSalientTerms]] (67.8 s) each rebuilt the identical
    * explode → (doc,term) count → df aggregate → tf⋈df join per run.
    * The BUILD shuffles twice (composite (doc,term) key with map-side
    * combine, then term) and joins term-partitioned sides; consumers
    * read the zone and pay only their own per-doc window (doc_id
    * shuffle, WindowGroupLimit-prefiltered). All-exact longs — the
    * parquet round trip is bit-safe. ~|distinct (doc,term)| rows,
    * i.e. a fraction of the text it summarizes. */
  private[graft] val tfDfMemo =
    new graft.ops.DerivedZone("text_tf_df", Seq("documents.parquet"))

  private def tfDfFrame(spark: SparkSession, dir: String): DataFrame =
    tfDfMemo.get(spark, dir) {
      // Round 16 (§1.2 step 1, measured by tools/NgramBuildProbe): the
      // old build exchanged the RAW token stream to aggregate tf —
      // 270.7M (doc, term) rows and 110 s of the 186 s ×1000 build. The
      // per-doc term counts are computable in-row (graft_term_counts,
      // identical counts by construction, spec-pinned), so tf now
      // emerges MAP-SIDE from one compiled pass; the one exchange left
      // clusters the already-aggregated tf rows (116M at ×1000) by term,
      // and both df (count over the term partition — a window, so the
      // two consumers of the exchange cannot diverge under per-branch
      // column pruning and replay the scan, the round-11
      // q_waiting_suppliers defect class) and the tf⋈df attach run
      // inside that partitioning with zero further exchanges.
      graft.functions.GraftFunctions.register(spark)
      val tf = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(graft.functions.GraftFunctions
          .termCounts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        .repartition(col("term"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("term")
      tf.withColumn("df", count(lit(1)).over(w))
        .select(col("doc_id"), col("term"), col("tf"), col("df"))
    }

  /** Per-document keyword extraction: the term maximizing
    * (tf DESC, df ASC, term ASC) — "most frequent in the doc, rarest in
    * the corpus". The tf-idf idea in pure integer ordering: no float idf
    * logs, so both engines rank bit-identically. Reads the shared
    * [[tfDfFrame]] zone; the only per-run work is the per-doc argmax
    * window over doc_id (millions of tiny groups — spreads, never
    * funnels).
    */
  def textTopTerm(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tfDfFrame(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("term").as("top_term"), col("tf"), col("df"))
      .orderBy("doc_id")
  }

  val textTopTermSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |ranked AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |                            ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, term AS top_term, tf, df FROM ranked WHERE rk = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- #31 n-gram stats
  /** Corpus bigram frequency: top 100 bigrams with doc frequency and total
    * count — the classic n-gram statistics sweep.
    *
    * Scale shape (round-13 rework): TWO gram-keyed aggregations joined on
    * the gram key — total counts over the raw explode, doc frequencies
    * over the per-doc DISTINCT explode (the compiled NGrams kernel
    * dedupes in-doc repeats map-side) — so BOTH partial aggregations
    * collapse each task to its distinct-gram set and the only exchanges
    * carry ~|vocab²|-bounded gram keys. The previous one-liner
    * (`agg(count, countDistinct(doc_id))`) looked like one aggregation
    * but planned as Spark's single-distinct rewrite: a FIRST aggregation
    * keyed on `(gram, doc_id)`, whose partial maps collapse almost
    * nothing (a doc contributes each gram once) — the shuffle carried
    * ~70 rows per document and the per-task hash maps fell off a spill
    * cliff past ~1M docs. Measured on the constant-vocabulary control
    * corpus (keys pinned, rows ×10): 4.8 → 120.6 s for 10× rows on the
    * old shape — the cliff, not key growth; the rework is re-measured in
    * BENCH_SCALING.md.
    */
  def textNgramStats(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    def grams(distinct: Boolean) = docs.select(explode(graft.functions
      .GraftFunctions.ngrams(split(col("text"), " "), 2, distinct)).as("gram"))
    val tf = grams(distinct = false).groupBy("gram")
      .agg(count(lit(1)).as("n"))
    val dfq = grams(distinct = true).groupBy("gram")
      .agg(count(lit(1)).as("n_docs"))
    tf.join(dfq, "gram")
      .select(col("gram"), col("n"), col("n_docs"))
      .orderBy(col("n").desc, col("gram"))
      .limit(100)
  }

  val textNgramStatsSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS gram
      |  FROM toks)
      |SELECT gram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM grams GROUP BY gram
      |ORDER BY n DESC, gram LIMIT 100""".stripMargin

  /** #62 text_decontaminate: eval-set contamination check — flag training
    * documents that share any word-3-gram with a held-out "benchmark" set
    * (the decontamination step every LLM data pipeline runs before
    * training; production systems use 8-13-grams, the synthetic docs are
    * short so 3-grams keep the check exercised). The benchmark set here is
    * the deterministic slice `doc_id % 97 == 0`.
    *
    * Scale shape: the benchmark set is tiny by construction, so its
    * shingle set BROADCASTs and the overlap test is a broadcast semi-ish
    * join against the exploded training shingles — the corpus shuffles
    * nothing, and the aggregation back to doc level is map-side partial.
    */
  def textDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    def grams(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.functions.GraftFunctions
        .ngrams(split(col("text"), " "), 3, distinct = true)).as("g"))
    val bench = grams(docs.filter(col("doc_id") % 97 === 0))
      .select(col("g")).distinct()
    grams(docs.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy("doc_id")
  }

  val textDecontaminateSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |shingled AS (SELECT doc_id, ${graft.functions.Portable.shingles3Sql("t")} AS sh FROM toks),
      |grams AS (SELECT doc_id, unnest(sh) AS g FROM shingled),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
      |SELECT doc_id, count(*) AS n_contaminated_grams
      |FROM grams JOIN bench USING (g)
      |WHERE doc_id % 97 <> 0
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Query terms for [[keywordSearch]] — corpus-frequent vocabulary so the
    * AND-conjunction still selects a meaningful result set. */
  private val SearchTerms = Seq("spark", "join")

  /** #70 text_keyword_search: conjunctive keyword search with term-
    * frequency ranking — every query term must appear; docs rank by total
    * tf with doc_id tiebreak. The text-corpus face of the engine's search
    * surface (metadata_search is the object-store face).
    *
    * Scale shape: one codegen'd projection computes all per-term tfs in a
    * single pass over each doc's tokens; the top-k is
    * TakeOrderedAndProject (no global sort). At an indexed 100 TB the
    * same ranking runs over an inverted-index join ([[Dedup.corpusOverlap]]
    * shows that shape); the scan form here is the index-free baseline.
    */
  def keywordSearch(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val tfs = SearchTerms.map(t =>
      size(filter(toks, x => x === t)).cast("long").as(s"tf_$t"))
    Tables.documents(spark, dir)
      .select(col("doc_id") +: tfs: _*)
      .filter(SearchTerms.map(t => col(s"tf_$t") > 0).reduce(_ && _))
      .withColumn("score", SearchTerms.map(t => col(s"tf_$t")).reduce(_ + _))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val keywordSearchSql: String = {
    val tfs = SearchTerms.map(t =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n      |         ")
    s"""WITH scored AS (
      |  SELECT doc_id,
      |         $tfs
      |  FROM documents)
      |SELECT doc_id, ${SearchTerms.map(t => s"tf_$t").mkString(", ")},
      |       ${SearchTerms.map(t => s"tf_$t").mkString(" + ")} AS score
      |FROM scored
      |WHERE ${SearchTerms.map(t => s"tf_$t > 0").mkString(" AND ")}
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Per-language token budget for [[corpusMixture]] (sized so the
    * majority language is down-sampled and the tail keeps everything). */
  private val MixBudget = 10000L

  /** #76 corpus_mixture: mixture planning + deterministic weighted
    * sampling in one pass — compute each language's sampling rate to hit
    * a per-language token budget (rate in exact ppm, integer division),
    * then keep documents whose portable hash falls under the rate. The
    * "hit the target language mix" step between curation and packing in
    * a training-data pipeline.
    *
    * Scale shape: the per-language token totals are one tiny aggregate
    * that BROADCASTs back onto the scan; the keep decision is a
    * stateless per-row hash compare, so the sample needs no shuffle, no
    * sort, and re-runs identically on any cluster size.
    */
  def corpusMixture(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val totals = docs.groupBy(col("lang").as("l"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr(s"${MixBudget * 1000000L} div lang_tokens")))
    docs.join(broadcast(totals), col("lang") === col("l"))
      .filter(Portable.mixCube(
        Portable.polyHash(concat(lit("d"), col("doc_id").cast("string"))))
        % 1000000L < col("rate_ppm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_tokens")).as("n_tokens_kept"),
        max(col("rate_ppm")).as("rate_ppm"))
      .orderBy("lang")
  }

  val corpusMixtureSql: String = {
    import graft.functions.Portable
    val h = Portable.mixCubeSql(
      Portable.polyHashSql("'d' || CAST(doc_id AS VARCHAR)"))
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |totals AS (
      |  SELECT lang AS l, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens,
      |         least(1000000, ${MixBudget * 1000000L} // CAST(sum(n_tokens) AS BIGINT)) AS rate_ppm
      |  FROM d GROUP BY 1)
      |SELECT lang, count(*) AS n_docs_kept,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept,
      |       max(rate_ppm) AS rate_ppm
      |FROM d JOIN totals ON lang = l
      |WHERE ($h) % 1000000 < rate_ppm
      |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ------------------------- #106 temperature-flattened language mixture
  /** #106 corpus_temperature: temperature sampling across languages — the
    * multilingual-LM curation step that UP-weights low-resource languages
    * relative to their raw frequency (the classic p^α flattening with
    * α = 0.5): per-language sampling weight w_l = ⌊√n_l⌋ (integer sqrt is
    * bit-exact in both engines, unlike a general pow), a half-corpus
    * budget split ∝ w_l in pure integer arithmetic, and each language's
    * quota filled by the documents with the smallest portable hash — a
    * deterministic, engine-independent sample whose exact membership the
    * oracle gates via a doc-id checksum.
    *
    * Scale shape — exact per-language rank WITHOUT a per-language global
    * sort (a `row_number() OVER (PARTITION BY lang)` puts a billion rows
    * in one partition per language at 100 TB): the hash domain is cut
    * into ~1000 cells, a (lang, cell) histogram (map-side combined, tiny)
    * yields broadcastable per-cell prefix offsets, and ranking happens
    * only WITHIN (lang, cell) partitions — global rank = cell offset +
    * within-cell rank, work per partition bounded by the cell width.
    * The quota table itself is languages-sized (broadcast by
    * construction: language count doesn't grow with the corpus).
    */
  def corpusTemperature(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable
    import org.apache.spark.sql.expressions.Window
    val bucket = 1L << 20
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
      Portable.polyHash(concat(lit("t"), col("doc_id").cast("string"))).as("h"))
      .withColumn("cell", expr(s"h div $bucket"))
    val stats = docs.groupBy(col("lang").as("l"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = stats.agg(sum(col("weight")).as("w_sum"),
      sum(col("n_docs")).as("total_docs"))
    val quotas = stats.join(broadcast(tot))
      .select(col("l"), col("n_docs"), col("weight"),
        least(col("n_docs"), expr("total_docs div 2 * weight div w_sum")).as("quota"))
    val hist = docs.groupBy(col("lang").as("hl"), col("cell").as("hc"))
      .agg(count(lit(1)).as("n"))
    // prefix offsets over the HISTOGRAM (languages × ~1000 cells — tiny)
    val offsets = hist.withColumn("cell_off",
      coalesce(sum(col("n")).over(Window.partitionBy("hl").orderBy("hc")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("hl"), col("hc"), col("cell_off"))
    val cellRank = Window.partitionBy("lang", "cell").orderBy(col("h"), col("doc_id"))
    docs.withColumn("cell_rnk", row_number().over(cellRank))
      .join(broadcast(offsets),
        col("lang") === col("hl") && col("cell") === col("hc"))
      .withColumn("rnk", col("cell_off") + col("cell_rnk"))
      .join(broadcast(quotas), col("lang") === col("l"))
      .withColumn("kept", col("rnk") <= col("quota"))
      .groupBy("lang")
      .agg(max(col("n_docs")).as("n_docs"), max(col("weight")).as("weight"),
        max(col("quota")).as("quota"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_doc_sum"))
      .orderBy("lang")
  }

  val corpusTemperatureSql: String = {
    import graft.functions.Portable
    val h = Portable.polyHashSql("'t' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
      |  SELECT doc_id, lang, ($h) AS h FROM documents),
      |stats AS (
      |  SELECT lang AS l, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(floor(sqrt(count(*))) AS BIGINT) AS weight
      |  FROM d GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(weight) AS BIGINT) AS w_sum,
      |         CAST(sum(n_docs) AS BIGINT) AS total_docs FROM stats),
      |q AS (
      |  SELECT l, n_docs, weight,
      |         least(n_docs, total_docs // 2 * weight // w_sum) AS quota
      |  FROM stats, tot),
      |r AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk
      |  FROM d)
      |SELECT lang, max(n_docs) AS n_docs, max(weight) AS weight,
      |       max(quota) AS quota,
      |       CAST(sum(CASE WHEN rnk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN rnk <= quota THEN doc_id ELSE 0 END) AS BIGINT) AS kept_doc_sum
      |FROM r JOIN q ON lang = l
      |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Tokens per packed training sequence for [[seqPack]]. */
  private val SeqLen = 256

  /** #64 seq_pack: GPT-style sequence packing — the step that turns a
    * curated corpus into fixed-length training sequences. Documents are
    * concatenated in deterministic order within each language stream and
    * every doc is assigned the range of [[SeqLen]]-token sequences it
    * lands in (docs may span a boundary, exactly like real token-stream
    * packing).
    *
    * Scale shape: the only stateful step is a prefix-sum window
    * PARTITIONED BY the stream key (`lang`) — each stream packs
    * independently and in parallel, which is precisely how a 100 TB
    * packing job shards (per language / per shard file, never one global
    * order). Everything else is a codegen'd projection.
    */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("first_seq", expr(s"start_tok div $SeqLen"))
      .withColumn("last_seq", expr(s"(start_tok + n_tokens - 1) div $SeqLen"))
      .orderBy("doc_id")
  }

  val seqPackSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, lang, n_tokens,
      |         CAST(coalesce(sum(n_tokens) OVER (
      |           PARTITION BY lang ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS start_tok
      |  FROM d)
      |SELECT doc_id, lang, n_tokens, start_tok,
      |       start_tok // $SeqLen AS first_seq,
      |       (start_tok + n_tokens - 1) // $SeqLen AS last_seq
      |FROM p ORDER BY doc_id""".stripMargin

  /** Patterns shared between the Spark query and the DuckDB oracle — both
    * dialects (java.util.regex / RE2) read these identically. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+1-555-[0-9]{4}"

  /** #60 pii_scrub: PII redaction pass — count and replace email addresses
    * and phone numbers before a corpus ships to training. The corpus is
    * the documents table with one deterministic synthetic email + phone
    * appended per doc (the raw synthetic text contains no PII, and the
    * injection makes the scrub verifiable end-to-end: the oracle gates the
    * match counts AND the md5 of the scrubbed text).
    *
    * Hot path is the fused `graft_scrub` kernel
    * ([[graft.functions.Sig.scrub]]): both counts and the scrubbed text in
    * compiled byte-level scans inside one whole-stage-codegen projection —
    * replacing the four java.util.regex passes (+2 intermediate string
    * materializations) of the declarative chain, which was the worst
    * purely-CPU scaler at sf10. [[piiScrubDeclarative]] keeps the regex
    * form; FunctionsSpec pins kernel ≡ regex on real docs and adversarial
    * pattern edge cases, and the DuckDB oracle (RE2) gates this query's
    * full output hash — three independent engines agreeing.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), injected.as("text"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.scrub(col("text")).as("s"))
      .select(col("doc_id"),
        col("s.n_emails").as("n_emails"),
        col("s.n_phones").as("n_phones"),
        md5(col("s.scrubbed")).as("scrub_hash"))
      .orderBy("doc_id")
  }

  /** The regex formulation of [[piiScrub]] — the kernel's reference
    * semantics, kept for the both-ways equivalence spec. */
  private[graft] def piiScrubDeclarative(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), injected.as("text"))
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).cast("int").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("scrub_hash"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String =
    s"""WITH corpus AS (
      |  SELECT doc_id,
      |         text || ' contact user' || CAST(doc_id AS VARCHAR)
      |              || '@mail.example.com or +1-555-'
      |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
      |       CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
      |       md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
      |                          '$PhoneRe', '<PHONE>', 'g')) AS scrub_hash
      |FROM corpus ORDER BY doc_id""".stripMargin

  // ----------------------------------- #93 LM-table fluency score
  private val LmVocabSize = 1000

  /** Per-document LM-table counts `(doc_id, n_bigrams, n_in_vocab)` at
    * the default vocabulary size, published once per corpus
    * ([[graft.ops.DerivedZone]] `lm_doc_score` — the `doc_quality`
    * move). The build is the expensive part of the whole LM family: TWO
    * bigram-explode passes over the corpus (vocab histogram + scoring
    * join), and THREE consumers otherwise re-run both per session —
    * `text_lm_score`, [[textPerplexityBucket]]'s ppm scores, and
    * [[graft.CurationPipeline]]'s fluency floor. Measured ×1000 the
    * rebuild cost ~40-66 s/run (round-14 flag); the zone row is 3 exact
    * longs per doc, so warm runs are a narrow parquet read. Exact
    * integers only — the parquet round trip is bit-safe. */
  private[graft] val lmScoreMemo =
    new graft.ops.DerivedZone("lm_doc_score", Seq("documents.parquet"))

  /** The zone's build: bigram-explode → vocab top-k (count-desc/gram-asc,
    * deterministic) → broadcast membership join → per-doc counts, left-
    * joined back onto the doc spine so zero-bigram docs keep a row. */
  private def lmScoreCounts(spark: SparkSession, dir: String,
                            vocabSize: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val toks = split(col("text"), " ")
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.ngrams(toks, 2, distinct = false))
          .as("gram"))
    val vocab = grams.groupBy("gram").agg(count(lit(1)).as("gf"))
      .orderBy(col("gf").desc, col("gram")).limit(vocabSize)
      .select(col("gram"), lit(1).as("in_vocab"))
    val perDoc = grams.join(broadcast(vocab), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(sum(col("in_vocab")), lit(0L)).as("n_in_vocab"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_in_vocab"), lit(0L)).as("n_in_vocab"))
  }

  /** #93 text_lm_score: n-gram-LM-style fluency filter without floats —
    * the corpus's top-1000 bigram table stands in for the language model,
    * and each document scores the FRACTION of its bigram occurrences
    * found in the table (the KenLM-perplexity-filter shape, but as an
    * exact integer ratio instead of engine-dependent log-prob sums).
    *
    * Scale shape: the per-doc counts are a [[lmScoreMemo]] zone artifact
    * (build: vocab histogram shuffle, map-side combined; deterministic
    * count-desc/gram-asc top-k BROADCAST into the membership join), so a
    * warm query is one narrow zone scan plus the score projection. Docs
    * shorter than 2 tokens score 0 explicitly — no 0/0 division reaches
    * either engine.
    */
  def textLmScore(spark: SparkSession, dir: String): DataFrame =
    textLmScore(spark, dir, LmVocabSize)

  /** [[textLmScore]] with a caller-chosen vocabulary size (a corpus-
    * relative filter needs |vocab| ≪ |distinct bigrams| to discriminate —
    * the default 1000 suits real corpora, tests shrink it). Only the
    * default size serves from the published zone; a custom size is a
    * different artifact and builds live. */
  def textLmScore(spark: SparkSession, dir: String, vocabSize: Int): DataFrame = {
    val counts =
      if (vocabSize == LmVocabSize)
        lmScoreMemo.get(spark, dir)(lmScoreCounts(spark, dir, vocabSize))
      else lmScoreCounts(spark, dir, vocabSize)
    counts
      .select(col("doc_id"), col("n_bigrams"), col("n_in_vocab"),
        when(col("n_bigrams") > 0,
          round(col("n_in_vocab") / col("n_bigrams"), 6)).otherwise(0.0)
          .as("lm_score"))
      .orderBy("doc_id")
  }

  val textLmScoreSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |         unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS gram
      |  FROM t),
      |vocab AS (
      |  SELECT gram, 1 AS in_vocab FROM (
      |    SELECT gram, count(*) AS gf FROM grams GROUP BY gram
      |    ORDER BY gf DESC, gram LIMIT $LmVocabSize)),
      |per_doc AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |         coalesce(CAST(sum(in_vocab) AS BIGINT), 0) AS n_in_vocab
      |  FROM grams LEFT JOIN vocab USING (gram)
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |       coalesce(p.n_bigrams, 0) AS n_bigrams,
      |       coalesce(p.n_in_vocab, 0) AS n_in_vocab,
      |       CASE WHEN coalesce(p.n_bigrams, 0) > 0
      |            THEN round(p.n_in_vocab / p.n_bigrams, 6) ELSE 0.0 END AS lm_score
      |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------- #114 CCNet-style perplexity bucketing
  /** #114 text_perplexity_bucket: CCNet's head/middle/tail data-selection
    * split (Wenzek et al., "CCNet", LREC 2020) — per language, documents
    * are cut into fluency thirds by their LM score, and downstream
    * training mixes sample by bucket (head = cleanest third). The score
    * is [[textLmScore]]'s table-hit ratio in exact integer ppm
    * (`n_in_vocab·1e6 div n_bigrams`), so both engines rank identical
    * integers — no float-comparison edge at the cutoffs.
    *
    * Bucket boundaries are VALUE-based nearest-rank tertiles: per
    * language, `c1` = the score at rank ⌈n/3⌉ (descending), `c2` at
    * ⌈2n/3⌉, and a document's bucket is 0/1/2 by `score ≥ c1 / ≥ c2 /
    * else`. Ties at a cutoff all land in the better bucket —
    * deterministic under any row order, unlike rank-split ties.
    *
    * Scale shape (the text_length_median trick): the heavy shuffle
    * carries only the distinct `(lang, score)` HISTOGRAM (≤ 1e6 cells
    * per language, bounded by the ppm domain — not by corpus size); the
    * cutoff derivation is a cumulative window over those distinct values
    * per language, and the ≤ |langs|-row cutoff table BROADCASTS back
    * into the scoring stream. No per-document global sort anywhere.
    */
  def textPerplexityBucket(spark: SparkSession, dir: String): DataFrame = {
    val lm = textLmScore(spark, dir)
    val scored = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(lm.select(col("doc_id"),
        expr("n_in_vocab * 1000000 div greatest(n_bigrams, 1)").as("lm_ppm")),
        "doc_id")
    val hist = scored.groupBy("lang", "lm_ppm").agg(count(lit(1)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("lm_ppm").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    val cuts = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wLang))
      .groupBy("lang")
      .agg(max(when(col("cum") >= expr("(n + 2) div 3"), col("lm_ppm"))).as("c1"),
        max(when(col("cum") >= expr("(2 * n + 2) div 3"), col("lm_ppm"))).as("c2"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("lm_ppm"),
        when(col("lm_ppm") >= col("c1"), 0)
          .when(col("lm_ppm") >= col("c2"), 1)
          .otherwise(2).as("bucket"))
      .orderBy("doc_id")
  }

  val textPerplexityBucketSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |         unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS gram
      |  FROM t),
      |vocab AS (
      |  SELECT gram, 1 AS in_vocab FROM (
      |    SELECT gram, count(*) AS gf FROM grams GROUP BY gram
      |    ORDER BY gf DESC, gram LIMIT $LmVocabSize)),
      |per_doc AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |         coalesce(CAST(sum(in_vocab) AS BIGINT), 0) AS n_in_vocab
      |  FROM grams LEFT JOIN vocab USING (gram)
      |  GROUP BY doc_id),
      |scored AS (
      |  SELECT d.doc_id, d.lang,
      |         coalesce(p.n_in_vocab, 0) * 1000000
      |           // greatest(coalesce(p.n_bigrams, 0), 1) AS lm_ppm
      |  FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id),
      |hist AS (
      |  SELECT lang, lm_ppm, count(*) AS cnt FROM scored GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, lm_ppm, cnt,
      |         CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY lm_ppm DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |         CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
      |  FROM hist),
      |cuts AS (
      |  SELECT lang,
      |         max(CASE WHEN cum >= (n + 2) // 3 THEN lm_ppm END) AS c1,
      |         max(CASE WHEN cum >= (2 * n + 2) // 3 THEN lm_ppm END) AS c2
      |  FROM cum GROUP BY lang)
      |SELECT s.doc_id, s.lang, s.lm_ppm,
      |       CASE WHEN s.lm_ppm >= c.c1 THEN 0
      |            WHEN s.lm_ppm >= c.c2 THEN 1 ELSE 2 END AS bucket
      |FROM scored s JOIN cuts c ON s.lang = c.lang
      |ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------ #87 count-min sketch (CMS)
  private val CmsDepth = 4
  private val CmsWidth = 512

  /** #87 text_cms: count-min-sketch term frequencies, reported beside the
    * exact counts for the corpus's top-50 terms (estimate ≥ exact always;
    * `overcount` is the collision error the 4×512 sketch admits).
    *
    * Scale shape — the reason CMS exists: the sketch build shuffles only
    * `depth × width` = 2048 CELL keys no matter how many tokens or
    * distinct terms the corpus has (per-occurrence native `graft_polyhash`
    * + universal-hash cell assignment are map-side, and the cell counts
    * partial-aggregate before the shuffle). Cells are sums, so per-shard
    * sketches merge by addition — the mergeable-summary contract. The
    * exact top-50 here is the verification harness, not part of the
    * sketch's cost.
    */
  def textCms(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.{GraftFunctions, Portable}
    val js = sequence(lit(0L), lit(CmsDepth - 1L))
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val cells = toks
      .select(GraftFunctions.polyhash(col("term")).as("h"))
      .select(col("h"), explode(js).as("j"))
      .select(col("j"), pmod(Portable.hashJ(col("h"), col("j")), lit(CmsWidth.toLong)).as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(50)
    top
      .select(col("term"), col("exact_cnt"),
        GraftFunctions.polyhash(col("term")).as("h"))
      .select(col("term"), col("exact_cnt"), col("h"), explode(js).as("j"))
      .withColumn("cell", pmod(Portable.hashJ(col("h"), col("j")), lit(CmsWidth.toLong)))
      .join(broadcast(cells), Seq("j", "cell"))
      .groupBy("term", "exact_cnt")
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col("term"), col("exact_cnt"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  val textCmsSql: String = {
    import graft.functions.Portable
    s"""WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |hashed AS (SELECT ${Portable.polyHashSql("term")} AS h FROM toks),
      |js AS (SELECT unnest(range($CmsDepth)) AS j),
      |cells AS (
      |  SELECT j, (${Portable.hashJSql("h", "j")}) % $CmsWidth AS cell,
      |         count(*) AS cnt
      |  FROM hashed CROSS JOIN js GROUP BY 1, 2),
      |top AS (
      |  SELECT term, count(*) AS exact_cnt FROM toks
      |  GROUP BY term ORDER BY exact_cnt DESC, term LIMIT 50),
      |th AS (SELECT term, exact_cnt, ${Portable.polyHashSql("term")} AS h FROM top)
      |SELECT t.term, t.exact_cnt, min(c.cnt) AS cms_estimate,
      |       min(c.cnt) - t.exact_cnt AS overcount
      |FROM th t CROSS JOIN js
      |JOIN cells c ON c.j = js.j AND c.cell = (${Portable.hashJSql("t.h", "js.j")}) % $CmsWidth
      |GROUP BY t.term, t.exact_cnt
      |ORDER BY exact_cnt DESC, term""".stripMargin
  }

  // ----------------------------- #110 DSIR-style importance weighting
  /** The "target domain" whose unigram distribution raw docs are scored
    * against — one synthetic source stands in for the usual curated slice
    * (Wikipedia/books vs CommonCrawl). */
  private val DsirTargetSource = "src0"
  /** Feature space: the corpus's top-V unigrams by total count. Bounded,
    * so the weight table always broadcasts regardless of corpus size. */
  private val DsirVocabSize = 2000
  private val DsirPpm = 1000000L
  private val DsirKappaScale = 10000L

  /** #110 corpus_dsir: data selection via importance weighting (the DSIR
    * shape: score raw-corpus docs by how target-like their hashed n-gram
    * features are, keep the most target-like slice) — in exact integer
    * math instead of float log-likelihood sums, so the score itself is
    * hash-gated across engines.
    *
    * Per vocab term, add-one-smoothed rates in ppm over the bounded
    * feature space: `t_ppm = (t_cnt+1)·1e6 div (t_tot+V)` (same for the
    * raw side), then the importance weight `κ = t_ppm·1e4 div max(r_ppm,
    * 1)` — the integer analogue of `p_target/p_raw`. A doc's score is
    * `Σ c_w·κ_w` over its in-vocab occurrences, and the kept flag is an
    * above-mean threshold (mean = one scalar aggregate), the
    * deterministic stand-in for DSIR's weight-proportional sampling.
    *
    * Scale shape: the per-doc raw-side scores are a [[dsirScoreMemo]]
    * zone artifact. The BUILD scans (and re-tokenizes) the corpus once
    * per pass — once for the term histogram (map-side combined; the
    * top-V cut is a bounded sort), once for the scoring pass, and once
    * more for the slim raw `doc_id` spine — with each explode
    * shuffle-free inside its own pass; the ≤V-row κ table BROADCASTS
    * into the occurrence stream, so the corpus never shuffles except the
    * per-doc score aggregation on `doc_id`. Collapsing to a literal
    * single scan would require caching/checkpointing the exploded
    * tokens, which at 100 TB costs more than the extra columnar scans it
    * saves (the token stream is ~the corpus itself; the scans prune to
    * 2-3 columns) — instead the multi-scan build now runs ONCE PER
    * DATASET and every later run reads the 2-long-column zone. The mean
    * threshold is a 1-row aggregate over the zone, broadcast back; no
    * global sort, no quantile job. At true 100 TB the long products here
    * move to decimal(38,0) — at any SF the bench reaches,
    * (t_cnt+1)·1e6 ≤ ~1e14 stays well inside int64.
    */
  def corpusDsir(spark: SparkSession, dir: String): DataFrame = {
    val raw = dsirScoreMemo.get(spark, dir)(dsirScores(spark, dir))
    // greatest(count,1): with zero raw docs Spark's non-ANSI `div 0`
    // yields NULL (kept=0 everywhere) while DuckDB's `// 0` raises — the
    // guard pins both engines to the same (vacuous) empty-corpus answer.
    val mean = raw.agg(expr("sum(score) div greatest(count(1), 1L)").as("mean_score"))
    raw.join(broadcast(mean))
      .select(col("doc_id"), col("score"),
        when(col("score") > col("mean_score"), 1).otherwise(0).as("kept"))
      .orderBy("doc_id")
  }

  /** Per-doc DSIR scores `(doc_id, score)` for every raw-side (non-
    * target) document, published once per corpus
    * ([[graft.ops.DerivedZone]] `dsir_doc_score`): the κ-table build and
    * both token passes were rebuilt per run (round-14 ×1000 flag,
    * 26.5 → 43.8 s); the artifact is 2 exact longs per raw doc. The
    * above-mean `kept` flag stays OUT of the zone — it is derived from
    * the zone in one scalar aggregate, so the artifact never goes stale
    * against a mean that shifts with the corpus (the fingerprint already
    * covers that, but 2 columns also read faster than 3). */
  private[graft] val dsirScoreMemo =
    new graft.ops.DerivedZone("dsir_doc_score", Seq("documents.parquet"))

  private[graft] def dsirScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("term"))
    val isTarget = col("source") === DsirTargetSource
    val termStats = toks.groupBy("term").agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("t_cnt"),
      sum(when(isTarget, 0L).otherwise(1L)).as("r_cnt"))
    val vocab = termStats
      .orderBy((col("t_cnt") + col("r_cnt")).desc, col("term"))
      .limit(DsirVocabSize)
    val tot = vocab.agg(sum(col("t_cnt")).as("t_tot"), sum(col("r_cnt")).as("r_tot"))
    val weights = vocab.join(broadcast(tot))
      .select(col("term"),
        expr(s"(t_cnt + 1) * $DsirPpm div (t_tot + $DsirVocabSize)").as("t_ppm"),
        expr(s"(r_cnt + 1) * $DsirPpm div (r_tot + $DsirVocabSize)").as("r_ppm"))
      .select(col("term"),
        expr(s"t_ppm * $DsirKappaScale div greatest(r_ppm, 1L)").as("kappa"))
    val scored = toks.filter(!isTarget)
      .join(broadcast(weights), Seq("term"))
      .groupBy("doc_id").agg(sum(col("kappa")).as("score"))
    docs.filter(!isTarget).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"))
  }

  val corpusDsirSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |stats AS (
      |  SELECT term,
      |         CAST(sum(CASE WHEN source = '$DsirTargetSource' THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
      |         CAST(sum(CASE WHEN source = '$DsirTargetSource' THEN 0 ELSE 1 END) AS BIGINT) AS r_cnt
      |  FROM toks GROUP BY term),
      |vocab AS (
      |  SELECT term, t_cnt, r_cnt FROM stats
      |  ORDER BY t_cnt + r_cnt DESC, term LIMIT $DsirVocabSize),
      |tot AS (
      |  SELECT CAST(sum(t_cnt) AS BIGINT) AS t_tot,
      |         CAST(sum(r_cnt) AS BIGINT) AS r_tot FROM vocab),
      |w AS (
      |  SELECT term,
      |         (t_cnt + 1) * $DsirPpm // (t_tot + $DsirVocabSize) AS t_ppm,
      |         (r_cnt + 1) * $DsirPpm // (r_tot + $DsirVocabSize) AS r_ppm
      |  FROM vocab, tot),
      |kap AS (SELECT term, t_ppm * $DsirKappaScale // greatest(r_ppm, 1) AS kappa FROM w),
      |scored AS (
      |  SELECT t.doc_id, CAST(sum(kappa) AS BIGINT) AS score
      |  FROM toks t JOIN kap USING (term)
      |  WHERE t.source <> '$DsirTargetSource'
      |  GROUP BY t.doc_id),
      |s AS (
      |  SELECT d.doc_id, coalesce(score, 0) AS score
      |  FROM (SELECT doc_id FROM documents WHERE source <> '$DsirTargetSource') d
      |  LEFT JOIN scored ON d.doc_id = scored.doc_id),
      |m AS (SELECT CAST(sum(score) AS BIGINT) // greatest(count(*), 1) AS mean_score FROM s)
      |SELECT doc_id, score,
      |       CAST(CASE WHEN score > mean_score THEN 1 ELSE 0 END AS INTEGER) AS kept
      |FROM s, m ORDER BY doc_id""".stripMargin

  // ------------------------------------------ #115 Gopher-style rule filter
  /** Gopher-style hard rule filter (Rae et al. 2021, "Scaling Language
    * Models" §A1.1 — the rule-based pre-filter every large curation
    * pipeline runs BEFORE model-based scoring), adapted to the
    * flat-token corpus and written in EXACT integer arithmetic: every
    * ratio threshold is a cross-multiplication (`mean_len ≤ 4.6` ⟺
    * `10·sum_len ≤ 46·n`), so there is no float division for the two
    * engines to disagree on. Five rules, each emitted as its own 0/1
    * column (a curation run wants to know WHICH rule fired, not just
    * that one did), plus the conjunction `pass`:
    *
    *  - `r_word_count`: 15 ≤ tokens ≤ 50000;
    *  - `r_mean_word_len`: mean token length in [3, 4.6];
    *  - `r_stopwords`: ≥ 2 distinct common stopwords present;
    *  - `r_ttr`: type-token ratio ≥ 1/2 (lexical diversity — the flat
    *    corpus has no lines, so Gopher's duplicate-line rules map to
    *    token-level diversity);
    *  - `r_repetition`: most frequent token ≤ 1/8 of the document.
    *
    * Scale shape: ONE compiled kernel pass per document
    * ([[graft.functions.Sig.gopherStats]] — linear scan + token-count
    * hash map, inside whole-stage codegen), never a shuffle; nothing
    * leaves the map side but the final ordered output. The earlier
    * declarative form computed `max_tf` with a nested interpreted HOF —
    * O(distinct × tokens) per document, quadratic on the 50 000-token
    * documents `r_word_count` itself admits, and the chain's worst
    * last-step scaler (7.8× for 10× data) — the kernel is spec-pinned
    * bit-equal to it (SigExpressionsSpec) and linear in document length
    * (measured on the 10k-token long-document corpus, BENCH_SCALING.md).
    */
  private val GopherStops = graft.functions.Sig.GopherStops

  def textGopherRules(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val stats = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.gopherStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n"),
        col("st.sum_len").as("sum_len"), col("st.n_vocab").as("n_vocab"),
        col("st.max_tf").as("max_tf"), col("st.n_stops").as("n_stops"))
    val n = col("n")
    def i(c: Column): Column = c.cast("int")
    val rWc = n >= 15 && n <= 50000
    val rMwl = col("sum_len") >= n * 3 && col("sum_len") * 10 <= n * 46
    val rStop = col("n_stops") >= 2
    val rTtr = col("n_vocab") * 2 >= n
    val rRep = col("max_tf") * 8 <= n
    stats.select(
      col("doc_id"), n.as("n_tokens"),
      i(rWc).as("r_word_count"), i(rMwl).as("r_mean_word_len"),
      i(rStop).as("r_stopwords"), i(rTtr).as("r_ttr"),
      i(rRep).as("r_repetition"),
      i(rWc && rMwl && rStop && rTtr && rRep).as("pass"))
      .orderBy("doc_id")
  }

  val textGopherRulesSql: String = {
    val inList = GopherStops.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS l,
      |         len(string_split(text, ' ')) AS n,
      |         length(text) - (len(string_split(text, ' ')) - 1) AS sum_len
      |  FROM documents)
      |SELECT doc_id, n AS n_tokens,
      |       CAST(n >= 15 AND n <= 50000 AS INTEGER) AS r_word_count,
      |       CAST(sum_len >= n * 3 AND sum_len * 10 <= n * 46 AS INTEGER) AS r_mean_word_len,
      |       CAST(len(list_filter(list_distinct(l), t -> t IN ($inList))) >= 2 AS INTEGER) AS r_stopwords,
      |       CAST(len(list_distinct(l)) * 2 >= n AS INTEGER) AS r_ttr,
      |       CAST(list_max(list_transform(list_distinct(l),
      |              t -> len(list_filter(l, x -> x = t)))) * 8 <= n AS INTEGER) AS r_repetition,
      |       CAST(n >= 15 AND n <= 50000
      |            AND sum_len >= n * 3 AND sum_len * 10 <= n * 46
      |            AND len(list_filter(list_distinct(l), t -> t IN ($inList))) >= 2
      |            AND len(list_distinct(l)) * 2 >= n
      |            AND list_max(list_transform(list_distinct(l),
      |                  t -> len(list_filter(l, x -> x = t)))) * 8 <= n AS INTEGER) AS pass
      |FROM t ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- #116 salient-term top-k
  /** Per-document salient terms: the top 3 terms ranked by term frequency
    * DESC then global document frequency ASC then term — i.e. TF-IDF
    * ordering with the idf log replaced by the df rank itself, which
    * carries the same ordering information in exact integers (no `ln`
    * for the engines to disagree on in the last ulp). The classic
    * keyword-extraction stage of a curation/indexing pipeline.
    *
    * Scale shape: reads the shared [[tfDfFrame]] zone (its once-per-
    * dataset build is the explode → (doc, term) count → df aggregate →
    * tf⋈df join chain this op used to rebuild per run); the per-run work
    * is only the per-doc window top-3 (shuffle on doc_id;
    * WindowGroupLimit prefilters partial top-3 BEFORE the exchange in
    * Spark 4). Every stage is linear in the token stream; no driver-side
    * state.
    */
  def textSalientTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tfDfFrame(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
      .orderBy("doc_id", "rank")
  }

  val textSalientTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |ranked AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |                            ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
      |  FROM tf JOIN df ON tf.term = df.term)
      |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // --------------------------------------- #123 Zipf rank-decade profile
  /** Zipf diagnostic of the corpus vocabulary: mass per RANK DECADE of
    * the frequency-ranked term list (ranks 1–9, 10–99, 100–999 — under a
    * Zipf s≈1 law each decade carries roughly equal total occurrences;
    * deviation is the health signal corpus curators watch for template
    * spam or tokenizer damage).
    *
    * The scale discipline is [[textPerplexityBucket]]'s: NO global sort
    * of the vocabulary and no per-term rank materialization. After the
    * one heavy exchange (term counts, map-side combined), terms collapse
    * to the distinct-FREQUENCY histogram `(f, n_terms)` — a frame bounded
    * by the largest term count, not vocabulary size — and each frequency
    * maps to its exact rank INTERVAL `[1+Σ_{f'>f} n', Σ_{f'≥f} n']` by a
    * cumulative window over that tiny frame. Decade membership is then
    * interval overlap in exact integers. Terms tied on frequency are
    * interchangeable for every emitted statistic, so the oracle's naive
    * `row_number` formulation is provably equal no matter how either
    * engine breaks ties. Capped at rank 999 so decades are whole.
    */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
    val hist = tf.groupBy("f").agg(count(lit(1)).as("nt"))
    val w = Window.orderBy(col("f").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val spanned = hist
      .withColumn("lo", lit(1L) + coalesce(sum("nt").over(w), lit(0L)))
      .withColumn("hi", col("lo") + col("nt") - 1)
    spanned
      .select(col("f"), col("lo"), col("hi"),
        explode(array(lit(1), lit(2), lit(3))).as("decade"))
      .withColumn("dlo", pow(lit(10.0), col("decade") - 1).cast("long"))
      .withColumn("dhi", least(pow(lit(10.0), col("decade")).cast("long") - 1, lit(999L)))
      .withColumn("overlap",
        greatest(lit(0L), least(col("hi"), col("dhi")) - greatest(col("lo"), col("dlo")) + 1))
      .filter(col("overlap") > 0)
      .groupBy("decade")
      .agg(sum("overlap").as("n_terms"),
        sum(col("f") * col("overlap")).as("total_occurrences"),
        max("f").as("max_freq"), min("f").as("min_freq"))
      .orderBy("decade")
  }

  val textZipfSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT term, count(*) AS f FROM tok GROUP BY term),
      |ranked AS (
      |  SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r FROM tf)
      |SELECT length(CAST(r AS VARCHAR)) AS decade,
      |       count(*) AS n_terms,
      |       CAST(sum(f) AS BIGINT) AS total_occurrences,
      |       CAST(max(f) AS BIGINT) AS max_freq,
      |       CAST(min(f) AS BIGINT) AS min_freq
      |FROM ranked WHERE r <= 999 GROUP BY 1 ORDER BY decade""".stripMargin

  // -------------------------------------- #124 boilerplate shingle share
  /** Per-document boilerplate share: the fraction (exact ppm) of a
    * document's distinct word-3-gram shingles that are corpus-common
    * (appear in ≥ 4 documents) — the CCNet-style template/boilerplate
    * signal used to down-weight navigation chrome, licence blocks and
    * mirrored passages before training.
    *
    * Scale shape: the same two-branch tf/df discipline as
    * [[textSalientTerms]] — explode distinct shingles once per branch,
    * document-frequency aggregate on the shingle key (map-side combined),
    * then an equi-join back on that key (both sides arrive
    * shingle-partitioned) and a per-doc aggregate. No all-pairs stage,
    * nothing driver-side; the ppm is integer division on two exact longs.
    * Documents shorter than 3 tokens have no shingles and are (per the
    * oracle, which mirrors this) not emitted.
    */
  private val BoilerDf = 4

  def textBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // native NGrams, not Portable.shingles3: the interpreted HOF re-splits
    // the text inside every element_at lambda (O(tokens²) character work
    // per document — measured 63 s isolated at ×100 where the compiled
    // one-pass kernel needs ~3 s); same output, spec-pinned in
    // FunctionsSpec
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions
          .ngrams(split(col("text"), " "), 3, distinct = true)).as("s"))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    // SHUFFLE_HASH on the df side: the default sort-merge join sorts the
    // full exploded shingle stream (tens of chars per key) — measured
    // 61.5 s isolated at ×100 for what the hash join does in a fraction;
    // the build side is only the distinct-shingle vocabulary
    sh.join(dfreq.hint("SHUFFLE_HASH"), "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= BoilerDf, 1L).otherwise(0L)).as("n_common"))
      .withColumn("boiler_ppm",
        expr("n_common * 1000000L div n_shingles"))
      .select("doc_id", "n_shingles", "n_common", "boiler_ppm")
      .orderBy("doc_id")
  }

  val textBoilerplateSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(${graft.functions.Portable.shingles3Sql("t")}) AS s
      |  FROM toks),
      |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
      |SELECT sh.doc_id, count(*) AS n_shingles,
      |       CAST(count(*) FILTER (WHERE df.df >= $BoilerDf) AS BIGINT) AS n_common,
      |       CAST(count(*) FILTER (WHERE df.df >= $BoilerDf) AS BIGINT) * 1000000 // count(*) AS boiler_ppm
      |FROM sh JOIN df ON sh.s = df.s
      |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ #130 BM25 relevance
  /** Query terms for [[textBm25]] — shared corpus vocabulary with spread
    * document frequencies so the idf weights actually differentiate. */
  private val Bm25Terms = Seq("spark", "join", "vector")
  private val Bm25K1 = 2.2  // k1 + 1 with k1 = 1.2
  private val Bm25TopK = 20

  /** #130 text_bm25: BM25-shaped relevance ranking of the corpus for a
    * fixed disjunctive query — per-term
    * `idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` with k1=1.2,
    * b=0.75, summed over the query terms in fixed order. The idf weight
    * is the RATIONAL Robertson form `(N − df + 0.5)/(df + 0.5)` with the
    * usual `ln` dropped: both engines then evaluate only IEEE +,·,/ in
    * the same association order (round 6 pins the hash), where a `ln`
    * could differ in the last ulp between libm implementations. Dropping
    * a per-term monotone transform changes score mixing, not the shape
    * of the operator — the knob is documented, not hidden.
    *
    * Scale shape: pass 1 computes all per-term tfs + doc length in ONE
    * codegen'd projection and aggregates them to a single stats row
    * (N, avgdl, per-term df) that BROADCASTs back onto pass 2's identical
    * projection for scoring; the top-k is TakeOrderedAndProject (no
    * global sort). Both passes scan only the pruned `text` column; at an
    * indexed 100 TB the same scoring runs over an inverted-index join
    * (see [[keywordSearch]]'s note), the scan form is the index-free
    * baseline.
    *
    * The tf/dl projection is COMPILED ([[graft.functions.ProfileScores]]
    * with one single-term profile per query term + the tokenStats
    * kernel): the first shape's per-term `size(filter(split(...)))` HOFs
    * re-split and re-scanned the tokens interpreted, ×2 passes — 32.5 s
    * at ×1000 where the kernels do one byte pass per scan
    * (FunctionsSpec pins ProfileScores ≡ the HOF chain; the oracle keeps
    * the declarative formulation).
    */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bm25_tfs",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ProfileScores(args.head, Bm25Terms.map(Seq(_))),
      "built-in")
    val proj = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenStats(col("text")).as("ts"),
        call_function("graft_bm25_tfs", col("text")).as("tfs"))
      .select(
        (col("doc_id") +: col("ts.n_ws_tokens").cast("long").as("dl") +:
          Bm25Terms.zipWithIndex.map { case (t, i) =>
            col("tfs").getItem(i).cast("long").as(s"tf_$t") }): _*)
    val stats = proj.agg(
      count(lit(1)).cast("double").as("n"),
      ((sum(col("dl")).cast("double")) / count(lit(1))).as("avgdl") +:
        Bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
            .cast("double").as(s"df_$t")): _*)
    val perTerm = Bm25Terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val idf = (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5))
      idf * ((tf * lit(Bm25K1)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
    }
    proj.crossJoin(broadcast(stats))
      .filter(Bm25Terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .withColumn("score", round(perTerm.reduce(_ + _), 6))
      .select(col("doc_id") +: Bm25Terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
  }

  val textBm25Sql: String = {
    val tfs = Bm25Terms.map(t =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n      |         ")
    val dfs = Bm25Terms.map(t =>
      s"CAST(count(*) FILTER (WHERE tf_$t > 0) AS DOUBLE) AS df_$t")
      .mkString(",\n      |         ")
    val scores = Bm25Terms.map(t =>
      s"((n - df_$t + 0.5::DOUBLE) / (df_$t + 0.5::DOUBLE)) * " +
        s"((CAST(tf_$t AS DOUBLE) * $Bm25K1::DOUBLE) / " +
        s"(CAST(tf_$t AS DOUBLE) + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (CAST(dl AS DOUBLE) / avgdl))))")
      .mkString("\n      |             + ")
    s"""WITH proj AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |         $tfs
      |  FROM documents),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
      |         $dfs
      |  FROM proj)
      |SELECT doc_id, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")},
      |       round($scores, 6) AS score
      |FROM proj CROSS JOIN stats
      |WHERE ${Bm25Terms.map(t => s"tf_$t > 0").mkString(" OR ")}
      |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  // --------------------------------------- #131 charset composition audit
  /** #131 text_charset_profile: per-source character-class composition —
    * exact counts of letter / digit / space / other characters plus each
    * class's ppm share. The encoding-damage / markup-residue audit a
    * curation pipeline runs per feed: a source whose `other` share jumps
    * is emitting markup, mojibake or binary spill, and the ppm columns
    * make the drift diffable across crawls.
    *
    * Scale shape: the class counts come from the `graft_charclass_stats`
    * compiled kernel — ONE byte scan per document, no intermediate
    * strings (round 15, guide §2.4: the previous form ran three
    * `regexp_replace` passes per row, each materializing a stripped
    * copy of the document just to take its length; kernel equality with
    * that form is spec-pinned in SigExpressionsSpec) — collapsed
    * map-side by the bounded `source` key, so a 100 TB scan shuffles
    * |sources| rows. The ppm shares are integer division on exact
    * longs.
    */
  def textCharsetProfile(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("source"),
        graft.functions.GraftFunctions.charClassStats(col("text")).as("cc"))
      .select(col("source"),
        col("cc.n_chars").cast("long").as("n_chars"),
        col("cc.n_letter").cast("long").as("n_letter"),
        col("cc.n_digit").cast("long").as("n_digit"),
        col("cc.n_space").cast("long").as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_letter") - col("n_digit") - col("n_space"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        sum("n_letter").as("n_letter"),
        sum("n_digit").as("n_digit"),
        sum("n_space").as("n_space"),
        sum("n_other").as("n_other"))
      .withColumn("letter_ppm", expr("n_letter * 1000000L div n_chars"))
      .withColumn("digit_ppm", expr("n_digit * 1000000L div n_chars"))
      .withColumn("other_ppm", expr("n_other * 1000000L div n_chars"))
      .orderBy("source")
  }

  val textCharsetProfileSql: String =
    """WITH per_doc AS (
      |  SELECT source,
      |         CAST(length(text) AS BIGINT) AS n_chars,
      |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_letter,
      |         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |         CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_space
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |       CAST(sum(n_letter) AS BIGINT) AS n_letter,
      |       CAST(sum(n_digit) AS BIGINT) AS n_digit,
      |       CAST(sum(n_space) AS BIGINT) AS n_space,
      |       CAST(sum(n_chars - n_letter - n_digit - n_space) AS BIGINT) AS n_other,
      |       CAST(sum(n_letter) AS BIGINT) * 1000000 // CAST(sum(n_chars) AS BIGINT) AS letter_ppm,
      |       CAST(sum(n_digit) AS BIGINT) * 1000000 // CAST(sum(n_chars) AS BIGINT) AS digit_ppm,
      |       CAST(sum(n_chars - n_letter - n_digit - n_space) AS BIGINT) * 1000000 // CAST(sum(n_chars) AS BIGINT) AS other_ppm
      |FROM per_doc GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------- #132 tokenizer fertility
  /** #132 text_fertility: tokenizer fertility per (lang, source) cell —
    * regex word tokens and characters summed exactly, with
    * tokens-per-million-chars and milli-chars-per-token as integer-exact
    * ratios. The "which slices are token-expensive" read that drives
    * per-language budget and packing decisions before training; fertility
    * shifts also flag tokenizer damage on a new crawl of a known source.
    *
    * Scale shape: per-doc token/char counts come from the same fused
    * one-pass kernel as [[textTokens]] ([[graft.functions.Sig.tokenStats]],
    * codegen'd — no split arrays materialize), collapsed map-side onto
    * the bounded lang×source key space; ratios are integer division on
    * the summed longs. One scan, one kilobyte-scale shuffle.
    */
  def textFertility(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        graft.functions.GraftFunctions.tokenStats(col("text")).as("ts"))
      .select(col("lang"), col("source"),
        col("ts.n_words").cast("long").as("n_words"),
        col("ts.n_chars").cast("long").as("n_chars"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_tokens"),
        sum("n_chars").as("n_chars"))
      .withColumn("tokens_per_mchar", expr("n_tokens * 1000000L div n_chars"))
      .withColumn("mchars_per_token", expr("n_chars * 1000L div n_tokens"))
      .orderBy("lang", "source")
  }

  val textFertilitySql: String =
    s"""WITH per_doc AS (
      |  SELECT lang, source,
      |         CAST(len(regexp_extract_all(lower(text), '$WordRe')) AS BIGINT) AS n_words,
      |         CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents)
      |SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_words) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |       CAST(sum(n_words) AS BIGINT) * 1000000 // CAST(sum(n_chars) AS BIGINT) AS tokens_per_mchar,
      |       CAST(sum(n_chars) AS BIGINT) * 1000 // CAST(sum(n_words) AS BIGINT) AS mchars_per_token
      |FROM per_doc GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // --------------------------------------- #137 hashed featurization
  private val HashFeatDims = 16

  /** #137 text_hash_features: hashed bag-of-words featurization — each
    * document projected to a fixed 16-dim integer vector of per-bucket
    * token counts (bucket = portable polyhash % 16). The cheap
    * featurize-before-ANN / classifier-input stage of a curation
    * pipeline (hashing trick, Weinberger et al. 2009), emitted as
    * exact integer columns so the gate is hash-exact.
    *
    * Scale shape: ONE compiled byte pass per document
    * ([[graft.functions.Sig.hashFeatures]] — the token loop folds the
    * hash as the scan passes the bytes; no split arrays, no explode, no
    * shuffle at all). The oracle formulation (explode → polyhash → count
    * per bucket) is provably identical and stays its gate.
    */
  def textHashFeatures(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cols = (0 until HashFeatDims).map(j =>
      element_at(col("hf"), j + 1).as(s"f$j"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.hashFeatures(col("text"), HashFeatDims).as("hf"))
      .select(col("doc_id") +: cols: _*)
      .orderBy("doc_id")
  }

  val textHashFeaturesSql: String = {
    val h = graft.functions.Portable.polyHashSql("t")
    val feats = (0 until HashFeatDims).map(j =>
      s"CAST(count(*) FILTER (WHERE b = $j) AS BIGINT) AS f$j")
      .mkString(",\n      |       ")
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |bk AS (SELECT doc_id, $h % $HashFeatDims AS b FROM tok)
      |SELECT doc_id,
      |       $feats
      |FROM bk GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- #140 lexical diversity
  /** Per-document lexical-diversity profile: type-token ratio, Simpson
    * repeat probability (the chance two random token draws collide —
    * the exact-count cousin of the entropy quality signal), and hapax
    * share — the MTLD/TTR-style diversity gate of an LLM-data curation
    * pipeline (low diversity ⇒ boilerplate/spam, high hapax ⇒ OCR noise
    * or codebooks).
    *
    * Scale shape: ONE compiled byte pass per document
    * ([[graft.functions.Sig.diversityStats]] — a token-count hash map
    * folded as the scan passes; no split arrays, no explode, NO shuffle
    * at all — the whole operator is a narrow projection). Every ratio
    * divides two exact integers from that struct, so both engines round
    * the same double and the gate is hash-exact.
    */
  def textDiversity(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.diversityStats(col("text")).as("ds"))
      .select(col("doc_id"),
        col("ds.n_tokens").cast("long").as("n_tokens"),
        col("ds.n_types").cast("long").as("n_types"),
        round(col("ds.n_types").cast("long") / col("ds.n_tokens"), 6).as("ttr"),
        when(col("ds.n_tokens") > 1,
          round(col("ds.sum_cc") /
            (col("ds.n_tokens").cast("long") * (col("ds.n_tokens").cast("long") - 1)), 6))
          .otherwise(lit(0.0)).as("simpson"),
        round(col("ds.n_hapax").cast("long") / col("ds.n_types"), 6).as("hapax_share"))
      .orderBy("doc_id")
  }

  val textDiversitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |a AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         count(*) AS n_types,
      |         CAST(sum(c * (c - 1)) AS BIGINT) AS sum_cc,
      |         CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
      |  FROM c GROUP BY 1)
      |SELECT doc_id, n_tokens, n_types,
      |       round(n_types / n_tokens, 6) AS ttr,
      |       CASE WHEN n_tokens > 1
      |            THEN round(sum_cc / (n_tokens * (n_tokens - 1)), 6)
      |            ELSE 0.0 END AS simpson,
      |       round(n_hapax / n_types, 6) AS hapax_share
      |FROM a ORDER BY doc_id""".stripMargin

  // ------------------------------------------- #142 priority sampling
  private val PriorityK = 100

  /** Deterministic weighted sample without replacement (priority
    * sampling, Duffield–Lund–Thorup 2007): each document draws a
    * pseudo-uniform u = polyhash(text)/P and gets priority w/u with
    * w = n_chars; the k largest priorities win, so inclusion probability
    * grows with document weight while staying reproducible run-to-run
    * (the "random" is the portable content hash both engines share).
    * The priority is kept in EXACT integer form w·P div h — monotone in
    * w/u, so the selected set and its ordering are engine-exact with no
    * float comparison anywhere. Integer flooring lands many distinct
    * real priorities w/u on equal values, so ties at the k-boundary are
    * broken by the content hash h DESC before doc_id — tie resolution is
    * content-pseudorandom, not id-ordered (an id-asc break would
    * deterministically bias selection toward low doc_ids among
    * equal-weight docs).
    *
    * Scale shape: a narrow per-row projection (hash + one integer
    * division), then a global top-k that plans as TakeOrdered — each
    * partition keeps k candidates and only k·partitions rows ever move;
    * no global sort, no full shuffle.
    */
  def samplePriority(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // n_chars pinned to long: the physical column is int64 in the source
    // testdata but int32 in ScaleData-derived corpora, and the weight·P
    // product overflows 32 bits (caught by the x10 oracle, round 14)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        graft.functions.GraftFunctions.polyhash(col("text")).as("h"))
      .withColumn("priority",
        expr(s"n_chars * ${graft.functions.Portable.P}L div greatest(h, 1L)"))
    val top = scored
      .orderBy(col("priority").desc, col("h").desc, col("doc_id").asc)
      .limit(PriorityK)
    top.select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("priority").desc, col("h").desc, col("doc_id").asc))
          .cast("long").as("rank"),
        col("doc_id"), col("n_chars"), col("h"), col("priority"))
      .orderBy("rank")
  }

  val samplePrioritySql: String =
    s"""WITH s AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |         ${graft.functions.Portable.polyHashSql("text")} AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, n_chars, h,
      |         n_chars * ${graft.functions.Portable.P} // greatest(h, 1) AS priority
      |  FROM s)
      |SELECT rank, doc_id, n_chars, h, priority FROM (
      |  SELECT row_number() OVER (ORDER BY priority DESC, h DESC, doc_id ASC) AS rank,
      |         doc_id, n_chars, h, priority
      |  FROM p) t
      |WHERE rank <= $PriorityK ORDER BY rank""".stripMargin
}
