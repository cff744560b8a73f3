package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an N× scale point from an existing test-data directory for
  * scaling benchmarks (`Bench` at two scale factors), by replicating every
  * fact table with key-shifted copies.
  *
  * Design goals, per table family:
  *  - **Join integrity per copy**: all foreign keys shift by the same
  *    `copy * offset`, so each copy is a self-contained TPC-H-ish world
  *    and join/aggregation work scales exactly with the copy count. The
  *    `region`/`nation` dims stay fixed (dims don't grow with data scale).
  *  - **Documents stay copy-disjoint for dedup**: every token of copy
  *    i>0 gets an `_i` suffix, so shingles/minhash/simhash structure
  *    WITHIN a copy is isomorphic to the original but shares nothing
  *    ACROSS copies — near-dup pair counts scale linearly, not
  *    quadratically (naive text replication would turn the whole corpus
  *    into 10-clone clusters and measure a different workload).
  *  - **Embeddings stay copy-disjoint for ANN**: copy i applies a
  *    copy-keyed coordinate sign-flip pattern. Sign flips preserve every
  *    within-copy dot product and norm EXACTLY (s_k² = 1), so each copy's
  *    similarity geometry is identical to the original, while cross-copy
  *    cosines are scrambled — candidate work scales linearly.
  *  - **Events keep their time range** (scale-up models higher event RATE,
  *    so windows get denser rather than the timeline growing).
  */
object ScaleData {

  /** Key shift per copy — far above any sf0.1 key (max observed ~600k). */
  val CopyOffset = 10000000L

  def scale(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    require(factor >= 1, "factor must be >= 1")
    // events.ts is normalized to epoch-nanos long on read (whatever the
    // source physical type — see Tables.events) so the scaled copy is
    // written with the exact canonical ts representation the engine
    // consumes; re-reading a scaled dir hits Tables' LongType fast path.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String): DataFrame = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      if (t == "events") graft.Tables.normalizeEventTs(spark, df) else df
    }
    // fail loudly if any source key reaches the copy shift — silent
    // aliasing across copies (e.g. chaining ScaleData onto its own
    // output) would break per-copy join/dedup disjointness with zero
    // errors and the benchmark would measure a different workload
    def assertKeyDomain(df: DataFrame, keys: String*): Unit = {
      val aggs = keys.map(k => max(col(k)).cast("long").as(k))
      val r = df.agg(aggs.head, aggs.tail: _*).first()
      keys.indices.foreach { i =>
        if (!r.isNullAt(i))
          require(r.getLong(i) < CopyOffset,
            s"source key ${keys(i)} reaches ${r.getLong(i)} >= CopyOffset " +
              s"$CopyOffset — copies would alias; rescale from the ORIGINAL data")
      }
    }
    def write(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // one distributed pass per table: explode the copy index, shift keys
    def replicated(df: DataFrame): DataFrame =
      df.withColumn("cp", explode(sequence(lit(0L), lit(factor - 1L))))
    def shifted(c: String): Column = col(c) + col("cp") * CopyOffset

    // fixed dims
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    assertKeyDomain(read("customer"), "c_custkey")
    assertKeyDomain(read("supplier"), "s_suppkey")
    assertKeyDomain(read("part"), "p_partkey")
    assertKeyDomain(read("orders"), "o_orderkey", "o_custkey")
    assertKeyDomain(read("lineitem"), "l_orderkey", "l_partkey", "l_suppkey")
    assertKeyDomain(read("events"), "event_id", "user_id")
    assertKeyDomain(read("documents"), "doc_id")
    assertKeyDomain(read("embeddings"), "vec_id")

    write(replicated(read("customer"))
      .select(shifted("c_custkey").as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer", 4)

    write(replicated(read("supplier"))
      .select(shifted("s_suppkey").as("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      "supplier", 2)

    write(replicated(read("part"))
      .select(shifted("p_partkey").as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part", 4)

    write(replicated(read("orders"))
      .select(shifted("o_orderkey").as("o_orderkey"),
        shifted("o_custkey").as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders", 8)

    write(replicated(read("lineitem"))
      .select(shifted("l_orderkey").as("l_orderkey"),
        shifted("l_partkey").as("l_partkey"),
        shifted("l_suppkey").as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem", 16)

    write(replicated(read("events"))
      .select(shifted("event_id").as("event_id"), col("ts"),
        shifted("user_id").as("user_id"), col("event_type"),
        col("value"), col("props")),
      "events", 16)

    val copyTagged = when(col("cp") === 0L, col("text"))
      .otherwise(array_join(
        transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("cp"))), " "))
    write(replicated(read("documents"))
      .select(shifted("doc_id").as("doc_id"), copyTagged.as("text"),
        col("lang"), col("source"),
        length(copyTagged).as("n_chars")),
      "documents", 8)

    // sign pattern s(cp, k) ∈ {−1, +1}; copy 0 is the identity
    val flip = transform(col("embedding"), (x, k) =>
      (x * when(col("cp") === 0L, lit(1.0))
        .otherwise(lit(1.0) - lit(2.0) * pmod(hash(col("cp"), k), lit(2))))
        .cast("float"))
    write(replicated(read("embeddings"))
      .select(shifted("vec_id").as("vec_id"), flip.as("embedding"), col("label")),
      "embeddings", 8)
  }

  /** Long-document corpus: the SAME total token volume as the source
    * documents table, reshaped to ~`tokensPerDoc` tokens per document —
    * the regime real curation corpora live in (10k–50k-token books/pages
    * vs the synthetic ~100-token rows every committed text bench ran on),
    * where any per-document cost that is super-linear in document length
    * changes regime (the text_gopher_rules HOF defect class).
    *
    * Consecutive documents (by `doc_id`, so merging never crosses a
    * ScaleData copy boundary — copy offsets keep the id ranges disjoint)
    * are concatenated with single spaces: total whitespace-token count is
    * EXACTLY preserved (joins add separators, never tokens), so a
    * per-token-linear operator should cost the same on both corpora and
    * the ratio isolates the per-document-shape term. `lang`/`source` are
    * taken from the group's head document (the corpus mixture shifts —
    * acceptable: this corpus benchmarks cost shape, not quality
    * semantics). Only `documents.parquet` is written: the §2.5 text
    * family reads nothing else.
    */
  def longDocs(spark: SparkSession, src: String, dst: String,
               tokensPerDoc: Int): Unit = {
    require(tokensPerDoc >= 1, "tokensPerDoc must be >= 1")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val avgTok = docs.agg(avg(size(split(col("text"), " "))))
      .first().getDouble(0)
    val g = math.max(1L, math.round(tokensPerDoc / avgTok))
    docs
      .withColumn("gid", expr(s"doc_id div $g"))
      .groupBy("gid")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            e => e.getField("text")), " ").as("text"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("source"), col("doc_id")).as("source"))
      .select(col("gid").as("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).as("n_chars"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }

  /** Constant-vocabulary document corpus at N×: copies shift `doc_id`
    * but keep the TEXT verbatim — no per-copy token suffixing — so the
    * distinct n-gram/shingle KEY SPACE stays exactly the source corpus's
    * while row volume grows ×factor. This is the control experiment for
    * the "key-growth class" attribution: the suffixed [[scale]] corpus
    * grows distinct 3-gram keys ~×factor, so an aggregation keyed on
    * n-grams (text_ngram_stats, text_boilerplate's df build) pays
    * key-cardinality growth ON TOP of row growth there. On THIS corpus a
    * healthy hash-aggregation should scale ~linearly in rows (map-side
    * partials collapse to the same bounded key set); if it doesn't, the
    * operator shape has a real defect the suffixed corpus masks.
    *
    * Within-copy near-dup structure is preserved trivially (each copy is
    * isomorphic to the source); cross-copy, every document is an exact
    * clone of its ×factor siblings — WRONG for benchmarking the pair-
    * joining dedup family (clone clusters explode pair counts), fine for
    * the per-token/per-n-gram text family this corpus exists to probe.
    * Only `documents.parquet` is written.
    */
  def constVocab(spark: SparkSession, src: String, dst: String,
                 factor: Int): Unit = {
    require(factor >= 1, "factor must be >= 1")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val r = docs.agg(max(col("doc_id")).cast("long")).first()
    require(r.isNullAt(0) || r.getLong(0) < CopyOffset,
      "source doc_id reaches the copy shift — rescale from the ORIGINAL data")
    docs.withColumn("cp", explode(sequence(lit(0L), lit(factor - 1L))))
      .select((col("doc_id") + col("cp") * CopyOffset).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }

  /** `runMain graft.tools.ScaleData <srcDir> <dstDir> <factor>`
    * or `runMain graft.tools.ScaleData --longdocs <srcDir> <dstDir> <tokensPerDoc>`
    * or `runMain graft.tools.ScaleData --constvocab <srcDir> <dstDir> <factor>` */
  def main(args: Array[String]): Unit = {
    val longMode = args.headOption.contains("--longdocs")
    val cvMode = args.headOption.contains("--constvocab")
    val rest = if (longMode || cvMode) args.tail else args
    require(rest.length == 3,
      "usage: ScaleData [--longdocs|--constvocab] <srcDir> <dstDir> <factor|tokensPerDoc>")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[16]"))
      .appName("graft-scaledata")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (longMode) longDocs(spark, rest(0), rest(1), rest(2).toInt)
    else if (cvMode) constVocab(spark, rest(0), rest(1), rest(2).toInt)
    else scale(spark, rest(0), rest(1), rest(2).toInt)
    spark.stop()
  }
}
