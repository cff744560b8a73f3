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
