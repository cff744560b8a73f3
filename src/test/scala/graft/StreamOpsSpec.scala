package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Click
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("watermarked tumbling window agg emits closed windows exactly once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamOps.windowedAgg(events, window = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(1), "click", 1.0), (2L, ts(4), "click", 2.0), (3L, ts(11), "view", 5.0))
      q.processAllAvailable()
      // watermark still at 0 → nothing final yet
      assert(spark.table("winagg").count() == 0)
      in.addData((4L, ts(30), "click", 1.0)) // watermark -> 25min, closes [0,10) and [10,20)
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .select(date_format(col("window_start"), "mm").cast("int"), col("event_type"), col("n"), col("sum_value"))
        .as[(Int, String, Long, Double)].collect().toSet
      assert(rows == Set((0, "click", 2L, 3.0), (10, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedupes replays") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamOps.dedupStream(events, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(1), "click", 1.0), (1L, ts(1), "click", 1.0), (2L, ts(2), "view", 2.0))
      q.processAllAvailable()
      in.addData((1L, ts(3), "click", 1.0)) // replay within watermark -> dropped
      q.processAllAvailable()
      assert(spark.table("dedupstream").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream range join pairs errors with clicks within the interval") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val errIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clkIn = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = errIn.toDF().toDF("event_id", "user_id", "ts")
    val clicks = clkIn.toDF().toDF("user_id", "ts")
    val q = StreamOps.rangeJoinStream(errors, clicks)
      .writeStream.format("memory").queryName("rangejoin")
      .outputMode("append").start()
    try {
      // clicks arrive FIRST, errors in a later batch — matches must come
      // from buffered stream state, exercising the stream-stream buffer
      clkIn.addData((7L, ts(10)), (7L, ts(12)), (8L, ts(10)))
      q.processAllAvailable()
      errIn.addData((100L, 7L, ts(11)), (101L, 9L, ts(11)))
      q.processAllAvailable()
      val got = spark.table("rangejoin")
        .select(col("event_id"), date_format(col("c_ts"), "mm").cast("int"))
        .as[(Long, Int)].collect().toSet
      // error 100 (user 7, t=11m) matches both user-7 clicks (10m, 12m);
      // error 101's user 9 has no clicks; user 8's click matches nothing
      assert(got == Set((100L, 10), (100L, 12)))
    } finally q.stop()
  }

  test("nearDupStream flags cross-batch near-duplicates from LSH bucket state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamOps.nearDupStream(docs, threshold = 0.5)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog in the misty morning park"
    try {
      in.addData((1L, base), (2L, "completely different words about spark shuffles and parquet files"))
      q.processAllAvailable()
      assert(spark.table("neardup").count() == 0, "no near-dups in batch 1")
      // batch 2: doc 3 is a near-copy of doc 1 from the PREVIOUS batch —
      // detection must come from bucket state, not a same-batch self-join
      in.addData((3L, base + " today"))
      q.processAllAvailable()
      val pairs = spark.table("neardup")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L)))
      val est = spark.table("neardup").select("est_jaccard")
        .as[Double].collect().max
      assert(est >= 0.5 && est <= 1.0)
      // an exact replay of doc 3 is not re-paired with itself
      in.addData((3L, base + " today"))
      q.processAllAvailable()
      assert(spark.table("neardup").select("a_id", "b_id").as[(Long, Long)]
        .collect().toSet == Set((1L, 3L)))
    } finally q.stop()
  }

  test("latestStateStream maintains the per-key head across batches, late events lose") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StreamOps.KeyedOp]
    val q = StreamOps.latestStateStream(in.toDS())
      .toDF("key", "op_index", "payload", "deleted")
      .writeStream.format("memory").queryName("lss")
      .outputMode("update").start()
    try {
      in.addData(
        StreamOps.KeyedOp("a", 1, "put", "a1"), StreamOps.KeyedOp("a", 3, "put", "a3"),
        StreamOps.KeyedOp("b", 2, "put", "b2"))
      q.processAllAvailable()
      // batch 2: late event for a (ignored), delete for b (wins), new key c
      in.addData(
        StreamOps.KeyedOp("a", 2, "put", "late"),
        StreamOps.KeyedOp("b", 9, "delete", ""),
        StreamOps.KeyedOp("c", 5, "put", "c5"))
      q.processAllAvailable()
      import org.apache.spark.sql.functions.{col, max, struct}
      val latest = spark.table("lss")
        .groupBy("key")
        .agg(max(struct(col("op_index"), col("payload"), col("deleted"))).as("s"))
        .select(col("key"), col("s.payload"), col("s.deleted"))
        .as[(String, String, Boolean)].collect().toSet
      assert(latest == Set(("a", "a3", false), ("b", "", true), ("c", "c5", false)))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dimension") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val dim = Seq(("click", "interactive"), ("view", "passive"))
      .toDF("event_type", "category")
    val q = StreamOps.enrichStream(events, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(1), "click", 1.0), (2L, ts(2), "view", 2.0),
        (3L, ts(3), "error", 3.0))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select(col("event_id"), col("category"))
        .as[(Long, Option[String])].collect().toMap
      // matched rows carry the dimension attribute; unmatched survive (left)
      assert(got == Map(1L -> Some("interactive"), 2L -> Some("passive"),
        3L -> None))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Click]
    val q = StreamOps.sessionize(in.toDS(), gapSeconds = 600) // 10 min gap
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 60 and 65 min (one session); user 2: event at 61 min
      in.addData(Click(1, ts(60), 1.0), Click(1, ts(65), 2.0), Click(2, ts(61), 7.0))
      q.processAllAvailable()
      // advance watermark far past all gaps → sessions time out and emit
      in.addData(Click(9, ts(180), 0.0))
      q.processAllAvailable()
      in.addData(Click(9, ts(300), 0.0)) // push watermark again to flush user 9
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select(col("user_id"), col("n_events"), col("sum_value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got.contains((1L, 2L, 3.0)) && got.contains((2L, 1L, 7.0)))
      // in-session gap split: user 1's two events 5min apart stayed ONE session
      assert(spark.table("sessions").filter(col("user_id") === 1).count() == 1)
    } finally q.stop()
  }

  test("native streaming session_window agg merges gaps and emits on watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = in.toDF().toDF("user_id", "ts", "value")
    val q = StreamOps.sessionWindowAgg(events, gap = "30 minutes",
      watermark = "1 hour")
      .writeStream.format("memory").queryName("swagg")
      .outputMode("append").start()
    try {
      // user 1: 60 + 65 min (one session); user 2: 61 min
      in.addData((1L, ts(60), 1.0), (1L, ts(65), 2.0), (2L, ts(61), 7.0))
      q.processAllAvailable()
      assert(spark.table("swagg").count() == 0, "sessions still open")
      // advance the watermark far past session closes
      in.addData((9L, ts(600), 0.0))
      q.processAllAvailable()
      val got = spark.table("swagg")
        .select(col("user_id"), col("n_events"), col("sum_value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 2L, 3.0), (2L, 1L, 7.0)), s"got $got")
      // the merged session spans first event .. last event + gap
      val span = spark.table("swagg").filter(col("user_id") === 1)
        .select(col("session_start"), col("session_end"))
        .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
      assert(span._1 == ts(60) && span._2 == ts(95))
    } finally q.stop()
  }

  test("windowed agg restarts from its checkpoint without loss or duplication") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val out = SparkTestSession.tempDir("recov-out")
    val ckpt = SparkTestSession.tempDir("recov-ckpt")
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    def start() = StreamOps.windowedAgg(
      in.toDF().toDF("event_id", "ts", "event_type", "value"),
      window = "10 minutes", watermark = "5 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      in.addData((1L, ts(1), "click", 1.0), (2L, ts(4), "click", 2.0),
        (3L, ts(11), "view", 5.0))
      q1.processAllAvailable() // watermark 0 → nothing emitted yet
    } finally q1.stop()

    // restart from the SAME checkpoint: window + watermark state recover
    val q2 = start()
    try {
      in.addData((4L, ts(30), "click", 1.0)) // watermark → 25min: closes [0,10) and [10,20)
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .select(col("event_type"), col("n"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      // pre-restart rows closed exactly once, not lost and not re-emitted
      assert(got == Set(("click", 2L, 3.0), ("view", 1L, 5.0)), s"got $got")
    } finally q2.stop()
  }

  test("foreachBatch upsert sink maintains a versioned serving table") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = SparkTestSession.tempDir("upsert-table")
    val ckpt = SparkTestSession.tempDir("upsert-ckpt")
    val in = MemoryStream[StreamOps.KeyedOp]
    val changes = StreamOps.latestStateStream(in.toDS())
      .toDF("key", "op_index", "payload", "deleted")
    val q = StreamOps.upsertSink(changes, dir, ckpt,
      keyCols = Seq("key"), versionCol = "op_index",
      isDelete = col("deleted")).start()
    try {
      in.addData(
        StreamOps.KeyedOp("a", 1, "put", "a1"),
        StreamOps.KeyedOp("b", 2, "put", "b2"))
      q.processAllAvailable()
      val v1 = StreamOps.latestVersionDir(spark, dir)
      assert(v1.isDefined, "first batch must commit a version")
      val t1 = spark.read.parquet(v1.get.toString)
        .select("key", "payload").as[(String, String)].collect().toMap
      assert(t1 == Map("a" -> "a1", "b" -> "b2"))

      // update a, delete b, add c → new version, old version still intact
      in.addData(
        StreamOps.KeyedOp("a", 3, "put", "a3"),
        StreamOps.KeyedOp("b", 9, "delete", ""),
        StreamOps.KeyedOp("c", 5, "put", "c5"))
      q.processAllAvailable()
      val v2 = StreamOps.latestVersionDir(spark, dir)
      assert(v2.isDefined && v2.get != v1.get, "second batch commits a NEW version")
      val t2 = spark.read.parquet(v2.get.toString)
        .select("key", "payload").as[(String, String)].collect().toMap
      assert(t2 == Map("a" -> "a3", "c" -> "c5"), s"bad serving state: $t2")
      // time travel: the previous committed version is still readable
      assert(spark.read.parquet(v1.get.toString).count() == 2)
    } finally q.stop()
  }

  test("upsertBatch replay after a committed version is idempotent") {
    import spark.implicits._
    val dir = SparkTestSession.tempDir("upsert-replay")
    def batch(rows: (String, Long, String, Boolean)*) =
      rows.toDF("key", "op_index", "payload", "deleted")
    def serving: Map[String, String] =
      spark.read.parquet(StreamOps.latestVersionDir(spark, dir).get.toString)
        .select("key", "payload").as[(String, String)].collect().toMap
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamOps.upsertBatch(b, dir, id, keyCols = Seq("key"),
        versionCol = "op_index", isDelete = col("deleted"))

    run(batch(("a", 1L, "a1", false), ("b", 2L, "b2", false)), 0L)
    val b1 = batch(("a", 3L, "a3", false), ("c", 5L, "c5", false))
    run(b1, 1L)
    assert(serving == Map("a" -> "a3", "b" -> "b2", "c" -> "c5"))

    // foreachBatch replay: v=1 is already committed (_SUCCESS written) but
    // the checkpoint commit was lost, so batch 1 runs AGAIN. The merge
    // base must be v=0, not the half-trusted v=1 the write targets.
    run(b1, 1L)
    assert(serving == Map("a" -> "a3", "b" -> "b2", "c" -> "c5"),
      "replayed batch must rewrite the same serving state")
    // and the stream continues normally past the replay
    run(batch(("b", 9L, "", true)), 2L)
    assert(serving == Map("a" -> "a3", "c" -> "c5"))
  }

  test("streaming last-touch attribution equals the batch operator on an ordered replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // the full event log in event-time order, split at the median second:
    // batch 2 is strictly later than batch 1, so the replay is an ordered
    // journal — the regime where the stream's carried last-click state is
    // exactly the batch window's running last()
    val all = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("sec"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .sortBy(r => (r._3, r._2))
    val cut = all(all.length / 2)._3
    val (b1, b2) = all.partition(_._3 <= cut)
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val events = in.toDS().map { case (u, e, s, t, v) =>
      StreamOps.AttrEvent(u, e, s, t, v) }
    val q = StreamOps.attributionStream(events)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      val afterB1 = spark.table("attrib").count()
      assert(afterB1 > 0, "first batch must emit attributions")
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      assert(spark.table("attrib").count() > afterB1,
        "second batch must attribute its purchases against carried state")
      val streamed = spark.table("attrib")
        .select(col("user_id"), col("purchase_id"),
          col("attributed_click_id"), col("attribution"), col("value"))
        .as[(Long, Long, Option[Long], String, Double)].collect().toSet
      val batch = graft.analytics.EventOps.attribution(spark, sf)
        .select(col("user_id"), col("purchase_id"),
          col("attributed_click_id"), col("attribution"), col("value"))
        .as[(Long, Long, Option[Long], String, Double)].collect().toSet
      assert(streamed == batch,
        "streamed attributions must be bit-equal to the batch window on the union")
      // a cross-batch credit exists: some purchase in batch 2 attributed
      // to a click from batch 1 — i.e. the state actually carried
      val b2purchases = b2.filter(_._4 == "purchase").map(_._2).toSet
      val b1clicks = b1.filter(_._4 == "click").map(_._2).toSet
      assert(streamed.exists { case (_, pid, attrId, _, _) =>
        b2purchases(pid) && attrId.exists(b1clicks) },
        "expected at least one batch-2 purchase credited to a batch-1 click")
    } finally q.stop()
  }

  test("incremental kNN graph over two micro-batches equals the T=4 batch graph on the union") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // 60 real vectors from the test corpus, split 35 + 25: well under the
    // batch cell-split threshold (GraphCell=64), so the (tbl, bucket)-
    // keyed stream and the cell-split batch build the same candidate sets
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val in = MemoryStream[(Long, Seq[Float])]
    val vectors = in.toDF().toDF("vec_id", "embedding")
    // DEFAULT configuration — must be the same GraphTables=4 build the
    // batch side ships, not a weaker single-table variant
    val q = StreamOps.knnGraphStream(vectors)
      .writeStream.format("memory").queryName("knngraph")
      .outputMode("append").start()
    try {
      in.addData(all.take(35).toIndexedSeq)
      q.processAllAvailable()
      val afterB1 = spark.table("knngraph").count()
      assert(afterB1 > 0, "first batch must emit neighbor lists")
      in.addData(all.drop(35).toIndexedSeq)
      q.processAllAvailable()
      assert(spark.table("knngraph").count() > afterB1,
        "second batch must emit UPDATED lists without re-feeding batch 1")
      // every table contributes state — 4 keyed states per arrival
      assert(spark.table("knngraph").select("tbl").distinct().count() ==
        graft.analytics.Similarity.GraphTables.toLong,
        "all 4 LSH tables must emit")

      // consumer discipline: latest generation per (node, table), merged
      // across tables by the shipped helper
      val merged = StreamOps.mergedGraph(spark.table("knngraph"))
        .as[(Long, Int, Long, Double)].collect().toSet

      val unionDf = all.toSeq.toDF("vec_id", "embedding")
      val expected = graft.analytics.Similarity
        .knnGraphFrame(spark, unionDf)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(merged == expected,
        "merged maintained graph must be bit-equal to the T=4 batch graph on the union")
    } finally q.stop()
  }

  test("media decode stage runs unchanged on a stream, bit-equal to batch") {
    import spark.implicits._
    import graft.ops.{MediaPipeline, PpmCodec}
    implicit val sc = spark.sqlContext
    // the extraction stage is a stateless typed mapPartitions — the SAME
    // operator must serve both batch backfill and streaming ingest with
    // no watermark or state store
    val recs = Seq(
      MediaPipeline.MediaRecord(1L, "a", PpmCodec.encode(30, 20, 5, 7)),
      MediaPipeline.MediaRecord(2L, "b", PpmCodec.encode(200, 100, 24, 255)),
      MediaPipeline.MediaRecord(3L, "a", PpmCodec.encode(1, 1, 1, 0)))
    val in = MemoryStream[(Long, String, Array[Byte])]
    val stream = in.toDS().map { case (id, s, p) => MediaPipeline.MediaRecord(id, s, p) }
    val q = MediaPipeline.extractFeatures(stream)
      .writeStream.format("memory").queryName("mediafeats")
      .outputMode("append").start()
    try {
      in.addData(recs.map(r => (r.doc_id, r.source, r.payload)))
      q.processAllAvailable()
      val streamed = spark.table("mediafeats")
        .as[MediaPipeline.MediaFeatures].collect().sortBy(_.doc_id).toSeq
      val batch = MediaPipeline.extractFeatures(recs.toDS())
        .collect().sortBy(_.doc_id).toSeq
      assert(streamed == batch, "streamed features must be bit-equal to batch")
    } finally q.stop()
  }
}
