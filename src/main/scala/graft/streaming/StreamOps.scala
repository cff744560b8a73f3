package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators (SURVEY §2.1 "streaming ingest" row and
  * the streaming faces of §2.2's event analytics).
  *
  * Each operator is a plain `DataFrame => DataFrame` (or typed Dataset
  * transform) usable under `readStream` as well as `read` — the batch
  * forms in [[graft.analytics.EventOps]] share the semantics, these run
  * them incrementally with bounded state:
  *
  *  - watermarks bound all keyed state (late events beyond the horizon are
  *    dropped, state for closed windows is evicted);
  *  - sessionization uses `flatMapGroupsWithState` with event-time timeout
  *    so each user's open session is the ONLY state held;
  *  - dedup uses `dropDuplicatesWithinWatermark`, i.e. the key cache is
  *    purged as the watermark advances instead of growing forever.
  */
object StreamOps {

  /** Tumbling event-time window aggregation with a watermark: count +
    * value sum per (window, event_type). Append-mode emits each window
    * exactly once, when the watermark passes it.
    */
  def windowedAgg(events: DataFrame, window: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream-static enrichment: join a stream against a static dimension
    * table. The static side is re-planned per micro-batch (so dimension
    * REFRESHES are picked up) and broadcast when small — stateless, no
    * watermark needed; the workhorse join of every streaming ingest that
    * annotates events with reference data.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String = "event_type"): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup on a business key, state bounded by the
    * watermark (the at-least-once → exactly-once repair stage of an
    * ingest pipeline).
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  // ------------------------------------------- continuous latest-state
  case class KeyedOp(key: String, opIndex: Long, opType: String, payload: String)
  case class KeyedState(opIndex: Long, opType: String, payload: String)

  /** Streaming twin of [[graft.ops.LatestState]]: maintain the
    * latest-event-per-key state continuously with `mapGroupsWithState`
    * and emit each key's new head whenever it advances (update-mode
    * changelog of the MVCC snapshot — downstream can upsert it into a
    * serving store instead of re-merging zones per query). Tombstones stay
    * in state (they must keep shadowing older late arrivals) but are
    * flagged for the consumer to delete.
    */
  def latestStateStream(ops: Dataset[KeyedOp]): Dataset[(String, Long, String, Boolean)] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .mapGroupsWithState[KeyedState, (String, Long, String, Boolean)](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedOp], state: GroupState[KeyedState]) =>
          val incoming = rows.maxBy(_.opIndex)
          val cur = state.getOption
          val best =
            if (cur.exists(_.opIndex >= incoming.opIndex)) cur.get
            else KeyedState(incoming.opIndex, incoming.opType, incoming.payload)
          state.update(best)
          (key, best.opIndex, best.payload, best.opType == "delete")
      }
  }

  // ------------------------------------- streaming last-touch attribution
  case class AttrEvent(user_id: Long, event_id: Long, sec: Long,
                       event_type: String, value: Double)
  case class LastClick(sec: Long, id: Long)
  case class Attribution(user_id: Long, purchase_id: Long, sec: Long,
                         value: Double, attributed_click_id: Option[Long],
                         attribution: String)

  /** Streaming twin of [[graft.analytics.EventOps.attribution]]: credit
    * each purchase to the user's most recent preceding click within
    * `horizonSec`, continuously. State per user is ONE `(sec, id)` pair —
    * the carried "latest click so far" — which is exactly the running
    * `last(click, ignoreNulls)` the batch window computes, so on an
    * event-time-ordered journal the emitted attributions are bit-equal to
    * the batch operator over the union of micro-batches (spec-asserted).
    * A late-arriving OLD click never overrides a newer one (the max-
    * (sec, id) admission mirrors [[latestStateStream]]'s monotone head);
    * purchases already emitted are append-only and not retro-credited —
    * the standard streaming-attribution trade, stated rather than hidden.
    */
  def attributionStream(events: Dataset[AttrEvent],
                        horizonSec: Long = 7L * 86400L): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClick, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[LastClick]) =>
          val out = List.newBuilder[Attribution]
          var last = state.getOption
          rows.toSeq.sortBy(r => (r.sec, r.event_id)).foreach { r =>
            r.event_type match {
              case "click" =>
                if (!last.exists(s => s.sec > r.sec ||
                    (s.sec == r.sec && s.id > r.event_id)))
                  last = Some(LastClick(r.sec, r.event_id))
              case "purchase" =>
                val attr = last.filter(s => r.sec - s.sec <= horizonSec)
                // HALF_UP away from zero — the exact rounding of the batch
                // operator's cents() (Spark round()); java's math.round is
                // floor(x+0.5) and diverges on negative exact half-cents
                val valueCents = BigDecimal(r.value * 100)
                  .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
                out += Attribution(uid, r.event_id, r.sec,
                  valueCents / 100.0,
                  attr.map(_.id),
                  if (attr.isDefined) "click" else "organic")
              case _ => ()
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  // ------------------------------------------- stream-stream range join
  /** Stream-stream interval join — the streaming twin of the batch
    * `events_range_join`: each error event joined to the same user's
    * clicks within ±60 s, as both streams flow. Watermarks on BOTH sides
    * plus the time-range join condition let Spark bound the join state:
    * a buffered click can be dropped once the error-side watermark passes
    * its ts + 60 s (and vice versa), so state is O(watermark window), not
    * O(stream length).
    */
  def rangeJoinStream(errors: DataFrame, clicks: DataFrame,
                      watermark: String = "2 minutes"): DataFrame = {
    val e = errors.withWatermark("ts", watermark)
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    e.join(c,
      expr("""e_user = c_user AND
              c_ts BETWEEN e_ts - INTERVAL 60 seconds
                       AND e_ts + INTERVAL 60 seconds"""))
      .select(col("event_id"), col("e_user").as("user_id"),
        col("e_ts"), col("c_ts"))
  }

  // ---------------------------------------------- streaming near-dup LSH
  case class NearDupCandidate(a_id: Long, b_id: Long, est_jaccard: Double)
  /** Bucket state in encoder-friendly flat form: `sigs` concatenates the
    * 32-long signature of each doc in `ids` order. */
  case class BucketDocs(ids: Seq[Long], sigs: Seq[Long])

  /** Streaming MinHash-LSH near-dup detection — the online face of
    * [[graft.analytics.Dedup.dedupMinhashLsh]]: as documents arrive,
    * signatures are computed map-side with the native kernels, the 8 LSH
    * band keys are exploded, and `flatMapGroupsWithState` keyed by band
    * key holds each bucket's seen (doc_id, signature) list. A new doc is
    * compared only against its own buckets; pairs whose signature
    * agreement ≥ `threshold` are emitted the moment the second doc
    * arrives — cross-batch, without re-scanning the corpus.
    *
    * State bounds: each bucket keeps at most `maxBucketDocs` signatures
    * (32 longs each) — a full bucket stops admitting new signatures but
    * still matches incoming docs against the kept ones, so state is
    * O(buckets × cap) regardless of stream length. Emission is
    * at-least-once per pair (a pair colliding in several bands emits from
    * each); consumers dedupe on (a_id, b_id), exactly like the batch
    * pipeline's DISTINCT over band candidates.
    */
  def nearDupStream(docs: DataFrame, threshold: Double = 0.5,
                    maxBucketDocs: Int = 64): Dataset[NearDupCandidate] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    def bandKey(b: Int): org.apache.spark.sql.Column =
      (0 until 4).foldLeft(lit(b.toLong)) { (acc, r) =>
        acc * 31L + element_at(col("sig"), b * 4 + r + 1)
      }
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.GraftFunctions.minhash32(
          graft.functions.GraftFunctions.ngrams(
            split(col("text"), " "), 3, distinct = true)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        explode(array((0 until 8).map(bandKey): _*)).as("bkey"))
      .as[(Long, Seq[Long], Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[BucketDocs, NearDupCandidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Seq[Long], Long)], state: GroupState[BucketDocs]) =>
          val cur = state.getOption.getOrElse(BucketDocs(Vector.empty, Vector.empty))
          var ids = cur.ids.toVector
          var sigs = cur.sigs.toVector
          val out = List.newBuilder[NearDupCandidate]
          rows.toSeq.sortBy(_._1).foreach { case (id, sig, _) =>
            if (!ids.contains(id)) {
              var d = 0
              while (d < ids.length) {
                var agree = 0
                var j = 0
                while (j < 32) {
                  if (sig(j) == sigs(d * 32 + j)) agree += 1
                  j += 1
                }
                val frac = agree / 32.0
                if (frac >= threshold) {
                  val oid = ids(d)
                  val (a, b) = if (oid < id) (oid, id) else (id, oid)
                  out += NearDupCandidate(a, b, math.round(frac * 1e6) / 1e6)
                }
                d += 1
              }
              if (ids.length < maxBucketDocs) {
                ids = ids :+ id
                sigs = sigs ++ sig
              }
            }
          }
          state.update(BucketDocs(ids, sigs))
          out.result().iterator
      }
  }

  // ---------------------------------------------- incremental kNN graph
  /** One emitted neighbor-list row: `tbl` is the LSH table the list was
    * maintained under and `gen` a per-(table, bucket) monotonically
    * increasing generation — a consumer (or the equality spec) keeps the
    * max-gen list per `(q_id, tbl)` and merges tables via
    * [[mergedGraph]], exactly the upsert-latest discipline of
    * [[upsertSink]]. */
  case class NeighborEdge(q_id: Long, tbl: Int, gen: Long, rank: Int,
                          n_id: Long, cosine: Double)
  /** Bucket state: member ids, their vectors (flattened, `dim` doubles
    * each), norms, and each member's CURRENT top-k heap (scores + ids,
    * ordered score desc then id asc). */
  case class GraphBucketState(ids: Seq[Long], vecs: Seq[Double],
                              nrms: Seq[Double], tops: Seq[Seq[Double]],
                              topIds: Seq[Seq[Long]], gen: Long)

  /** Incremental maintenance of the corpus k-NN graph — the streaming
    * face of [[graft.analytics.Similarity.knnGraph]]: each arrival routes
    * to its bucket state in EVERY one of the `tables` independent LSH
    * tables (`flatMapGroupsWithState` keyed by `(tbl, bucket)`, where
    * table t's 8-bit bucket is the top bits of the same
    * plane-`[t·24, t·24+24)` code the batch build uses — the multi-table
    * recall knob the batch side ships as `GraphTables = 4`), scores only
    * against that bucket's members, and emits UPDATED per-table neighbor
    * lists — the new node's list plus any member list the arrival
    * actually entered. Cosines replicate the batch math exactly
    * (sequential dot, HALF_UP 6-dp rounding, score-desc/id-asc
    * tie-break). [[mergedGraph]] folds the per-table lists into the
    * batch-graph schema; because a node out of its table's top-k is
    * beaten there by k same-table candidates that all reach the merged
    * union too, merging per-table top-k lists IS the top-k of the
    * candidate union — so on buckets below the batch cell-split
    * threshold the merged stream graph is BIT-EQUAL to the T-table batch
    * graph over the union of all arrivals (spec-asserted at T=4 on two
    * micro-batches).
    *
    * State bounds: each (table, bucket) keeps ≤ `maxBucketDocs` vectors
    * (the [[nearDupStream]] policy: a full bucket stops admitting but
    * still serves incoming arrivals' own lists), so state is
    * O(T × buckets × cap × dim) regardless of stream length; per-arrival
    * work is O(T × bucket size × dim) — the same T × Σ bucket² economics
    * as the batch self-join, paid once per arrival instead of per
    * rebuild. Emission is update-shaped and at-least-once per list
    * version; `gen` makes upserts order-safe.
    */
  def knnGraphStream(vectors: DataFrame, k: Int = 5,
                     maxBucketDocs: Int = 256,
                     tables: Int = graft.analytics.Similarity.GraphTables)
      : Dataset[NeighborEdge] = {
    val spark = vectors.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    import graft.functions.Portable.toDouble
    val dim = 64
    // valueOf (Double.toString semantics), NOT new BigDecimal(x) (exact
    // binary expansion): Spark's Round — which the batch graph's
    // round(col, 6) lowers to — goes through Decimal(double) =
    // scala.BigDecimal(double) = valueOf. For cosines whose shortest
    // decimal straddles a 6-dp HALF_UP tie the two constructors disagree,
    // which would break the spec-pinned bit-equality with the batch graph.
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    // (score desc, id asc) insertion returning None when nothing changed
    def insert(tops: Seq[Double], ids: Seq[Long], score: Double, id: Long)
        : Option[(Seq[Double], Seq[Long])] = {
      val beats = (s: Double, i: Long) => score > s || (score == s && id < i)
      if (tops.size >= k && !beats(tops.last, ids.last)) None
      else {
        val pos = tops.indices.find(j => beats(tops(j), ids(j))).getOrElse(tops.size)
        Some((
          ((tops.take(pos) :+ score) ++ tops.drop(pos)).take(k),
          ((ids.take(pos) :+ id) ++ ids.drop(pos)).take(k)))
      }
    }
    val ed = toDouble(col("embedding"))
    // table t's bucket = top 8 bits of the code over planes
    // [t·GraphPlanes, (t+1)·GraphPlanes) — identical to the batch
    // codedTables derivation (table 0 ≡ hyperplaneBucket8), so stream
    // and batch route every vector to the SAME T buckets
    vectors
      .select(col("vec_id").cast("long").as("vec_id"), ed.as("ed"))
      .select(col("vec_id"), col("ed"),
        posexplode(array((0 until tables).map(t =>
          graft.functions.GraftFunctions.hyperplaneCode(
            col("ed"), t * graft.analytics.Similarity.GraphPlanes,
            graft.analytics.Similarity.GraphPlanes)): _*))
          .as(Seq("tbl", "code")))
      .withColumn("bucket",
        expr(s"code div ${1L << graft.analytics.Similarity.GraphSplitBits}"))
      .select(col("vec_id"), col("ed"), col("tbl"), col("bucket"))
      .as[(Long, Seq[Double], Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[GraphBucketState, NeighborEdge](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[(Long, Seq[Double], Int, Long)],
         state: GroupState[GraphBucketState]) =>
          val tbl = key._1
          val cur = state.getOption.getOrElse(
            GraphBucketState(Vector.empty, Vector.empty, Vector.empty,
              Vector.empty, Vector.empty, 0L))
          var ids = cur.ids.toVector
          var vecs = cur.vecs.toVector
          var nrms = cur.nrms.toVector
          var tops = cur.tops.toVector.map(_.toVector)
          var topIds = cur.topIds.toVector.map(_.toVector)
          var gen = cur.gen
          val out = List.newBuilder[NeighborEdge]
          def emit(q: Long, ts: Seq[Double], is: Seq[Long]): Unit = {
            gen += 1
            var r = 0
            while (r < ts.size) {
              out += NeighborEdge(q, tbl, gen, r + 1, is(r), ts(r)); r += 1
            }
          }
          rows.toSeq.sortBy(_._1).foreach { case (id, e, _, _) =>
            if (!ids.contains(id)) {
              val v = e.toIndexedSeq
              val nrm = math.sqrt(dot(v, v))
              var myTops = Vector.empty[Double]
              var myIds = Vector.empty[Long]
              var d = 0
              while (d < ids.length) {
                val w = vecs.slice(d * dim, d * dim + dim)
                val cos = round6(dot(v, w) / (nrm * nrms(d)))
                insert(myTops, myIds, cos, ids(d)).foreach { case (t, i) =>
                  myTops = t.toVector; myIds = i.toVector
                }
                insert(tops(d), topIds(d), cos, id).foreach { case (t, i) =>
                  tops = tops.updated(d, t.toVector)
                  topIds = topIds.updated(d, i.toVector)
                  emit(ids(d), t, i)
                }
                d += 1
              }
              if (myTops.nonEmpty) emit(id, myTops, myIds)
              if (ids.length < maxBucketDocs) {
                ids :+= id; vecs ++= v; nrms :+= nrm
                tops :+= myTops; topIds :+= myIds
              }
            }
          }
          state.update(GraphBucketState(ids, vecs, nrms, tops, topIds, gen))
          out.result().iterator
      }
  }

  /** Consumer-side merge of [[knnGraphStream]]'s per-table emissions into
    * the batch-graph schema `(q_id, rank, n_id, cosine)`: keep the
    * latest-generation list per `(q_id, tbl)`, dedupe `(q_id, n_id)`
    * across tables (a pair co-occurring in several tables carries the
    * SAME exact cosine, so `distinct()` on the scored row is the id
    * dedupe), and re-rank the union by (cosine desc, id asc). Top-k of
    * per-table top-k lists equals top-k of the full candidate union — a
    * candidate outside its own table's k is beaten by k same-table
    * candidates that all reach the union — so this reproduces
    * [[graft.analytics.Similarity.knnGraph]]'s T-table result exactly on
    * unsplit buckets. Runs as a plain batch query over the sink table
    * (two window functions over the bounded edge set). */
  def mergedGraph(edges: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = edges
      .withColumn("maxg",
        max(col("gen")).over(Window.partitionBy("q_id", "tbl")))
      .filter(col("gen") === col("maxg"))
      .select("q_id", "n_id", "cosine").distinct()
    latest
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  // ------------------------------------------------------- sessionization
  case class Click(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes `gapSeconds` after its last event (enforced with event-time
    * timeout, so state is one small record per active user, evicted as
    * the watermark advances).
    */
  def sessionize(clicks: Dataset[Click], gapSeconds: Long = 1800L): Dataset[Session] = {
    import clicks.sparkSession.implicits._
    clicks
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Click], state: GroupState[SessionState]) =>
          def toSession(s: SessionState): Session =
            Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { c =>
              val t = c.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + c.value))
                case Some(s) =>
                  closed ::= toSession(s)
                  cur = Some(SessionState(t, t, 1, c.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, c.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  // -------------------------------------- native streaming session agg
  /** Built-in streaming session windows (`session_window` + watermark) —
    * the declarative counterpart of [[sessionize]]'s custom-state
    * implementation. State is one open session per key, merged as events
    * arrive and finalized (append mode) when the watermark passes the
    * session's close; no user state-management code to get wrong.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  // ------------------------------------------- foreachBatch upsert sink
  /** Highest committed (`_SUCCESS`-marked) `v=<n>` version directory of a
    * versioned parquet table, if any. */
  def latestVersionDir(spark: org.apache.spark.sql.SparkSession,
                       dir: String): Option[org.apache.hadoop.fs.Path] =
    latestVersionBelow(spark, dir, Long.MaxValue)

  /** Highest committed version directory whose version number is strictly
    * below `bound` (the merge base an upsert of batch `bound` may read). */
  def latestVersionBelow(spark: org.apache.spark.sql.SparkSession,
                         dir: String, bound: Long): Option[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(_.getName.drop(2).toLong < bound)
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
      .sortBy(_.getName.drop(2).toLong).lastOption
  }

  /** One micro-batch of the upsert sink: merge the changelog batch with
    * the current table version (latest-per-key, tombstones dropped) and
    * commit it as `v=<batchId>`. Idempotent under foreachBatch replay —
    * re-running a batch rewrites the same version directory. The merge
    * base is the highest committed version STRICTLY BELOW `batchId`: if
    * batch N replays after its own `v=N` was already committed (the
    * `_SUCCESS` landed but the checkpoint commit was lost), merging from
    * `v=N` itself would make the overwrite read its own target path
    * ("Cannot overwrite a path that is also being read from") and wedge
    * the stream on every restart — replay must re-derive `v=N` from the
    * same inputs the original attempt had.
    */
  def upsertBatch(batch: DataFrame, dir: String, batchId: Long,
                  keyCols: Seq[String], versionCol: String,
                  isDelete: org.apache.spark.sql.Column): Unit = {
    val spark = batch.sparkSession
    val merged = latestVersionBelow(spark, dir, batchId)
      .map(p => spark.read.parquet(p.toString).unionByName(batch))
      .getOrElse(batch)
    graft.ops.LatestState.snapshot(merged, keyCols, versionCol, isDelete)
      .write.mode("overwrite").parquet(s"$dir/v=$batchId")
  }

  /** Continuous upsert of an update-mode changelog into a parquet serving
    * table via `foreachBatch` — the sink side of [[latestStateStream]].
    * Every micro-batch commits a NEW `v=<batchId>` directory and readers
    * resolve the highest `_SUCCESS`-marked version, so a reader never
    * observes a half-written table (the same version-then-swap discipline
    * as the compaction staging zone).
    *
    * Tombstone shadowing of LATE arrivals is the upstream changelog's job
    * ([[latestStateStream]] keeps tombstones in state and re-emits); this
    * sink drops them from the serving table.
    */
  def upsertSink(changes: DataFrame, dir: String, checkpointDir: String,
                 keyCols: Seq[String], versionCol: String,
                 isDelete: org.apache.spark.sql.Column)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        upsertBatch(b.toDF(), dir, id, keyCols, versionCol, isDelete))
}
