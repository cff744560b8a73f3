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
}
