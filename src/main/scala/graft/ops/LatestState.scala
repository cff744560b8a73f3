package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-event-per-key snapshot — the core MVCC merge of a metadata
  * search engine: given an op-log, keep only each key's most recent event
  * and drop keys whose most recent event is a tombstone.
  *
  * Semantics follow the reference's snapshot merge
  * (reference: src/main/scala/com/scality/clueso/query/MetadataQueryExecutor.scala:178-184:
  * `row_number over (partition by key order by opIndex desc) = 1` then
  * `type != 'delete'`).
  *
  * ==Why argmax-join instead of a window or `max_by(struct)`==
  * A rank window sorts every shuffle partition in full before discarding
  * all but one row per key. The `max_by(struct(payload), version)`
  * aggregation avoids the sort but carries a struct aggregation buffer,
  * which HashAggregate cannot hold — Spark falls back to
  * ObjectHashAggregate/SortAggregate, an interpreted per-row path that
  * re-sorts map partitions (measured mildly superlinear: 13× for 10× data
  * at the 100× scale point). [[snapshot]] therefore splits the merge:
  * a slim `max(version)` HashAggregate per key (fixed-width buffer,
  * whole-stage codegen, map-side partial collapse) followed by a
  * LEFT SEMI equi-join back on (keys, version) to recover the winning
  * row's payload. Both sides stay in codegen; the semi-join build side is
  * one (keys, version) row per distinct key, so Catalyst broadcasts it
  * when it fits and AQE picks a shuffled hash join when it doesn't.
  * Requires `versionCol` to be unique within a key — true for op
  * indexes/event ids, and asserted by the reference semantics (a rank
  * window on tied versions would pick one arbitrarily; the op log has no
  * ties). [[snapshotWindowed]] keeps the reference formulation for
  * comparison/tests.
  */
object LatestState {

  /** One row per key: the payload of the event with the highest version.
    *
    * @param df         op-log (any schema)
    * @param keyCols    identity of the logical record
    * @param versionCol total order within a key (op index / sequence number)
    * @param isDelete   evaluated on the *latest* event; matching keys are
    *                   dropped from the snapshot (tombstones)
    */
  def snapshot(df: DataFrame, keyCols: Seq[String], versionCol: String,
               isDelete: Column): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    val slim = df.groupBy(keyCols.map(col): _*)
      .agg(max(col(versionCol)).as(versionCol))
    val winners = df.join(slim, keyCols :+ versionCol, "left_semi")
      // same column contract as the old aggregation form: keys first
      .select(keyCols.map(col) ++ payload.map(col): _*)
      .filter(!isDelete)
    // The semi-join emits one row per PHYSICAL copy of the winning
    // (key, version) row. The op-log can legitimately hold two copies of
    // the same event — landing and staging both contain a compaction
    // group during the compactor's purge-tolerance window (and
    // permanently if a crashed run re-appends a group). An event is
    // immutable, so copies are value-identical; keep one arbitrarily via
    // a rank window. Crucially the window input here is the
    // already-collapsed winners frame (≈ one row per live key), so the
    // sort is OUTPUT-bounded — unlike the reference's full-history
    // window, and unlike the alternatives: distinct()/except reject MAP
    // payload columns outright, and dropDuplicates(subset)'s
    // first(payload) buffer forces the ObjectHashAggregate path, which
    // silently turns sort-based past its 128-key fallback threshold —
    // the very landmine the argmax split removed.
    val copies = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    winners.withColumn("__copy", row_number().over(copies))
      .filter(col("__copy") === 1).drop("__copy")
  }

  /** Reference formulation: rank window + filter. Same result, kept for
    * spec-level equivalence checks and for callers that need the full
    * ranked history rather than the head row.
    */
  def snapshotWindowed(df: DataFrame, keyCols: Seq[String], versionCol: String,
                       isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1 && !isDelete)
      .drop("__rank")
  }
}
