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
    df.join(slim, keyCols :+ versionCol, "left_semi")
      // same column contract as the old aggregation form: keys first
      .select(keyCols.map(col) ++ payload.map(col): _*)
      .filter(!isDelete)
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
