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
  * ==Why aggregation instead of a window==
  * A rank window sorts every shuffle partition in full before discarding
  * all but one row per key. [[snapshot]] instead aggregates with
  * `max_by(struct(payload), version)`: partial aggregation collapses
  * duplicate keys map-side *before* the exchange, so at 100 TB the shuffle
  * carries ~|distinct keys| rows instead of |events| rows, and no sort is
  * performed at all. [[snapshotWindowed]] keeps the reference formulation
  * for comparison/tests.
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
    val latest = df
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(versionCol)).as("__latest"))
    latest
      .select(keyCols.map(col) ++ payload.map(c => col(s"__latest.`$c`").as(c)): _*)
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
