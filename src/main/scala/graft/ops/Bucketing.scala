package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time so
  * every later equi-join / aggregation on the bucket key is co-located
  * and shuffle-free.
  *
  * This is the 100 TB play for repeatedly-joined fact tables (orders ⋈
  * lineitem on the order key, events ⋈ events on user): a join of two
  * tables bucketed into the same bucket count on the join key reads
  * bucket i of each side in the same task — Catalyst plans a
  * SortMergeJoin with NO Exchange on either side (see `BucketingSpec`,
  * which asserts the shuffle-free plan and result parity vs the plain
  * join). The one-time bucketed write costs a single shuffle; every
  * subsequent join amortizes it.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) catalog table,
    * replacing any previous version. Sorting by the bucket key lets the
    * SortMergeJoin skip its per-task sort too.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket key — co-located,
    * no Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
