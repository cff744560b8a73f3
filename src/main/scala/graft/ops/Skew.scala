package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for the cases AQE can't fix.
  *
  * AQE's runtime skew-join splitting (on by default) handles sort-merge
  * joins; these helpers cover the remaining patterns:
  *
  *  - [[saltedJoin]]: equi-join where one side has pathological key skew
  *    and the other is too large to broadcast — salt the skewed side,
  *    replicate the other over the salt domain, join on (key, salt). Each
  *    hot key's rows spread over `saltFactor` shuffle partitions instead
  *    of one.
  *  - [[saltedCountSum]]: two-stage aggregation under key skew with very
  *    high per-key row counts; partial aggregates by (key, salt) collapse
  *    the hot key before the final narrow merge by key. (Plain
  *    `groupBy(key)` already does map-side partial aggregation — this is
  *    only for when single-key volume still overwhelms one reducer.)
  */
object Skew {

  /** Deterministic spreading salt: full-row hash modulo `factor` (rows of
    * the same hot key differ somewhere, so they spread; identical rows
    * co-locate, which is harmless).
    */
  private def salt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(factor))

  /** Inner equi-join of `skewed` with `other` on `key`, with the skewed
    * side salted and the other side replicated `saltFactor`×.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val s = skewed.withColumn("__salt", salt(skewed, saltFactor))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    s.join(o, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage `groupBy(key).agg(count, sum(valueCol))` with a spreading
    * salt on the first stage.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltFactor: Int): DataFrame =
    df.withColumn("__salt", salt(df, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"))
}
