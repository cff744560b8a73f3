package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-layout optimization for scan pruning (SURVEY §2.1, spec row).
  *
  * At 100 TB the scan you never run is the fastest one: parquet footers
  * carry per-file column min/max, and Spark skips whole files whose stats
  * can't match the filter. That only works if the writer CLUSTERED the
  * data — these helpers are the write-side half of data skipping.
  *
  * - [[writeRangeLayout]]: range-partition + sort by one key → each file
  *   owns a disjoint key range; point/range predicates on the key touch
  *   one (or few) files. The layout the clueso landing/staging zones get
  *   per bucket via partitioning, generalized to any sort key.
  * - [[writeMortonLayout]]: interleave the bits of TWO keys (Z-order
  *   curve) and range-partition on the curve position → each file is a
  *   rectangle in (a, b) space, so predicates on EITHER column prune
  *   files — the multi-dimensional clustering single-key sorting can't
  *   give.
  */
object Layout {

  /** Bits per dimension in [[mortonCode]] (two dims → 2×31 = 62-bit code,
    * the widest two-dim interleave a signed 64-bit column can carry).
    * Keys must be non-negative and < 2^31 ≈ 2.1e9 per dimension —
    * [[writeMortonLayout]] validates this instead of silently aliasing:
    * a key above the bit budget would wrap onto the same curve positions
    * as a small key, files would stop being bounded rectangles, and the
    * advertised two-column skipping would degrade with no visible error.
    */
  val MortonBits = 31

  /** Z-order curve position: the low [[MortonBits]] bits of `a` and `b`
    * interleaved (a even positions, b odd). Built as a balanced tree of
    * shift/mask ops — plain codegen'd integer math, no UDF.
    */
  def mortonCode(a: Column, b: Column): Column = {
    def spread(c: Column): Column =
      (0 until MortonBits).map(i =>
        shiftleft(shiftright(c, i).bitwiseAND(1L), 2 * i))
        .reduce(_ + _)
    spread(a) + shiftleft(spread(b), 1)
  }

  /** Range-partition into `nFiles` files sorted by `key`: disjoint
    * per-file key ranges → file-level skipping on `key` predicates. */
  def writeRangeLayout(df: DataFrame, key: String, nFiles: Int, path: String): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Z-order layout on two keys: range-partition + sort on the Morton
    * code so every file covers a bounded rectangle in (keyA, keyB).
    * Fails loudly if either key exceeds the [[MortonBits]] domain (one
    * extra min/max aggregate over the input — trivial next to the write's
    * own shuffle, and the alternative is silent skipping degradation). */
  def writeMortonLayout(df: DataFrame, keyA: String, keyB: String,
                        nFiles: Int, path: String): Unit = {
    val bound = 1L << MortonBits
    val r = df.agg(min(col(keyA)), max(col(keyA)),
                   min(col(keyB)), max(col(keyB))).first()
    def asL(i: Int): Long = r.get(i) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"morton keys must be integral, got $other")
    }
    require(r.anyNull || (asL(0) >= 0 && asL(1) < bound && asL(2) >= 0 && asL(3) < bound),
      s"morton keys out of domain [0, $bound): " +
        s"$keyA=[${r.get(0)}, ${r.get(1)}], $keyB=[${r.get(2)}, ${r.get(3)}]")
    df.withColumn("__z", mortonCode(col(keyA), col(keyB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
