package graft.ops

/** Cluster-sizing math for the 100 TB deployment, as code instead of a
  * runbook (spec-checked in `TuningSpec`).
  *
  * The knobs below are the ones that decide whether a plan that is
  * correct at sf0.1 still RUNS at 1000 executors:
  *
  *  - **shuffle partitions**: sized so one shuffle partition of the
  *    largest expected shuffle fits comfortably in one task's memory
  *    (`targetPartitionBytes`, default 128 MiB), floored at 2× total
  *    cores so every core has work even for small stages — AQE coalesces
  *    down from there, it never splits up, so err high.
  *  - **scan partition size** (`maxPartitionBytes`): keep the default
  *    128 MiB — larger starves parallelism on pruned scans, smaller
  *    drowns the driver in tasks.
  *  - **broadcast threshold**: bounded by executor memory, not wishful
  *    thinking: a broadcast table materializes ONCE PER EXECUTOR on the
  *    heap; 1/32 of executor memory caps the worst case with 32
  *    concurrent broadcasts far away.
  *  - **AQE on** (with skew-join splitting): runtime re-planning is the
  *    only defense against estimate drift at this scale.
  */
object Tuning {

  final case class Profile(confs: Map[String, String]) {
    def apply(spark: org.apache.spark.sql.SparkSession): Unit =
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  val MiB: Long = 1L << 20
  val GiB: Long = 1L << 30

  /** Shuffle-partition count for `shuffleBytes` of shuffled data:
    * ceil(bytes / target), floored at 2 tasks per core. */
  def shufflePartitions(shuffleBytes: Long, totalCores: Int,
                        targetPartitionBytes: Long = 128 * MiB): Int = {
    require(shuffleBytes >= 0 && totalCores > 0 && targetPartitionBytes > 0)
    val bySize = (shuffleBytes + targetPartitionBytes - 1) / targetPartitionBytes
    math.max(bySize, 2L * totalCores).min(Int.MaxValue).toInt
  }

  /** Broadcast cutoff: 1/32 of executor heap, capped at 1 GiB (the point
    * where broadcast build+ship time loses to a shuffle join anyway). */
  def broadcastThresholdBytes(executorMemBytes: Long): Long =
    math.min(executorMemBytes / 32, 1 * GiB)

  /** Measured scratch-disk high-water per candidate pair in the
    * near-dup shared-counts build (shuffle files + the per-pass
    * aggregate's spill, compressed): the round-11 ×1000 run put ~1.266B
    * pairs through a 4-pass build with a measured ≤30 GB sawtooth —
    * ≈95 bytes of peak scratch per pair-per-pass; 96 rounds to a power
    * of two. Conservative by construction (the measurement is a
    * high-water, not an average). */
  val PairScratchBytesPerPair: Long = 96L

  /** [[PairScratchBytesPerPair]] for the round-16 PACKED pair rows: the
    * pair shuffle now carries 2 longs (`(doc<<32|n)` per side, 24-byte
    * UnsafeRows) instead of 4 (40 bytes) — 0.6× the measured 96 B/pair
    * high-water is 57.6, rounded up to 64 for margin (the constant is a
    * high-water bound, so rounding must go up). Verified at ×1000: the
    * 3-pass build (422M pairs/pass) stays inside the same 30 GB budget
    * the 4-pass unpacked build needed. */
  val PackedPairScratchBytesPerPair: Long = 64L

  /** Pass count for the pair-space-sharded shared-counts build
    * ([[graft.analytics.Dedup]]): the number of disjoint a-side shards
    * needed so one pass's pair shuffle fits the per-host scratch budget.
    *
    * `scratchBudgetBytes <= 0` means scratch is not a bottleneck — the
    * cluster case, where shuffle scratch is an aggregate resource sized
    * with the fleet — and the build runs ONE pass (no sharding, no
    * inter-pass hygiene). A positive budget is the single-host case
    * (e.g. this sandbox's ~30 GB effective headroom): passes =
    * ceil(pairCount × bytes/pair ÷ budget), capped at `maxPasses`
    * because each pass rescans the full cached posting list (CPU ∝
    * passes) — past the cap, more scratch is the answer, not more
    * passes. */
  def pairShardPasses(pairCount: Long, scratchBudgetBytes: Long,
                      maxPasses: Int = 8,
                      bytesPerPair: Long = PairScratchBytesPerPair): Int = {
    require(pairCount >= 0, "pairCount must be non-negative")
    require(maxPasses >= 1, "maxPasses must be >= 1")
    require(bytesPerPair >= 1, "bytesPerPair must be >= 1")
    if (scratchBudgetBytes <= 0L) 1
    else {
      val perPass = math.max(1L, scratchBudgetBytes / bytesPerPair)
      val needed = (pairCount + perPass - 1) / perPass
      math.max(1L, math.min(needed, maxPasses.toLong)).toInt
    }
  }

  /** Local-bench shuffle width for a run over `inputBytes` of source
    * data on `cores` cores: the size-driven partition count (worst-case
    * single-query shuffle ≈ input bytes — the measured ×1000 ratio for
    * the suite's shuffle-heaviest relational queries; the pair build
    * sizes its own width off posting count and is excluded), rounded UP
    * to a whole number of `cores`-wide scheduler waves so every wave
    * runs full — floored at ONE full wave, not [[shufflePartitions]]'s
    * 2-tasks-per-core: that floor smooths task skew on cluster-scale
    * scans, but a local point whose data needs fewer than `cores`
    * partitions is latency-bound and extra waves are pure scheduling
    * overhead (measured: the 120-query suite at sf0.1 runs 54 s at one
    * wave vs 64 s at two). ×1000 (~17 GB of source parquet, 32 cores)
    * → 128, the width the round-11 robustness runs proved. */
  def benchWidth(inputBytes: Long, cores: Int): Int = {
    require(inputBytes >= 0 && cores > 0)
    val bySize = (inputBytes + 128 * MiB - 1) / (128 * MiB)
    val waves = math.max(1L, (bySize + cores - 1) / cores)
    (waves * cores).min(Int.MaxValue).toInt
  }

  /** The conf profile for a cluster of `executors`×`coresPerExecutor`
    * cores and an expected worst-case shuffle of `maxShuffleBytes`. */
  def profile(executors: Int, coresPerExecutor: Int,
              executorMemBytes: Long, maxShuffleBytes: Long): Profile = {
    val cores = executors * coresPerExecutor
    Profile(Map(
      "spark.sql.shuffle.partitions" ->
        shufflePartitions(maxShuffleBytes, cores).toString,
      "spark.sql.files.maxPartitionBytes" -> (128 * MiB).toString,
      "spark.sql.autoBroadcastJoinThreshold" ->
        broadcastThresholdBytes(executorMemBytes).toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true"))
  }
}
