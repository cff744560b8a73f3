package graft.tools

import graft.search.{SearchQuery, SearchServer}
import org.apache.spark.sql.SparkSession

/** Measured warm-executor amortization — the quantitative face of the
  * serving mode (reference: MetadataQueryExecutor's resident executor +
  * SessionCacheManager delegation; graft: [[graft.search.SearchServer]]).
  *
  * Populates a landing zone, then drives one warm server: per bucket the
  * FIRST query pays the landing∪staging snapshot merge + persist, every
  * later query plans against the cached snapshot. Prints one JSON line
  * with cold/warm latencies, the amortization ratio, and the rebuild
  * count (must equal the bucket count — one build per bucket, ever).
  *
  * Usage: `runMain graft.tools.ServerBench [buckets] [eventsPerBucket] [warmReps]`
  */
object ServerBench {
  def main(args: Array[String]): Unit = {
    val buckets = if (args.length > 0) args(0).toInt else 4
    val perBucket = if (args.length > 1) args(1).toLong else 50000L
    val warmReps = if (args.length > 2) args(2).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-server-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_server_bench")
    val landing = root.resolve("landing").toString
    val staging = root.resolve("staging").toString
    val names = (1 to buckets).map(i => f"srvb$i%02d")
    names.foreach(b => Populator.populateLanding(spark, landing, b, perBucket, numFiles = 4))

    val server = new SearchServer(spark, landing, staging, cacheTtlMillis = 600000L)
    try {
      def ms[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      // vary the predicate per rep so warm timings measure query work
      // against the cached snapshot, never result-level caching
      def q(b: String, i: Int): SearchQuery =
        SearchQuery(b, where = s"`content-length` % 97 = ${i % 97}", limit = 100)
      val cold = names.map(b => ms(server.executeJson(q(b, 0))))
      val warm = names.flatMap(b => (1 to warmReps).map(i => ms(server.executeJson(q(b, i)))))
      val sortedWarm = warm.sorted
      def pct(p: Double): Double = sortedWarm(((sortedWarm.size - 1) * p).toInt)
      val coldMed = cold.sorted.apply(cold.size / 2)
      val json =
        s"""{"metric":"server_bench","buckets":$buckets,"events_per_bucket":$perBucket,""" +
        s""""warm_reps_per_bucket":$warmReps,""" +
        s""""cold_ms_median":${"%.1f".format(coldMed)},""" +
        s""""warm_ms_median":${"%.1f".format(pct(0.5))},""" +
        s""""warm_ms_p95":${"%.1f".format(pct(0.95))},""" +
        s""""amortization":${"%.1f".format(coldMed / pct(0.5))},""" +
        s""""snapshot_rebuilds":${server.snapshotRebuilds}}"""
      println(json)
      val out = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
      require(server.snapshotRebuilds == buckets.toLong,
        s"expected exactly one snapshot build per bucket, got ${server.snapshotRebuilds}")
    } finally {
      server.close()
      spark.stop()
    }
  }
}
