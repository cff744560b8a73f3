package graft

/** Deployment configuration for the search-engine half of the library
  * (reference: src/main/scala/com/scality/clueso/CluesoConfig.scala — the
  * subset that governs zone layout and runtime behavior; connection
  * settings live with the session, not here).
  *
  * @param landingDir      streaming-append zone, partitioned `(bucket, opGroup)`
  * @param stagingDir      compacted zone, same layout
  * @param checkpointDir   streaming checkpoint root
  * @param groupInterval   op-index records per compaction group
  * @param cacheTtlMillis  bucket-snapshot cache lifetime
  * @param excludeBucket   deployment's own metadata bucket (never indexed)
  * @param purgeToleranceMs grace period between compaction's staging
  *                        append and the landing purge (in-flight search
  *                        tolerance; see [[graft.compact.Compactor]])
  * @param kafkaBootstrap  Kafka bootstrap servers; empty → file journal
  * @param kafkaTopic      Kafka topic carrying the metadata journal
  * @param maxSearchScanBytes admission budget for one search's scan
  *                        footprint; 0 disables the [[graft.search.PlanGuard]]
  *                        gate (cartesian/nested-loop joins are still
  *                        rejected whenever the gate is on)
  */
case class GraftConfig(landingDir: String, stagingDir: String,
                       checkpointDir: String,
                       groupInterval: Long = 10000L,
                       cacheTtlMillis: Long = 60000L,
                       excludeBucket: String = "",
                       purgeToleranceMs: Long = 0L,
                       kafkaBootstrap: String = "",
                       kafkaTopic: String = "",
                       maxSearchScanBytes: Long = 0L) {
  require(groupInterval > 0, "groupInterval must be positive")
  require(purgeToleranceMs >= 0, "purgeToleranceMs must be non-negative")
  require(maxSearchScanBytes >= 0, "maxSearchScanBytes must be non-negative")
}

object GraftConfig {
  /** Load from Java properties (`graft.landing.dir`, `graft.staging.dir`,
    * `graft.checkpoint.dir`, `graft.group.interval`, `graft.cache.ttl.ms`,
    * `graft.exclude.bucket`), e.g. a `--properties-file` passed to
    * spark-submit.
    */
  def fromProperties(props: java.util.Properties): GraftConfig = {
    def get(k: String): String = {
      val v = props.getProperty(k)
      require(v != null, s"missing required property $k")
      v
    }
    GraftConfig(
      landingDir = get("graft.landing.dir"),
      stagingDir = get("graft.staging.dir"),
      checkpointDir = props.getProperty("graft.checkpoint.dir",
        get("graft.landing.dir") + "/_checkpoints"),
      groupInterval = props.getProperty("graft.group.interval", "10000").toLong,
      cacheTtlMillis = props.getProperty("graft.cache.ttl.ms", "60000").toLong,
      excludeBucket = props.getProperty("graft.exclude.bucket", ""),
      purgeToleranceMs = props.getProperty("graft.purge.tolerance.ms", "0").toLong,
      kafkaBootstrap = props.getProperty("graft.kafka.bootstrap", ""),
      kafkaTopic = props.getProperty("graft.kafka.topic", ""),
      maxSearchScanBytes = props.getProperty("graft.search.max.scan.bytes", "0").toLong)
  }
}
