package graft

import graft.compact.Compactor
import graft.ingest.IngestPipeline
import graft.search.{ListRequest, MetadataSearch, SearchQuery, SessionCache}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The assembled search engine: one object wiring ingestion, search,
  * snapshot caching and compaction over a [[GraftConfig]] — the
  * entrypoint a deployment (or a user migrating from the reference
  * engine) drives.
  */
class GraftEngine(spark: SparkSession, val config: GraftConfig) {

  val searcher = new MetadataSearch(spark, config.landingDir, config.stagingDir)
  val compactor = new Compactor(spark, config.landingDir, config.stagingDir,
    config.purgeToleranceMs)
  private val cache = new SessionCache(config.cacheTtlMillis)

  /** Start continuous ingestion: the Kafka journal when the config names
    * a broker (the reference's production source), else the file journal.
    * Parse, filter and sink are shared between the two.
    */
  def startIngest(inputDir: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    if (config.kafkaBootstrap.nonEmpty)
      IngestPipeline.kafkaJournalStream(spark, config.kafkaBootstrap,
        config.kafkaTopic, config.landingDir, config.checkpointDir, trigger,
        config.excludeBucket, config.groupInterval)
    else
      IngestPipeline.fileJournalStream(spark, inputDir, config.landingDir,
        config.checkpointDir, trigger, config.excludeBucket, config.groupInterval)

  /** Search the live snapshot (landing ∪ staging merged per call).
    * With `maxSearchScanBytes` configured, the plan is audited BEFORE any
    * task launches ([[graft.search.PlanGuard]]) so a degenerate predicate
    * fails fast instead of scanning the world.
    */
  def search(q: SearchQuery): DataFrame = {
    val df = searcher.search(q)
    if (config.maxSearchScanBytes > 0)
      graft.search.PlanGuard.admit(df, BigInt(config.maxSearchScanBytes))
    else df
  }

  /** Search against the TTL-cached materialized snapshot of the bucket —
    * the hot-bucket path (reference: SessionCacheManager): repeated
    * searches reuse one persisted merge until the TTL lapses.
    */
  def searchCached(q: SearchQuery): DataFrame =
    searcher.searchSnapshot(cache.get(q.bucket)(searcher.bucketSnapshot(q.bucket)), q)

  /** S3 ListObjectsV2 page over the live snapshot (delimiter rollup +
    * leaf objects; see [[MetadataSearch.listObjects]]). */
  def listObjects(req: ListRequest): DataFrame = searcher.listObjects(req)

  /** S3 ListObjectVersions page over the unmerged zones
    * (see [[MetadataSearch.listVersions]]). */
  def listVersions(req: ListRequest): DataFrame = searcher.listVersions(req)

  /** Invalidate a bucket's cached snapshot (e.g. after compaction). */
  def invalidateCache(bucket: String): Unit = cache.invalidate(bucket)

  /** Fold closed landing op-groups into staging for all buckets; returns
    * per-bucket failures (empty when everything compacted). */
  def compact(numPartitions: Int, force: Boolean = false): Map[String, Throwable] = {
    val failures = compactor.compactAll(numPartitions, force)
    cache.clear() // snapshots may now read stale landing paths
    failures
  }
}
