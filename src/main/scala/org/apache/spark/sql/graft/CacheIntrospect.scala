package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Accessors for `private[sql]` cache internals that
  * [[graft.search.PlanGuard.factScanCounts]] needs to attribute
  * cache-BUILD scans (the one execution that materializes a cached
  * relation runs its child plan's base-table scan; every later
  * execution reads column buffers). Lives in an `org.apache.spark.sql`
  * subpackage purely for access — same pattern as
  * [[org.apache.spark.graft.metrics.SearchMetricsSource]]; no Spark
  * behavior is modified.
  */
object CacheIntrospect {

  /** Identity of the cache behind a cached-relation scan: the
    * `CachedRDDBuilder` instance, which Spark's CacheManager shares
    * across every consumer of one cache (reference equality = same
    * cache). Opaque to callers. */
  def cacheKey(scan: InMemoryTableScanExec): AnyRef =
    scan.relation.cacheBuilder

  /** Whether the cache's column buffers are already materialized (a
    * scan of a loaded cache reads buffers, never the base table). */
  def isLoaded(scan: InMemoryTableScanExec): Boolean =
    scan.relation.cacheBuilder.isCachedColumnBuffersLoaded

  /** The physical plan a cold cache runs (once) to materialize. */
  def cachedPlan(scan: InMemoryTableScanExec): SparkPlan =
    scan.relation.cacheBuilder.cachedPlan
}
