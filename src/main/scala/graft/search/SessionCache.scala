package graft.search

import java.util.concurrent.ConcurrentHashMap
import java.util.function.BiFunction

import org.apache.spark.sql.DataFrame

/** Per-bucket snapshot cache with TTL and atomic swap
  * (reference: src/main/scala/com/scality/clueso/query/cache/SessionCacheManager.scala).
  *
  * Searches against a hot bucket reuse one materialized snapshot instead of
  * re-merging landing∪staging per request; after `ttlMillis` the next
  * caller rebuilds and atomically swaps, unpersisting the old snapshot.
  * Rebuild is serialized per bucket by the map's per-key lock; concurrent
  * readers keep getting the old snapshot until the swap completes.
  */
class SessionCache(ttlMillis: Long) {

  private case class Entry(df: DataFrame, builtAt: Long)

  private val entries = new ConcurrentHashMap[String, Entry]()

  /** Get the cached snapshot for `bucket`, (re)building with `build` when
    * absent or older than the TTL.
    */
  def get(bucket: String)(build: => DataFrame): DataFrame = {
    val now = System.currentTimeMillis()
    val updated = entries.compute(bucket, new BiFunction[String, Entry, Entry] {
      override def apply(k: String, cur: Entry): Entry = {
        if (cur != null && now - cur.builtAt < ttlMillis) cur
        else {
          val fresh = build.persist()
          fresh.count() // materialize before publishing
          if (cur != null) cur.df.unpersist(false)
          Entry(fresh, now)
        }
      }
    })
    updated.df
  }

  def invalidate(bucket: String): Unit = {
    val e = entries.remove(bucket)
    if (e != null) e.df.unpersist(false)
    ()
  }

  def clear(): Unit = {
    entries.forEach((_, e) => { e.df.unpersist(false); () })
    entries.clear()
  }
}
