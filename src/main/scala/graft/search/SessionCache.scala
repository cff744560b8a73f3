package graft.search

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Per-bucket snapshot cache with TTL and atomic swap
  * (reference: src/main/scala/com/scality/clueso/query/cache/SessionCacheManager.scala).
  *
  * Searches against a hot bucket reuse one materialized snapshot instead of
  * re-merging landing∪staging per request; after `ttlMillis` the next
  * caller rebuilds and atomically swaps, unpersisting the old snapshot.
  *
  * Locking: rebuilds serialize on a PER-BUCKET lock object (the semantics
  * of the reference's per-bucket lock set, SessionCacheManager.scala:77-84)
  * — deliberately NOT inside `ConcurrentHashMap.compute`, whose contract
  * wants short, simple functions: a minutes-long `persist()+count()` in a
  * compute block also stalls unrelated buckets hashing to the same bin.
  * Readers never block: a fresh entry is returned without touching the
  * lock, and during a rebuild concurrent callers of OTHER buckets proceed
  * on their own locks.
  */
class SessionCache(ttlMillis: Long) {

  private case class Entry(df: DataFrame, builtAt: Long)

  private val entries = new ConcurrentHashMap[String, Entry]()
  private val locks = new ConcurrentHashMap[String, Object]()

  private def fresh(e: Entry, now: Long): Boolean =
    e != null && now - e.builtAt < ttlMillis

  /** Get the cached snapshot for `bucket`, (re)building with `build` when
    * absent or older than the TTL.
    */
  def get(bucket: String)(build: => DataFrame): DataFrame = {
    val e = entries.get(bucket)
    if (fresh(e, System.currentTimeMillis())) return e.df
    val lock = locks.computeIfAbsent(bucket, _ => new Object)
    lock.synchronized {
      // double-check: another caller may have finished the rebuild while
      // this one waited on the bucket lock
      val cur = entries.get(bucket)
      if (fresh(cur, System.currentTimeMillis())) cur.df
      else {
        val built = build.persist()
        built.count() // materialize before publishing
        val old = entries.put(bucket, Entry(built, System.currentTimeMillis()))
        if (old != null) old.df.unpersist(false)
        built
      }
    }
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
