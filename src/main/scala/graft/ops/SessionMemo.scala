package graft.ops

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for SMALL derived frames shared by several
  * registered queries (confirmed near-dup pairs, cluster labels, the
  * parsed op-log projection), revalidated against the on-disk state of
  * the memo's input tables.
  *
  * Keying on (session, dir) alone serves STALE results when the same
  * path is rewritten in place within one session — so every access also
  * computes a cheap driver-side fingerprint of the input tables (each
  * data file's path, length and modification time, hashed) and rebuilds
  * when it moved. A rewrite therefore invalidates automatically; no
  * write path needs to know which memos exist.
  *
  * Entries hold strong references to their session (unavoidable: the
  * memoized DataFrame itself references it, so a weak-keyed map would
  * never collect — the value would resurrect the key). Entries whose
  * session has STOPPED are purged on every [[get]] (the
  * [[DerivedZone]] rule), so a long-lived multi-session process that
  * cycles sessions doesn't accumulate dead pins; [[clear]] remains the
  * explicit hatch (e.g. [[graft.analytics.Dedup.clearMemos]]) for
  * evicting LIVE sessions' entries.
  *
  * A rebuild runs inside the map's compute (the bin stays locked for the
  * build): callers are per-session query registries where concurrent
  * same-key builds — not sub-millisecond lookups — are the thing to
  * prevent. Contrast [[graft.search.SessionCache]], which serves many
  * concurrent buckets and deliberately locks per key OUTSIDE the map.
  *
  * @param tables input table file names under the queried dir whose
  *               on-disk state the memo depends on (e.g. `documents.parquet`)
  */
private[graft] final class SessionMemo(tables: Seq[String]) {

  private final case class Entry(fp: String, df: DataFrame)

  private val entries = new ConcurrentHashMap[(SparkSession, String), Entry]()

  /** The memoized frame for (spark, dir), rebuilding via `build` when
    * absent or when any input table's on-disk state changed. The replaced
    * entry's checkpoint blocks are ContextCleaner-reaped once unreferenced.
    */
  def get(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    // a stopped session's frames can never be served again; drop their
    // entries so the memo doesn't pin dead sessions (their checkpoint
    // blocks died with the context — only the references linger)
    entries.keySet.removeIf(_._1.sparkContext.isStopped)
    val fp = SessionMemo.fingerprint(spark, tables.map(t => s"$dir/$t"))
    val key = (spark, dir)
    val cur = entries.get(key)
    if (cur != null && cur.fp == fp) cur.df
    else entries.compute(key, (_, c) =>
      if (c != null && c.fp == fp) c else Entry(fp, build)).df
  }

  def clear(): Unit = entries.clear()
}

private[graft] object SessionMemo {

  /** Driver-side identity of on-disk table state: every data file's
    * (path, length, mtime), sorted and hashed. A metadata-only listing —
    * no data is read — so the check is microseconds on a local FS and one
    * round-trip per table on an object store.
    *
    * ==Granularity caveat==
    * mtime resolution is filesystem-dependent (1 s on several local
    * stores, coarser on some object stores), so an in-place rewrite that
    * preserves every file name AND length within one mtime tick is not
    * detected. Spark's own writers make this practically unreachable
    * (part files carry a fresh job/task UUID in the name, so any rewrite
    * changes paths), but a byte-patching writer that edits files in place
    * must call the owning family's `clearMemos()` after such a rewrite.
    */
  def fingerprint(spark: SparkSession, paths: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    md.update(listEntries(spark, paths).mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The sorted per-file identity entries behind [[fingerprint]] —
    * exposed so [[DerivedZone]]'s append-aware path can compare file SETS
    * (old ⊂ new ⇒ pure append) rather than only their hash. */
  def listEntries(spark: SparkSession, paths: Seq[String]): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    paths.foreach { raw =>
      val p = new Path(raw)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) parts += s"$raw:absent"
      else {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val s = it.next()
          val name = s.getPath.getName
          // _SUCCESS / _spark_metadata and friends carry no data
          if (!name.startsWith("_") && !name.startsWith(".")) {
            parts += s"${s.getPath}:${s.getLen}:${s.getModificationTime}"
          }
        }
      }
    }
    parts.sorted.toSeq
  }

  /** Total on-disk bytes of the data files under `paths` — the
    * driver-side input-size measurement behind size-derived shuffle
    * widths (metadata-only, no Spark jobs). */
  def dataBytes(spark: SparkSession, paths: Seq[String]): Long =
    listEntries(spark, paths).iterator.filterNot(_.endsWith(":absent")).map { e =>
      val i2 = e.lastIndexOf(':')
      val i1 = e.lastIndexOf(':', i2 - 1)
      e.substring(i1 + 1, i2).toLong
    }.sum

  /** The file path of a [[listEntries]] entry (strip the trailing
    * `:len:mtime` fields). */
  def entryPath(e: String): String = {
    val i2 = e.lastIndexOf(':')
    val i1 = e.lastIndexOf(':', i2 - 1)
    e.substring(0, i1)
  }
}
