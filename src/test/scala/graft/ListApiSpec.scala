package graft

import graft.compact.Compactor
import graft.ingest.EventParser
import graft.search.{ListRequest, MetadataSearch}
import graft.tools.Populator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parameterized ListObjectsV2 / ListObjectVersions API over the native
  * landing ∪ staging zones — the reusable surface behind the oracle-gated
  * `list_objects`/`list_versions` query shapes.
  */
class ListApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // landing+staging with real version history: 40 base PUTs (half the
  // closed groups compacted to staging), then re-PUTs of two keys and a
  // delete marker for a third appended to landing
  private lazy val (landing, staging) = {
    val l = SparkTestSession.tempDir("listapi-landing")
    val s = SparkTestSession.tempDir("listapi-staging")
    Populator.populateLanding(spark, l, "lb", 40, groupInterval = 20L)
    new Compactor(spark, l, s).compactBucket("lb", 1)
    import spark.implicits._
    val extra = Seq(
      """{"opIndex":"000000000100_000000","type":"put","bucket":"lb","key":"obj_0000000003","value":{"content-length":99}}""",
      """{"opIndex":"000000000101_000000","type":"put","bucket":"lb","key":"obj_0000000005","value":{"content-length":98}}""",
      """{"opIndex":"000000000102_000000","type":"delete","bucket":"lb","key":"obj_0000000007"}""")
      .toDF("value")
    EventParser.parse(extra, "value", excludeBucket = "", groupInterval = 20L)
      .write.partitionBy("bucket", "opGroup").mode("append").parquet(l)
    (l, s)
  }
  private lazy val search = new MetadataSearch(spark, landing, staging)

  test("flat listing pages with a keyset cursor, deleted keys hidden") {
    val p1 = search.listObjects(ListRequest("lb", maxKeys = 10))
      .collect().map(_.getString(1)).toSeq
    assert(p1.size == 10 && p1 == p1.sorted)
    assert(p1.head == "obj_0000000000")
    val p2 = search.listObjects(
        ListRequest("lb", startAfter = Some(p1.last), maxKeys = 10))
      .collect().map(_.getString(1)).toSeq
    assert(p2.size == 10 && (p1.toSet & p2.toSet).isEmpty)
    assert(p2.forall(_ > p1.last), "cursor must be strictly-greater keyset")
    // the tombstoned key is gone from the snapshot listing
    val all = search.listObjects(ListRequest("lb")).collect().map(_.getString(1))
    assert(!all.contains("obj_0000000007") && all.length == 39)
  }

  test("delimiter rollup collapses shared prefixes, drill-down lists leaves") {
    // delimiter '_' with empty prefix: every key rolls into 'obj_'
    val roots = search.listObjects(ListRequest("lb", delimiter = "_")).collect()
    assert(roots.length == 1)
    val r = roots.head
    assert(r.getString(0) == "common_prefix" && r.getString(1) == "obj_")
    assert(r.getLong(2) == 39L, "rollup must count the keys it hides")
    // drill into the prefix: no further delimiter -> leaf objects
    val leaves = search.listObjects(
      ListRequest("lb", prefix = "obj_", delimiter = "_", maxKeys = 5)).collect()
    assert(leaves.length == 5 && leaves.forall(_.getString(0) == "object"))
  }

  test("delimiter pagination skips whole groups (S3 continuation semantics)") {
    // dedicated fixture: keys forming three delimiter groups + loose leaves
    val l2 = SparkTestSession.tempDir("listapi2-landing")
    val s2 = SparkTestSession.tempDir("listapi2-staging")
    import spark.implicits._
    val puts = Seq("a/x", "a/y", "a/z", "b/x", "b/y", "c", "d/z")
      .zipWithIndex.map { case (k, i) =>
        s"""{"opIndex":"${"%012d".format(i)}_000000","type":"put","bucket":"pb","key":"$k","value":{"content-length":1}}"""
      }.toDF("value")
    EventParser.parse(puts, "value", excludeBucket = "", groupInterval = 20L)
      .write.partitionBy("bucket", "opGroup").mode("append").parquet(l2)
    val s = new MetadataSearch(spark, l2, s2)

    // full listing: groups a/ (3), b/ (2), d/ (1) + leaf c
    val all = s.listObjects(ListRequest("pb", delimiter = "/"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(all == Seq(("common_prefix", "a/", 3L), ("common_prefix", "b/", 2L),
      ("object", "c", 1L), ("common_prefix", "d/", 1L)))

    // page 1 of 2 ends mid-keyspace INSIDE what raw-key filtering would
    // consider group b/'s key range
    val p1 = s.listObjects(ListRequest("pb", delimiter = "/", maxKeys = 2))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(p1 == Seq(("common_prefix", "a/", 3L), ("common_prefix", "b/", 2L)))

    // continuation from the last DERIVED name: the a/ and b/ groups must
    // not re-emit (raw-key filtering would re-list b/ — its keys b/x,b/y
    // sort after the cursor "b/" — with the same or a partial count)
    val p2 = s.listObjects(ListRequest("pb", delimiter = "/",
        startAfter = Some(p1.last._2), maxKeys = 2))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(p2 == Seq(("object", "c", 1L), ("common_prefix", "d/", 1L)),
      s"page 2 must start past the whole b/ group, got $p2")

    // cursor straddling a group (mid-group cursor "a/"): the whole group
    // is skipped, never re-emitted with a partial n_keys
    val afterA = s.listObjects(ListRequest("pb", delimiter = "/",
        startAfter = Some("a/"), maxKeys = 10))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(afterA == Seq(("common_prefix", "b/", 2L), ("object", "c", 1L),
      ("common_prefix", "d/", 1L)))
  }

  test("version listing shows full history newest-first with markers") {
    val vs = search.listVersions(ListRequest("lb", prefix = "obj_00000000"))
      .collect()
      .map(x => (x.getString(0), x.getInt(2), x.getInt(3), x.getInt(4)))
    val byKey = vs.groupBy(_._1)
    // re-put key: two versions, new one latest
    assert(byKey("obj_0000000003").toSeq.sortBy(_._2) ==
      Seq(("obj_0000000003", 1, 1, 0), ("obj_0000000003", 2, 0, 0)))
    // deleted key: delete marker IS the latest version, history kept
    assert(byKey("obj_0000000007").toSeq.sortBy(_._2) ==
      Seq(("obj_0000000007", 1, 1, 1), ("obj_0000000007", 2, 0, 0)))
    // untouched key: single latest version
    assert(byKey("obj_0000000001").toSeq ==
      Seq(("obj_0000000001", 1, 1, 0)))
    // maxKeys bounds the page
    assert(search.listVersions(ListRequest("lb", maxKeys = 7)).count() == 7)
  }
}
