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
