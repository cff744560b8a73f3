package graft

import graft.compact.Compactor
import graft.ingest.IngestPipeline
import graft.search.{MetadataSearch, SearchQuery}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference engine's own query test scenarios
  * (reference: src/test/scala/com/scality/clueso/CluesoMergingAndQueryingSpec.scala)
  * on graft, using the reference's exact wire format: the event `value`
  * arrives as a double-encoded JSON *string* and user metadata is queried
  * with `userMd`-dot-backtick syntax and LIKE patterns.
  */
class ReferenceParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference-style envelope: value is an escaped JSON string. */
  private def refEnvelope(opIndex: String, typ: String, bucket: String, key: String,
                          userMd: Map[String, String]): String = {
    val md = userMd.map { case (k, v) => s"""\\"$k\\":\\"$v\\"""" }.mkString(",")
    s"""{"opIndex":"$opIndex","type":"$typ","bucket":"$bucket","key":"$key","value":"{ \\"md-model-version\\":3,\\"owner-display-name\\":\\"CustomAccount\\",\\"owner-id\\":\\"12349qwer\\",\\"content-length\\":13,\\"last-modified\\":\\"2017-08-08T03:57:02.249Z\\",\\"content-md5\\":\\"4b02d12ad7f063d67aec9dc2116a57a2\\",\\"x-amz-version-id\\":\\"null\\",\\"x-amz-storage-class\\":\\"STANDARD\\",\\"acl\\":{\\"Canned\\":\\"private\\",\\"FULL_CONTROL\\":[],\\"WRITE_ACP\\":[],\\"READ\\":[],\\"READ_ACP\\":[]},\\"key\\":\\"\\",\\"location\\":[{\\"key\\":\\"12cb\\",\\"size\\":13,\\"start\\":0,\\"dataStoreName\\":\\"file\\",\\"dataStoreETag\\":\\"1:4b\\"}],\\"isDeleteMarker\\":false,\\"tags\\":{},\\"replicationInfo\\":{\\"status\\":\\"\\",\\"content\\":[],\\"destination\\":\\"\\",\\"storageClass\\":\\"\\",\\"role\\":\\"\\"},\\"dataStoreName\\":\\"us-east-1\\",$md}"}"""
  }

  private def fixture(): (MetadataSearch, Compactor, String, String) = {
    val landing = SparkTestSession.tempDir("rp-landing")
    val staging = SparkTestSession.tempDir("rp-staging")
    (new MetadataSearch(spark, landing, staging),
      new Compactor(spark, landing, staging), landing, staging)
  }

  test("scenario 1: only the most recent PUT per key; userMd dot-access WHERE") {
    val (search, _, landing, _) = fixture()
    IngestPipeline.batchIngest(spark, Seq(
      refEnvelope("000000000001_000000", "put", "b1", "bigger",
        Map("x-amz-meta-color" -> "blue", "x-amz-meta-mymeta1" -> "thisisfun")),
      refEnvelope("000000000002_000000", "put", "b1", "other",
        Map("x-amz-meta-color" -> "blue"))).toDF("value"), landing)

    val r = search.search(SearchQuery("b1",
      """ userMd.`x-amz-meta-mymeta1` = 'thisisfun' """)).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("key") == "bigger")
  }

  test("scenario 2+3: delete tombstones hide keys across zones; compaction preserves results") {
    val (search, compactor, landing, _) = fixture()
    // staging: older puts for a,b ; landing: delete a (newer)
    IngestPipeline.batchIngest(spark, Seq(
      refEnvelope("000000000001_000000", "put", "b2", "a", Map()),
      refEnvelope("000000000002_000000", "put", "b2", "b", Map()),
      refEnvelope("000000000003_000000", "delete", "b2", "a", Map()),
      refEnvelope("000000020001_000000", "put", "b2", "zlast", Map())).toDF("value"),
      landing, groupInterval = 10000L)

    val before = search.search(SearchQuery("b2")).select("key").as[String].collect().toSeq
    assert(before == Seq("b", "zlast"))

    // compact closed groups into staging; results must not change
    compactor.compactBucket("b2", numPartitions = 1)
    val after = search.search(SearchQuery("b2")).select("key").as[String].collect().toSeq
    assert(after == before)
    // compacted landing group purged
    assert(!new java.io.File(s"$landing/bucket=b2/opGroup=10000").exists())
  }

  test("scenario 4+5: LIKE queries and keyset pagination paginate exactly") {
    val (search, _, landing, _) = fixture()
    IngestPipeline.batchIngest(spark, Seq(
      refEnvelope("000000000001_000000", "put", "b3", "puppie-goldenret",
        Map("x-amz-meta-dog" -> "goldenretriever")),
      refEnvelope("000000000002_000000", "put", "b3", "puppie-labrador",
        Map("x-amz-meta-dog" -> "labretriever")),
      refEnvelope("000000000003_000000", "put", "b3", "kitten",
        Map("x-amz-meta-dog" -> "nope"))).toDF("value"), landing)

    val where = """ userMd.`x-amz-meta-dog` LIKE "%retriever" """
    val page1 = search.search(SearchQuery("b3", where, None, 1)).collect()
    assert(page1.length == 1 && page1.head.getAs[String]("key") == "puppie-goldenret")
    val page2 = search.search(SearchQuery("b3", where, Some("puppie-goldenret"), 1)).collect()
    assert(page2.length == 1 && page2.head.getAs[String]("key") == "puppie-labrador")
    val page3 = search.search(SearchQuery("b3", where, Some("puppie-labrador"), 1)).collect()
    assert(page3.isEmpty)
  }

  test("scenario 6: version keys (NUL-separated) are hidden from master listings") {
    val (search, _, landing, _) = fixture()
    IngestPipeline.batchIngest(spark, Seq(
      refEnvelope("000000000001_000000", "put", "b4", "master-key", Map()),
      refEnvelope("000000000002_000000", "put", "b4", "master-key\\u0000v123", Map()))
      .toDF("value"), landing)
    val keys = search.search(SearchQuery("b4")).select("key").as[String].collect().toSeq
    assert(keys == Seq("master-key"))
  }
}
