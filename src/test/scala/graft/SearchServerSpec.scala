package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

import graft.search.{SearchQuery, SearchServer}
import graft.tools.Populator
import org.json4s.DefaultFormats
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The warm long-lived executor mode (reference:
  * MetadataQueryExecutor.scala:17-60): N mixed-bucket queries through ONE
  * resident session, snapshot built once per bucket, errors answered
  * in-band, invalidation forces a rebuild.
  */
class SearchServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit val fmts: DefaultFormats.type = DefaultFormats

  private lazy val (landing, staging) = {
    val l = SparkTestSession.tempDir("srv-landing")
    val s = SparkTestSession.tempDir("srv-staging")
    Populator.populateLanding(spark, l, "sb1", 60, groupInterval = 40L)
    Populator.populateLanding(spark, l, "sb2", 40, groupInterval = 40L)
    (l, s)
  }

  private def serve(server: SearchServer, lines: Seq[String]): Seq[String] = {
    val out = new StringWriter()
    server.serve(new BufferedReader(new StringReader(lines.mkString("\n"))),
      new PrintWriter(out))
    out.toString.linesIterator.toSeq.filter(_.nonEmpty)
  }

  private def keysOf(jsonArrayLine: String): Seq[String] =
    JsonMethods.parse(jsonArrayLine).children.map(c => (c \ "key").extract[String])

  test("one warm session serves 12 mixed-bucket queries with one snapshot build per bucket") {
    val server = new SearchServer(spark, landing, staging, cacheTtlMillis = 600000L)
    try {
      val pizza = """ userMd.`x-amz-meta-food` = 'pizza' """
      val requests = Seq(
        s"""{"bucket":"sb1"}""",
        s"""{"bucket":"sb2"}""",
        s"""{"bucket":"sb1","limit":5}""",
        s"""{"bucket":"sb2","limit":7}""",
        s"""{"bucket":"sb1","where":"$pizza"}""",
        s"""{"bucket":"sb2","where":"$pizza"}""",
        s"""{"bucket":"sb1","startKey":"obj_0000000009"}""",
        s"""{"bucket":"sb2","startKey":"obj_0000000009","limit":3}""",
        s"""{"bucket":"sb1","where":"`content-length` < 1024"}""",
        s"""{"bucket":"sb2","where":"`content-length` < 1024","limit":4}""",
        s"""{"bucket":"sb1","where":"$pizza","startKey":"obj_0000000004","limit":6}""",
        s"""{"bucket":"sb2","where":"$pizza","startKey":"obj_0000000004","limit":6}""")
      val responses = serve(server, requests)
      assert(responses.size == 12, s"one response line per request: $responses")
      assert(responses.forall(_.startsWith("[")),
        "every search response is the reference's bare JSON-array line")

      // the warm executor built exactly one snapshot per bucket — queries
      // 3..12 planned against the cached merge, no re-scan
      assert(server.snapshotRebuilds == 2,
        s"expected 2 snapshot builds (one per bucket), got ${server.snapshotRebuilds}")

      // results are correct: match the direct (uncached) search path
      def direct(q: SearchQuery): Seq[String] =
        server.searcher.search(q).select("key").as[String].collect().toSeq
      assert(keysOf(responses(0)) == direct(SearchQuery("sb1")))
      assert(keysOf(responses(2)) == direct(SearchQuery("sb1", limit = 5)))
      assert(keysOf(responses(3)) == direct(SearchQuery("sb2", limit = 7)))
      assert(keysOf(responses(7)) ==
        direct(SearchQuery("sb2", startKey = Some("obj_0000000009"), limit = 3)))
      val pizzaWhere = " userMd.`x-amz-meta-food` = 'pizza' "
      assert(keysOf(responses(4)) == direct(SearchQuery("sb1", pizzaWhere)))
      assert(keysOf(responses(10)) == direct(SearchQuery("sb1", pizzaWhere,
        Some("obj_0000000004"), 6)))
      assert(keysOf(responses(4)).nonEmpty && keysOf(responses(2)).size == 5)

      // pages are key-ordered (the ORDER BY key LIMIT n contract)
      responses.take(12).map(keysOf).foreach(ks => assert(ks == ks.sorted))
    } finally server.close()
  }

  test("errors answer in-band, invalidation rebuilds, shutdown stops the loop") {
    val server = new SearchServer(spark, landing, staging, cacheTtlMillis = 600000L)
    try {
      val responses = serve(server, Seq(
        """{"bucket":"sb1","limit":2}""",
        """not json at all""",
        """{"bucket":"sb1","where":"this is not sql"}""",
        """{"cmd":"invalidate","bucket":"sb1"}""",
        """{"bucket":"sb1","limit":2}""",
        """{"cmd":"metrics"}""",
        """{"cmd":"shutdown"}""",
        """{"bucket":"sb1"}"""))
      // shutdown stops the loop: the trailing query is never answered
      assert(responses.size == 7, s"expected 7 responses, got: $responses")
      assert(responses(1).startsWith("""{"error":"""), "bad JSON answers in-band")
      assert(responses(2).startsWith("""{"error":"""), "bad SQL answers in-band")
      assert(responses(3) == """{"ok":true}""")
      // query(1) built the snapshot; invalidate forced query(5) to rebuild
      assert(server.snapshotRebuilds == 2,
        s"invalidate must force a rebuild, got ${server.snapshotRebuilds}")
      assert(keysOf(responses(0)) == keysOf(responses(4)),
        "rebuilt snapshot returns the same page")
      val metrics = JsonMethods.parse(responses(5))
      assert((metrics \ "searchCount").extract[Long] > 0)
      assert((metrics \ "snapshotRebuilds").extract[Long] == 2)
      assert(responses(6) == """{"ok":true}""")
    } finally server.close()
  }

  test("compactor completion invalidates the warm snapshot via the zone epoch") {
    // fresh zones — compaction purges landing, so the shared fixture
    // must not be touched
    val l = SparkTestSession.tempDir("srv-epoch-landing")
    val s = SparkTestSession.tempDir("srv-epoch-staging")
    Populator.populateLanding(spark, l, "eb1", 60, groupInterval = 20L)
    val server = new SearchServer(spark, l, s, cacheTtlMillis = 600000L)
    try {
      val warm = serve(server, Seq(
        """{"bucket":"eb1","limit":50}""",
        """{"bucket":"eb1","limit":50}"""))
      val before = keysOf(warm(0))
      assert(before.nonEmpty && keysOf(warm(1)) == before)
      assert(server.snapshotRebuilds == 1, "second query must be warm")

      // a compactor in what is operationally ANOTHER process rewrites the
      // zones; no invalidate command is ever sent to the server
      new graft.compact.Compactor(spark, l, s).compactBucket("eb1", numPartitions = 2)

      val after = serve(server, Seq(
        """{"bucket":"eb1","limit":50}""",
        """{"bucket":"eb1","limit":50}"""))
      assert(server.snapshotRebuilds == 2,
        s"compaction must force exactly one rebuild, got ${server.snapshotRebuilds}")
      // compaction preserves latest-state semantics: same page before/after
      assert(keysOf(after(0)) == before && keysOf(after(1)) == before)
    } finally server.close()
  }

  test("HTTP face: reference client GET, POST /search, metrics, errors in-band") {
    val server = new SearchServer(spark, landing, staging, cacheTtlMillis = 600000L)
    val http = new graft.search.HttpSearchServer(server, port = 0)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      def fetch(method: String, pathAndQuery: String, body: String = "")
          : (Int, String) = {
        val conn = java.net.URI.create(base + pathAndQuery).toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
        if (body.nonEmpty) {
          conn.setDoOutput(true)
          conn.getOutputStream.write(body.getBytes("UTF-8"))
        }
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        (code, new String(is.readAllBytes(), "UTF-8"))
      }
      // the reference client's exact shape (bin/search.py):
      // GET /<bucket>?search=<urlencoded where>[&limit] -> JSON array
      val where = java.net.URLEncoder.encode(
        " userMd.`x-amz-meta-food` = 'pizza' ", "UTF-8")
      val (c1, b1) = fetch("GET", s"/sb1?search=$where&limit=5")
      assert(c1 == 200 && b1.startsWith("[") && b1.endsWith("]"))
      val httpKeys = keysOf(b1)
      // and it answers exactly what the line protocol answers — shared handler
      val lineKeys = keysOf(serve(server, Seq(
        s"""{"bucket":"sb1","where":" userMd.`x-amz-meta-food` = 'pizza' ","limit":5}""")).head)
      assert(httpKeys == lineKeys && httpKeys.nonEmpty)
      // POST /search takes the line-protocol object verbatim
      val (c2, b2) = fetch("POST", "/search",
        """{"bucket":"sb2","limit":3}""")
      assert(c2 == 200 && keysOf(b2).size == 3)
      // start_key paginates like the line protocol's startKey
      val (c3, b3) = fetch("GET",
        s"/sb1?search=&limit=4&start_key=obj_0000000009")
      assert(c3 == 200 && keysOf(b3).forall(_ > "obj_0000000009"))
      // metrics and invalidate round-trip
      val (cm, bm) = fetch("GET", "/metrics")
      assert(cm == 200 && bm.contains("\"searchCount\""))
      val (ci, bi) = fetch("POST", "/invalidate?bucket=sb1")
      assert(ci == 200 && bi == """{"ok":true}""")
      // a bad query answers 400 with the in-band error, server survives
      val (ce, be) = fetch("POST", "/search", """{"bucket":"sb1","where":"NOT SQL ("}""")
      assert(ce == 400 && be.contains("\"error\""))
      val (cu, _) = fetch("GET", "/no/such/route")
      assert(cu == 404)
      val (cOk, _) = fetch("GET", s"/sb1?search=&limit=1")
      assert(cOk == 200, "the warm executor survives bad requests")
    } finally {
      http.close()
      server.close()
    }
  }

  test("warm queries launch no scan of the zone files (persisted snapshot reused)") {
    val server = new SearchServer(spark, landing, staging, cacheTtlMillis = 600000L)
    try {
      serve(server, Seq("""{"bucket":"sb1","limit":1}"""))
      val persistedAfterFirst = spark.sparkContext.getPersistentRDDs.keySet
      assert(persistedAfterFirst.nonEmpty, "first query materializes the snapshot")
      serve(server, Seq(
        """{"bucket":"sb1","limit":9}""",
        """{"bucket":"sb1","where":"`content-length` < 512"}"""))
      assert(spark.sparkContext.getPersistentRDDs.keySet == persistedAfterFirst,
        "warm queries add no new persisted snapshot")
      assert(server.snapshotRebuilds == 1)
    } finally server.close()
  }
}
