package graft.search

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.graft.metrics.SearchMetricsSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.{DefaultFormats, JValue}
import org.json4s.jackson.JsonMethods

/** Long-lived warm query executor — the reference engine's actual
  * production operating mode (reference:
  * src/main/scala/com/scality/clueso/query/MetadataQueryExecutor.scala:17-60):
  * ONE SparkSession plus per-bucket cached snapshots stay resident, search
  * requests arrive repeatedly, and each result streams back to the calling
  * gateway as a single JSON-array line over stdout (the reference's
  * `executeAndPrint` contract, :57-60). The point of the mode is
  * amortization: the first query on a bucket pays the landing∪staging
  * snapshot merge + persist; every later query on that bucket (until TTL
  * or an explicit invalidation after compaction) plans against the
  * already-materialized snapshot — no re-scan, no re-merge.
  *
  * Request protocol (one JSON object per line on stdin):
  *  - `{"bucket":"b","where":"<sql>","startKey":"k","limit":100}` →
  *    one JSON-array line of result rows (bare array, the reference's
  *    gateway contract; `where`/`startKey`/`limit` optional)
  *  - `{"cmd":"invalidate","bucket":"b"}` → `{"ok":true}` — drop the
  *    bucket's cached snapshot (a compactor just rewrote its zones)
  *  - `{"cmd":"metrics"}` → one JSON object of the `graft.search` counters
  *  - `{"cmd":"shutdown"}` → `{"ok":true}` and the serve loop returns
  *  - a malformed or failing request → `{"error":"..."}`; the loop
  *    CONTINUES (one bad query must not kill the warm executor)
  *
  * Scale posture: identical to [[MetadataSearch]] (pruned per-bucket
  * scans, argmax-join merge, TakeOrderedAndProject pages) — the
  * server adds residency, not new plan shapes. The cached snapshot is one
  * bucket's live keys (bounded by the bucket, not the corpus); a
  * 1000-executor deployment holds hot buckets in cluster memory and the
  * TTL bounds staleness exactly like the reference's
  * `SessionCacheManager`.
  */
class SearchServer(spark: SparkSession, landingDir: String, stagingDir: String,
                   cacheTtlMillis: Long = 60000L,
                   metricsFlushMillis: Long = 0L) extends AutoCloseable {

  val searcher = new MetadataSearch(spark, landingDir, stagingDir)
  private val cache = new SessionCache(cacheTtlMillis)
  private val rebuilds = new AtomicLong(0L)
  // compaction epoch each cached snapshot was built at — revalidated per
  // request so a compactor in ANOTHER process invalidates this server's
  // cache just by finishing (see graft.ops.ZoneEpoch)
  private val epochs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cache-miss snapshot builds since start. A warm second query on a
    * bucket must NOT move this — the spec's no-re-scan assertion.
    */
  def snapshotRebuilds: Long = rebuilds.get()

  // The reference keeps a background thread re-registering RDD gauges
  // with the metrics system while the executor is resident
  // (MetadataQueryExecutor.scala:25-39). Graft's counters register once,
  // but the periodic touch keeps the source alive across metrics-system
  // restarts and gives sinks a heartbeat to scrape against.
  private val metricsCancel = new AtomicBoolean(false)
  private val metricsThread: Option[Thread] =
    if (metricsFlushMillis <= 0) None
    else {
      val t = new Thread(() => {
        while (!metricsCancel.get()) {
          Thread.sleep(metricsFlushMillis)
          SearchMetricsSource.getOrRegister()
        }
      }, "graft-search-metrics")
      t.setDaemon(true)
      t.start()
      Some(t)
    }

  private def snapshot(bucket: String): DataFrame = {
    // one metadata-sized read per request: a compaction that completed
    // since this bucket's snapshot was cached changes the epoch, and the
    // stale snapshot is dropped HERE — compactor completion drives the
    // invalidation, no explicit invalidate round-trip required
    val epoch = graft.ops.ZoneEpoch.read(spark, stagingDir, bucket)
    if (epochs.getOrDefault(bucket, "") != epoch) cache.invalidate(bucket)
    cache.get(bucket) {
      rebuilds.incrementAndGet()
      epochs.put(bucket, epoch)
      searcher.bucketSnapshot(bucket)
    }
  }

  /** Plan one search against the warm snapshot (reference `execute`,
    * MetadataQueryExecutor.scala:62-95, with cache delegation :42-50).
    */
  def execute(q: SearchQuery): DataFrame =
    searcher.searchSnapshot(snapshot(q.bucket), q)

  /** Materialize one search as the reference's stdout contract: a single
    * JSON-array line (`executeAndPrint`, MetadataQueryExecutor.scala:57-60).
    * Latency/rows/failures land in the `graft.search` metrics source.
    */
  def executeJson(q: SearchQuery): String =
    "[" + SearchMetricsSource.recordSearch(execute(q).toJSON.collect())
      .mkString(",") + "]"

  /** Drop a bucket's cached snapshot (compaction rewrote its zones). */
  def invalidate(bucket: String): Unit = cache.invalidate(bucket)

  private def escJson(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ")

  /** Answer ONE request (the line-protocol JSON object) — the single
    * handler both faces share: [[serve]] feeds it stdin lines, and
    * [[HttpSearchServer]] feeds it request bodies / query-string
    * translations, so the two protocols cannot drift. Returns the
    * response JSON plus whether the request asked the server to stop.
    * Errors are answered in-band — a bad query must not kill the warm
    * executor on either face.
    */
  def handle(request: String): (String, Boolean) = {
    implicit val fmts: DefaultFormats.type = DefaultFormats
    try {
      val j: JValue = JsonMethods.parse(request)
      (j \ "cmd").extractOpt[String] match {
        case Some("shutdown") =>
          ("""{"ok":true}""", true)
        case Some("invalidate") =>
          invalidate((j \ "bucket").extract[String])
          ("""{"ok":true}""", false)
        case Some("metrics") =>
          val m = SearchMetricsSource.getOrRegister()
          (s"""{"searchCount":${m.searchCount.getCount},""" +
            s""""searchFailures":${m.searchFailures.getCount},""" +
            s""""rowsReturned":${m.rowsReturned.getCount},""" +
            s""""snapshotRebuilds":${snapshotRebuilds}}""", false)
        case Some(other) =>
          // client-supplied string: escape it or a quote/control char
          // in `cmd` breaks the one-JSON-object-per-line protocol
          (s"""{"error":"unknown cmd: ${escJson(other)}"}""", false)
        case None =>
          (executeJson(SearchQuery(
            bucket = (j \ "bucket").extract[String],
            where = (j \ "where").extractOpt[String].getOrElse(""),
            startKey = (j \ "startKey").extractOpt[String],
            limit = (j \ "limit").extractOpt[Int].getOrElse(1000))), false)
      }
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        (s"""{"error":"${escJson(msg)}"}""", false)
    }
  }

  /** Serve requests line-by-line until EOF or a shutdown command; returns
    * the number of requests answered. One response line per request line,
    * errors answered in-band — the loop survives bad queries.
    */
  def serve(in: BufferedReader, out: PrintWriter): Long = {
    var served = 0L
    var running = true
    while (running) {
      val line = in.readLine()
      if (line == null) running = false
      else if (line.trim.nonEmpty) {
        served += 1
        val (response, stop) = handle(line)
        if (stop) running = false
        out.println(response)
        out.flush()
      }
    }
    served
  }

  override def close(): Unit = {
    metricsCancel.set(true)
    metricsThread.foreach(_.interrupt())
    cache.clear()
  }
}

/** Minimal HTTP/REST face over a warm [[SearchServer]] — the wire shape a
  * reference client actually speaks (reference: `bin/search.py` issues
  * `GET /<bucket>?search=<urlencoded where>` against its gateway and
  * reads the JSON-array response; the Livy image fronts the resident
  * executor the same way). Built on the JDK's `com.sun.net.httpserver`
  * (zero dependencies, same classpath everywhere Spark runs).
  *
  * Routes (every search answer is the same bare JSON array the line
  * protocol emits — both faces share [[SearchServer.handle]]):
  *  - `GET /<bucket>?search=<where>[&limit=N][&start_key=K]` — the
  *    reference client's query shape, translated to the line protocol
  *  - `POST /search` with a line-protocol JSON object body
  *  - `GET /metrics` — the `graft.search` counters
  *  - `POST /invalidate?bucket=<b>` — drop a bucket's snapshot
  *
  * Requests serialize onto one handler thread — the backend is one warm
  * session and the snapshot cache is what makes serialized answers fast,
  * exactly like the socat gateway's flock (docker/images/server).
  */
class HttpSearchServer(server: SearchServer, port: Int = 0)
    extends AutoCloseable {
  import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttp}

  private val http = JdkHttp.create(new java.net.InetSocketAddress(port), 0)
  private val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
  @volatile private var stopRequested = false

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  http.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val request = (ex.getRequestMethod, path) match {
        case ("POST", "search") =>
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        case ("GET", "metrics") => """{"cmd":"metrics"}"""
        case ("POST", "invalidate") =>
          val b = queryParams(ex).getOrElse("bucket", "")
          s"""{"cmd":"invalidate","bucket":${jstr(b)}}"""
        case ("GET", bucket) if bucket.nonEmpty && !bucket.contains("/") =>
          // the reference client's shape: GET /<bucket>?search=<where>
          val p = queryParams(ex)
          val limit = p.get("limit").flatMap(_.toIntOption).getOrElse(1000)
          val sk = p.get("start_key").map(k => s""","startKey":${jstr(k)}""")
            .getOrElse("")
          s"""{"bucket":${jstr(bucket)},"where":${jstr(
            p.getOrElse("search", ""))},"limit":$limit$sk}"""
        case _ => ""
      }
      if (request.isEmpty)
        respond(ex, 404, """{"error":"unknown route"}""")
      else {
        val (body, stop) = server.handle(request)
        if (stop) stopRequested = true
        respond(ex, if (body.startsWith("""{"error""")) 400 else 200, body)
      }
    } catch {
      case e: Throwable =>
        try respond(ex, 500, s"""{"error":${jstr(
          Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
        catch { case _: Throwable => () }
    }
  })
  http.setExecutor(pool)
  http.start()

  /** The bound port (for `port = 0` ephemeral binds in specs). */
  def boundPort: Int = http.getAddress.getPort

  /** Block until a `{"cmd":"shutdown"}` request arrives. */
  def awaitShutdown(pollMillis: Long = 200L): Unit =
    while (!stopRequested) Thread.sleep(pollMillis)

  override def close(): Unit = {
    http.stop(0)
    pool.shutdownNow()
    ()
  }
}

/** `runMain graft.search.SearchServer [--http <port>] <landingDir>
  * <stagingDir> [ttlMs]` — build one session and serve until shutdown:
  * stdin-JSONL by default (the gateway pipes queries in), or the REST
  * face on `--http` (the reference's Livy-gateway port is 8998). Session
  * + cache warmth amortizes across all requests either way.
  */
object SearchServer {
  def main(args: Array[String]): Unit = {
    val httpPort = args.sliding(2).collectFirst {
      case Array("--http", p) => p.toInt }
    val rest = {
      val i = args.indexOf("--http")
      if (i < 0) args else args.patch(i, Nil, 2)
    }
    require(rest.length >= 2,
      "usage: SearchServer [--http <port>] <landingDir> <stagingDir> [cacheTtlMillis]")
    val ttl = if (rest.length > 2) rest(2).toLong else 60000L
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-search-server")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new SearchServer(spark, rest(0), rest(1), ttl,
      metricsFlushMillis = 10000L)
    try httpPort match {
      case Some(p) =>
        val h = new HttpSearchServer(server, p)
        System.err.println(s"[graft] http search server on port ${h.boundPort}")
        try h.awaitShutdown() finally h.close()
      case None =>
        server.serve(
          new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8)),
          new PrintWriter(System.out))
        ()
    } finally {
      server.close()
      spark.stop()
    }
  }
}
