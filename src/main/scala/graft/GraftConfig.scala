package graft

/** Deployment configuration for the search-engine half of the library
  * (reference: src/main/scala/com/scality/clueso/CluesoConfig.scala — the
  * subset that governs zone layout and runtime behavior; connection
  * settings live with the session, not here).
  *
  * @param landingDir      streaming-append zone, partitioned `(bucket, opGroup)`
  * @param stagingDir      compacted zone, same layout
  * @param checkpointDir   streaming checkpoint root
  * @param groupInterval   op-index records per compaction group
  * @param cacheTtlMillis  bucket-snapshot cache lifetime
  * @param excludeBucket   deployment's own metadata bucket (never indexed)
  * @param purgeToleranceMs grace period between compaction's staging
  *                        append and the landing purge (in-flight search
  *                        tolerance; see [[graft.compact.Compactor]])
  * @param kafkaBootstrap  Kafka bootstrap servers; empty → file journal
  * @param kafkaTopic      Kafka topic carrying the metadata journal
  * @param maxSearchScanBytes admission budget for one search's scan
  *                        footprint; 0 disables the [[graft.search.PlanGuard]]
  *                        gate (cartesian/nested-loop joins are still
  *                        rejected whenever the gate is on)
  * @param scratchBytes    per-host shuffle-scratch budget for disk-bounded
  *                        builds (the near-dup pair build shards its pair
  *                        space so one pass's shuffle fits this — see
  *                        [[graft.ops.Tuning.pairShardPasses]]); 0 (the
  *                        default) means scratch is a cluster-aggregate
  *                        resource and builds run single-pass
  * @param refineRounds    NN-descent rounds for the kNN-graph family
  *                        ([[graft.analytics.Similarity]], published as
  *                        `spark.graft.refine.rounds`). Deployment
  *                        default 2: the measured ×1000 recall curve
  *                        (`CLUSTERED_RECALL_X1000.json`, 2M vectors /
  *                        20k planted clusters) shows bounded-LSH recall
  *                        degrading 68% → 42% as cluster density grows
  *                        10×, while refine round 2 recovers 82.7% —
  *                        ABOVE the 79.3% unbounded-LSH ceiling — for
  *                        one more linear candidate pass (127 s at
  *                        ×1000). The library-level default stays 1 (the
  *                        oracle-gated shape); this is the shipped
  *                        deployment recommendation.
  * @param s3Endpoint      S3-compatible object-store endpoint for `s3a://`
  *                        zone paths (the reference's entire deployment
  *                        premise — SparkUtils.scala:26-70 wires endpoint/
  *                        credentials/path-style/SSL from CluesoConfig
  *                        into every session and filesystem handle);
  *                        empty → the Hadoop defaults (IAM/instance
  *                        profile on AWS proper) are left alone
  * @param s3AccessKey     access key; empty → env (`AWS_ACCESS_KEY_ID`) or
  *                        provider-chain credentials
  * @param s3SecretKey     secret key; empty → env (`AWS_SECRET_ACCESS_KEY`)
  *                        or provider-chain credentials
  * @param s3PathStyleAccess path-style addressing (required by most
  *                        non-AWS S3 implementations, incl. the
  *                        reference's target store)
  * @param s3SslEnabled    TLS to the endpoint
  */
case class GraftConfig(landingDir: String, stagingDir: String,
                       checkpointDir: String,
                       groupInterval: Long = 10000L,
                       cacheTtlMillis: Long = 60000L,
                       excludeBucket: String = "",
                       purgeToleranceMs: Long = 0L,
                       kafkaBootstrap: String = "",
                       kafkaTopic: String = "",
                       maxSearchScanBytes: Long = 0L,
                       scratchBytes: Long = 0L,
                       refineRounds: Int = 2,
                       derivedDir: String = "",
                       s3Endpoint: String = "",
                       s3AccessKey: String = "",
                       s3SecretKey: String = "",
                       s3PathStyleAccess: Boolean = false,
                       s3SslEnabled: Boolean = true) {
  require(groupInterval > 0, "groupInterval must be positive")
  require(purgeToleranceMs >= 0, "purgeToleranceMs must be non-negative")
  require(maxSearchScanBytes >= 0, "maxSearchScanBytes must be non-negative")
  require(scratchBytes >= 0, "scratchBytes must be non-negative")
  require(refineRounds >= 1, "refineRounds must be >= 1")

  /** Publish the session-scoped knobs onto `spark.conf` so engine code
    * that takes only a session (the analytics families) sees the
    * deployment's resource shape — e.g. [[graft.analytics.Dedup]] reads
    * `spark.graft.scratch.bytes` to size its pair-shard pass count — and
    * wire the object-store connection into the session's Hadoop conf so
    * `s3a://` zone paths resolve without out-of-band `--conf` flags
    * (reference: SparkUtils.confSparkSession, SparkUtils.scala:58-70).
    *
    * An explicit `scratchBytes = 0` in a conf FILE means "unset", not
    * "force single-pass" — the key is left alone so local-master
    * sessions keep the free-disk fallback; a deployment that wants the
    * cluster single-pass shape on a local master sets the session conf
    * directly. S3 settings are applied per-field only when non-empty:
    * a deployment on real AWS with instance-profile credentials sets
    * only what it overrides and the Hadoop provider chain supplies the
    * rest. */
  def applySessionConfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (scratchBytes > 0L)
      spark.conf.set(GraftConfig.ScratchBytesConf, scratchBytes.toString)
    // deployment default 2 (measured recall, see the field doc) — always
    // published, so a config-driven session gets the recommended shape
    // without a separate --conf flag
    spark.conf.set(GraftConfig.RefineRoundsConf, refineRounds.toString)
    // durable DerivedZone store: only deployments opt in — unset, each
    // process keeps its private temp root (removed on exit), so ad-hoc
    // runs always recompute derived artifacts from the source tables
    if (derivedDir.nonEmpty)
      spark.conf.set(GraftConfig.DerivedDirConf, derivedDir)
    // fs.s3a.* must land on the CONTEXT Hadoop configuration: session
    // `spark.hadoop.*` confs are only folded in at session build, and
    // every FileSystem.get in the engine (zones, compactor, journal)
    // reads sparkContext.hadoopConfiguration — setting both keeps the
    // session conf introspectable and the filesystem handles correct.
    def set(k: String, v: String): Unit = {
      spark.conf.set(s"spark.hadoop.$k", v)
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    if (s3Endpoint.nonEmpty) {
      set("fs.s3a.endpoint", s3Endpoint)
      set("fs.s3a.path.style.access", s3PathStyleAccess.toString)
      set("fs.s3a.connection.ssl.enabled", s3SslEnabled.toString)
    }
    if (s3AccessKey.nonEmpty) set("fs.s3a.access.key", s3AccessKey)
    if (s3SecretKey.nonEmpty) set("fs.s3a.secret.key", s3SecretKey)
  }
}

object GraftConfig {

  /** Session-conf key carrying [[GraftConfig.scratchBytes]] (also
    * settable directly — `spark.conf.set` or `--conf` — for processes
    * that never build a GraftConfig, e.g. the scaling benches). */
  val ScratchBytesConf = "spark.graft.scratch.bytes"

  /** Session-conf key carrying [[GraftConfig.refineRounds]] — read by
    * [[graft.analytics.Similarity]]'s NN-descent refine. */
  val RefineRoundsConf = "spark.graft.refine.rounds"

  /** Session-conf key carrying [[GraftConfig.derivedDir]] — read by
    * [[graft.ops.DerivedZone.root]]. */
  val DerivedDirConf = "spark.graft.derived.dir"

  /** The session's per-host scratch budget: the session conf if set,
    * else the `SPARK_GRAFT_SCRATCH_BYTES` env (so bench/CLI runs can
    * declare the host's disk without code), else — ONLY under a
    * `local[*]` master — half of the shuffle directory's free space.
    *
    * The local-master fallback exists because on a single host the
    * shuffle scratch genuinely IS bounded by one disk: an unconfigured
    * run of a disk-bounded build (the near-dup pair shuffle is ~45-50 GB
    * at ×1000) on a machine with less free space than that would
    * otherwise run single-pass and die on ENOSPC — the exact failure
    * mode the pair-space sharding was built to prevent. Half of free
    * space leaves headroom for everything the budget does NOT model
    * (cached posting lists on disk, checkpoint files, other queries'
    * shuffles in a full-suite run). A real cluster master keeps the
    * 0 = cluster-aggregate default: there, per-host scratch is sized
    * with the fleet and single-pass is the right shape. */
  def scratchBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(ScratchBytesConf)
      .orElse(sys.env.get("SPARK_GRAFT_SCRATCH_BYTES"))
      .map(_.trim.toLong).getOrElse(localScratchFallback(spark))

  /** Half the usable space of the first shuffle-scratch dir when the
    * master is local, else 0. Exposed for `ConfigToolsSpec`. */
  private[graft] def localScratchFallback(
      spark: org.apache.spark.sql.SparkSession): Long =
    if (!spark.sparkContext.master.startsWith("local")) 0L
    else {
      val dir = spark.conf.getOption("spark.local.dir")
        .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
        .map(_.split(",")(0))
        .getOrElse(System.getProperty("java.io.tmpdir"))
      math.max(0L, new java.io.File(dir).getUsableSpace / 2)
    }

  /** Load from a HOCON-style config file — the deployment surface the
    * reference exposes (CluesoConfig takes a parsed config file; every
    * CLI tool takes the file's path as its first argument, e.g.
    * `/root/reference/src/main/scala/com/scality/clueso/tools/
    * MetadataTableCompactorTool.scala:14-18`). Parameterizing a
    * deployment means editing a conf file, not writing Scala.
    *
    * The runtime classpath is Spark's, which ships no HOCON library, so
    * this is a self-contained parser for the subset deployment configs
    * use:
    *  - `key = value` and `key: value` bindings;
    *  - nested object blocks `a { b = c }` flattening to dotted keys
    *    (`a.b`), plus literal dotted keys;
    *  - `#` and `//` comments (full-line or trailing, quote-aware);
    *  - quoted or bare scalar values;
    *  - duration suffixes (`ms`/`s`/`m`/`h`) on the `*.ms` keys, in the
    *    spirit of the reference's `getDuration` fields.
    */
  def fromFile(path: String): GraftConfig = {
    val props = new java.util.Properties()
    val stack = scala.collection.mutable.Stack.empty[String]
    def stripComment(line: String): String = {
      var inQuote = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '"') inQuote = !inQuote
        else if (!inQuote && (c == '#' ||
          (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
          return line.substring(0, i)
        i += 1
      }
      line
    }
    def unquote(v: String): String =
      if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
        v.substring(1, v.length - 1)
      else v
    val DurationMs = """(\d+)\s*(ms|s|m|h)""".r
    def normalize(key: String, v: String): String =
      if (key.endsWith(".ms")) v match {
        case DurationMs(n, "ms") => n
        case DurationMs(n, "s") => (n.toLong * 1000L).toString
        case DurationMs(n, "m") => (n.toLong * 60000L).toString
        case DurationMs(n, "h") => (n.toLong * 3600000L).toString
        case other => other
      } else v
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().foreach { raw =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line == "}") {
          require(stack.nonEmpty, s"$path: unbalanced '}'")
          stack.pop(); ()
        } else if (line.endsWith("{")) {
          stack.push(line.dropRight(1).trim.stripSuffix(":").stripSuffix("=").trim)
        } else {
          val sep = line.indexWhere(c => c == '=' || c == ':')
          require(sep > 0, s"$path: unparseable config line: $raw")
          val key = (stack.reverse :+ line.substring(0, sep).trim).mkString(".")
          val value = unquote(line.substring(sep + 1).trim)
          // an UNQUOTED s3a://... value gets comment-truncated at `//`
          // (HOCON's own rule) — a landing dir of "s3a:" would surface
          // as a confusing failure far from the config mistake, so make
          // the truncation loud here instead
          require(!(value.endsWith(":") && raw.contains("://")),
            s"$path: value for $key was comment-truncated at '//' — quote URIs: $key = \"...\"")
          props.setProperty(key, normalize(key, value))
        }
      }
    } finally src.close()
    require(stack.isEmpty, s"$path: unclosed '{' block (${stack.mkString(".")})")
    fromProperties(props)
  }

  /** Load from Java properties (`graft.landing.dir`, `graft.staging.dir`,
    * `graft.checkpoint.dir`, `graft.group.interval`, `graft.cache.ttl.ms`,
    * `graft.exclude.bucket`), e.g. a `--properties-file` passed to
    * spark-submit.
    */
  def fromProperties(props: java.util.Properties): GraftConfig = {
    def get(k: String): String = {
      val v = props.getProperty(k)
      require(v != null, s"missing required property $k")
      v
    }
    GraftConfig(
      landingDir = get("graft.landing.dir"),
      stagingDir = get("graft.staging.dir"),
      checkpointDir = props.getProperty("graft.checkpoint.dir",
        get("graft.landing.dir") + "/_checkpoints"),
      groupInterval = props.getProperty("graft.group.interval", "10000").toLong,
      cacheTtlMillis = props.getProperty("graft.cache.ttl.ms", "60000").toLong,
      excludeBucket = props.getProperty("graft.exclude.bucket", ""),
      purgeToleranceMs = props.getProperty("graft.purge.tolerance.ms", "0").toLong,
      kafkaBootstrap = props.getProperty("graft.kafka.bootstrap", ""),
      kafkaTopic = props.getProperty("graft.kafka.topic", ""),
      maxSearchScanBytes = props.getProperty("graft.search.max.scan.bytes", "0").toLong,
      scratchBytes = props.getProperty("graft.scratch.bytes", "0").toLong,
      refineRounds = props.getProperty("graft.refine.rounds", "2").toInt,
      derivedDir = props.getProperty("graft.derived.dir", ""),
      // credentials fall back to the standard AWS env vars (the
      // reference's envOrElseConfig order: environment wins over file —
      // keeps secrets out of checked-in conf files)
      s3Endpoint = props.getProperty("graft.s3.endpoint", ""),
      s3AccessKey = sys.env.getOrElse("AWS_ACCESS_KEY_ID",
        props.getProperty("graft.s3.access.key", "")),
      s3SecretKey = sys.env.getOrElse("AWS_SECRET_ACCESS_KEY",
        props.getProperty("graft.s3.secret.key", "")),
      s3PathStyleAccess =
        props.getProperty("graft.s3.path.style", "false").toBoolean,
      s3SslEnabled = props.getProperty("graft.s3.ssl", "true").toBoolean)
  }
}
