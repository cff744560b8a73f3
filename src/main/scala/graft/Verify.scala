package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Fail-loud contract: EVERY key in SparkEntry.queries produces an output
  * dir. A query that throws writes a one-row error-sentinel parquet
  * (column `__graft_error__`) — so the driver's compare records a visible
  * schema/hash mismatch for that key instead of silently dropping it from
  * the artifact (round 6 lost 18 failing queries from CORRECTNESS_r06
  * exactly that way; the artifact alone read as 100% green). Alongside,
  * `verify_status.json` maps every attempted key to ok/err for auditing.
  */
object Verify {
  final case class Status(ok: Boolean, err: Option[String])

  /** Run the dump; returns per-query status keyed by EVERY attempted name
    * (= queries keyset ∩ filter). Total function — never throws per-query.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]]): Map[String, Status] = {
    new java.io.File(outDir).mkdirs()
    val statuses = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val st =
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            Status(ok = true, err = None)
          } catch { case e: Throwable =>
            val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
            System.err.println(s"[verify] $name failed: $msg")
            // Error sentinel: guarantees a row in the driver's correctness
            // artifact (as a loud mismatch) for this key.
            try {
              import spark.implicits._
              Seq(msg).toDF("__graft_error__").coalesce(1)
                .write.mode("overwrite").parquet(s"$outDir/$name")
            } catch { case e2: Throwable =>
              // the key may now be absent from the driver's correctness
              // artifact entirely — make that diagnosable from the run log
              System.err.println(
                s"[verify] $name sentinel write failed: ${e2.getClass.getName}: " +
                  Option(e2.getMessage).getOrElse(""))
            }
            Status(ok = false, err = Some(msg))
          }
        // Storage hygiene between queries — see the matching note in Bench.
        spark.catalog.clearCache()
        System.gc()
        name -> st
      }
    // provenance stamp — proves the status reflects a real fresh run
    val stamped = statuses.map { case (k, s) =>
      val err = s.err.map(e => s""", "err": ${q(e)}""").getOrElse("")
      s"${q(k)}: {\"ok\": ${s.ok}$err}"
    } ++ Seq(s""""_generated_at": ${q(java.time.Instant.now().toString)}""")
    Files.writeString(Paths.get(s"$outDir/verify_status.json"),
      stamped.mkString("{", ",", "}"))
    statuses
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)      => (s, o, None)
      case Array(s, o, fil) => (s, o, Some(fil.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, only)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // A FILTERED run must not overwrite the full manifest: stale result
    // dirs from a previous full run would sit beside a subset-only
    // oracle_sql.json and a later crosscheck would silently lose the
    // unfiltered queries' coverage. Subset runs write a partial manifest.
    val manifest = if (only.isDefined) "oracle_sql.partial.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$manifest"), json)
    spark.stop()
  }
}
