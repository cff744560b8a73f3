package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Fail-loud contract of the correctness dump (round-6 postmortem: 18
  * erroring queries were silently ABSENT from CORRECTNESS_r06.json, so the
  * artifact alone read as 100% green).
  *
  * Pins: (1) Verify.run returns a status for EVERY attempted key — the
  * artifact keyset equals the queries keyset; (2) a failing query still
  * produces an output parquet (the `__graft_error__` sentinel), so the
  * driver's DuckDB compare records a visible mismatch row instead of
  * dropping the key; (3) verify_status.json carries the error text.
  */
class VerifyContractSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("ok path: every attempted key gets a status and a result dir") {
    val out = SparkTestSession.tempDir("verify-ok")
    val subset = Set("q1_agg", "text_tokens")
    val st = Verify.run(spark, sf, out, Some(subset))
    assert(st.keySet == subset)
    assert(st.values.forall(_.ok))
    subset.foreach { k =>
      assert(Files.exists(Paths.get(s"$out/$k")), s"missing result dir for $k")
      val cols = spark.read.parquet(s"$out/$k").columns.toSet
      assert(!cols.contains("__graft_error__"), s"$k wrote an error sentinel")
    }
    val statusJson = Files.readString(Paths.get(s"$out/verify_status.json"))
    subset.foreach(k => assert(statusJson.contains(s""""$k": {"ok": true}""")))
  }

  test("failing queries still emit an entry: sentinel parquet + err status") {
    val out = SparkTestSession.tempDir("verify-err")
    val bogusSf = SparkTestSession.tempDir("verify-nodata") // no tables here
    val subset = Set("q1_agg", "dedup_exact")
    val st = Verify.run(spark, bogusSf, out, Some(subset))
    // total function: keyset preserved, nothing dropped, nothing thrown
    assert(st.keySet == subset)
    assert(st.values.forall(s => !s.ok && s.err.exists(_.nonEmpty)))
    subset.foreach { k =>
      val df = spark.read.parquet(s"$out/$k")
      assert(df.columns.toSeq == Seq("__graft_error__"),
        s"$k should carry the error sentinel, got ${df.columns.mkString(",")}")
      assert(df.count() == 1)
    }
    val statusJson = Files.readString(Paths.get(s"$out/verify_status.json"))
    subset.foreach(k => assert(statusJson.contains(s""""$k": {"ok": false, "err":""")))
  }
}
