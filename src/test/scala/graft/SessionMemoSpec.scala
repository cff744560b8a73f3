package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.ops.SessionMemo
import org.scalatest.funsuite.AnyFunSuite

/** The memo staleness contract: keyed by (session, dir) BUT revalidated
  * against the input table's on-disk fingerprint, so an in-place rewrite
  * of the same path rebuilds instead of serving pre-rewrite results.
  */
class SessionMemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hit on unchanged data, rebuild on in-place rewrite, per-dir isolation") {
    val dir = SparkTestSession.tempDir("memo-data")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val memo = new SessionMemo(Seq("documents.parquet"))
    val builds = new AtomicInteger(0)
    def read() = memo.get(spark, dir) {
      builds.incrementAndGet()
      spark.read.parquet(s"$dir/documents.parquet").localCheckpoint()
    }

    assert(read().count() == 2 && builds.get == 1)
    assert(read().count() == 2 && builds.get == 1, "unchanged data must hit")

    // in-place rewrite of the SAME path: the (session, dir) key is
    // unchanged — only the fingerprint catches this
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(read().count() == 3, "rewrite must serve the NEW data")
    assert(builds.get == 2, "rewrite must trigger exactly one rebuild")
    assert(read().count() == 3 && builds.get == 2, "and then hit again")

    // a different dir is a different entry, not a collision
    val dir2 = SparkTestSession.tempDir("memo-data2")
    Seq((9L, "z")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val n2 = memo.get(spark, dir2) {
      builds.incrementAndGet()
      spark.read.parquet(s"$dir2/documents.parquet").localCheckpoint()
    }.count()
    assert(n2 == 1 && builds.get == 3)
    assert(read().count() == 3 && builds.get == 3, "dir1 entry undisturbed")

    memo.clear()
    assert(read().count() == 3 && builds.get == 4, "clear() evicts")
  }

  test("fingerprint: stable on unchanged data, distinct for absent vs present") {
    val dir = SparkTestSession.tempDir("memo-fp")
    val fpAbsent = SessionMemo.fingerprint(spark, Seq(s"$dir/t.parquet"))
    Seq(1, 2, 3).toDF("x").write.parquet(s"$dir/t.parquet")
    val fp1 = SessionMemo.fingerprint(spark, Seq(s"$dir/t.parquet"))
    val fp2 = SessionMemo.fingerprint(spark, Seq(s"$dir/t.parquet"))
    assert(fp1 == fp2, "same on-disk state, same fingerprint")
    assert(fp1 != fpAbsent, "absent and present must differ")
  }
}
