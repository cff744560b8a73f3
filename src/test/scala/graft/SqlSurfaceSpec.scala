package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL entry surface: a session that knows nothing of the Scala
  * API drives the engine through registered views + `graft_*` functions.
  * This is the landing path for a SQL-only user of the reference engine.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("registered views + functions run analytics from plain SQL") {
    Tables.registerAll(spark, sf)

    val agg = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(agg.count() > 0)

    // native kernels resolve by name in SQL
    val sig = spark.sql(
      "SELECT doc_id, graft_polyhash(text) AS h FROM documents ORDER BY doc_id LIMIT 5")
    assert(sig.collect().forall(_.getLong(1) >= 0))

    // the nanos-ts events table is usable directly (registerAll routes it
    // through the nanosAsLong loader)
    val ev = spark.sql(
      "SELECT user_id, count(*) AS n FROM events GROUP BY user_id")
    assert(ev.count() > 0)

    // a cross-view join, purely in SQL
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_cust DESC LIMIT 3""".stripMargin)
    assert(joined.count() == 3)
  }

  test("pushdown and pruning survive the view layer") {
    Tables.registerAll(spark, sf)
    val q = spark.sql("SELECT doc_id, lang FROM documents WHERE doc_id < 10")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan under the view"))
    assert(scan.metadata.getOrElse("PushedFilters", "")
      .contains("LessThan(doc_id,10)"), "predicate lost at the view boundary")
    assert(scan.requiredSchema.fieldNames.toSet == Set("doc_id", "lang"),
      "column pruning lost at the view boundary")
  }
}
