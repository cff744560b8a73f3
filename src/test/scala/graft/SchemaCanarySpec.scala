package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Schema-drift canary (round-6 postmortem): the driver regenerates
  * `/root/testdata` between rounds and has already changed physical types
  * once (`events.ts` TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), which broke 18
  * queries as scattered analysis errors. This spec is the single named
  * place that fails first on the next silent regeneration: it loads every
  * table through the engine's own loaders and asserts the NORMALIZED
  * schema every downstream operator assumes.
  *
  * `events.ts` must surface as LongType epoch-nanos whatever the parquet
  * encoding — that invariant IS the round-7 fix (Tables.normalizeEventTs).
  */
class SchemaCanarySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] = {
    val df =
      if (name == "events") Tables.events(spark, sf)
      else Tables.load(spark, sf, name)
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  test("events normalizes to the canonical engine schema (ts = long nanos)") {
    val f = fields("events")
    assert(f("ts") == LongType, s"ts must normalize to epoch-nanos long, got ${f("ts")}")
    assert(f("event_id") == LongType)
    assert(f("user_id") == LongType)
    assert(f("event_type") == StringType)
    assert(f("value") == DoubleType)
    assert(f("props") == StringType)
  }

  test("events ts values are epoch NANOS (not micros/millis mislabeled)") {
    // 2020-01-01 .. 2030-01-01 in nanos: [1.577e18, 1.893e18]. A micros
    // value mistakenly passed through unscaled would be ~1.6e15 and fail.
    val r = Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.min("ts"),
           org.apache.spark.sql.functions.max("ts")).first()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo > 1_000_000_000_000_000_000L && hi < 2_500_000_000_000_000_000L,
      s"ts range [$lo, $hi] is not plausible epoch-nanos — scaling bug or drift")
  }

  test("ts normalization is session-timezone-proof") {
    // the NTZ→LTZ cast resolves its zone at analysis; the loader pins UTC
    // before building the frame, so a session running in another timezone
    // (a real cluster default) must still produce identical epoch nanos
    val utcRow = Tables.events(spark, sf)
      .orderBy("event_id").limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val nyRow = Tables.events(spark, sf)
        .orderBy("event_id").limit(3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(nyRow.toSeq == utcRow.toSeq,
        "epoch-nanos ts must not depend on the caller's session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("loading events does not permanently mutate the session timezone") {
    // the NTZ branch pins UTC only for the eager analysis of its cast and
    // must restore the caller's zone — a table load that flips the session
    // tz would silently change every later tz-dependent expression
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      Tables.events(spark, sf).limit(1).collect()
      assert(spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo",
        "Tables.events must restore the caller's session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("relational tables keep the column types the operators assume") {
    val li = fields("lineitem")
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType &&
      li("l_suppkey") == LongType && li("l_linenumber") == IntegerType)
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .foreach(c => assert(li(c) == DoubleType, s"$c: ${li(c)}"))
    assert(li("l_returnflag") == StringType && li("l_linestatus") == StringType)
    // date-ish columns: any timestamp flavor is fine (queries use
    // date_format/cast, which accept both); a LONG or STRING here is drift.
    def timestampish(t: DataType) = t == TimestampType || t == TimestampNTZType || t == DateType
    assert(timestampish(li("l_shipdate")), s"l_shipdate: ${li("l_shipdate")}")

    val o = fields("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_totalprice") == DoubleType && o("o_orderstatus") == StringType)
    assert(timestampish(o("o_orderdate")), s"o_orderdate: ${o("o_orderdate")}")

    val c = fields("customer")
    assert(c("c_custkey") == LongType && c("c_nationkey") == IntegerType &&
      c("c_acctbal") == DoubleType && c("c_mktsegment") == StringType)
    val s = fields("supplier")
    assert(s("s_suppkey") == LongType && s("s_nationkey") == IntegerType &&
      s("s_acctbal") == DoubleType)
    val p = fields("part")
    assert(p("p_partkey") == LongType && p("p_size") == IntegerType &&
      p("p_retailprice") == DoubleType)
    val n = fields("nation")
    assert(n("n_nationkey") == IntegerType && n("n_regionkey") == IntegerType)
    val r = fields("region")
    assert(r("r_regionkey") == IntegerType && r("r_name") == StringType)
  }

  test("documents / embeddings keep the pipeline-facing types") {
    val d = fields("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType &&
      d("n_chars") == LongType)
    val e = fields("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType)
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
           e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding: ${e("embedding")}")
  }
}
