package graft.analytics

import graft.Tables
import graft.Tables.{cents, tsStr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics suite — the engine's general-purpose query surface
  * (SURVEY.md §2.2).
  *
  * Scale notes (100 TB posture):
  *  - Dim tables (region/nation/customer-filtered) are `broadcast()` so fact
  *    scans never shuffle for the dim side.
  *  - Money math is exact integer cents (see [[graft.Tables.cents]]); sums
  *    are map-side partially aggregated longs.
  *  - Top-k uses `orderBy().limit()` which Spark plans as
  *    TakeOrderedAndProject — no global sort materialization.
  */
object Relational {

  /** TPC-H Q1 shape: wide grouped aggregation over the fact table.
    * One shuffle, partial aggregation on the map side.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-01"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_discount")).as("disc_c"),
        cents(col("l_tax")).as("tax_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qty_c")) / 100.0).as("sum_qty"),
        (sum(col("price_c")) / 100.0).as("sum_base_price"),
        (sum(col("price_c") * (lit(100L) - col("disc_c"))) / 10000.0).as("sum_disc_price"),
        (sum(col("price_c") * (lit(100L) - col("disc_c")) * (lit(100L) + col("tax_c"))) / 1000000.0).as("sum_charge"),
        (sum(col("qty_c")) / (lit(100.0) * count(lit(1)))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """WITH l AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(round(l_quantity*100) AS BIGINT)      AS qty_c,
      |         CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
      |         CAST(round(l_discount*100) AS BIGINT)      AS disc_c,
      |         CAST(round(l_tax*100) AS BIGINT)           AS tax_c
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00')
      |SELECT l_returnflag, l_linestatus,
      |       CAST(sum(qty_c) AS BIGINT)/100.0 AS sum_qty,
      |       CAST(sum(price_c) AS BIGINT)/100.0 AS sum_base_price,
      |       CAST(sum(price_c*(100-disc_c)) AS BIGINT)/10000.0 AS sum_disc_price,
      |       CAST(sum(price_c*(100-disc_c)*(100+tax_c)) AS BIGINT)/1000000.0 AS sum_charge,
      |       CAST(sum(qty_c) AS BIGINT)/(100.0*count(*)) AS avg_qty,
      |       count(*) AS count_order
      |FROM l GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    * Customer side is broadcast after its segment filter.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), tsStr(col("o_orderdate")).as("orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
      |       o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: snowflake join over the full dim chain with broadcast
    * dims; revenue by nation.
    */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5JoinSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Ranked window top-k per group: top 3 orders per customer by price.
    * Exact-cents ordering with orderkey tiebreak keeps ranks deterministic.
    */
  def windowTopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
    val w = Window.partitionBy("o_custkey").orderBy(col("price_c").desc, col("o_orderkey"))
    o.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"), (col("price_c") / 100.0).as("totalprice"))
      .orderBy("o_custkey", "rank")
  }

  val windowTopKSql: String =
    """SELECT o_custkey, rank, o_orderkey, price_c/100.0 AS totalprice FROM (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rank
      |  FROM orders) t
      |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin

  /** Anti join: customers with no order above $100k. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 100000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join: customers holding at least one urgent order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val urgent = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), (cents(col("c_acctbal")) / 100.0).as("acctbal"))
      .orderBy("c_custkey")
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_mktsegment,
      |       CAST(round(c_acctbal*100) AS BIGINT)/100.0 AS acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Hierarchical ROLLUP over (returnflag, linestatus); rollup nulls are
    * rendered as 'ALL' so ordering/NULL semantics can't diverge.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), cents(col("l_quantity")).as("qty_c"))
    l.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(col("qty_c")) / 100.0).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")
  }

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_qty,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** TPC-H Q14 shape: promo-revenue share per ship month — conditional
    * aggregation over the fact table with the `part` dim broadcast. All
    * revenue is exact integer (cents × basis-point) math; the share is one
    * double division of exact longs, so both engines agree bit-for-bit.
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_partkey"),
      date_format(col("l_shipdate"), "yyyy-MM").as("month"),
      (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev_c4"))
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === "ECONOMY").as("is_promo"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy("month")
      .agg(
        (sum(when(col("is_promo"), col("rev_c4")).otherwise(0L)) / 10000.0).as("promo_rev"),
        (sum(col("rev_c4")) / 10000.0).as("total_rev"),
        round(sum(when(col("is_promo"), col("rev_c4")).otherwise(0L)) / sum(col("rev_c4")), 6)
          .as("promo_share"))
      .orderBy("month")
  }

  val promoShareSql: String =
    """WITH l AS (
      |  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
      |         CAST(round(l_extendedprice*100) AS BIGINT)
      |           * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_c4
      |  FROM lineitem)
      |SELECT month,
      |       CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev_c4 ELSE 0 END) AS BIGINT)/10000.0 AS promo_rev,
      |       CAST(sum(rev_c4) AS BIGINT)/10000.0 AS total_rev,
      |       round(CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev_c4 ELSE 0 END) AS BIGINT)
      |             / CAST(sum(rev_c4) AS BIGINT), 6) AS promo_share
      |FROM l JOIN part ON l_partkey = p_partkey
      |GROUP BY month ORDER BY month""".stripMargin

  /** Correlated scalar subquery, expressed on the engine's SQL surface:
    * each customer's largest order(s). Catalyst decorrelates the subquery
    * into an aggregate + join (no per-row re-execution), so the same query
    * a reference user writes in SQL runs as one distributed plan.
    */
  def correlatedMax(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    // 100.0D: Spark SQL parses a bare 100.0 as DECIMAL, which would make
    // totalprice DECIMAL while the oracle's division yields DOUBLE
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |       CAST(round(o_totalprice*100) AS BIGINT)/100.0D AS totalprice
        |FROM orders_v o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
        |                      FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val correlatedMaxSql: String =
    """SELECT o_orderkey, o_custkey,
      |       CAST(round(o_totalprice*100) AS BIGINT)/100.0 AS totalprice
      |FROM orders o
      |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
      |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Full CUBE over (mktsegment, priority) with grouping flags — the
    * all-combinations companion of [[rollupAgg]] (rollup only descends the
    * hierarchy; cube also emits the priority-only slice). Cube nulls are
    * rendered as 'ALL' and the grouping flags ride along so oracle NULL
    * semantics can't diverge.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderpriority"), cents(col("o_totalprice")).as("price_c"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("price_c")) / 100.0).as("sum_price"),
        grouping(col("c_mktsegment")).cast("int").as("g_seg"),
        grouping(col("o_orderpriority")).cast("int").as("g_pri"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("mktsegment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"), col("g_seg"), col("g_pri"))
      .orderBy("mktsegment", "priority")
  }

  val cubeAggSql: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_price,
      |       CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY CUBE (c_mktsegment, o_orderpriority)
      |ORDER BY mktsegment, priority""".stripMargin

  /** PIVOT: order counts per market segment spread across one column per
    * priority. The pivot values are pinned (not inferred), so the plan is
    * a single groupBy with conditional aggregates — no extra distinct-
    * values job, stable schema at any scale.
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderpriority"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .pivot("o_orderpriority", prios)
      .count()
      .na.fill(0L)
      .orderBy("mktsegment")
  }

  val pivotAggSql: String =
    """SELECT c_mktsegment AS mktsegment,
      |       count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS "1-URGENT",
      |       count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS "2-HIGH",
      |       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS "3-MEDIUM",
      |       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
      |       count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS "5-LOW"
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY mktsegment""".stripMargin

  /** Multiple distinct aggregates in one pass. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  val distinctAggSql: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** #56 q_custdist (TPC-H Q13 shape): orders-per-customer distribution.
    * The outer join keeps zero-order customers (count 0 must appear in the
    * histogram), and the priority predicate lives in the join (filtering
    * `orders` before the join is equivalent and lets the filter push to
    * the scan). Two shuffles: the custkey one dominates at scale and
    * partial-aggregates map-side; the second groups a |distinct counts|-
    * sized frame.
    */
  def custDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val custDistSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** #57 q_not_in: NOT IN subquery on the SQL surface — Spark plans this
    * as a null-aware anti join (a distinct physical operator from the
    * plain LeftAnti of `q_anti_join`; with a broadcastable subquery it
    * becomes a single-key BroadcastHashJoin with isNullAware=true).
    * `l_partkey` is non-null in the data, but the operator carries the
    * three-valued NOT IN semantics regardless.
    */
  def notInAnti(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("part_v")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT p_brand, count(*) AS n_unmoved
        |FROM part_v
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem_v WHERE l_quantity > 45)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  val notInAntiSql: String =
    """SELECT p_brand, count(*) AS n_unmoved
      |FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ----------------------------------------- #69 GROUPING SETS surface
  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * (status, priority), (status), and the grand total in ONE pass.
    * Spark expands the sets with a single Expand node over one scan
    * (grouping-set aggregation never re-reads the fact table), and the
    * aggregation stays map-side partial per set. `grouping_id` + sentinel
    * labels keep the three strata disambiguated and hash-stable.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_c"))
      .createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT coalesce(o_orderstatus, '<all>')   AS status,
        |       coalesce(o_orderpriority, '<all>') AS priority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n_orders,
        |       sum(price_c) AS total_cents
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY gid, status, priority""".stripMargin)
  }

  val groupingSetsSql: String =
    """WITH o AS (
      |  SELECT o_orderstatus, o_orderpriority,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders)
      |SELECT coalesce(o_orderstatus, '<all>')   AS status,
      |       coalesce(o_orderpriority, '<all>') AS priority,
      |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |       count(*) AS n_orders,
      |       CAST(sum(price_c) AS BIGINT) AS total_cents
      |FROM o
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), ())
      |ORDER BY gid, status, priority""".stripMargin

  // ------------------------------------ #67 global-threshold anti (Q22)
  /** TPC-H Q22 shape: customers whose balance beats the global average of
    * positive balances but who placed no URGENT order, aggregated per
    * nation — a global scalar aggregate feeding a filter, composed with
    * an anti join over a filtered subquery.
    *
    * Scale shape: the scalar threshold is a one-row aggregate that
    * BROADCASTs into the filter (no driver-side collect), the anti join
    * builds on `orders`' distinct custkeys, and the final aggregation is
    * a handful of nations — map-side partial all the way.
    */
  def wealthyInactive(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bal_cents"))
    val thr = cust.filter(col("bal_cents") > 0)
      .agg(avg(col("bal_cents")).as("thr"))
    cust.join(broadcast(thr))
      .filter(col("bal_cents") > col("thr"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("bal_cents")).as("total_bal_cents"))
      .orderBy("c_nationkey")
  }

  val wealthyInactiveSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer),
      |thr AS (SELECT avg(bal_cents) AS thr FROM cust WHERE bal_cents > 0)
      |SELECT c_nationkey, count(*) AS n_cust,
      |       CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
      |FROM cust, thr
      |WHERE bal_cents > thr
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin
}
