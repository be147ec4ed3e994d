package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.Tables

/** Relational operator inventory (SURVEY.md §2) re-expressed Spark-first
  * over the TPC-H-ish test star schema.
  *
  * Each entry names the reference operator(s) it covers, citing the
  * reference file:line it derives from. The plans are written so Catalyst
  * does the heavy lifting: filters/pruning push into the parquet scans,
  * small dims are broadcast (no shuffle on the fact side), and aggregations
  * use partial (map-side) combine. At 100 TB the same plans hold: the only
  * shuffles are keyed aggregations and the one sort-merge join whose build
  * side is genuinely large.
  */
object CoreQueries {

  /** Exact money decimal: doubles in the test data carry ≤2 decimal digits,
    * so DECIMAL(18,2) is lossless and makes add/multiply order-independent. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private val oneD: Column = lit(1).cast(DecimalType(18, 2))

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // A1/A2-style aggregation + P3 filter + P7 arithmetic
    // (ref: step_5 groupBy dims; step_4:150-153 money arithmetic)
    QueryDef(
      "q1_pricing_summary",
      "TPC-H-Q1-style grouped aggregate: filter -> hash-agg with partial combine; exact decimal sums cast back to double",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // ------------------------------------------------------------------
    // P1 projection + P3 equality filter (ref: step_4:40-58,97-98)
    QueryDef(
      "q2_filter_project",
      "equality + range filter pushed to the parquet scan, narrow projection (ReadSchema pruning)",
      """SELECT o_orderkey, o_custkey, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    },

    // ------------------------------------------------------------------
    // J4 multi-way equi-join + A1 agg (ref: step_5:547-566 fact assembly)
    QueryDef(
      "q3_segment_revenue",
      "fact->dim join chain with broadcast dims: lineitem |> orders |> customer, grouped revenue by market segment",
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      // customer/orders scale with the data (no hard-coded broadcast);
      // AQE picks broadcast-hash when the built side is actually small.
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // ------------------------------------------------------------------
    // J1 full-outer join (ref: step_4:107-111 forex outer join) + P8 coalesce
    QueryDef(
      "q4_daily_activity",
      "full-outer join of two keyed daily aggregates (ref's forex outer-join shape) with null-filling coalesce",
      """SELECT d, COALESCE(n_orders, 0) AS n_orders, COALESCE(n_ships, 0) AS n_ships
        |FROM (SELECT o_orderdate AS d, COUNT(*) AS n_orders FROM orders GROUP BY 1) a
        |FULL OUTER JOIN (SELECT l_shipdate AS d, COUNT(*) AS n_ships FROM lineitem GROUP BY 1) b USING (d)""".stripMargin) { (s, dir) =>
      val od = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d")).agg(count(lit(1)).as("n_orders"))
      val sd = Tables.lineitem(s, dir)
        .groupBy(col("l_shipdate").as("d")).agg(count(lit(1)).as("n_ships"))
      od.join(sd, Seq("d"), "full_outer")
        .select(col("d"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships"), lit(0L)).as("n_ships"))
    },

    // ------------------------------------------------------------------
    // J3 left-anti join (ref: step_5:107-111 delta-load pattern)
    QueryDef(
      "q5_customers_without_orders",
      "left-anti join: the reference's incremental-load NOT EXISTS primitive. Filtered to one order status so the anti case is non-vacuous (round-2 verdict: the unfiltered variant returned 0 rows on both engines). At scale, shrink the build side to distinct keys before the anti-join.",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      // Build side pre-shrunk to the distinct key set: at 100 TB the
      // anti-join then builds on |distinct keys|, not |orders|.
      val o = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "P")
        .select("o_custkey").distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // left-semi join (EXISTS) — completes the J3 family
    QueryDef(
      "q6_customers_with_orders",
      "left-semi join (EXISTS): dedup-free key membership probe",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // ------------------------------------------------------------------
    // W1 rank-dedup (ref: step_4:114-125) — newest-wins per key
    QueryDef(
      "q7_latest_order_per_customer",
      "rank() over (partition by key order by recency desc) = 1 — the reference's dedup operator with a total-order tiebreak",
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
        |  FROM orders) WHERE rk = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rk", rank().over(w))
        .filter(col("rk") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    },

    // ------------------------------------------------------------------
    // U1 union-distinct (ref: step_5:469 — Snowpark union = UNION DISTINCT)
    QueryDef(
      "q8_union_distinct",
      "UNION (distinct) semantics: Spark union is UNION ALL, so .distinct() restores Snowpark/ANSI behavior",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .union(o.filter(col("o_totalprice") > 100000.0).select("o_custkey"))
        .distinct()
    },

    // ------------------------------------------------------------------
    // S12 surrogate keys (ref: seq.nextval, step_3:27 / step_5:88 etc.)
    QueryDef(
      "q9_surrogate_keys",
      "dense append-safe surrogate keys: row_number over a total order + existing-max offset (nextval semantics)",
      """SELECT CAST(100 + row_number() OVER (ORDER BY n_name) AS BIGINT) AS nation_sk,
        |  n_nationkey, n_name FROM nation""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir).select(
        (lit(100L) + row_number().over(Window.orderBy(col("n_name"))).cast(LongType)).as("nation_sk"),
        col("n_nationkey"), col("n_name"))
    },

    // ------------------------------------------------------------------
    // P12/P13 date-dim generation (ref: step_5:396-425, pandas replaced by
    // executor-side sequence+explode — no driver round-trip)
    QueryDef(
      "q10_date_dim",
      "date dimension from min/max order date via sequence()+explode — runs on executors, unlike the reference's pandas driver loop",
      """WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mn, CAST(MAX(o_orderdate) AS DATE) AS mx FROM orders)
        |SELECT CAST(d AS TIMESTAMP) AS cal_dt,
        |  year(d) AS year, quarter(d) AS quarter, month(d) AS month,
        |  day(d) AS day_of_month, dayofweek(d) + 1 AS day_of_week,
        |  dayname(d) AS day_name,
        |  CASE WHEN dayofweek(d) IN (0, 6) THEN 'Weekend' ELSE 'Weekday' END AS day_type
        |FROM (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d FROM bounds)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .agg(min(to_date(col("o_orderdate"))).as("mn"), max(to_date(col("o_orderdate"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"))).as("cal_dt"))
        .select(
          // TIMESTAMP output on both sides: a physical date32 vs int64
          // parquet type difference would trip a byte-level hash compare.
          col("cal_dt").cast("timestamp").as("cal_dt"),
          year(col("cal_dt")).cast(LongType).as("year"),
          quarter(col("cal_dt")).cast(LongType).as("quarter"),
          month(col("cal_dt")).cast(LongType).as("month"),
          dayofmonth(col("cal_dt")).cast(LongType).as("day_of_month"),
          dayofweek(col("cal_dt")).cast(LongType).as("day_of_week"),
          date_format(col("cal_dt"), "EEEE").as("day_name"),
          when(dayofweek(col("cal_dt")).isin(1, 7), "Weekend")
            .otherwise("Weekday").as("day_type"))
    },

    // ------------------------------------------------------------------
    // P8 CASE WHEN / NULL handling (ref: step_5:205-214 promo 'NA' fill)
    QueryDef(
      "q11_case_bucket",
      "CASE WHEN bucketing + NULLIF/COALESCE defaulting (the reference's promo-code NA fill)",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice >= 300000.0 THEN 'large'
        |       WHEN o_totalprice >= 150000.0 THEN 'medium'
        |       ELSE 'small' END AS size_bucket,
        |  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'NA') AS priority
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 300000.0, "large")
          .when(col("o_totalprice") >= 150000.0, "medium")
          .otherwise("small").as("size_bucket"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("NA")).as("priority"))
    },

    // ------------------------------------------------------------------
    // P11 string split + element access (ref: step_5:132-135 mobile_key)
    QueryDef(
      "q12_split_attributes",
      "split('/'-style composite key) + element access — the reference's product-dim attribute derivation",
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS name_adjective,
        |  split_part(p_name, ' ', 2) AS name_noun,
        |  CAST(split_part(p_brand, '#', 2) AS BIGINT) AS brand_no
        |FROM part""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        split(col("p_name"), " ").getItem(0).as("name_adjective"),
        split(col("p_name"), " ").getItem(1).as("name_noun"),
        split(col("p_brand"), "#").getItem(1).cast(LongType).as("brand_no"))
    },

    // ------------------------------------------------------------------
    // P7/P9 currency-conversion arithmetic + casts (ref: step_4:150-153,
    // 7. Source to Curated Layer.sql:42-43 DECIMAL(23,8) targets)
    QueryDef(
      "q13_usd_conversion",
      "per-row money arithmetic with explicit decimal casts (exact) and IEEE double division (deterministic)",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charge,
        |  l_extendedprice / (1.0 + l_tax) AS net_of_tax
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) * (oneD - dec(col("l_discount")))
          * (oneD + dec(col("l_tax")))).cast("double").as("charge"),
        (col("l_extendedprice") / (lit(1.0) + col("l_tax"))).as("net_of_tax"))
    },

    // ------------------------------------------------------------------
    // J4 full star-schema fact assembly (ref: step_5:547-584): 4 dim
    // lookups, every dim broadcast — zero shuffle on the fact side.
    QueryDef(
      "q14_fact_assembly",
      "star fact row assembly: fact |> 4 broadcast dim lookups |> FK projection; the probe side never shuffles",
      """SELECT l_orderkey, l_linenumber, o_custkey AS customer_fk,
        |  n_nationkey AS nation_fk, r_regionkey AS region_fk, p_partkey AS part_fk,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_regionkey")
      val r = Tables.region(s, dir).select("r_regionkey")
      val p = Tables.part(s, dir).select("p_partkey")
      // nation/region are fixed-cardinality -> always broadcast; orders/
      // customer/part grow with scale -> leave strategy to stats + AQE.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .join(p, li("l_partkey") === p("p_partkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("o_custkey").as("customer_fk"),
          col("n_nationkey").as("nation_fk"),
          col("r_regionkey").as("region_fk"),
          col("p_partkey").as("part_fk"),
          (dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
            .cast("double").as("net_price"))
    })
}
