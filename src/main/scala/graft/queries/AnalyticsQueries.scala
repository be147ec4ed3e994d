package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.CrossEngine
import graft.sources.Tables

/** Round-5 analytics depth: multi-dimensional aggregation (CUBE with
  * grouping masks), running/moving window analytics, heavy-hitter
  * extraction, semi-structured JSON columns, single-pass data profiling,
  * statistical outlier detection, and exact per-group medians.
  *
  * Everything here follows the engine's cross-engine exactness rules
  * (QueryDef scaladoc + CrossEngine): decimal money math, integer
  * aggregation wherever order-dependence could bite, scalar IEEE
  * double ops (incl. sqrt, which IEEE 754 requires correctly rounded)
  * only on aggregated scalars — never a parallel double SUM.
  */
object AnalyticsQueries {

  /** Exact cents as a long: parse the 2-decimal money double through
    * DECIMAL so no engine-specific double rounding is involved.
    * DuckDB equivalent: CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT).
    * (Double->BIGINT casts differ across engines — DuckDB rounds, Spark
    * truncates — so the value must be integral BEFORE the cast, which
    * the decimal route guarantees.) */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast(LongType)

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // CUBE: all 4 grouping sets of (nation, segment) in ONE shuffle —
    // Catalyst plans cube as Expand (4 replicas tagged with a
    // grouping id) feeding a single hash aggregate, so the fact side
    // is read and shuffled once, not once per grouping set. The dims
    // are broadcast; at 100 TB the only big exchange is the orders
    // aggregate itself, and partial (map-side) aggregation collapses
    // each partition to at most |nations|x|segments|x4 rows before it.
    QueryDef(
      "q60_cube",
      "CUBE (nation, segment) revenue: 4 grouping sets in one Expand+hash-aggregate shuffle, GROUPING() masks distinguish 'ALL' from a literal value",
      """SELECT COALESCE(n_name, 'ALL') AS nation_name,
        |  COALESCE(c_mktsegment, 'ALL') AS segment,
        |  GROUPING(n_name) AS g_nation, GROUPING(c_mktsegment) AS g_segment,
        |  count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(
          grouping(col("n_name")).cast(LongType).as("g_nation"),
          grouping(col("c_mktsegment")).cast(LongType).as("g_segment"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .select(
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          col("g_nation"), col("g_segment"), col("n_orders"), col("revenue"))
    },

    // ------------------------------------------------------------------
    // Running + moving window analytics: three frames over ONE window
    // partitioning (customer), so the plan is a single shuffle on
    // o_custkey feeding one Window node — adding frames is free once
    // the partitioning is shared. Money sums stay DECIMAL inside the
    // frame (exact regardless of accumulation order), cast to double
    // only on output. (o_orderdate, o_orderkey) is a unique sort key,
    // so every frame is deterministic.
    QueryDef(
      "q61_running",
      "per-customer running total, 3-row moving sum, and lag gap-days: three frames over one shared window partitioning = one shuffle",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3,
        |  CAST(date_diff('day',
        |    CAST(lag(o_orderdate) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_total"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(-2, Window.currentRow))
          .cast("double").as("mov3"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast(LongType).as("gap_days"))
    },

    // ------------------------------------------------------------------
    // Heavy hitters: top-k most frequent tokens corpus-wide. The
    // aggregate is map-side-combinable (each partition collapses to
    // its local token counts before the shuffle) and the top-k is
    // TakeOrderedAndProject — per-partition heaps of k rows, never a
    // global sort. Deterministic tiebreak (count desc, token asc)
    // makes the row SET stable, which is what the gate hashes.
    QueryDef(
      "q62_heavyhit",
      "corpus-wide top-20 heavy-hitter tokens: map-side-combined count + TakeOrderedAndProject (per-partition heaps, no global sort)",
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(CrossEngine.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    },

    // ------------------------------------------------------------------
    // Semi-structured JSON column: events.props holds a JSON object.
    // from_json with an explicit schema is the scale path — typed,
    // codegen'd, no per-row driver logic, and schema-on-read means bad
    // records become NULL instead of failing the scan. The aggregate
    // distinct is Expand-based: one shuffle.
    QueryDef(
      "q63_json",
      "JSON property extraction (from_json with explicit schema) + per-value counts and distinct users; typed schema-on-read, bad records -> NULL",
      """SELECT CAST(props->>'k' AS BIGINT) AS k, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k"), col("user_id"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // ------------------------------------------------------------------
    // Single-pass data profiling: per-column non-null + distinct counts
    // for six orders columns computed in ONE aggregate (Catalyst plans
    // the multi-distinct as an Expand feeding one shuffle), then
    // unpivoted with stack() into the (col_name, metric...) long shape.
    // The naive alternative — one scan per column — reads the table six
    // times; this reads it once.
    QueryDef(
      "q64_profile",
      "single-pass per-column profiling (non-null + exact distinct counts for 6 columns in one Expand-planned aggregate), stack()-unpivoted to long form",
      """SELECT 'o_orderkey' AS col_name, count(o_orderkey) AS n_nonnull,
        |    count(DISTINCT o_orderkey) AS n_distinct FROM orders
        |UNION ALL SELECT 'o_custkey', count(o_custkey),
        |    count(DISTINCT o_custkey) FROM orders
        |UNION ALL SELECT 'o_orderstatus', count(o_orderstatus),
        |    count(DISTINCT o_orderstatus) FROM orders
        |UNION ALL SELECT 'o_totalprice', count(o_totalprice),
        |    count(DISTINCT o_totalprice) FROM orders
        |UNION ALL SELECT 'o_orderdate', count(o_orderdate),
        |    count(DISTINCT o_orderdate) FROM orders
        |UNION ALL SELECT 'o_orderpriority', count(o_orderpriority),
        |    count(DISTINCT o_orderpriority) FROM orders""".stripMargin) { (s, dir) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(count(col(c)).as(s"c$i"), countDistinct(col(c)).as(s"d$i"))
      }
      val stackArgs = cols.zipWithIndex
        .map { case (c, i) => s"'$c', c$i, d$i" }.mkString(", ")
      Tables.orders(s, dir)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nonnull, n_distinct)")
    },

    // ------------------------------------------------------------------
    // Statistical outlier detection (1.5-sigma on account balance, per
    // segment; 1.5 rather than the textbook 2 because the synthetic
    // balances are ~uniform, whose max deviation is sqrt(3)=1.73 sigma —
    // a 2-sigma cut would be vacuously empty). Cross-engine-exact by
    // construction: the only PARALLEL
    // aggregates are integer (sum of cents, sum of squared cents —
    // order-free), and mean/variance/sqrt happen on the aggregated
    // SCALARS with an identical IEEE op sequence on both engines
    // (sqrt is correctly rounded per IEEE 754, unlike ln/exp). The
    // 5-row stats side is broadcast back onto customer: one shuffle
    // for the aggregate, zero for the join.
    QueryDef(
      "q65_outlier",
      "per-segment 1.5-sigma outliers: integer sum/sum-of-squares aggregation (order-free), scalar IEEE mean/variance/sqrt, broadcast stats join-back",
      """WITH c AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |stats AS (SELECT c_mktsegment, count(*) AS n, SUM(cents) AS s,
        |    SUM(cents * cents) AS q
        |  FROM c GROUP BY 1)
        |SELECT c_custkey, c.c_mktsegment AS c_mktsegment, c_acctbal
        |FROM c JOIN stats ON c.c_mktsegment = stats.c_mktsegment
        |WHERE abs(CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
        |  > 1.5 * sqrt((CAST(q AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        cents(col("c_acctbal")).as("cents"))
      val stats = c.groupBy("c_mktsegment").agg(
        count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents") * col("cents")).as("q"))
      val mean = col("s").cast("double") / col("n")
      val variance = (col("q").cast("double")
        - col("s").cast("double") * col("s").cast("double") / col("n")) / col("n")
      c.join(broadcast(stats), "c_mktsegment")
        .filter(abs(col("cents").cast("double") - mean) > lit(1.5) * sqrt(variance))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    },

    // ------------------------------------------------------------------
    // Exact per-group median (percentile_disc-style lower middle) via
    // row_number + count over the SAME window partitioning: one
    // shuffle on the group key, no approx-percentile sketch error, and
    // the picked VALUE is tiebreak-independent (equal values are
    // interchangeable at the middle rank). At 100 TB with skewed
    // groups this stays one shuffle; a heavy group is still a single
    // partition's sort — the knob is the same sub-bucketing used by
    // q52, trading a second pass for bounded partitions.
    QueryDef(
      "q66_median",
      "exact per-segment median (lower-middle percentile_disc) via row_number + count over one shared window partitioning — no sketch error",
      """WITH ranked AS (SELECT c_mktsegment, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer)
        |SELECT c_mktsegment, c_acctbal AS median_acctbal, n AS n_rows
        |FROM ranked WHERE rn = (n + 1) // 2""".stripMargin) { (s, dir) =>
      val byVal = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val whole = Window.partitionBy(col("c_mktsegment"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_acctbal"),
          row_number().over(byVal).as("rn"),
          count(lit(1)).over(whole).as("n"))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("c_mktsegment"), col("c_acctbal").as("median_acctbal"),
          col("n").as("n_rows"))
    },

    // ------------------------------------------------------------------
    // MERGE INTO / upsert semantics, engine-side: matched keys take the
    // update batch's values, unmatched-in-target rows are inserted,
    // untouched rows pass through — expressed as ONE full-outer join +
    // per-column coalesce (source wins), which is exactly the dataflow
    // a MERGE compiles to. The update batch is synthesized
    // deterministically (every 7th customer re-priced, plus 150 brand
    // new keys). Scale shape: one shuffle on the key — or zero for the
    // fact side when the batch is broadcastable; on a real lakehouse
    // table the same plan applies after partition-pruning to the files
    // the batch touches. The op tag makes matched/inserted/kept rows
    // separately countable (and the test non-vacuous).
    QueryDef(
      "q70_upsert",
      "MERGE/upsert emulation: full-outer join + per-column coalesce (source wins) with matched/insert/keep op tags — the dataflow a MERGE INTO compiles to, one shuffle",
      """WITH upd AS (
        |  SELECT c_custkey, c_name, c_acctbal + 50.0 AS c_acctbal,
        |      c_mktsegment
        |    FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'NewCustomer#' || c_custkey,
        |      0.0, 'STARTUP'
        |    FROM customer WHERE c_custkey <= 150)
        |SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
        |  COALESCE(u.c_name, t.c_name) AS c_name,
        |  COALESCE(u.c_acctbal, t.c_acctbal) AS c_acctbal,
        |  COALESCE(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
        |  CASE WHEN t.c_custkey IS NULL THEN 'insert'
        |       WHEN u.c_custkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS op
        |FROM customer t FULL JOIN upd u ON t.c_custkey = u.c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val upd = c.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 50.0).as("c_acctbal"), col("c_mktsegment"))
        .unionAll(c.filter(col("c_custkey") <= 150)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            concat(lit("NewCustomer#"), col("c_custkey")).as("c_name"),
            lit(0.0).as("c_acctbal"), lit("STARTUP").as("c_mktsegment")))
      val t = c.select(col("c_custkey").as("tk"), col("c_name").as("tn"),
        col("c_acctbal").as("tb"), col("c_mktsegment").as("tm"))
      t.join(upd, t("tk") === upd("c_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("tk")).as("c_custkey"),
          coalesce(col("c_name"), col("tn")).as("c_name"),
          coalesce(col("c_acctbal"), col("tb")).as("c_acctbal"),
          coalesce(col("c_mktsegment"), col("tm")).as("c_mktsegment"),
          when(col("tk").isNull, "insert")
            .when(col("c_custkey").isNull, "keep")
            .otherwise("update").as("op"))
    },

    // ------------------------------------------------------------------
    // Conversion-funnel analysis: per user, first 'view', first 'click'
    // within 24h after it, first 'purchase' within 24h after that;
    // users counted by deepest stage reached. (The 24h step bound is
    // what makes the funnel discriminate — the synthetic users emit
    // events for a month, so an unbounded funnel converts everyone;
    // bounded it splits 90/35/25 at sf0.01.) Each stage is a conditional MIN
    // aggregate on user_id — three aggregations co-partitioned on the
    // same key, so after the first Exchange the follow-on joins and
    // groupBys reuse the partitioning (no re-shuffle; AQE coalesces).
    // Timestamps are ms-truncated on BOTH engines before any
    // comparison — the >= conditions would otherwise disagree for
    // events inside the same millisecond (Spark stores micros, the
    // parquet holds nanos).
    QueryDef(
      "q71_funnel",
      "view->click(24h)->purchase(24h) conversion funnel: per-user conditional-min stage times (ms-truncated both engines), users counted by deepest stage; co-partitioned aggregates reuse one shuffle",
      """WITH e AS (SELECT user_id, event_type,
        |    date_trunc('millisecond', ts) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t1
        |        AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
        |        AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
        |  count(*) AS n_users
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), date_trunc("millisecond", col("ts")).as("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = e.join(v, "user_id")
        .filter(col("event_type") === "click" && col("ts") >= col("t1")
          && col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = e.join(c, "user_id")
        .filter(col("event_type") === "purchase" && col("ts") >= col("t2")
          && col("ts") <= col("t2") + expr("INTERVAL 24 HOUR"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.join(c.select(col("user_id"), col("t2")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), col("t3")), Seq("user_id"), "left")
        .select(when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2).otherwise(1).cast(LongType).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
    },

    // ------------------------------------------------------------------
    // Cohort retention: the canonical product-analytics matrix. Each
    // user's cohort is the week of their first event; a cell
    // (cohort_week, offset_weeks) counts the distinct users of that
    // cohort active offset weeks later. Plan shape: one pass builds the
    // per-user cohort table (min agg), one pass the distinct
    // (user, week) activity set, and the join is user_id-co-partitioned
    // — both sides shuffle once on the same key, then one
    // count-distinct aggregate. No self-join of events against events:
    // at 100 TB the event log is read twice and reduced immediately
    // both times, never joined at event granularity. Week arithmetic is
    // exact: both engines truncate to Monday and the day difference of
    // two week-truncations is a multiple of 7, so the /7 is an exact
    // integer in double.
    QueryDef(
      "q96_cohort_retention",
      "cohort retention matrix: first-event week cohorts x offset weeks -> distinct active users; two reduced passes + one user-keyed join, never an event-granularity self-join",
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
        |cohort AS (SELECT user_id, min(w) AS cw FROM ev GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, w FROM ev)
        |SELECT CAST(cw AS TIMESTAMP) AS cohort_week,
        |  CAST(date_diff('day', CAST(cw AS DATE), CAST(w AS DATE)) / 7 AS BIGINT)
        |    AS offset_weeks,
        |  count(DISTINCT user_id) AS n_users
        |FROM act JOIN cohort USING (user_id)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      val cohort = ev.groupBy("user_id").agg(min(col("w")).as("cw"))
      val act = ev.distinct()
      act.join(cohort, "user_id")
        .select(col("user_id"), col("cw").as("cohort_week"),
          (datediff(col("w"), col("cw")) / 7).cast(LongType).as("offset_weeks"))
        .groupBy("cohort_week", "offset_weeks")
        .agg(countDistinct(col("user_id")).as("n_users"))
    })
}
