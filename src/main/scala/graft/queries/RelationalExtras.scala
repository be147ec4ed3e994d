package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.keys.SurrogateKeys
import graft.sources.Tables

/** Remaining SURVEY.md §2 relational operators not covered by CoreQueries:
  * O1 (LIMIT/top-k), S8-full (raw SQL over registered views), P2
  * (`selectExpr` projection), and the scale-safe S12 variant (distributed
  * dense surrogate keys, replacing the single-partition global window for
  * non-tiny inputs).
  */
object RelationalExtras {

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // O1 LIMIT / top-k (ref: step_1_check_connection.py:54-65 `limit 10`).
    // orderBy+limit compiles to TakeOrderedAndProject: each partition
    // keeps only its local top-k, the driver merges k*numPartitions rows
    // — no global sort, scale-safe by construction.
    QueryDef(
      "q15_topk_limit",
      "deterministic top-k: ORDER BY value DESC with a unique-key tiebreak + LIMIT; TakeOrderedAndProject, never a global sort",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    },

    // ------------------------------------------------------------------
    // S8 full: raw SQL entry over registered views (ref: session.sql at
    // step_1_check_connection.py:43-65, step_5:465-541). The SQL text is
    // ANSI enough to run verbatim on DuckDB — the oracle IS the query.
    QueryDef(
      "q16_sql_view",
      "spark.sql over createOrReplaceTempView-registered tables; identical ANSI text runs on the oracle",
      """SELECT n_name,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.nation(s, dir).createOrReplaceTempView("nation")
      s.sql(
        """SELECT n_name,
          |  COUNT(*) AS n_customers,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin)
    },

    // ------------------------------------------------------------------
    // P2 selectExpr projection (ref: step_5:87-92,177-185 — the
    // reference's dominant projection style).
    QueryDef(
      "q17_selectexpr",
      "selectExpr SQL-fragment projection: expressions, aliases, casts in one call (the reference's dim-builder projection idiom)",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  CAST(p_size * 10 AS BIGINT) AS size_deci,
        |  concat(p_brand, ':', p_type) AS brand_type
        |FROM part""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).selectExpr(
        "p_partkey",
        "upper(p_brand) AS brand_uc",
        "CAST(p_size * 10 AS BIGINT) AS size_deci",
        "concat(p_brand, ':', p_type) AS brand_type")
    },

    // ------------------------------------------------------------------
    // S12 at scale: dense surrogate keys over a non-tiny table with NO
    // single-partition window (round-1/2 verdict's one perf-weak item).
    // The oracle is the semantic spec: row_number over the total order.
    QueryDef(
      "q18_distributed_keys",
      "dense append-safe surrogate keys via range-partition + monotonically_increasing_id decode + per-partition offsets — no WindowExec, no single-partition sort",
      """SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS order_sk,
        |  o_orderkey, o_custkey FROM orders""".stripMargin) { (s, dir) =>
      SurrogateKeys.dense(
        Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        Seq(col("o_orderkey")), "order_sk")
        .select(col("order_sk").cast(LongType).as("order_sk"),
          col("o_orderkey"), col("o_custkey"))
    })
}
