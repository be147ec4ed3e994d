package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.keys.SurrogateKeys
import graft.sources.Tables

/** The medallion pipeline's composed stage shapes declared over the star
  * testdata so the driver's DuckDB gate checks them (the full pipeline
  * over the reference's own files is exercised by MedallionSpec —
  * these queries prove the same composed operator chains hash-exactly).
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Curate-stage composition (ref: step_4:94-169): filter -> literal
    // enrichment -> broadcast rate join -> rank-dedup newest-wins ->
    // converted-amount projection. One declared chain, not isolated ops.
    QueryDef(
      "q31_curate_compose",
      "composed curation: status filter |> lit enrich |> broadcast daily-rate left join |> rank-dedup (latest order per customer) |> currency-conversion projection",
      """WITH rates AS (SELECT DISTINCT o_orderdate AS rate_dt,
        |    1.0 + day(o_orderdate) / 100.0 AS rate FROM orders),
        |filtered AS (SELECT *, 'AMER' AS region FROM orders WHERE o_orderstatus = 'F'),
        |joined AS (SELECT f.*, r.rate FROM filtered f
        |  LEFT JOIN rates r ON f.o_orderdate = r.rate_dt),
        |ranked AS (SELECT *, rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk FROM joined)
        |SELECT o_orderkey, o_custkey, region, o_totalprice, rate,
        |  o_totalprice / rate AS usd_price
        |FROM ranked WHERE rk = 1""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val rates = o.select(col("o_orderdate").as("rate_dt"),
          (lit(1.0) + dayofmonth(col("o_orderdate")) / 100.0).as("rate"))
        .distinct()
      val filtered = o.filter(col("o_orderstatus") === "F")
        .withColumn("region", lit("AMER"))
      val joined = filtered.join(broadcast(rates),
        filtered("o_orderdate") === rates("rate_dt"), "left")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      joined.withColumn("rk", rank().over(w)).filter(col("rk") === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("region"),
          col("o_totalprice"), col("rate"),
          (col("o_totalprice") / col("rate")).as("usd_price"))
    },

    // ------------------------------------------------------------------
    // Dim-builder composition (ref: step_5:72-114): distinct natural keys
    // -> anti-join against the existing dim -> dense keys continuing the
    // existing sequence -> isActive literal.
    QueryDef(
      "q32_dim_delta_compose",
      "composed incremental dim build: groupBy-distinct candidates |> left-anti delta vs existing |> offset-continued dense surrogate keys |> isActive flag",
      """WITH cand AS (SELECT DISTINCT c_mktsegment, c_nationkey FROM customer),
        |existing AS (SELECT * FROM cand WHERE c_nationkey < 12),
        |delta AS (SELECT c.* FROM cand c LEFT JOIN existing e
        |  ON c.c_mktsegment = e.c_mktsegment AND c.c_nationkey = e.c_nationkey
        |  WHERE e.c_mktsegment IS NULL)
        |SELECT CAST((SELECT count(*) FROM existing)
        |    + row_number() OVER (ORDER BY c_mktsegment, c_nationkey) AS BIGINT) AS dim_pk,
        |  c_mktsegment, c_nationkey, 'Y' AS is_active
        |FROM delta""".stripMargin) { (s, dir) =>
      val cand = Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"), col("c_nationkey")).count().drop("count")
      val existing = cand.filter(col("c_nationkey") < 12)
      val delta = cand.join(broadcast(existing),
        Seq("c_mktsegment", "c_nationkey"), "left_anti")
      val offset = existing.count()
      SurrogateKeys
        .dense(delta, Seq(col("c_mktsegment"), col("c_nationkey")), "dim_pk", offset)
        .select(col("dim_pk"), col("c_mktsegment"), col("c_nationkey"),
          lit("Y").as("is_active"))
    },

    // ------------------------------------------------------------------
    // Catalog + sink round-trip (ref: S8/S9/S10 — save_as_table append
    // with count guard, step_4:167-169, step_5:51-67,585-587): write a
    // managed table, conditionally append a delta, read it back through
    // the catalog. The oracle states the equivalent direct query.
    QueryDef(
      "q33_table_roundtrip",
      "managed parquet table round-trip: overwrite base |> conditional append delta (isEmpty guard) |> catalog read-back aggregate",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus IN ('P', 'F')
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      // per-JVM scratch db (JvmScratch) — also clears a previous run's
      // orphaned physical dir so CREATE never hits LOCATION_ALREADY_EXISTS
      val table = JvmScratch.resetTable(s, "roundtrip_orders")
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "P")
        .write.format("parquet").mode("overwrite")
        .saveAsTable(table)
      val delta = o.filter(col("o_orderstatus") === "F")
      if (!delta.isEmpty) // the reference's count()>0 guard, done lazily
        delta.write.format("parquet").mode("append")
          .saveAsTable(table)
      s.table(table)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    },

    // ------------------------------------------------------------------
    // Session-context smoke probe (ref: step_1_check_connection.py:46-49
    // queries current_role/database/schema/warehouse before touching
    // data; SURVEY §2.8). Spark has catalog + database natively; role
    // and warehouse have no Spark analog, so per SURVEY they are config
    // strings with declared defaults. Constant single-row output — the
    // oracle states the same literals; the probe's value is that a
    // misconfigured session (non-default catalog/database) fails the
    // gate before any data-path query runs, exactly the reference's
    // connection-check intent.
    QueryDef(
      "q102_session_context",
      "session-context probe: current_catalog()/current_database() + role/warehouse config-string stand-ins (step_1 connection-check parity, SURVEY §2.8)",
      """SELECT 'spark_catalog' AS catalog_name, 'default' AS database_name,
        |  'data_engineer' AS role_name, 'graft_wh' AS warehouse_name""".stripMargin) { (s, _) =>
      s.sql("SELECT current_catalog() AS catalog_name, current_database() AS database_name")
        .withColumn("role_name",
          lit(s.conf.get("spark.graft.role", "data_engineer")))
        .withColumn("warehouse_name",
          lit(s.conf.get("spark.graft.warehouse", "graft_wh")))
    })
}
