package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Table-maintenance operations a 100-TB lakehouse runs continuously:
  * small-file compaction and change-data-capture snapshot diffing.
  * Beyond-reference surface (the reference's Snowflake warehouse gets
  * both from the platform; a Spark-native engine must provide them).
  *
  * Both are oracle-checked like every other operator: compaction's
  * oracle proves the rewrite is content-preserving (the whole point of
  * a compactor), CDC's oracle is the same full-outer classification in
  * SQL.
  */
object MaintenanceQueries {

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Small-file compaction: streaming ingest and per-partition writers
    // leave thousands of KB-sized files; reading them costs a task per
    // file and floods the driver with footer metadata. The compactor
    // rewrites a fragmented table into few large range-partitioned,
    // sorted files — repartitionByRange gives globally disjoint
    // l_orderkey ranges per file, sortWithinPartitions makes each file's
    // min/max footer stats tight, so post-compaction scans both schedule
    // fewer tasks AND prune by range predicate (MaintenanceSpec proves
    // the file-count and pruning claims). The oracle is the original
    // table: a compactor that changes content is corrupt, full stop.
    QueryDef(
      "q89_compaction",
      "small-file compaction: 64 fragmented files rewritten as 4 range-partitioned files sorted on l_orderkey; oracle = original content (rewrite is content-preserving)",
      """SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
        |  l_quantity, l_extendedprice
        |FROM lineitem""".stripMargin) { (s, dir) =>
      // fixed per-JVM path + overwrite mode: repeated invocations (the
      // bench runs every query k times) reuse the same disk footprint
      // instead of leaking a fresh temp copy per run; the fragmented
      // intermediate is deleted as soon as the compacted copy is written
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_q89_compaction").toString
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      Tables.lineitem(s, dir).select(cols.map(col): _*)
        .repartition(64) // simulate the fragmented state
        .write.mode("overwrite").parquet(s"$tmp/fragmented")
      s.read.parquet(s"$tmp/fragmented")
        .repartitionByRange(4, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(s"$tmp/compacted")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$tmp/fragmented"))
      s.read.parquet(s"$tmp/compacted")
    },

    // ------------------------------------------------------------------
    // CDC snapshot diff: classify every key of two table snapshots as
    // inserted / updated / deleted by one co-partitioned full-outer
    // join (both sides shuffle on the key once; at 100 TB this is the
    // standard incremental-ingest primitive feeding MERGE q70 and the
    // incremental MV q80). The "next" snapshot is derived from orders
    // deterministically: keys %17==0 deleted, %13==0 restatused to 'X',
    // %23==0 re-inserted under a fresh key (-k-1: strictly negative,
    // so it never collides with an existing key, including 0). Unchanged
    // rows are dropped before anything downstream sees them — the
    // delta, not the snapshot, is what flows on.
    QueryDef(
      "q92_cdc_diff",
      "CDC snapshot diff: full-outer join of two snapshots classifying keys as I/U/D with old/new status ('-' when absent), unchanged rows dropped — the incremental-ingest delta primitive",
      """WITH prev AS (SELECT o_orderkey AS k, o_orderstatus AS st FROM orders),
        |curr AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS st
        |  FROM orders WHERE o_orderkey % 17 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1 AS k, o_orderstatus AS st
        |  FROM orders WHERE o_orderkey % 23 = 0)
        |SELECT CAST(coalesce(prev.k, curr.k) AS BIGINT) AS o_orderkey,
        |  CASE WHEN curr.k IS NULL THEN 'D'
        |       WHEN prev.k IS NULL THEN 'I'
        |       ELSE 'U' END AS op,
        |  coalesce(prev.st, '-') AS old_status, coalesce(curr.st, '-') AS new_status
        |FROM prev FULL OUTER JOIN curr ON prev.k = curr.k
        |WHERE curr.k IS NULL OR prev.k IS NULL OR prev.st <> curr.st""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val prev = o.select(col("o_orderkey").as("pk"), col("o_orderstatus").as("pst"))
      val curr = o.filter(col("o_orderkey") % 17 =!= 0)
        .select(col("o_orderkey").as("ck"),
          when(col("o_orderkey") % 13 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("cst"))
        .unionByName(o.filter(col("o_orderkey") % 23 === 0)
          .select((-col("o_orderkey") - 1).as("ck"), col("o_orderstatus").as("cst")))
      prev.join(curr, col("pk") === col("ck"), "full_outer")
        .filter(col("ck").isNull || col("pk").isNull || col("pst") =!= col("cst"))
        .select(coalesce(col("pk"), col("ck")).as("o_orderkey"),
          when(col("ck").isNull, "D")
            .when(col("pk").isNull, "I")
            .otherwise("U").as("op"),
          coalesce(col("pst"), lit("-")).as("old_status"),
          coalesce(col("cst"), lit("-")).as("new_status"))
    })
}
