package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ingest.SourceLoader
import graft.sources.Tables

/** Puts the file-format readers (SURVEY §2.1 S3/S5/S6) under the DuckDB
  * gate. The star testdata is parquet-only, so the medallion readers were
  * previously verified only by `sbt test` goldens over the reference's
  * files; this query closes the gap by ROUND-TRIPPING a star table
  * through both text formats with the exact SourceLoader option set and
  * oracle-comparing against the parquet original:
  *
  *   - CSV (ref IN shape, step_3_load_from_stage_to_source.py:24-55):
  *     header, quote-escaped MULTILINE records — every staged name gets
  *     an embedded newline so each record really spans two physical
  *     lines — plus an injected corrupt file whose rows must be caught
  *     by the PERMISSIVE corrupt-record column and skipped
  *     (ON_ERROR=CONTINUE, ref step_3:51);
  *   - JSON (ref FR shape, step_3:88-109): outer-ARRAY documents (not
  *     JSON lines) with string-typed numerics, multiLine read +
  *     try_cast back to the typed schema.
  *
  * A reader defect anywhere — quoting, newline handling, null slip,
  * numeric round-trip, array framing — breaks the exact hash compare.
  */
object IngestQueries {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q53_file_roundtrip",
      "stage customer to quoted-multiline CSV (+ a corrupt file that must be skipped) and outer-array JSON with string-typed numerics, read both back through the SourceLoader option set; oracle is the parquet original stated once per format",
      """WITH staged AS (SELECT c_custkey,
        |    c_name || chr(10) || 'LINE2' AS c_name,
        |    c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer)
        |SELECT 'csv' AS src, * FROM staged
        |UNION ALL
        |SELECT 'json' AS src, * FROM staged""".stripMargin) { (s, dir) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_roundtrip").toString
      val cust = Tables.customer(s, dir)
      // every record spans two physical lines once written
      val staged = cust.withColumn("c_name",
        concat(col("c_name"), lit("\nLINE2")))
      val cols = staged.schema.fieldNames.map(col)

      // ---- CSV leg (IN shape) -------------------------------------
      staged.coalesce(2).write.mode("overwrite")
        .option("header", true).option("quote", "\"").option("escape", "\"")
        .csv(s"$tmp/csv")
      // corrupt rows: unparseable key + quoted embedded newline; the
      // PERMISSIVE read must land these in the corrupt column, not fail
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "csv", "zz_corrupt.csv"),
        "c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment\n" +
          "oops,\"Bad\nRow\",notanint,notadouble,m\n" +
          "alsobad,n,1,2.0,m\n")
      val csvBack = s.read
        .option("header", true)
        .option("multiLine", true)
        .option("quote", "\"")
        .option("escape", "\"")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", SourceLoader.CorruptCol)
        .schema(StructType(staged.schema.fields :+
          StructField(SourceLoader.CorruptCol, StringType)))
        .csv(s"$tmp/csv")
        .filter(col(SourceLoader.CorruptCol).isNull)
        .select(cols: _*)

      // ---- JSON leg (FR shape) ------------------------------------
      // string-typed numerics, then per-partition outer-ARRAY documents
      // (Spark writes JSON lines natively; the reference's feed is an
      // array per file, which is what multiLine=true parses)
      import s.implicits._
      staged
        .withColumn("c_custkey", col("c_custkey").cast("string"))
        .withColumn("c_nationkey", col("c_nationkey").cast("string"))
        .withColumn("c_acctbal", col("c_acctbal").cast("string"))
        .toJSON
        .mapPartitions(it => Iterator.single(it.mkString("[", ",", "]")))
        .write.mode("overwrite").text(s"$tmp/json")
      val jsonBack = s.read
        .option("multiLine", true)
        .option("mode", "PERMISSIVE")
        .json(s"$tmp/json")
        .select(
          col("c_custkey").try_cast("long").as("c_custkey"),
          col("c_name"),
          col("c_nationkey").try_cast("int").as("c_nationkey"),
          col("c_acctbal").try_cast("double").as("c_acctbal"),
          col("c_mktsegment"))

      csvBack.withColumn("src", lit("csv"))
        .unionByName(jsonBack.withColumn("src", lit("json")))
        .select(col("src") +: cols: _*)
    })
}
