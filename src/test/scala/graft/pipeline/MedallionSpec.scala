package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.SourceLoader
import graft.model.CountryConfig

/** End-to-end golden test of the medallion pipeline over the reference's
  * own sample files (SURVEY.md §5 item 2): layer row counts, lineage,
  * key density, curation semantics, star-schema integrity, and
  * incremental re-run behavior — one pipeline run shared by all
  * assertions (suite is ordered).
  */
class MedallionSpec extends SparkSpec {

  private lazy val report: MedallionJob.RunReport = {
    assume(new java.io.File(refDataDir).isDirectory, "reference data not present")
    MedallionJob.run(spark, refDataDir)
  }

  test("source layer loads the SURVEY §5 golden row counts, zero skipped") {
    val bySrc = report.source.map(r => r.country -> r).toMap
    assert(bySrc("IN").loaded == 1931) // 847 + 1084 CSV records
    assert(bySrc("US").loaded == 1864) // 905 + 959 parquet rows
    assert(bySrc("FR").loaded == 1517) // 882 + 635 JSON objects
    assert(report.source.forall(_.skipped == 0))
  }

  test("multiline CSV really parsed as records: an IN address keeps its embedded newline") {
    val in = spark.table("source.in_sales_order")
    assert(in.filter(col("shipping_address").contains("\n")).count() > 0)
  }

  test("lineage columns populated; sales_order_key dense from 1") {
    for (cc <- CountryConfig.all) {
      val t = spark.table(s"source.${cc.code.toLowerCase}_sales_order")
      assert(t.filter(col("_metadata_file_name").isNull
        || col("_metadata_last_modified").isNull
        || col("_metadata_row_number").isNull).count() == 0)
      val n = t.count()
      val keys = t.agg(min("sales_order_key"), max("sales_order_key"),
        countDistinct("sales_order_key")).first()
      assert(keys.getLong(0) == 1L && keys.getLong(1) == n && keys.getLong(2) == n,
        s"${cc.code}: keys not dense 1..$n: $keys")
    }
  }

  test("FR JSON string-typed numerics land as typed columns") {
    val fr = spark.table("source.fr_sales_order")
    val schema = fr.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("unit_price") == "decimal(10,2)")
    assert(schema("order_quantity") == "long")
    assert(fr.filter(col("unit_price").isNull).count() == 0)
  }

  test("curated layer: Paid+Delivered counts match an independent computation") {
    val c = report.curated.toMap
    assert(c("IN") == 320 && c("US") == 331 && c("FR") == 372)
  }

  test("curation attaches forex and converts to USD for every row") {
    val cur = MedallionJob.unionCurated(spark)
    assert(cur.filter(col("exchange_rate").isNull
      || col("us_total_order_amt").isNull || col("usd_tax_amt").isNull).count() == 0)
    // US rows convert at 1.0: USD amounts equal local amounts
    assert(spark.table("curated.us_sales_order")
      .filter(col("us_total_order_amt") =!=
        col("local_total_order_amt").cast("decimal(23,8)")).count() == 0)
  }

  test("star schema: every fact row resolves all six dimension FKs") {
    val fact = spark.table("consumption.sales_fact")
    assert(fact.count() == 1023) // 320 + 331 + 372
    def orphans(dim: String, pk: String, fk: String): Long =
      fact.join(spark.table(s"consumption.$dim"),
        fact(fk) === col(pk), "left_anti").count()
    assert(orphans("date_dim", "date_id_pk", "date_id_fk") == 0)
    assert(orphans("region_dim", "region_id_pk", "region_id_fk") == 0)
    assert(orphans("customer_dim", "customer_id_pk", "customer_id_fk") == 0)
    assert(orphans("payment_dim", "payment_id_pk", "payment_id_fk") == 0)
    assert(orphans("product_dim", "product_id_pk", "product_id_fk") == 0)
    assert(orphans("promo_code_dim", "promo_code_id_pk", "promo_code_id_fk") == 0)
  }

  test("customer join-key subset cannot fan out: fact count == curated count") {
    // FactBuilder joins customer_dim on (name, country, region), a
    // subset of its 5-col natural key, faithful to step_5:548-550 —
    // sound only while names are unique per (country, region). Guard
    // both the precondition and the consequence.
    report // force the pipeline
    val dim = spark.table("consumption.customer_dim")
    assert(dim.count() ==
      dim.select("customer_name", "country", "region").distinct().count(),
      "customer names no longer unique per (country, region): " +
        "FactBuilder's 3-col join would fan out; switch to the 5-col key")
    assert(spark.table("consumption.sales_fact").count() ==
      MedallionJob.unionCurated(spark).count())
  }

  test("dimension cardinalities: one row per natural key") {
    assert(spark.table("consumption.region_dim").count() == 3)
    assert(spark.table("consumption.date_dim").count() == 3) // 2020-01-01..03
    val prod = spark.table("consumption.product_dim")
    assert(prod.count() == prod.select("mobile_key").distinct().count())
    // product attributes derive from the composite key
    assert(prod.filter(col("brand") =!=
      split(col("mobile_key"), "/").getItem(0)).count() == 0)
  }

  test("date dim fields: pandas dayofweek semantics (Mon=0, weekend=5,6)") {
    val dd = spark.table("consumption.date_dim")
      .filter(col("order_dt") === "2020-01-01").first()
    // 2020-01-01 was a Wednesday
    assert(dd.getAs[Int]("order_dayofweek") == 2)
    assert(dd.getAs[String]("order_dayname") == "Wednesday")
    assert(dd.getAs[String]("order_weekday") == "Weekday")
    assert(dd.getAs[Long]("day_counter") == 1L)
  }

  test("incremental re-run: dims add zero rows, sources continue key sequence") {
    val report2 = MedallionJob.run(spark, refDataDir)
    assert(report2.dims.values.forall(_ == 0L), s"dims grew: ${report2.dims}")
    assert(report2.dateDim == 0L)
    val in = spark.table("source.in_sales_order")
    val n = in.count()
    assert(n == 2 * 1931)
    val keys = in.agg(min("sales_order_key"), max("sales_order_key"),
      countDistinct("sales_order_key")).first()
    assert(keys.getLong(0) == 1L && keys.getLong(1) == n && keys.getLong(2) == n,
      "appended load must continue the dense sequence")
  }
}
