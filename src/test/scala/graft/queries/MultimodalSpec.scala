package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The array-shaped multimodal decode (q30's mapPartitions core). The
  * declared query unrolls the feature vector to scalar f0..f7 columns so
  * the driver's row-sorting compare can judge it; this spec keeps the
  * array<double> variant itself under test. */
class MultimodalSpec extends SparkSpec {

  private def payloads = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
  }

  test("decode emits one row per payload with an 8-wide feature vector in [0,1)") {
    val d = MultimodalQueries.decoded(payloads)
    assert(d.count() == payloads.count())
    assert(d.filter(size(col("features")) =!= 8).count() == 0)
    val bad = d.select(explode(col("features")).as("f"))
      .filter(col("f") < 0.0 || col("f") >= 1.0)
    assert(bad.count() == 0)
    assert(d.filter(col("width") < 16 || col("width") > 31).count() == 0)
    assert(d.filter(col("height") < 16 || col("height") > 31).count() == 0)
  }

  test("decode is deterministic and the declared q30 unrolls it faithfully") {
    val arr = MultimodalQueries.decoded(payloads)
      .select(col("doc_id") +: (0 until 8).map(k =>
        element_at(col("features"), k + 1).as(s"f$k")): _*)
    val q30 = graft.SparkEntry.queries("q30_multimodal_decode")(spark, sfDir)
      .select(col("doc_id") +: (0 until 8).map(k => col(s"f$k")): _*)
    assert(arr.exceptAll(q30).count() == 0)
    assert(q30.exceptAll(arr).count() == 0)
  }
}
