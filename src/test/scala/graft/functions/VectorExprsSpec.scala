package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CrossEngine
import graft.sources.Tables

/** The native codegen'd vector expressions must be BIT-identical to the
  * higher-order-function folds they replace — the folds are the
  * executable spec (and what the DuckDB oracle mirrors), so any
  * divergence would silently break every similarity query's oracle. */
class VectorExprsSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("graft_dot is bit-identical to the HOF fold over real embeddings") {
    val a = vecs.select(col("vec_id"), col("v"))
    val b = vecs.select(col("vec_id").as("wid"), col("v").as("w"))
    val pairs = a.join(b, col("vec_id") % 17 === col("wid") % 17)
    val diff = pairs.select(
        CrossEngine.dotFold(col("v"), col("w")).as("nat"),
        CrossEngine.dotFoldHof(col("v"), col("w")).as("hof"))
      // exactness: IEEE value equality AND the value-exact Double
      // string round-trip (catches a sign-bit or ulp divergence)
      .filter(expr("NOT (nat <=> hof AND cast(nat AS STRING) = cast(hof AS STRING))"))
    assert(diff.count() == 0)
  }

  test("graft_sqdist is bit-identical to the HOF fold") {
    val a = vecs.limit(100)
    val pairs = a.crossJoin(a.select(col("v").as("w")).limit(50))
    val diff = pairs.select(
        CrossEngine.sqDistFold(col("v"), col("w")).as("nat"),
        CrossEngine.sqDistFoldHof(col("v"), col("w")).as("hof"))
      .filter(expr("NOT (nat <=> hof AND cast(nat AS STRING) = cast(hof AS STRING))"))
    assert(diff.count() == 0)
  }

  test("null and length-mismatch contracts match zip_with semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0)),
      (2L, Array(1.0), Array(3.0, 4.0)) // mismatched lengths
    ).toDF("id", "a", "b")
    val r = df.select(col("id"), CrossEngine.dotFold(col("a"), col("b")).as("d"))
      .collect().map(row => row.getLong(0) -> (if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    assert(r(1L) == 11.0)
    assert(r(2L) == null)
    // null array -> null
    val n = df.select(CrossEngine.dotFold(lit(null).cast("array<double>"), col("b")).as("d"))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("graft_dot resolves in raw SQL through the extension registration") {
    vecs.createOrReplaceTempView("ve")
    val r = spark.sql(
      "SELECT max(graft_dot(v, v)) AS m FROM ve").collect()(0).getDouble(0)
    assert(r > 0.0)
  }
}
