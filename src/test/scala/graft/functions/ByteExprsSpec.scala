package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.functions.CrossEngine
import graft.sources.Tables

/** The native byte-range expressions (ByteExprs) must match the
  * HOF chains they replaced in q38/q68 — those chains are the
  * executable spec, and the unchanged DuckDB oracles mirror them. */
class ByteExprsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("text").cast("binary").as("bin"))

  /** The original q38 HOF chain: ascii(substr) per byte, end-clamped. */
  private def hofFold(from: org.apache.spark.sql.Column,
      len: Long, mult: Long, mod: Long) =
    aggregate(
      transform(
        sequence(from, least(from + (len - 1),
          octet_length(col("bin")).cast(LongType))),
        i => ascii(col("text").substr(i.cast("int"), lit(1))).cast(LongType)),
      lit(0L), (acc, b) => (acc * mult + b) % mod)

  test("graft_bytefold matches the HOF rolling hash incl. end-clamped tails") {
    // frame starts every 64 bytes -> the last frame per doc is a
    // partial window, exercising the clamp
    val frames = docs
      .select(col("doc_id"), col("text"), col("bin"),
        explode(sequence(lit(0L),
          ceil(octet_length(col("bin")) / 64.0).cast(LongType) - 1)).as("f"))
      .select(
        CrossEngine.byteFold(col("bin"), lit(1L) + col("f") * 64, lit(64L),
          131L, 1000003L).as("nat"),
        hofFold(lit(1L) + col("f") * 64, 64L, 131L, 1000003L).as("hof"))
    assert(frames.filter(not(col("nat") <=> col("hof"))).count() == 0)
    assert(frames.count() > 0)
  }

  test("graft_bytefold with mult=1 and huge mod is the plain byte sum") {
    val d = docs.filter(octet_length(col("bin")) >= 96)
      .select(
        CrossEngine.byteFold(col("bin"), lit(1L), lit(96L),
          1L, Long.MaxValue).as("nat"),
        aggregate(
          transform(sequence(lit(1L), lit(96L)),
            i => ascii(col("text").substr(i.cast("int"), lit(1))).cast(LongType)),
          lit(0L), (acc, b) => acc + b).as("hof"))
    assert(d.filter(not(col("nat") <=> col("hof"))).count() == 0)
  }

  test("graft_bytemax matches array_max over the window; empty range is null") {
    val d = docs.filter(octet_length(col("bin")) >= 96)
      .select(
        CrossEngine.byteMax(col("bin"), lit(49L), lit(96L)).as("nat"),
        array_max(transform(
          sequence(lit(49L), least(lit(144L),
            octet_length(col("bin")).cast(LongType))),
          i => ascii(col("text").substr(i.cast("int"), lit(1))).cast(LongType)))
          .as("hof"))
    assert(d.filter(not(col("nat") <=> col("hof"))).count() == 0)
    // start past the end -> empty range -> null
    val empty = docs.select(CrossEngine.byteMax(col("bin"),
      octet_length(col("bin")).cast(LongType) + 1, lit(10L)).as("m"))
    assert(empty.filter(col("m").isNotNull).count() == 0)
  }

  test("byte expressions resolve in raw SQL via GraftExtensions") {
    docs.limit(5).createOrReplaceTempView("byte_docs")
    val r = spark.sql(
      """SELECT graft_bytefold(bin, 1L, 64L, 131L, 1000003L) AS h,
        |  graft_bytemax(bin, 1L, 64L) AS m FROM byte_docs""".stripMargin)
      .collect()
    assert(r.length == 5 && r.forall(row => !row.isNullAt(0) && !row.isNullAt(1)))
  }
}
