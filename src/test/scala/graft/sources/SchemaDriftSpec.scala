package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.SparkSpec

/** Regression guard against harness-testdata schema drift.
  *
  * Round 10 proved the driver can regenerate `/root/testdata` under the
  * repo's feet: `events.ts` flipped from TIMESTAMP(NANOS) (a nano-count
  * long under `nanosAsLong`) to untagged µs (TIMESTAMP_NTZ in Spark 4),
  * and every consumer that crossed into JVM objects —
  * `Row.getTimestamp`, the `Ev`/`SessionRow` encoders — died with a
  * ClassCastException that surfaced only in the driver's bench tail.
  * This spec makes the next drift fail here, in `sbt test`, instead:
  * it pins the column inventory of every harness table, the canonical
  * post-normalization event schema, the three-encoding totality of
  * [[Tables.normalizeEventTs]], and the typed-encoder path that was the
  * round-10 crash site.
  */
class SchemaDriftSpec extends SparkSpec {

  test("every harness table loads with its expected column inventory") {
    val expected = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    Tables.all.foreach { t =>
      val cols = Tables.load(spark, sfDir, t).columns.toSeq
      assert(cols == expected(t), s"table $t drifted: got $cols")
    }
  }

  test("events.ts normalizes to ms-truncated TimestampType whatever the file carries") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"canonical events ts must be TimestampType, got ${ev.schema("ts").dataType}")
    // ms truncation: no sub-millisecond residue survives normalization
    val subMs = ev.select((unix_micros(col("ts")) % 1000).as("r"))
      .filter(col("r") =!= 0).count()
    assert(subMs == 0, s"$subMs rows carry sub-ms precision after normalization")
  }

  test("normalizeEventTs is total over all three observed ts encodings") {
    // one instant with sub-ms residue, so truncation is exercised too
    val ns = 1700000000123456789L
    val base = spark.range(3).select((col("id") * 3600L * 1000000000L + ns).as("ns"))
    val asLong = base.select(col("ns").as("ts"))
    val asLtz = base.select(timestamp_micros(expr("ns div 1000")).as("ts"))
    val asNtz = asLtz.select(col("ts").cast("timestamp_ntz").as("ts"))
    assert(asLong.schema("ts").dataType == LongType)
    assert(asNtz.schema("ts").dataType.typeName == "timestamp_ntz")

    val outs = Seq(asLong, asLtz, asNtz).map(Tables.normalizeEventTs)
    outs.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType,
        s"normalizeEventTs must emit TimestampType, got ${df.schema("ts").dataType}")
    }
    val collected = outs.map(_.select(unix_micros(col("ts"))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
    assert(collected.distinct.size == 1,
      s"encodings disagree after normalization: $collected")
    assert(collected.head.head == 1700000000123000L, // µs, ms-truncated
      s"ms truncation drifted: ${collected.head.head}")
  }

  test("driver contract: SparkEntry.entry returns rows and every query has an oracle or rows-only note") {
    assert(graft.SparkEntry.entry(spark).count() > 0,
      "the driver's smoke check (entry rows > 0) would fail")
    // every declared query name resolves; oracle keys are a subset of them
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("typed encoder path over normalized events works (round-10 crash site)") {
    import spark.implicits._
    // the exact shape q36 feeds flatMapGroupsWithState: a java.sql.Timestamp
    // case-class field encoded from the normalized ts column
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("millisecond", col("ts")).as("ts"),
        col("event_type"))
      .as[graft.streaming.Ev]
      .head(3)
    assert(evs.nonEmpty && evs.forall(_.ts != null))
    // and the driver-side Row access writeSentinel used to do
    val m = Tables.events(spark, sfDir).agg(max(col("ts"))).first().getTimestamp(0)
    assert(m != null)
  }
}
