package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-scale test-data generator: writes an N-times-larger copy of a
  * test SF directory by unioning N key-shifted replicas of each table,
  * preserving the star schema's referential integrity (each replica's
  * foreign keys shift together) and the distributional shape the
  * queries depend on.
  *
  * Key offsets are powers of 10, so `key % 10`-style slicing predicates
  * (the q87 split buckets, q93's arriving-batch stand-in) keep exactly
  * the same per-replica selectivity. Document text is vowel-remapped
  * per replica (a 1:1 char translate: token counts and char lengths are
  * preserved, planted near-dup pairs stay near-dups WITHIN a replica)
  * so replicas don't read as verbatim duplicates of each other and the
  * shingle-based dedup queries keep sf-proportional candidate volumes.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir] [outDir] [copies]
  * Default: /root/testdata/sf0.1 -> /tmp/graft_sf1 x10 (i.e. sf1).
  */
object ScaleGen {

  /** Smallest power of 10 strictly above the column's max value. The
    * cast-to-long absorbs int-typed key columns in arbitrary source
    * dirs; an empty (or all-null) table is a clear error, not an NPE. */
  private def cap(df: DataFrame, c: String): Long = {
    val row = df.agg(max(col(c).cast("long"))).first()
    require(!row.isNullAt(0), s"cap($c): source table is empty or all-null")
    val mx = row.getLong(0)
    var p = 10L
    while (p <= mx) p *= 10
    p
  }

  /** Per-replica 1:1 vowel->digit remap; replica 0 is the original.
    * The (vowel pair, digit pair) combination is injective in i for up
    * to 500 replicas: the vowel pair cycles with period 5, and within a
    * residue class the digit pair ((i-1)/5, (i-1)/50) takes a distinct
    * value per replica — so no two replicas ever get the identical
    * mapping (which would produce verbatim-duplicate text and inflate
    * shingle-dedup candidate volume). */
  private def remapText(textCol: String, i: Int) = {
    val from = Seq("ae", "ei", "io", "ou", "ua")((i - 1) % 5)
    val to = s"${((i - 1) / 5) % 10}${((i - 1) / 50) % 10}"
    translate(col(textCol), from, to)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    require(copies >= 1 && copies <= 500,
      s"copies=$copies outside [1,500] — remapText injectivity holds to 500")
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed-size dims replicate as-is (TPC-H keeps them constant per SF)
    write("region", t("region"))
    write("nation", t("nation"))

    val custCap = cap(t("customer"), "c_custkey")
    val suppCap = cap(t("supplier"), "s_suppkey")
    val partCap = cap(t("part"), "p_partkey")
    val orderCap = cap(t("orders"), "o_orderkey")
    val docCap = cap(t("documents"), "doc_id")
    val userCap = cap(t("events"), "user_id")
    val eventCap = cap(t("events"), "event_id")

    def replicate(name: String, shifts: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = t(name)
      val scaled = (0 until copies).map { i =>
        val shifted = shifts.foldLeft(base) { case (df, (c, capV)) =>
          df.withColumn(c, col(c) + lit(capV * i))
        }
        extra(shifted, i)
      }.reduce(_ unionByName _)
      write(name, scaled)
    }

    replicate("customer", Map("c_custkey" -> custCap))
    replicate("supplier", Map("s_suppkey" -> suppCap))
    replicate("part", Map("p_partkey" -> partCap))
    replicate("orders", Map("o_orderkey" -> orderCap, "o_custkey" -> custCap))
    replicate("lineitem", Map("l_orderkey" -> orderCap,
      "l_partkey" -> partCap, "l_suppkey" -> suppCap))
    // events.ts has shipped in three encodings across harness rounds
    // (nano-count long under nanosAsLong, untagged-µs TIMESTAMP_NTZ,
    // TimestampType — the drift SchemaDriftSpec pins); writing the raw
    // shape back verbatim would either drop the timestamp logical type
    // (BIGINT where the oracles do date_trunc) or propagate NTZ. Route
    // through the same normalizeEventTs every consumer uses: canonical
    // ms-truncated TimestampType, whatever the source carried — every
    // consumer truncates to milliseconds anyway, so no fidelity is lost.
    replicate("events", Map("event_id" -> eventCap, "user_id" -> userCap),
      (df, _) => graft.sources.Tables.normalizeEventTs(df))
    replicate("documents", Map("doc_id" -> docCap),
      (df, i) => if (i == 0) df else df.withColumn("text", remapText("text", i)))
    // embeddings share the documents key space (q29 joins vec_id = doc_id).
    // Per-replica dimension ROTATION: permuting coordinates preserves
    // norms and every intra-replica pairwise cosine exactly (planted
    // near-dup structure intact), but a vector and its rotated twin are
    // no longer parallel — without this, 10 verbatim copies per vector
    // inflate the cosine-near-dup set ~100x per bucket and the sf1 run
    // measures duplicate-blowup, not scale.
    replicate("embeddings", Map("vec_id" -> docCap), (df, i) =>
      if (i == 0) df
      else {
        val d = size(col("embedding"))
        val off = lit(i * 7) % d // mod the dim so any copy count is valid
        df.withColumn("embedding",
          concat(slice(col("embedding"), off + 1, d - off),
            slice(col("embedding"), lit(1), off)))
      })

    spark.stop()
  }
}
