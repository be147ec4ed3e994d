package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish star schema plus the
  * LLM-data-pipeline tables (`documents`, `embeddings`, `events`).
  *
  * Each table is a single parquet file under `dir` (see TESTDATA.md).
  * Reads are plain `spark.read.parquet` so Catalyst gets full pushdown:
  * filters and column pruning reach the scan (`PushedFilters` /
  * `ReadSchema` in `.explain`), and at cluster scale the same call on a
  * directory of many files gives split-level parallelism for free.
  */
object Tables {
  val starSchema: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val dataOps: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = starSchema ++ dataOps

  /** Per-(session, path) memo of the RESOLVED base-table DataFrame —
    * driver-side plan-construction work only (file listing + footer
    * schema inference + relation resolution), never data: every action
    * on the returned frame still scans the parquet from disk. The
    * round-21 PlanCost audit put ~0.1 s of per-query bench wall in
    * exactly this resolution (repeated for every `spark.read.parquet`
    * of the same static file), the largest uniform slice of the
    * 94-query small-query bucket (guide §5: the driver should do
    * almost no work; §7.3: resolution/listing is single-threaded
    * driver time). Keyed WEAKLY on the session (foreachBatch clones
    * sessions per micro-batch — strong keys would pin them) and on
    * (path, root length+mtime): a REGENERATED corpus at the same path
    * (the BandIndex/SemIndex/DurableArtifacts regen flows: overwrite
    * rewrites the table dir, bumping its mtime) mints a new key
    * instead of serving the stale file listing. The one root
    * getFileStatus per call is the same driver-side metadata read
    * DurableIndex.fingerprint makes, microseconds against the ~100 ms
    * resolution it saves. Contract: corpora are flat single-file-or-
    * flat-dir tables (a nested-partition in-place overwrite that
    * leaves the root mtime untouched is not a supported flow). */
  private val resolved =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val ver =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p)
        s"${st.getLen}:${st.getModificationTime}"
      } catch { case _: java.io.IOException => "absent" }
    val per = resolved.synchronized {
      var m = resolved.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        resolved.put(spark, m)
      }
      m
    }
    per.computeIfAbsent(s"$path@$ver", _ => spark.read.parquet(path))
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader
    * normalizes the nano count to an ms-truncated TimestampType — the
    * highest precision the DuckDB oracle and Spark can agree on
    * bit-for-bit (DuckDB keeps ns, Spark µs). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))

  /** Shared by the batch loader and the streaming reader (which must
    * declare the RAW schema, then normalize). The harness has shipped
    * `events.ts` in three encodings across rounds — TIMESTAMP(NANOS)
    * surfacing as a nano-count long under `nanosAsLong`, untagged µs
    * surfacing as TIMESTAMP_NTZ, and plain TimestampType — so this
    * canonicalizes ALL of them to ONE shape: ms-truncated
    * TimestampType. The session TZ is pinned UTC everywhere, so the
    * NTZ wall clock and the instant coincide and the cast is lossless.
    * Every downstream consumer — Catalyst plans, typed encoders
    * (`Ev`/`SessionRow` declare `java.sql.Timestamp`), driver-side
    * `Row.getTimestamp` — relies on this invariant; keep it total over
    * any encoding the data may drift to next. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    val canonical = raw.schema("ts").dataType match {
      case LongType => timestamp_millis(expr("ts div 1000000"))
      case TimestampNTZType =>
        date_trunc("millisecond", col("ts").cast(TimestampType))
      case _ => date_trunc("millisecond", col("ts"))
    }
    raw.withColumn("ts", canonical)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
