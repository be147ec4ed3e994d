package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Shared shingle stage + MinHash tuning constants — the base every dedup family builds on.
  *
  * Pure round-16 refactor: split out of the 3,300-line DedupQueries.scala
  * verbatim (self-typed to the object so cross-family references keep
  * resolving; `private` widened to `private[queries]` — traits cannot
  * share plain-private members — and derived vals made lazy so trait
  * initialization order can never observe an unset field). */
trait DedupCore { self: DedupQueries.type =>
  private[queries] val ShingleN = 3
  private[queries] val NumPerms = 12 // 6 bands x 2 rows
  private[queries] val Bands = 6
  private[queries] lazy val RowsPerBand = NumPerms / Bands
  private[queries] val JaccardThreshold = "0.8"
  private[queries] val DfCut = 50 // inverted-index document-frequency cut

  /** Delta/R-bounded staging that must SURVIVE memory pressure: the
    * round-17 scale gate found q142@sf10's fate at the default 8 GiB
    * heap decided by whether its staged shingle relations fit
    * DESERIALIZED — a skew-sized delta stages millions of
    * (doc_id, sg-string) rows, and the default MEMORY_AND_DISK level
    * kept tipping the executors into an eviction storm (plain task
    * OOMs, and kryo re-serialization crashes on the way down).
    * MEMORY_AND_DISK_SER stores the blocks serialized: 3-5x smaller
    * for string-heavy rows, and eviction writes bytes instead of
    * re-serializing under pressure.
    *
    * DATA-ADAPTIVE like [[DedupStreaming.textStreamWidth]]: the level
    * flips to serialized once the corpus passes [[StageSerMinBytes]] —
    * a measured trade, not a blanket one: at sf0.1 the serde costs
    * q142 ~+1.5s (+30% — stagings are consumed by several branches,
    * each re-deserializing), while at sf10 the deserialized level is
    * the difference between finishing in ~175s and an eviction-storm
    * OOM (3/3 vs ~50/50 at the default 8 GiB heap). At 100 TB the
    * staged "delta" is a day's crawl and must never be the thing that
    * OOMs the job. */
  private[queries] def stageSer(s: SparkSession, dir: String,
      df: DataFrame): DataFrame =
    if (corpusBytes(s, dir) >= StageSerMinBytes)
      df.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else df.localCheckpoint()

  /** documents.parquet size past which shingle-scale stagings store
    * serialized (sf0.1 ~0.6 MB stays deserialized; sf10 ~60 MB flips). */
  private[queries] val StageSerMinBytes: Long = 16L << 20

  private val corpusBytesCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  /** documents.parquet content length, memoized per (dir, mtime) — the
    * mtime key means a corpus REGENERATED at the same path in-session
    * (ScaleGen in specs) gets a fresh size instead of a stale staging
    * level; the per-call cost is one cheap getFileStatus, and the memo
    * keeps the recursive content summary to one call per generation. */
  private[queries] def corpusBytes(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir, "documents.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val mtime =
      try fs.getFileStatus(p).getModificationTime catch {
        case _: java.io.FileNotFoundException => return 0L
      }
    corpusBytesCache.computeIfAbsent((dir, mtime), { _ =>
      java.lang.Long.valueOf(fs.getContentSummary(p).getLength)
    })
  }

  /** (doc_id, sg): distinct word-3-gram shingles per document. */
  private[queries] def shingle(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= ShingleN)
      .select(col("doc_id"), explode(shinglesOf(col("t"), ShingleN)).as("sg"))
      .distinct()

  private[queries] def shingleDf(s: SparkSession, dir: String): DataFrame =
    shingle(Tables.documents(s, dir))

  /** The shingle CTE restricted to `docWhere` (empty = full corpus) —
    * parameterized so the retraction oracle (q143) can state the same
    * pipeline over corpus-minus-deleted. */
  private[queries] def sqlShingleCteFor(docWhere: String): String = {
    val pred = if (docWhere.isEmpty) "" else s" AND $docWhere"
    s"""toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents
       |         WHERE len(string_split(text, ' ')) >= $ShingleN$pred),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest(${sqlShingles("t", ShingleN)}) AS sg FROM toks)""".stripMargin
  }

  private[queries] lazy val sqlShingleCte = sqlShingleCteFor("")
}
