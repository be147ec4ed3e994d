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
