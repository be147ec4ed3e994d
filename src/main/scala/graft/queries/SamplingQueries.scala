package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Deterministic corpus sampling — the training-data curation ops a
  * 100 TB pipeline runs constantly (hold-out carving, per-language
  * balancing) made REPRODUCIBLE: instead of `rand()` (non-deterministic
  * across runs/engines, unusable under an exactness gate and a re-run
  * audit), rank rows by a salted content hash. Hash uniformity makes the
  * sample statistically uniform; the hash makes it a pure function of
  * the data — same sample on every engine, every run, every cluster
  * size. Changing the salt string draws an independent sample.
  */
object SamplingQueries {

  private val UniformK = 50
  private val PerStratumK = 10
  private val Salt = "graft-sample-1"

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q55_deterministic_sample",
      s"hash-ranked sampling: uniform top-$UniformK over the whole corpus (TakeOrderedAndProject, no global sort) UNION per-language stratified top-$PerStratumK (one shuffle on lang); salted md5 rank makes both reproducible",
      s"""WITH h AS (SELECT doc_id, lang,
         |    ${sqlMd5Hash48(s"'$Salt:' || doc_id::VARCHAR")} AS hk
         |  FROM documents),
         |uni AS (SELECT doc_id, lang FROM h
         |        ORDER BY hk, doc_id LIMIT $UniformK),
         |strat AS (SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang,
         |      row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
         |    FROM h) WHERE rn <= $PerStratumK)
         |SELECT 'uniform' AS sample_kind, doc_id, lang FROM uni
         |UNION ALL
         |SELECT 'stratified' AS sample_kind, doc_id, lang FROM strat""".stripMargin) { (s, dir) =>
      val h = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        md5Hash48(concat(lit(s"$Salt:"), col("doc_id").cast("string"))).as("hk"))
      // top-k by hash rank: compiles to TakeOrderedAndProject — each
      // partition keeps k rows, the driver merges k*partitions, never a
      // global sort
      val uniform = h.orderBy(col("hk"), col("doc_id"))
        .limit(UniformK)
        .select(lit("uniform").as("sample_kind"), col("doc_id"), col("lang"))
      // per-stratum k: one shuffle on the stratum key; at 100 TB strata
      // are level-sized (languages), so skew salting applies as in q40
      val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
      val stratified = h
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= PerStratumK)
        .select(lit("stratified").as("sample_kind"), col("doc_id"), col("lang"))
      uniform.unionByName(stratified)
    },

    // ------------------------------------------------------------------
    // Deterministic train/val/test split: every training pipeline's
    // first operation, done the reproducible way — bucket = salted
    // content hash mod 10 (8/1/1 split), a pure stateless projection:
    // no shuffle, no rand(), the same document lands in the same split
    // on every run, engine, and cluster size, and late-arriving data
    // never reshuffles earlier assignments (the property rand() or
    // randomSplit() cannot give). Holdout integrity is auditable: the
    // assignment is recomputable from the row alone.
    QueryDef(
      "q87_split",
      "deterministic train/val/test split: salted-hash bucket mod 10 -> 8/1/1 assignment as a stateless projection; reproducible, append-stable, shuffle-free",
      s"""SELECT doc_id, lang,
         |  CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |    ${sqlMd5Hash48(s"'$Salt:split:' || doc_id::VARCHAR")} % 10 AS b
         |  FROM documents)""".stripMargin) { (s, dir) =>
      val b = md5Hash48(concat(lit(s"$Salt:split:"), col("doc_id").cast("string"))) % 10
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        when(b < 8, "train").when(b === 8, "val").otherwise("test").as("split"))
    })
}
