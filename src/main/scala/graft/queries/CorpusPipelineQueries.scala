package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** The end-to-end training-corpus production run: every document gets a
  * final disposition by composing the individually-proven operators —
  * benchmark exclusion, 13-gram decontamination (q86's check), near-dup
  * drop (q24's pairs, keep-smallest policy), quality filter (q19's
  * criterion), and the q87 split assignment for survivors. One query,
  * one answer to "what exactly goes into the training set and why was
  * everything else dropped" — the audit artifact a data-governance
  * review asks for.
  *
  * Precedence is the standard one (cheap-and-certain before
  * statistical): benchmark > contaminated > near_dup > low_quality >
  * kept. Plan shape: every stage is a reduced per-doc flag table joined
  * back by doc_id — the corpus text is scanned by the flag builders
  * (each individually bucketed/blocked, see their home queries), never
  * re-joined at text granularity.
  */
object CorpusPipelineQueries {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q100_corpus_pipeline",
      "corpus production run: benchmark/contaminated/near-dup/low-quality/kept disposition per document (q86+q24+q19 composed, keep-smallest dedup policy) + q87 split for survivors",
      {
        val stop = TextQueries.sqlList(TextQueries.stopEn)
        s"""WITH ${DedupQueries.sqlMinhashCtes},
           |pairs AS (${DedupQueries.sqlMinhashPairSelect}),
           |neardup AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
           |${DedupQueries.sqlSh13Ctes},
           |benchsh AS (SELECT DISTINCT h FROM sh13 WHERE doc_id % 5 = 0),
           |contaminated AS (SELECT DISTINCT s.doc_id
           |  FROM sh13 s JOIN benchsh b USING (h) WHERE s.doc_id % 5 <> 0),
           |quality AS (SELECT doc_id,
           |    CASE WHEN len(string_split(text, ' ')) >= 10
           |          AND len(list_filter(string_split(text, ' '),
           |                t -> t IN ($stop))) > 0
           |         THEN 1 ELSE 0 END AS q
           |  FROM documents),
           |disp AS (SELECT q.doc_id,
           |    CASE WHEN q.doc_id % 5 = 0 THEN 'benchmark'
           |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
           |         WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
           |         WHEN q.q = 0 THEN 'low_quality'
           |         ELSE 'kept' END AS disposition
           |  FROM quality q
           |  LEFT JOIN contaminated c ON c.doc_id = q.doc_id
           |  LEFT JOIN neardup nd ON nd.doc_id = q.doc_id)
           |SELECT doc_id, disposition,
           |  CASE WHEN disposition <> 'kept' THEN '-'
           |       WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id, disposition,
           |    ${SamplingQueries.sqlSplitBucket("doc_id")} AS b
           |  FROM disp)""".stripMargin
      }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // the production run READS the standing artifacts (round-15
      // verdict #4): pairs from the durable pair/band/postings stack
      // (only the arriving %10==7 slice is tokenized — the q130
      // identity, proven == the from-scratch pipeline), span hashes
      // from the durable span index (zero 13-gram shingling). The
      // oracle is unchanged: the artifacts hold exactly these facts.
      val neardup = DedupQueries.corpusPairsIndexed(s, dir)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("nd", lit(1))
      val sh13 = DedupQueries.spanIndexTable(s, dir)
      val benchsh = sh13.filter(col("doc_id") % 5 === 0)
        .select(col("h")).distinct()
      val contaminated = sh13.filter(col("doc_id") % 5 =!= 0)
        .join(broadcast(benchsh), Seq("h"))
        .select(col("doc_id")).distinct()
        .withColumn("ct", lit(1))
      val toks = tokens(col("text"))
      val stopArr = array(TextQueries.stopEn.map(lit): _*)
      // quality carries every doc_id exactly once, so it IS the driving
      // table — no separate documents scan re-joined on doc_id
      val quality = docs.select(col("doc_id"),
        when(size(toks) >= 10 && arrays_overlap(toks, stopArr), 1)
          .otherwise(0).as("q"))
      val b = SamplingQueries.splitBucket(col("doc_id"))
      quality
        .join(contaminated, Seq("doc_id"), "left")
        .join(neardup, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, "benchmark")
            .when(col("ct").isNotNull, "contaminated")
            .when(col("nd").isNotNull, "near_dup")
            .when(col("q") === 0, "low_quality")
            .otherwise("kept").as("disposition"))
        .select(col("doc_id"), col("disposition"),
          when(col("disposition") =!= "kept", "-")
            .when(b < 8, "train").when(b === 8, "val")
            .otherwise("test").as("split"))
    })
}
