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
        val salt = SamplingQueries.Salt
        s"""WITH ${DedupQueries.sqlMinhashCtes},
           |pairs AS (${DedupQueries.sqlMinhashPairSelect}),
           |neardup AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
           |t13 AS (SELECT doc_id, string_split(text, ' ') t FROM documents
           |        WHERE len(string_split(text, ' ')) >= 13),
           |sh13 AS (SELECT DISTINCT doc_id, ${sqlMd5Hash48("sg")} AS h13
           |         FROM (SELECT doc_id, unnest(${sqlShingles("t", 13)}) AS sg
           |               FROM t13)),
           |benchsh AS (SELECT DISTINCT h13 FROM sh13 WHERE doc_id % 5 = 0),
           |contaminated AS (SELECT DISTINCT s.doc_id
           |  FROM sh13 s JOIN benchsh b USING (h13) WHERE s.doc_id % 5 <> 0),
           |quality AS (SELECT doc_id,
           |    CASE WHEN len(string_split(text, ' ')) >= 10
           |          AND len(list_filter(string_split(text, ' '),
           |                t -> t IN ($stop))) > 0
           |         THEN 1 ELSE 0 END AS q
           |  FROM documents),
           |disp AS (SELECT d.doc_id,
           |    CASE WHEN d.doc_id % 5 = 0 THEN 'benchmark'
           |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
           |         WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
           |         WHEN q.q = 0 THEN 'low_quality'
           |         ELSE 'kept' END AS disposition
           |  FROM documents d
           |  LEFT JOIN contaminated c ON c.doc_id = d.doc_id
           |  LEFT JOIN neardup nd ON nd.doc_id = d.doc_id
           |  JOIN quality q ON q.doc_id = d.doc_id)
           |SELECT doc_id, disposition,
           |  CASE WHEN disposition <> 'kept' THEN '-'
           |       WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id, disposition,
           |    ${sqlMd5Hash48(s"'$salt:split:' || doc_id::VARCHAR")} % 10 AS b
           |  FROM disp)""".stripMargin
      }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val neardup = DedupQueries.minhashPairs(s, dir)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("nd", lit(1))
      val sh13 = docs
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 13)
        .select(col("doc_id"), explode(shinglesOf(col("t"), 13)).as("sg"))
        .select(col("doc_id"), md5Hash48(col("sg")).as("h13"))
        .distinct()
        .localCheckpoint()
      val benchsh = sh13.filter(col("doc_id") % 5 === 0)
        .select(col("h13")).distinct()
      val contaminated = sh13.filter(col("doc_id") % 5 =!= 0)
        .join(broadcast(benchsh), Seq("h13"))
        .select(col("doc_id")).distinct()
        .withColumn("ct", lit(1))
      val toks = tokens(col("text"))
      val stopArr = array(TextQueries.stopEn.map(lit): _*)
      val quality = docs.select(col("doc_id"),
        when(size(toks) >= 10
          && size(filter(toks, t => array_contains(stopArr, t))) > 0, 1)
          .otherwise(0).as("q"))
      val b = md5Hash48(concat(lit(s"${SamplingQueries.Salt}:split:"),
        col("doc_id").cast("string"))) % 10
      docs.select(col("doc_id"))
        .join(contaminated, Seq("doc_id"), "left")
        .join(neardup, Seq("doc_id"), "left")
        .join(quality, Seq("doc_id"))
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
