package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table. All vectorized built-ins / higher-order
  * functions — no per-row UDFs, so every expression stays inside
  * whole-stage codegen and the scan prunes to the columns used.
  *
  * (The reference pipeline has no text operators — these are the
  * north-star extensions the brief requires alongside SURVEY.md §2.)
  */
object TextQueries {

  private[queries] val stopEn = Seq("the", "a", "of", "and", "to", "is", "in")
  private val stopFr = Seq("le", "la", "de", "et", "un", "les")
  private val stopDe = Seq("der", "die", "das", "und", "ein", "ist")
  private val stopEs = Seq("el", "la", "de", "y", "un", "los")

  private[queries] def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
    * the same pattern compiles identically under Java regex and RE2. */
  private val bpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  // ---- TF-IDF maintenance artifacts (q155/q156) ------------------------
  //
  // TF-IDF is its own artifact class in the maintenance matrix:
  // IMMUTABLE per-doc facts (term frequencies are doc-local — no corpus
  // change can alter a surviving doc's tf rows) under GLOBAL weights
  // (df and N shift with every append/delete and re-weight EVERY
  // document's scores). So maintenance never touches standing text:
  // the tf index is read back verbatim, and only the broadcast-sized
  // df sidecar and the doc count move — df adds under append (doc sets
  // are disjoint, so distinct-doc counts add) and subtracts under
  // delete (the deleted docs' own tf rows are their df contribution).

  private def termsOf(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))

  /** The per-doc (doc_id, term, tf) facts of the standing corpus —
    * tokenized once per content fingerprint, never again. Published
    * MULTI-FILE (the round-13 pair_index lesson): the tf fact table is
    * corpus-sized, so the write keeps the tf aggregation's distributed
    * partitioning instead of funneling through one task. */
  private[graft] def tfIndexTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.sources.DurableIndex.attachOrBuild(
      s, dir, "tf_index", "documents.parquet", None) {
      termsOf(Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 7))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    }

  /** The global-weight sidecar: (term, df) — df derived from the tf
    * index (one row per (doc, term) means df is a row count), never
    * from text — plus a sentinel row (term NULL) carrying the standing
    * DOCUMENT count (q58's N counts all documents, term-bearing or
    * not). Vocabulary-sized: broadcasts. */
  private[graft] def dfSidecarTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.sources.DurableIndex.attachOrBuild(
      s, dir, "term_df", "documents.parquet", None) {
      val df = tfIndexTable(s, dir).groupBy("term")
        .agg(count(lit(1)).as("df"))
      val sentinel = Tables.documents(s, dir)
        .filter(col("doc_id") % 10 =!= 7)
        .agg(count(lit(1)).as("df"))
        .select(lit(null).cast("string").as("term"), col("df"))
      df.unionByName(sentinel).coalesce(1)
    }

  /** The q58 scoring tail over any (tfc, df, n) triple: ubiquity cut,
    * exact rational idf, per-doc top-3 rank. */
  private def tfidfTail(tfc: org.apache.spark.sql.DataFrame,
      dfRel: org.apache.spark.sql.DataFrame,
      nDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val scored = tfc
      .join(broadcast(dfRel), "term")
      .crossJoin(broadcast(nDf))
      .filter(lit(10) * col("df") < lit(9) * col("n"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * col("n")).cast("double") / col("df") as "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  /** q58's oracle restricted to `docWhere` — shared by q155 (empty:
    * full corpus) and the retraction q156. */
  private def tfidfOracleFor(docWhere: String): String = {
    val w = if (docWhere.isEmpty) "" else s" WHERE $docWhere"
    s"""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents$w),
       |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents$w),
       |scored AS (SELECT doc_id, term, tf, df,
       |    (tf * n)::DOUBLE / df AS score
       |  FROM tfc JOIN df USING (term) CROSS JOIN n
       |  WHERE 10 * df < 9 * n),
       |ranked AS (SELECT *, row_number() OVER
       |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Quality scoring: length/token/stopword stats per document.
    QueryDef(
      "q19_text_stats",
      "per-document quality stats: char/token counts, mean token length, stopword ratio, composite quality score — all codegen'd builtins, no UDFs",
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE / len(string_split(text, ' ')) AS mean_token_len,
         |  len(list_filter(string_split(text, ' '), t -> t IN (${sqlList(stopEn)})))::DOUBLE / len(string_split(text, ' ')) AS stop_ratio,
         |  CASE WHEN len(string_split(text, ' ')) >= 10
         |        AND len(list_filter(string_split(text, ' '), t -> t IN (${sqlList(stopEn)}))) > 0
         |       THEN 1 ELSE 0 END AS quality_pass
         |FROM documents""".stripMargin) { (s, dir) =>
      val toks = tokens(col("text"))
      val stopArr = array(stopEn.map(lit): _*)
      val nStop = size(filter(toks, t => array_contains(stopArr, t)))
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        size(toks).cast(LongType).as("n_tokens"),
        // chars minus the (n_tokens-1) separating spaces, per token:
        ((length(col("text")) - size(toks) + 1).cast("double") / size(toks))
          .as("mean_token_len"),
        (nStop.cast("double") / size(toks)).as("stop_ratio"),
        when(size(toks) >= 10 && nStop > 0, 1).otherwise(0)
          .cast(LongType).as("quality_pass"))
    },

    // ------------------------------------------------------------------
    // Language ID: n-gram/stopword-score heuristic with a deterministic
    // argmax. (The synthetic `lang` labels are uncorrelated with the
    // generated text, so the declared semantics are the deterministic
    // scoring function itself, oracle-checked — not label recovery.)
    QueryDef(
      "q20_lang_id",
      "stopword-profile language scoring + deterministic argmax (en>fr>de>es tiebreak); the standard n-gram-heuristic shape, vectorized",
      s"""SELECT doc_id, lang AS labeled_lang, s_en, s_fr, s_de, s_es,
         |  CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
         |       WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
         |       WHEN s_de >= s_es THEN 'de'
         |       ELSE 'es' END AS predicted_lang
         |FROM (SELECT doc_id, lang,
         |  CAST(len(list_filter(string_split(text,' '), t -> t IN (${sqlList(stopEn)}))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(string_split(text,' '), t -> t IN (${sqlList(stopFr)}))) AS BIGINT) AS s_fr,
         |  CAST(len(list_filter(string_split(text,' '), t -> t IN (${sqlList(stopDe)}))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(string_split(text,' '), t -> t IN (${sqlList(stopEs)}))) AS BIGINT) AS s_es
         |FROM documents)""".stripMargin) { (s, dir) =>
      val toks = tokens(col("text"))
      def score(ws: Seq[String]) = {
        val arr = array(ws.map(lit): _*)
        size(filter(toks, t => array_contains(arr, t))).cast(LongType)
      }
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          score(stopEn).as("s_en"), score(stopFr).as("s_fr"),
          score(stopDe).as("s_de"), score(stopEs).as("s_es"))
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          col("s_en"), col("s_fr"), col("s_de"), col("s_es"),
          when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de")
            && col("s_en") >= col("s_es"), "en")
            .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_es"), "fr")
            .when(col("s_de") >= col("s_es"), "de")
            .otherwise("es").as("predicted_lang"))
    },

    // ------------------------------------------------------------------
    // Token counting: whitespace vs BPE-ish regex pre-tokenization.
    QueryDef(
      "q21_token_count",
      "token counting two ways: whitespace split and a BPE-style regex pre-tokenizer (letter runs / digit runs / punctuation); regex chosen to mean the same under Java regex and RE2",
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$bpeish')) AS BIGINT) AS bpe_tokens
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(bpeish), lit(0)))
          .cast(LongType).as("bpe_tokens"))
    },

    // ------------------------------------------------------------------
    // PII redaction: the standard training-data scrub — emails and long
    // digit runs masked with vectorized regexp_replace (global on both
    // engines), match counts reported for audit. The corpus is synthetic
    // with no real PII, so every 5th document gets a deterministic
    // contact line appended IN THE QUERY (identically on both engines) —
    // the declared semantics are the redaction operator, non-vacuously.
    // Patterns chosen to mean the same under Java regex and RE2.
    QueryDef(
      "q42_pii_redaction",
      "PII redaction: email + long-digit-run masking via global regexp_replace with per-doc match counts; deterministic synthetic PII injected on every 5th doc so the scrub is non-vacuous",
      """WITH enriched AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com or 5550100' || CAST(doc_id AS VARCHAR)
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_numbers,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{6,}', '[NUMBER]', 'g') AS redacted
        |FROM enriched""".stripMargin) { (s, dir) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val numRe = "[0-9]{6,}"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or 5550100"), col("doc_id").cast("string")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            .cast(LongType).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(numRe), lit(0)))
            .cast(LongType).as("n_long_numbers"),
          regexp_replace(
            regexp_replace(col("text"), emailRe, "[EMAIL]"),
            numRe, "[NUMBER]").as("redacted"))
    },

    // ------------------------------------------------------------------
    // Document fingerprinting: order-sensitive rolling hash over token
    // hashes — a content-defined fingerprint two permuted documents do
    // NOT share (unlike bag-of-words hashes).
    QueryDef(
      "q22_fingerprint",
      "rolling polynomial fingerprint: sequential fold acc*131 + md5-token-hash mod P over the token stream; order-sensitive, cross-engine-exact integer arithmetic",
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(string_split(text, ' '), t -> ${sqlTokenHash("t")})),
         |    (acc, h) -> (acc * 131 + h) % $P) AS fingerprint
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        aggregate(
          transform(tokens(col("text")), t => tokenHash(t)),
          lit(0L),
          (acc, h) => (acc * 131 + h) % P).as("fingerprint"))
    },

    // ------------------------------------------------------------------
    // TF-IDF keyword extraction: the relevance-scoring shape text
    // pipelines use for quality filters and topic tagging. The idf is
    // kept RATIONAL — score = (tf * N)::DOUBLE / df, one division, no
    // log — so the DuckDB oracle reproduces the ranking bit-for-bit
    // (textbook log-idf changes the monotone scale, not the per-doc
    // ordering, when every doc's candidates face the same N). Ubiquitous
    // terms are cut by 10*df < 9*N (integer compare; this synthetic
    // corpus has a 31-term vocab with median df ~0.78N, so a textbook
    // df<N/2 cut would keep one term). Scale shape: tf is
    // one groupBy over (doc, term); df one over term (broadcast — term
    // vocab is bounded); the per-doc top-3 is a rank window that
    // WindowGroupLimit prunes map-side exactly like q55's strata.
    QueryDef(
      "q58_tfidf_keywords",
      "TF-IDF keyword extraction: exact rational idf (tf*N/df, no libm), ubiquity cut 10*df < 9*N, per-doc top-3 terms by (score desc, term) via WindowGroupLimit-pruned rank",
      """WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, term, tf, df,
        |    (tf * n)::DOUBLE / df AS score
        |  FROM tfc JOIN df USING (term) CROSS JOIN n
        |  WHERE 10 * df < 9 * n),
        |ranked AS (SELECT *, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin) { (s, dir) =>
      val terms = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tfc = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = terms.groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"))
      val nDf = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
      val scored = tfc
        .join(broadcast(df), "term")
        .crossJoin(broadcast(nDf))
        .filter(lit(10) * col("df") < lit(9) * col("n"))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf") * col("n")).cast("double") / col("df") as "score")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    },

    // ------------------------------------------------------------------
    // Incremental TF-IDF under corpus growth — the maintenance form of
    // q58, and its own artifact class: per-doc tf facts are IMMUTABLE
    // (doc-local), but df and N are GLOBAL weights that re-score every
    // document on every append. So the apply reads the persisted tf
    // index verbatim (zero standing re-tokenization), tokenizes only
    // the delta, ADDS the delta's distinct-doc df (doc sets disjoint —
    // addition is exact), bumps N, and re-runs only the broadcast-join
    // scoring tail. == full-corpus q58 verbatim.
    QueryDef(
      "q155_incremental_tfidf",
      "incremental TF-IDF maintenance: persisted per-doc tf index (tokenize once) + broadcast df sidecar; the delta tokenizes alone, df ADDS (disjoint doc sets), N bumps, and only the scoring tail re-runs — standing text never re-read; == full-corpus TF-IDF top-3 exactly",
      tfidfOracleFor("")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val side = dfSidecarTable(s, dir)
      val deltaTfc = termsOf(docs.filter(col("doc_id") % 10 === 7))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val deltaDf = deltaTfc.groupBy("term").agg(count(lit(1)).as("ddf"))
      val df1 = side.filter(col("term").isNotNull)
        .join(deltaDf, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("ddf"), lit(0L))).as("df"))
      val n1 = side.filter(col("term").isNull).select(col("df").as("n0"))
        .crossJoin(broadcast(docs.filter(col("doc_id") % 10 === 7)
          .agg(count(lit(1)).as("nd"))))
        .select((col("n0") + col("nd")).as("n"))
      tfidfTail(tfIndexTable(s, dir).unionByName(deltaTfc), df1, n1)
    },

    // ------------------------------------------------------------------
    // TF-IDF retraction — the global-weight member of the retraction
    // matrix: deleting documents changes NOTHING in surviving docs' tf
    // rows (per-doc facts tombstone by anti-join), but their df
    // contribution SUBTRACTS out of the sidecar (their own tf rows ARE
    // that contribution — read from the index, zero text) and N drops,
    // re-weighting every surviving doc's scores through the same
    // broadcast tail. Chains the ordinary q155 delta apply on top —
    // deletion composes with maintenance. == q58 over
    // corpus-minus-deleted exactly.
    QueryDef(
      "q156_tfidf_retraction",
      "TF-IDF retraction: deleted docs' tf rows tombstoned (per-doc facts), their df contribution subtracted from the broadcast sidecar (read from the index — zero text), N dropped, ordinary delta apply chained on top; == TF-IDF top-3 over corpus-minus-deleted exactly",
      tfidfOracleFor("doc_id % 10 != 3")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
      val tfc0 = tfIndexTable(s, dir)
      val side = dfSidecarTable(s, dir)
      val rdf = tfc0.join(broadcast(del), Seq("doc_id"), "left_semi")
        .groupBy("term").agg(count(lit(1)).as("rdf"))
      val tfc1 = tfc0.join(broadcast(del), Seq("doc_id"), "left_anti")
      val deltaTfc = termsOf(docs.filter(col("doc_id") % 10 === 7))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val deltaDf = deltaTfc.groupBy("term").agg(count(lit(1)).as("ddf"))
      val df1 = side.filter(col("term").isNotNull)
        .join(broadcast(rdf), Seq("term"), "left")
        .join(deltaDf, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df"), lit(0L)) - coalesce(col("rdf"), lit(0L))
            + coalesce(col("ddf"), lit(0L))).as("df"))
        .filter(col("df") > 0)
      val n1 = side.filter(col("term").isNull).select(col("df").as("n0"))
        .crossJoin(broadcast(docs.filter(col("doc_id") % 10 === 7)
          .agg(count(lit(1)).as("nd"))))
        .crossJoin(broadcast(del.agg(count(lit(1)).as("ndel"))))
        .select((col("n0") + col("nd") - col("ndel")).as("n"))
      tfidfTail(tfc1.unionByName(deltaTfc), df1, n1)
    },

    // ------------------------------------------------------------------
    // Repetition / boilerplate scoring — the training-data quality
    // signal dedup pipelines cut on (Gopher/C4-style repetition rules):
    // type-token ratio (distinct tokens / tokens) and the count of
    // immediately-repeated tokens. Everything is per-row array
    // arithmetic on codegen'd builtins — no explode, no shuffle, no
    // UDF: the whole plan is a stateless projection that scales with
    // scan bandwidth. The ratio is ONE double division of two exact
    // integers (IEEE-deterministic on both engines).
    QueryDef(
      "q69_repetition",
      "repetition/boilerplate quality stats: type-token ratio + consecutive-duplicate count per doc, pure per-row array arithmetic — stateless projection, zero shuffle",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS ttr,
        |  CAST(len(list_filter(range(2, len(string_split(text, ' ')) + 1),
        |    i -> string_split(text, ' ')[i] = string_split(text, ' ')[i - 1]))
        |    AS BIGINT) AS n_consec_dup
        |FROM documents""".stripMargin) { (s, dir) =>
      // tokenize ONCE per row into a named column: the consecutive-dup
      // lambda indexes the array per element, and an inline `split`
      // expression is not subexpression-eliminated inside lambda bodies
      // (re-splitting per index made this O(tokens^2) splits)
      val t = col("t")
      Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(
          col("doc_id"),
          size(t).cast(LongType).as("n_tokens"),
          size(array_distinct(t)).cast(LongType).as("n_types"),
          (size(array_distinct(t)).cast("double") / size(t)).as("ttr"),
          size(filter(sequence(lit(2), size(t)),
            i => element_at(t, i) === element_at(t, i - 1)))
            .cast(LongType).as("n_consec_dup"))
    },

    // ------------------------------------------------------------------
    // Collocation mining by PMI-style lift: which bigrams occur far more
    // often than their unigrams predict. lift = P(w1 w2) / (P(w1)P(w2))
    // computed in probability-ratio form — (cb/nb) / ((c1/n1)*(c2/n1))
    // — as a fixed sequence of IEEE double ops mirrored exactly in the
    // oracle. NOT as integer products: cb*n1*n1 overflows int64 already
    // at ~10^7 tokens, where DuckDB errors and Spark wraps silently.
    // Corpus-scale shape:
    // two map-side-combinable count aggregations (bigrams, unigrams),
    // the unigram table joined twice by key — at 100 TB both joins
    // shuffle token-count tables, never documents; the min-count cut
    // (>= 5) bounds the ranked set before the top-k heap.
    QueryDef(
      "q94_collocations",
      "PMI-style bigram lift: count(bigram)/N vs unigram expectation in probability-ratio double form mirrored in the oracle (integer products would overflow int64), min-count 5, top-20 by (lift, bigram)",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents
         |              WHERE len(string_split(text, ' ')) >= 2),
         |uni AS (SELECT unnest(t) AS w FROM toks),
         |ucnt AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
         |un AS (SELECT sum(cw) AS n1 FROM ucnt),
         |big AS (SELECT unnest(${sqlShingles("t", 2)}) AS bg FROM toks),
         |bcnt AS (SELECT bg, count(*) AS cb FROM big GROUP BY bg)
         |SELECT bg AS bigram, cb AS n_pair,
         |  (CAST(cb AS DOUBLE) / CAST(nbig AS DOUBLE))
         |    / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         |       * (CAST(c2 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS lift
         |FROM (
         |  SELECT bg, cb,
         |    (SELECT sum(cb) FROM bcnt) AS nbig,
         |    (SELECT n1 FROM un) AS n1,
         |    u1.cw AS c1, u2.cw AS c2
         |  FROM bcnt
         |  JOIN ucnt u1 ON u1.w = string_split(bg, ' ')[1]
         |  JOIN ucnt u2 ON u2.w = string_split(bg, ' ')[2]
         |  WHERE cb >= 5)
         |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .filter(size(tokens(col("text"))) >= 2)
      val uni = docs.select(explode(tokens(col("text"))).as("w"))
      val ucnt = uni.groupBy("w").agg(count(lit(1)).as("cw"))
      // n1 = sum of the word counts already aggregated — not a second
      // tokenize-explode pass over the corpus
      val n1 = ucnt.groupBy().agg(sum(col("cw")).as("n1"))
      val bcnt = docs.select(tokens(col("text")).as("t"))
        .select(explode(shinglesOf(col("t"), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("cb"))
      val nbig = bcnt.groupBy().agg(sum(col("cb")).as("nbig"))
      val parts = split(col("bg"), " ")
      bcnt.filter(col("cb") >= 5)
        .crossJoin(broadcast(n1)).crossJoin(broadcast(nbig))
        .withColumn("w1", element_at(parts, 1))
        .withColumn("w2", element_at(parts, 2))
        .join(ucnt.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
        .join(ucnt.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
        .select(col("bg").as("bigram"), col("cb").as("n_pair"),
          ((col("cb").cast("double") / col("nbig").cast("double"))
            / ((col("c1").cast("double") / col("n1").cast("double"))
              * (col("c2").cast("double") / col("n1").cast("double")))).as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(20)
    },

    // ------------------------------------------------------------------
    // Overlapping document chunking — the op that feeds both RAG
    // ingestion and fixed-context training: each document splits into
    // 32-token windows on a 24-token stride (8-token overlap, so no
    // boundary-crossing span is lost), each chunk carrying its offset,
    // clamped length, and a content hash for downstream chunk-level
    // dedup. Differs from q38's byte-frame sampling in the two ways a
    // text chunker differs from a frame sampler: boundaries are TOKEN
    // positions, and windows overlap. Plan shape: bind the token array
    // once, explode the chunk starts, slice per chunk — a stateless
    // projection chain, zero shuffle; at 100 TB throughput is bounded by
    // scan bandwidth, and the emitted chunk table (id, hash, offsets) is
    // what downstream stages join, never the source text.
    QueryDef(
      "q104_chunking",
      "overlapping token chunking: 32-token windows, 24-token stride, per-chunk offset + clamped length + 48-bit content hash — stateless explode+slice, zero shuffle (RAG/training chunk prep)",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
         |c AS (SELECT doc_id, t,
         |        unnest(range(0, (len(t) - 1) // 24 + 1)) AS chunk_idx
         |      FROM d)
         |SELECT doc_id, chunk_idx,
         |  CAST(chunk_idx * 24 + 1 AS BIGINT) AS start_tok,
         |  CAST(least(32, len(t) - chunk_idx * 24) AS BIGINT) AS chunk_len,
         |  ${sqlMd5Hash48("array_to_string(t[chunk_idx*24+1 : chunk_idx*24+32], ' ')")}
         |    AS chunk_hash
         |FROM c""".stripMargin) { (s, dir) =>
      val (win, stride) = (32, 24)
      val t = col("t")
      Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), t, explode(sequence(lit(0L),
          expr(s"(size(t) - 1) div $stride").cast("long"))).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * stride + 1).as("start_tok"),
          least(lit(win.toLong), size(t) - col("chunk_idx") * stride)
            .cast(LongType).as("chunk_len"),
          md5Hash48(concat_ws(" ",
            slice(t, (col("chunk_idx") * stride + 1).cast("int"), lit(win))))
            .as("chunk_hash"))
    },

    // ------------------------------------------------------------------
    // Filter-funnel attrition report — the audit every quality cascade
    // ships with: which rule removed how much, per language. Rules are
    // ORDERED (a doc is attributed to the FIRST rule it fails — funnel
    // semantics, so stage counts sum to the corpus and stages are
    // disjoint), built from the q19 stat expressions: minimum length,
    // stopword presence, token-shape bound. Scale shape: ONE scan, all
    // rules fused into a single codegen'd CASE (not one pass per rule —
    // the difference between 1x and Rx the corpus I/O at 100 TB), then
    // a map-side-combinable count into |langs| x |stages| rows.
    QueryDef(
      "q119_filter_funnel",
      "quality-filter funnel: first-failing-rule attribution (min_tokens >= 20 -> has_stopword -> mean_token_len <= 5.0) fused into one scan + one tiny aggregate; per-(lang, stage) attrition counts",
      s"""WITH s AS (SELECT lang,
         |    len(string_split(text, ' ')) AS nt,
         |    len(list_filter(string_split(text, ' '),
         |        t -> t IN (${sqlList(stopEn)}))) AS ns,
         |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
         |      / len(string_split(text, ' ')) AS mtl
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN nt < 20 THEN 'fail_min_tokens'
         |       WHEN ns = 0 THEN 'fail_no_stopwords'
         |       WHEN mtl > 5.0 THEN 'fail_token_shape'
         |       ELSE 'pass' END AS stage,
         |  count(*) AS n_docs
         |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val toks = tokens(col("text"))
      val stopArr = array(stopEn.map(lit): _*)
      Tables.documents(s, dir)
        .select(col("lang"), size(toks).as("nt"),
          size(filter(toks, t => array_contains(stopArr, t))).as("ns"),
          ((length(col("text")) - size(toks) + 1).cast("double") / size(toks))
            .as("mtl"))
        .select(col("lang"),
          when(col("nt") < 20, "fail_min_tokens")
            .when(col("ns") === 0, "fail_no_stopwords")
            .when(col("mtl") > 5.0, "fail_token_shape")
            .otherwise("pass").as("stage"))
        .groupBy("lang", "stage").agg(count(lit(1)).as("n_docs"))
    })
}
