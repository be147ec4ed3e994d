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

  /** Tokens per training shard for q98 (small so the sf gates produce
    * a multi-shard assignment: ~27k corpus tokens at sf0.01 -> ~13
    * shards). */
  private val TokenBudget = 2048L

  /** q118 context-window length (tokens): small enough that every sf
    * gate produces a multi-window packing with split documents. */
  private[queries] val CtxWindow = 512L

  private val UniformK = 50
  private val PerStratumK = 10
  private[queries] val Salt = "graft-sample-1"

  /** Global EXCLUSIVE running token sum in doc_id order — the two-pass
    * shape shared by q98 (shard packing) and q118 (context packing): a
    * naive `sum() OVER (ORDER BY doc_id)` is a single-partition global
    * sort; this is range-partition + sort-within (one balanced
    * shuffle), a one-long-per-partition totals job, driver-side
    * offsets (numShufflePartitions entries, not rows), then a map-side
    * pass attaching each partition's running sum on top of its offset.
    * Returns (doc_id, n_tokens, cumx). */
  private def withTokenPrefixSum(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val base = Tables.documents(s, dir).select(col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tokens"))
    val parts = s.sessionState.conf.numShufflePartitions
    val sorted = base
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .localCheckpoint() // totals and assignment must see the same blocks
    val totals = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single((pid, it.map(_.getLong(1)).sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(pid) = tokens before pid
    val outSchema = sorted.schema.add(StructField("cumx", LongType, nullable = false))
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        val n = r.getLong(1)
        val c = acc
        acc += n
        Row(r.getLong(0), n, c)
      }
    }
    s.createDataFrame(rows, outSchema)
  }

  /** Salted split bucket 0-9 of a doc_id column — the q87 assignment,
    * shared with the q100 corpus pipeline. */
  private[queries] def splitBucket(docId: org.apache.spark.sql.Column) =
    md5Hash48(concat(lit(s"$Salt:split:"), docId.cast("string"))) % 10

  /** SQL twin of [[splitBucket]]. */
  private[queries] def sqlSplitBucket(x: String): String =
    s"${sqlMd5Hash48(s"'$Salt:split:' || $x::VARCHAR")} % 10"

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
      val b = splitBucket(col("doc_id"))
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        when(b < 8, "train").when(b === 8, "val").otherwise("test").as("split"))
    },

    // ------------------------------------------------------------------
    // Token-budget shard packing — the last step before a corpus feeds a
    // trainer: assign documents (in stable doc_id order) to shards of
    // ~TokenBudget tokens each, so every shard is a near-equal unit of
    // training work. shard(d) = floor(exclusive-prefix-sum(n_tokens) /
    // budget), which needs a GLOBAL running sum — the operation a naive
    // `sum() OVER (ORDER BY ...)` computes on a single partition. This
    // uses the S12/SurrogateKeys two-pass shape instead: range-partition
    // by doc_id + sort within partitions (one balanced shuffle), a
    // one-long-per-partition totals job, driver-side offsets (numShuffle-
    // Partitions entries, not rows), then a map-side pass attaches each
    // partition's running sum on top of its offset. The genuine
    // per-partition imperative case where the RDD layer is the right
    // Spark idiom. The oracle states the semantic spec — the global
    // window running sum — which DuckDB can afford at oracle scale.
    QueryDef(
      "q98_shard_packing",
      s"token-budget shard packing: shard = floor(exclusive global running token sum / $TokenBudget) via range-partition + per-partition offsets (no single-partition window), doc_id order",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      - n_tokens AS cumx
         |  FROM d)
         |SELECT doc_id, n_tokens,
         |  CAST(floor(cumx / $TokenBudget.0) AS BIGINT) AS shard
         |FROM c""".stripMargin) { (s, dir) =>
      withTokenPrefixSum(s, dir).select(col("doc_id"), col("n_tokens"),
        // non-negative long div == floor
        expr(s"cumx div $TokenBudget").as("shard"))
    },

    // ------------------------------------------------------------------
    // Context-window packing — the OTHER packing a trainer needs (q98
    // fills shards; this fills the model's context): concatenate the
    // corpus in stable doc_id order and chunk it into fixed
    // CtxWindow-token training sequences, the GPT-style concat-and-
    // chunk step. A document spans windows floor(cumx/W) ..
    // floor((cumx+n-1)/W) — usually one or two rows via an explode over
    // that (tiny) range — and contributes the overlap of its token
    // interval with each window. Per-window sums are exactly W (the
    // packing has zero padding by construction except the final
    // window), which the spec asserts. Scale shape: the global running
    // sum is the shared q98 two-pass (no single-partition window); the
    // rest is a stateless projection + bounded explode.
    QueryDef(
      "q118_context_packing",
      s"concat-and-chunk context packing: documents chunked into $CtxWindow-token training windows via the q98 two-pass global prefix sum; output = (window, doc, tokens contributed), boundary docs split across adjacent windows",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      - n_tokens AS BIGINT) AS cumx
         |  FROM d),
         |e AS (SELECT doc_id, n_tokens, cumx,
         |    unnest(range(cumx // $CtxWindow,
         |                 (cumx + n_tokens - 1) // $CtxWindow + 1)) AS window_id
         |  FROM c)
         |SELECT CAST(window_id AS BIGINT) AS window_id, doc_id,
         |  CAST(least(cumx + n_tokens, (window_id + 1) * $CtxWindow)
         |     - greatest(cumx, window_id * $CtxWindow) AS BIGINT) AS tok_in_window
         |FROM e""".stripMargin) { (s, dir) =>
      withTokenPrefixSum(s, dir)
        .select(col("doc_id"), col("n_tokens"), col("cumx"),
          explode(sequence(expr(s"cumx div $CtxWindow"),
            expr(s"(cumx + n_tokens - 1) div $CtxWindow"))).as("window_id"))
        .select(col("window_id"), col("doc_id"),
          (least(col("cumx") + col("n_tokens"), (col("window_id") + 1) * CtxWindow)
            - greatest(col("cumx"), col("window_id") * CtxWindow))
            .as("tok_in_window"))
    },

    // ------------------------------------------------------------------
    // Domain-mixture resampling — the op that turns a raw crawl into a
    // training mixture: given target mixture weights per domain (lang
    // stands in for the domain key), carve a half-corpus token target
    // and fill each domain's share greedily in salted-hash order.
    // budget_d = (w_pct * total_tokens) div 200 (= pct of half the
    // corpus) — integer arithmetic end-to-end, exact on both engines.
    // A document is kept while its domain's EXCLUSIVE running token sum
    // is under budget (greedy packing: each domain overshoots by at
    // most its last document), so per-domain quotas are exact given the
    // deterministic hash order — the sample is a pure function of the
    // data, like q55/q87; domains without a declared weight drop out
    // (weight zero). Scale shape: the weights table and the one-row
    // total broadcast; the only shuffle is the per-domain running sum
    // (at 100 TB: the q98 range-partition + per-partition-offset pass
    // keyed by domain — the window states the semantics).
    QueryDef(
      "q103_domain_mixture",
      "domain-mixture resampling: per-domain token budgets = weight% of a half-corpus target, filled greedily in salted-hash order — deterministic quota-exact mixture rebalancing (weights en40/zh20/de15/es15/fr10)",
      s"""WITH w(lang, w_pct) AS (VALUES
         |    ('de', 15), ('en', 40), ('es', 15), ('fr', 10), ('zh', 20)),
         |d AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${sqlMd5Hash48(s"'$Salt:mix:' || doc_id::VARCHAR")} AS hk
         |  FROM documents),
         |t AS (SELECT sum(n_tokens) AS total_tokens FROM d),
         |c AS (SELECT d.doc_id, d.lang, d.n_tokens, w.w_pct,
         |    sum(n_tokens) OVER (PARTITION BY d.lang
         |      ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS cumx
         |  FROM d JOIN w ON d.lang = w.lang)
         |SELECT doc_id, lang, n_tokens,
         |  CAST((w_pct * total_tokens) // 200 AS BIGINT) AS domain_budget
         |FROM c, t
         |WHERE cumx < (w_pct * total_tokens) // 200""".stripMargin) { (s, dir) =>
      val wDf = s.createDataFrame(
        Seq(("de", 15L), ("en", 40L), ("es", 15L), ("fr", 10L), ("zh", 20L)))
        .toDF("lang", "w_pct")
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        md5Hash48(concat(lit(s"$Salt:mix:"), col("doc_id").cast("string"))).as("hk"))
      val total = d.agg(sum(col("n_tokens")).as("total_tokens"))
      val win = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.join(broadcast(wDf), Seq("lang"))
        .withColumn("cumx", sum(col("n_tokens")).over(win) - col("n_tokens"))
        .crossJoin(broadcast(total))
        .withColumn("domain_budget", expr("(w_pct * total_tokens) div 200"))
        .filter(col("cumx") < col("domain_budget"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("domain_budget"))
    })
}
