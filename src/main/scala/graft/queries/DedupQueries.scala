package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Deduplication operators over `documents` — the first of the four
  * LLM-data-pipeline families (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard). Every variant is bucketed/blocked: no stage ever forms the
  * all-pairs product, so each plan survives a 100x scale-up — candidate
  * generation is always (hash-groupBy | band-groupBy | inverted-index
  * join), never crossJoin.
  *
  * The sf0.01 corpus plants 25 near-duplicate pairs at Jaccard >= 0.8
  * (verified by probe), so the LSH / verify stages are non-vacuous.
  *
  * Scale note: the shingle subtree feeds several consumer branches per
  * query (signature, per-doc counts, both sides of the verify join), and
  * Spark reuses shuffle stages only when subtrees canonicalize
  * identically — so as a pure plan it was recomputed per branch. It is
  * now STAGED once per query run via an eager `localCheckpoint` (the
  * single-session analog of writing the shingle table as a bucketed
  * stage, the medallion pattern of q41): one tokenize-explode-distinct
  * pass, then every branch reads the materialized blocks. At 100 TB the
  * checkpoint becomes a real bucketed stage table and every dedup pass
  * reads the stage, not the corpus.
  */
object DedupQueries
    extends DedupCore
    with DedupDecontam
    with DedupMinhash
    with DedupRetraction
    with DedupNgram
    with DedupGraph
    with DedupSimhash
    with DedupStreaming {

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Exact dedup: hash-groupBy on the md5 digest. The corpus has no
    // exact duplicates, so the input is doubled (self-union with shifted
    // ids) to exercise the collapse non-vacuously: 1000 rows -> 500
    // groups of 2. At 100 TB the digest (32 bytes) is the shuffle key —
    // the document bodies never move.
    QueryDef(
      "q23_dedup_exact",
      "exact dedup via md5-digest hash-groupBy over a doubled corpus; keeps min doc_id as canonical, counts copies — text never enters the shuffle",
      """SELECT md5(text) AS text_md5,
        |  CAST(min(doc_id) AS BIGINT) AS canonical_id,
        |  count(*) AS n_copies
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL
        |      SELECT doc_id + 1000000 AS doc_id, text FROM documents)
        |GROUP BY md5(text)""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select("doc_id", "text")
      d.union(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
    },

    // ------------------------------------------------------------------
    // MinHash + LSH near-dup: shingle -> 12-perm minhash signature ->
    // 6 bands of 2 -> band-bucket join for candidates -> exact Jaccard
    // verify on candidates only. The band groupBy is the blocking stage:
    // candidate count is sum of bucket-size-choose-2, never n^2.
    QueryDef(
      "q24_minhash_lsh",
      s"MinHash($NumPerms perms)+LSH($Bands bands x $RowsPerBand) near-dup detection with exact-Jaccard verification of band-bucket candidates only; threshold $JaccardThreshold",
      s"WITH $sqlMinhashCtes\n$sqlMinhashPairSelect") { (s, dir) =>
      minhashPairs(s, dir)
    },

    // ------------------------------------------------------------------
    // SimHash: 48-bit bit-voting fingerprint over token hashes. Near-dup
    // docs land within small Hamming distance; here the declared output
    // is the fingerprint itself (deterministic integer arithmetic).
    // Spark side votes with 48 aggregate COLUMNS over the token-hash
    // rows — no 48x bit-explode, no (doc, bit) shuffle: one map-side-
    // combinable groupBy(doc_id) carrying 48 longs per doc (the
    // k-means/minhash wide-agg pattern; 2.5x faster at sf1 than the
    // explode form). The oracle states the same votes via explode —
    // two shapes, one arithmetic.
    QueryDef(
      "q25_simhash",
      "48-bit SimHash via bit-voting over md5 token hashes: 48 vote-sum aggregate columns (no bit-explode), sign bits assembled in one projection — pure integer ops, exact on both engines",
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
         |            FROM documents),
         |th AS (SELECT doc_id, ${sqlTokenHash("w")} AS h FROM tok),
         |bits AS (SELECT doc_id, b, sum(((h >> b) & 1) * 2 - 1) AS s
         |  FROM th CROSS JOIN (SELECT unnest(range(48)) AS b) bb
         |  GROUP BY doc_id, b)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val votes = (0 until 48).map(b =>
        sum(expr(s"(shiftright(h, $b) & CAST(1 AS BIGINT)) * 2 - 1")).as(s"s$b"))
      val assembled = (0 until 48).map(b => expr(
          s"CASE WHEN s$b > 0 THEN shiftleft(CAST(1 AS BIGINT), $b) ELSE CAST(0 AS BIGINT) END"))
        .reduce(_ + _)
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("w"))
        .distinct()
        .select(col("doc_id"), tokenHash(col("w")).as("h"))
        .groupBy("doc_id")
        .agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), assembled.cast("long").as("simhash"))
    },

    // ------------------------------------------------------------------
    // n-gram Jaccard via inverted-index join: pairs are generated only
    // through shared shingles (after a document-frequency cut that drops
    // stop-shingles), then scored. The df-cut both bounds the join
    // fan-out at scale and is applied identically to the counts, so the
    // score is self-consistent.
    QueryDef(
      "q26_ngram_jaccard",
      s"word-3-gram Jaccard similarity through an inverted-index self-join with df<=$DfCut shingle cut; emits pairs >= 0.3 — no all-pairs stage",
      sqlNgramOracle) { (s, dir) =>
      // df-cut as a count-over-window on sg: ONE shuffle both computes
      // the document frequency and leaves the index hash-partitioned on
      // sg — the groupBy+join formulation paid a second shuffle to
      // rejoin the cut back onto the index. fsh is then staged once
      // (see object Scaladoc): consumed by the per-doc counts and both
      // sides of the pair join.
      val fsh = shingleDf(s, dir)
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("sg"))))
        .filter(col("df") <= DfCut)
        .select("doc_id", "sg")
        .localCheckpoint()
      ngramScoredPairs(fsh)
    },

    // ------------------------------------------------------------------
    // Incremental n-gram Jaccard — the LAST dedup family without an
    // incremental form, and the hardest: the df<=DfCut stop-shingle cut
    // is GLOBAL, so corpus growth can push a previously-indexed shingle
    // over the cut and silently invalidate standing pairs (their common
    // counts AND their per-doc denominators). The maintenance is exact
    // anyway, via a delta-bounded fix-up set: only delta-carried
    // shingles can cross the cut; each crossing shingle names at most
    // DfCut standing docs; those docs plus the delta form R, the only
    // docs whose pair rows can change. Standing pairs with BOTH ends
    // outside R carry over from the persisted pair table untouched
    // (their filtered sets, common counts, and denominators are all
    // provably unchanged); pairs touching R re-score through one probe
    // of R's filtered shingles against the full filtered index. == q26
    // over the full corpus, verbatim oracle. OperatorPropertiesSpec
    // forces an actual cut-crossing and checks brute-force equality.
    QueryDef(
      "q142_incremental_ngram",
      s"incremental n-gram Jaccard under df-cut drift: persisted postings/df/pair artifacts; only delta-carried shingles can cross the df<=$DfCut cut, so the fix-up set is (crossing-shingle docs ∪ delta) — standing pairs outside it carry over untouched, pairs touching it re-score via one index probe; == full-corpus q26 exactly",
      sqlNgramOracle) { (s, dir) =>
      val deltaSh = stageSer(s, dir, shingle(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7)))
      ngramMaintain(ngramPostingsTable(s, dir), ngramDfTable(s, dir),
        ngramPairsTable(s, dir), deltaSh,
        ser = corpusBytes(s, dir) >= StageSerMinBytes)
    },

    // ------------------------------------------------------------------
    // q142 through the size-gated NON-broadcast route pinned on — the
    // q108/q115/q136 treatment applied to the n-gram family, closing
    // the last large-delta asymmetry in the dedup matrix (round-11
    // verdict #1). Past the gate — a day's-crawl delta, or a df-cut
    // avalanche where one hot shingle crosses and names millions of
    // standing docs — nothing delta-derived broadcasts: the delta's
    // per-shingle counts shuffle ONCE into the postings table's
    // 16-bucket sg layout and merge-join the bucketed scan (zero
    // index-side Exchange — PlanAuditSpec), and the R-bounded fix-up
    // joins drop their hints for AQE. Result == q142 == full-corpus
    // q26: verbatim oracle.
    QueryDef(
      "q145_incremental_ngram_large",
      s"LARGE-delta incremental n-gram Jaccard: the q142 contract through the size-gated non-broadcast path — delta df counts shuffled once into the postings table's 16-bucket sg layout and merge-joined with zero index-side Exchange, every delta-side broadcast dropped in favor of AQE; == q142 == full-corpus q26 exactly",
      sqlNgramOracle) { (s, dir) =>
      val deltaSh = stageSer(s, dir, shingle(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7)))
      ngramMaintain(ngramPostingsTable(s, dir), ngramDfTable(s, dir),
        ngramPairsTable(s, dir), deltaSh, forceLarge = Some(true),
        ser = corpusBytes(s, dir) >= StageSerMinBytes)
    },

    // ------------------------------------------------------------------
    // Connected components over the near-dup pair graph — the step that
    // turns pairwise similarity into a dedup DECISION: transitive
    // closure groups (a~b, b~c => {a,b,c}), one canonical (min) id per
    // cluster, every other member a drop candidate. Spark side is
    // iterative min-label propagation with POINTER DOUBLING: each round
    // first takes the min over each vertex's neighbors' labels (one
    // equi-join + groupBy), then path-halves — label(v) <-
    // label(label(v)) via a self-join of the label table — so a chain
    // component of diameter D converges in O(log D) rounds, not O(D):
    // after the neighbor step moves a label one hop, the jump step
    // doubles how far the minimum has traveled. Both steps only ever
    // LOWER labels toward the component minimum (labels are always ids
    // of reachable vertices), so the fixpoint is unchanged and the
    // monotone label-sum convergence test still applies.
    // localCheckpoint truncates the growing lineage per round. At
    // 100 TB the same loop runs with the label table hash-partitioned
    // on doc_id.
    // The oracle is an independent algorithm entirely: DuckDB's
    // recursive CTE computing full reachability, then min per vertex.
    QueryDef(
      "q54_dedup_components",
      "connected components over the MinHash near-dup pairs via min-label propagation to fixpoint; every document labeled with its cluster's canonical (min) id + cluster size; oracle is a recursive-CTE reachability computation",
      ccOracleSql) { (s, dir) =>
      val pairs = minhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
      val (labels, _) = connectedComponents(pairs)
      labelCorpus(Tables.documents(s, dir), labels)
    },

    // ------------------------------------------------------------------
    // Benchmark decontamination (GPT-3 appendix-C shape): a training
    // document is contaminated if it shares any 13-gram with a held-out
    // benchmark/eval set. Candidates come ONLY through the 13-gram
    // equi-join against the benchmark's shingle set — at 100 TB the
    // benchmark side is a few thousand documents (here the mod-5 slice
    // stands in), so its shingles broadcast and the corpus-sized side
    // never shuffles: the whole check is one broadcast-join + groupBy.
    // Both sides are DISTINCT per (doc, shingle), so count(*) per pair
    // is exactly the number of distinct shared 13-grams.
    QueryDef(
      "q86_decontaminate",
      "benchmark decontamination: corpus docs sharing any 13-gram with the benchmark slice (doc_id % 5 = 0), via broadcast equi-join on 48-bit span hashes — n_shared counts distinct shared hashes (collision-conflating, mirrored by the oracle)",
      decontaminateOracle) { (s, dir) =>
      // 48-bit span hashes, not 100-byte 13-gram strings, cross the
      // broadcast + join; staged once (spanHashes13) so the bench slice
      // is a filter over the same materialization, not a second pass
      val sh13 = spanHashes13(s, dir)
      val bench = sh13.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("bench_id"), col("h").as("bh"))
      sh13.join(broadcast(bench),
          col("h") === col("bh") && col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
    },

    // ------------------------------------------------------------------
    // Incremental decontamination under BENCHMARK GROWTH — the q86
    // maintenance direction q116 does not cover (q116 streams the
    // CORPUS against a fixed benchmark; here the benchmark grows while
    // the corpus stands). Two stacked durable artifacts: the corpus
    // span-hash index (tokenize once per corpus fingerprint) and the
    // standing contamination table (q86 vs the standing benchmark
    // half). A benchmark update reads the NEW eval docs' spans OUT OF
    // THE INDEX (zero text touched anywhere), broadcast-probes the
    // index, and appends — disjoint from the standing rows by bench_id
    // side, so the union is exact: q86's oracle over the full
    // benchmark, verbatim. At 100 TB: per-update cost is the index
    // probe; the corpus is never re-tokenized.
    QueryDef(
      "q137_incremental_decontaminate",
      "incremental decontamination under benchmark growth: persisted corpus span-hash index (tokenize once) + persisted standing contamination table; a new eval slice (bench_id % 10 == 5) reads its spans out of the index and broadcast-probes it, appended to the standing rows — == full-benchmark q86 exactly",
      decontaminateOracle) { (s, dir) =>
      val idx = spanIndexTable(s, dir)
      val standing = contamIndexTable(s, dir)
      val newBench = idx.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id").as("bench_id"), col("h").as("bh"))
      val fresh = idx.join(broadcast(newBench),
          col("h") === col("bh") && col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
      standing.unionByName(fresh)
    },

    // ------------------------------------------------------------------
    // Exact duplicated-span detection (the exact-substring half of
    // training-data dedup, cf. "Deduplicating Training Data Makes
    // Language Models Better": find verbatim token spans repeated across
    // documents so they can be cut, not just whole-doc dropped). Every
    // distinct 5-token span is hashed to 48 bits; a span shared by >= 2
    // docs marks every document carrying it. Per doc we report how much
    // of it is duplicated material (dup_spans / tot_spans). Plan shape:
    // shingle-explode -> hash groupBy (span bodies never join; only the
    // per-hash doc count flows back via a second groupBy join) — at
    // 100 TB both aggregations are map-side-combinable and the join is
    // hash-to-hash, never text-to-text.
    QueryDef(
      "q91_dup_spans",
      "duplicated 5-token spans across documents: 48-bit span hashes, per-span doc-frequency, per-doc duplicated/total span counts — the exact-substring cut list of training-data dedup",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents
         |              WHERE len(string_split(text, ' ')) >= 5),
         |sp AS (SELECT DISTINCT doc_id,
         |         ${sqlMd5Hash48("sg")} AS h
         |       FROM (SELECT doc_id, unnest(${sqlShingles("t", 5)}) AS sg FROM toks)),
         |df AS (SELECT h, count(*) AS n_docs FROM sp GROUP BY h)
         |SELECT sp.doc_id,
         |  CAST(count(*) FILTER (WHERE n_docs >= 2) AS BIGINT) AS dup_spans,
         |  CAST(count(*) AS BIGINT) AS tot_spans
         |FROM sp JOIN df USING (h)
         |GROUP BY sp.doc_id""".stripMargin) { (s, dir) =>
      val n = 5
      // staged once: `sp` feeds both the doc-frequency aggregation and
      // the join-back — without the checkpoint the tokenize-explode-
      // hash-distinct subtree runs twice (the q24/q26 staging lesson)
      val sp = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= n)
        .select(col("doc_id"), explode(shinglesOf(col("t"), n)).as("sg"))
        .select(col("doc_id"), md5Hash48(col("sg")).as("h"))
        .distinct()
        .localCheckpoint()
      val df = sp.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      sp.join(df, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(when(col("n_docs") >= 2, 1)).as("dup_spans"),
          count(lit(1)).as("tot_spans"))
    },

    // ------------------------------------------------------------------
    // Incremental dedup — the mode a 100-TB pipeline actually runs in:
    // a small arriving batch (here: doc_id % 10 == 7 stands in for
    // "today's crawl") is checked against the already-indexed corpus
    // WITHOUT ever forming corpus x corpus candidates. The corpus band
    // index is a PERSISTED bucketed stage table (bandIndexTable, built
    // once per JVM and reused by every batch — the standing artifact);
    // only the delta's bands are minhashed fresh, and the candidate
    // join is delta-bands (broadcast — delta-sized) against the TABLE,
    // so per-batch cost scales with the delta and the matched buckets,
    // never with corpus^2 or a corpus re-minhash. PlanAuditSpec asserts
    // the plan reads the bucketed table with zero corpus-side Exchange.
    // Verification (exact Jaccard) touches only candidate pairs, and
    // even the shingle pass it needs is candidate-pruned: a broadcast
    // semi-join restricts document tokenization to the matched corpus
    // docs, so NO stage of the batch re-reads corpus text at corpus
    // granularity.
    QueryDef(
      "q93_incremental_dedup",
      s"incremental MinHash dedup: arriving batch (doc_id%10==7) minhashed fresh and LSH-joined (broadcast) against the PERSISTED bucketed corpus band-index table, exact-Jaccard >= $JaccardThreshold verify on candidates only — per-batch cost scales with the delta",
      sqlIncrementalDedupOracle) { (s, dir) =>
      incrementalMatches(s, dir,
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7))
    },

    // ------------------------------------------------------------------
    // The SAME incremental contract through the LARGE-delta path: past
    // the size gate (DeltaBroadcastMaxDocs distinct docs) the delta's
    // bands are beyond broadcast range — a day's crawl at 100 TB — so
    // the probe instead shuffles the delta ONCE into the index's own
    // HashPartitioning(band_key, 16) layout and merge-joins the
    // bucketed scan: still ZERO index-side Exchange (the bucket layout
    // IS the corpus-side shuffle, paid once at index-build time), and
    // no broadcast of anything delta-sized anywhere (the verify joins
    // drop their hints too — AQE decides by runtime size). The path is
    // pinned here regardless of the stand-in delta's actual size so the
    // plan is auditable at gate scale (PlanAuditSpec) and the result
    // provably equals q93's: the oracle below is q93's, verbatim.
    QueryDef(
      "q108_incremental_dedup_bucketed",
      s"LARGE-delta incremental dedup: the q93 contract through the size-gated non-broadcast path — delta bands shuffled once into the index's 16-bucket band_key layout, merge-joined with zero index-side Exchange and no delta broadcast; result == q93 exactly",
      sqlIncrementalDedupOracle) { (s, dir) =>
      incrementalMatches(s, dir,
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7),
        forceLarge = Some(true))
    },

    // ------------------------------------------------------------------
    // The SAME incremental contract, LIVE: the arriving batch lands as
    // parquet FILE DROPS consumed by a checkpointed Structured Streaming
    // drain (maxFilesPerTrigger=1 -> one micro-batch per drop), and each
    // micro-batch runs the identical delta-vs-index pipeline inside
    // foreachBatch — probe the DURABLE band-index table (broadcast
    // delta), candidate-pruned exact-Jaccard verify, append matches.
    // Each arriving doc is scored independently against the standing
    // corpus index, so the final table equals the batch q93 result
    // EXACTLY regardless of how the arrivals were micro-batched — the
    // oracle below is q93's, verbatim. At 100 TB this is the shape of a
    // continuously-deduplicating ingest: only the trigger changes.
    QueryDef(
      "q105_stream_incremental_dedup",
      s"STREAMING incremental dedup: arriving batch lands as 3 parquet file drops, one checkpointed AvailableNow drain (maxFilesPerTrigger=1 -> 3 micro-batches), each micro-batch LSH-probed (broadcast) against the DURABLE band-index table + exact-Jaccard >= $JaccardThreshold verified; final table == batch q93 result regardless of micro-batching",
      sqlIncrementalDedupOracle) { (s, dir) =>
      streamIncrementalDedup(s, dir)
    },

    // ------------------------------------------------------------------
    // Streaming INDEX MAINTENANCE — the piece q105 leaves implicit: the
    // standing band index is not just consumed by the stream, it is
    // GROWN by it. The whole corpus arrives as 3 ordered file drops
    // against an initially EMPTY bucketed index; every micro-batch is
    // (1) matched against the index SO FAR, then (2) its own bands are
    // appended (insertInto bucketizes per the catalog spec, so the
    // layout invariant survives every append). The emitted set is
    // exactly the cross-drop near-dup pairs — deterministic because the
    // drop files carry explicit strictly-increasing mtimes, which is
    // the order FileStreamSource processes them in — so the DuckDB
    // oracle restates it as a plain drop-index inequality. Within-drop
    // pairs are deliberately absent (a batch matches before indexing
    // itself); finding those is the all-pairs q24's job. At 100 TB this
    // is the bootstrap AND the steady state of a continuously-
    // deduplicating ingest: the same two steps, forever.
    QueryDef(
      "q107_stream_index_bootstrap",
      s"STREAMING index maintenance: corpus streamed in 3 ordered drops into an initially EMPTY bucketed band index, each micro-batch matched against the index so far THEN appended to it (insertInto keeps the bucket layout) — emits every cross-drop exact-Jaccard >= $JaccardThreshold pair",
      s"""WITH $sqlSigBandsCtes,
         |cand AS (SELECT DISTINCT d.doc_id AS dd, c.doc_id AS cd
         |  FROM bands d JOIN bands c ON d.band_key = c.band_key
         |  WHERE d.doc_id % 3 > c.doc_id % 3),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT dd, cd, count(*) AS c
         |  FROM cand JOIN sh x ON x.doc_id = dd
         |            JOIN sh y ON y.doc_id = cd AND y.sg = x.sg
         |  GROUP BY dd, cd)
         |SELECT dd AS doc_id, cd AS dup_of,
         |  c::DOUBLE / (xa.n + yb.n - c) AS jaccard
         |FROM common JOIN cnt xa ON xa.doc_id = dd
         |            JOIN cnt yb ON yb.doc_id = cd
         |WHERE c::DOUBLE / (xa.n + yb.n - c) >= $JaccardThreshold""".stripMargin) { (s, dir) =>
      streamIndexBootstrap(s, dir)
    },

    // ------------------------------------------------------------------
    // The SEMANTIC incremental contract, LIVE — q105's mirror on the
    // embedding side, completing the streaming half of the family
    // symmetry. The arriving embedding delta lands as 3 file drops;
    // each micro-batch is assigned through the PERSISTED codebook
    // (q112's durable artifact, re-read not re-trained), broadcast-
    // probed against the PERSISTED bucketed block index, and its
    // lowest-corpus-id keepers land as a dynamic overwrite of the
    // batch's own sink partition (idempotent under replay). The index
    // is static corpus-side and every delta vector arrives exactly
    // once, so the per-batch keeper equals the global keeper and the
    // final table == the batch q110/q112 result regardless of
    // micro-batching — the oracle is theirs, verbatim.
    QueryDef(
      "q113_stream_semantic_dedup",
      s"STREAMING semantic dedup: arriving embedding delta as 3 file drops, each micro-batch assigned via the PERSISTED codebook and broadcast-probed against the PERSISTED block index, cosine >= ${SimilarityQueries.NearDupThreshold} with lowest-corpus-id keepers; final table == batch q112 result",
      SimilarityQueries.semanticIncrementalOracle) { (s, dir) =>
      streamSemanticDedup(s, dir)
    },

    // ------------------------------------------------------------------
    // Streaming SEMANTIC index maintenance — q107's mirror, the last
    // cell of the family symmetry matrix: the block index bootstrapped
    // and GROWN by the stream itself. The codebook is trained once,
    // up front, on the full corpus (the offline-train/online-serve
    // split of a production ANN index — q90's Lloyd arithmetic) and
    // staged as a tiny table the micro-batches re-read; the corpus
    // then arrives as 3 ordered drops against an initially EMPTY
    // bucketed block index. Each micro-batch is (1) assigned through
    // the staged codebook, (2) cosine-matched against the index SO FAR
    // (broadcast batch blocks, bucketed index scan), then (3) appended
    // via insertInto, which bucketizes per the catalog spec. Emits
    // exactly the cross-drop near-dup pairs; replay-idempotent the
    // same way q107 is (probe minus own partition, overwrite by
    // batch_id); post-drain the index recompacts to one file per
    // bucket through the shared compactBucketedIndex.
    QueryDef(
      "q114_stream_sem_index_bootstrap",
      s"STREAMING semantic index maintenance: codebook trained once up front, corpus streamed in 3 ordered drops into an initially EMPTY bucketed block index, each micro-batch assigned + matched against the index so far THEN appended (insertInto keeps the bucket layout) — emits every cross-drop cosine >= ${SimilarityQueries.NearDupThreshold} pair",
      s"""WITH ${SimilarityQueries.semAllBlocksOracleCtes}
         |SELECT d.vec_id AS vec_id, c.vec_id AS dup_of,
         |  ${sqlCosine("d.v", "c.v")} AS cosine
         |FROM cells d JOIN cells c
         |  ON d.cell = c.cell AND d.sub = c.sub
         | AND d.vec_id % 3 > c.vec_id % 3
         |WHERE ${sqlCosine("d.v", "c.v")} >= ${SimilarityQueries.NearDupThreshold}""".stripMargin) { (s, dir) =>
      streamSemIndexBootstrap(s, dir)
    },

    // ------------------------------------------------------------------
    // Streaming decontamination — the q86 contract LIVE, extending the
    // streaming treatment to the third probe family. The role split is
    // the reverse of q105's: the BENCHMARK span-hash set is the small
    // standing artifact (eval sets are a few thousand docs and change
    // rarely — staged ONCE up front, the q114 codebook treatment), and
    // the CORPUS is what arrives. All documents stream in 3 drops;
    // each micro-batch is 13-gram span-hashed through the same
    // expressions as the batch query and broadcast-joined against the
    // staged benchmark table, its contamination rows landing as a
    // dynamic overwrite of the batch's own sink partition (replay-
    // idempotent). Batch-local counts are globally correct because the
    // drops partition docs — a doc's hashes never split across
    // batches — and the benchmark side is static. Final table ==
    // batch q86 exactly (verbatim oracle).
    QueryDef(
      "q116_stream_decontaminate",
      "STREAMING benchmark decontamination: benchmark 13-gram span hashes staged once up front, corpus streamed in 3 drops, each micro-batch span-hashed and broadcast-joined against the staged benchmark set — final table == batch q86 exactly",
      decontaminateOracle) { (s, dir) =>
      streamDecontaminate(s, dir)
    },

    // ------------------------------------------------------------------
    // SimHash Hamming near-dup pairs — the pair-mining half q25 leaves
    // implicit (q25 declares the fingerprint; this declares the JOIN).
    // Fingerprints are voted over shingle hashes (see shingleSimhash:
    // token-level votes are vocabulary-dominated and unblockable), then
    // blocked 4 x 12 bits: pigeonhole guarantees every pair within
    // Hamming 3 shares a block, so candidates come ONLY through block
    // equality — never all-pairs — and verification is one
    // bit_count(xor) projection per candidate. The cheapest dedup
    // family at 100 TB: 8 bytes of state per doc, no text re-read
    // anywhere past the fingerprint pass.
    QueryDef(
      "q127_simhash_pairs",
      s"SimHash near-dup pairs: 48-bit shingle-voted fingerprints, $SimhashBlockCount x $SimhashBlockBits-bit Hamming blocks for candidates (pigeonhole-complete at distance $HammingMax), bit_count(xor) verify — no all-pairs stage, no text past the fingerprint pass",
      s"""WITH $sqlSimhashBlockCtes
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sblocks a JOIN sblocks b
         |  ON a.block_key = b.block_key AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax""".stripMargin) { (s, dir) =>
      // staged once: the fingerprint table feeds both sides of the
      // block self-join (the q24/q26 staging lesson)
      val fp = shingleSimhash(Tables.documents(s, dir)).localCheckpoint()
      val blocks = simhashBlocks(fp)
      val a = blocks.select(col("doc_id").as("da"),
        col("simhash").as("fa"), col("block_key"))
      val b = blocks.select(col("doc_id").as("db"),
        col("simhash").as("fb"), col("block_key").as("bk"))
      a.join(b, col("block_key") === col("bk") && col("da") < col("db"))
        .select(col("da"), col("db"),
          expr("CAST(bit_count(fa ^ fb) AS BIGINT)").as("hamming"))
        .filter(col("hamming") <= HammingMax)
        .distinct()
        .select(col("da").as("doc_a"), col("db").as("doc_b"), col("hamming"))
    },

    // ------------------------------------------------------------------
    // The SimHash incremental contract: the arriving delta fingerprinted
    // fresh and probed against the PERSISTED bucketed fingerprint index
    // (the family's durable artifact, same DurableIndex contract as the
    // band and block indexes). Distinctive vs q93/q110: the verify is
    // closed-form on the join output — no candidate-pruned second pass,
    // no corpus re-read of ANY kind. Size-gated broadcast like every
    // probe in the family.
    QueryDef(
      "q128_incremental_simhash",
      s"incremental SimHash dedup: delta (doc_id%10==7) fingerprinted fresh and block-joined (broadcast, size-gated) against the PERSISTED 16-bucket fingerprint index, Hamming <= $HammingMax via one bit_count(xor) projection — zero corpus re-read after the index build",
      sqlSimhashIncrementalOracle) { (s, dir) =>
      simhashMatches(s, dir,
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7))
    },

    // ------------------------------------------------------------------
    // q128 through the size-gated NON-broadcast route pinned on — the
    // q108/q115 treatment applied to the SimHash family, completing the
    // large-delta symmetry across all three dedup families. Past the
    // gate the delta fingerprints shuffle once into the index's
    // 16-bucket block_key layout and merge-join the bucketed scan with
    // zero index-side Exchange; pinned here regardless of the stand-in
    // delta's size so the plan is auditable at gate scale
    // (PlanAuditSpec). Result == q128 exactly: verbatim oracle.
    QueryDef(
      "q136_incremental_simhash_large",
      s"LARGE-delta incremental SimHash dedup: the q128 contract through the size-gated non-broadcast path — delta fingerprints shuffled once into the index's 16-bucket block_key layout, merge-joined with zero index-side Exchange and no delta broadcast; result == q128 exactly",
      sqlSimhashIncrementalOracle) { (s, dir) =>
      simhashMatches(s, dir,
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7),
        forceLarge = Some(true))
    },

    // ------------------------------------------------------------------
    // The SAME contract LIVE: q105's drain shape with the SimHash probe
    // per micro-batch. Final table == batch q128 regardless of
    // micro-batching (static index + drops partition the delta);
    // replay-idempotent via the batch_id-partitioned dynamic-overwrite
    // sink. Oracle is q128's, verbatim.
    QueryDef(
      "q129_stream_simhash_dedup",
      s"STREAMING SimHash dedup: arriving delta as 3 file drops, one checkpointed AvailableNow drain, each micro-batch fingerprinted and block-probed against the PERSISTED fingerprint index; final table == batch q128 exactly",
      sqlSimhashIncrementalOracle) { (s, dir) =>
      streamSimhashDedup(s, dir)
    },

    // ------------------------------------------------------------------
    // Incremental PAIR-SET maintenance — the closure of the incremental
    // family: q93/q108 answer "what does the delta match?", this answers
    // "what is the NEW all-pairs result?" without recomputing it from
    // scratch. Because bands and shingle counts are PER-DOCUMENT
    // (independent of the rest of the corpus), the full pair set
    // decomposes exactly into three disjoint parts: standing pairs
    // (both docs in the indexed corpus — read from the PERSISTED
    // [[pairIndexTable]], the maintained artifact, a bare parquet scan
    // with zero recompute — PairIndexSpec), within-delta pairs (both
    // docs arriving — delta-sized all-pairs, the cheap part), and
    // cross pairs (the q93 probe against the DURABLE band index).
    // Disjointness is structural — a pair is classified by which side
    // each doc lives on — so the union needs no dedup, and the result
    // provably equals the batch q24 over the full corpus: the oracle
    // below is q24's, verbatim. At 100 TB this is how the pair table
    // is actually maintained: per batch, append (within ∪ cross) to
    // the standing pair table — PairIndexSpec proves append-then-read
    // == full recompute across two successive batches; nothing
    // corpus-sized ever recomputes.
    QueryDef(
      "q130_incremental_pair_maintenance",
      s"incremental all-pairs maintenance: PERSISTED standing pair table (bare scan, zero recompute) ∪ within-delta pairs ∪ cross pairs (the q93 probe against the durable band index) — a structurally disjoint decomposition that equals batch q24 exactly (verbatim oracle); per-batch cost is delta-pairs + the index probe, never a corpus recompute",
      s"WITH $sqlMinhashCtes\n$sqlMinhashPairSelect") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val standing = pairIndexTable(s, dir)
      val delta = docs.filter(col("doc_id") % 10 === 7)
      val within = pairsOfDocs(delta)
      val cross = incrementalMatches(s, dir, delta)
        .select(least(col("delta_id"), col("corpus_id")).as("doc_a"),
          greatest(col("delta_id"), col("corpus_id")).as("doc_b"),
          col("jaccard"))
      standing.unionByName(within).unionByName(cross)
    },

    // ------------------------------------------------------------------
    // Incremental COMPONENT maintenance — the q130 decomposition lifted
    // one level, from the pair set to the cluster labeling (the thing
    // an entity-resolution / dedup-keeper pipeline actually serves).
    // The standing labels are the PERSISTED [[ccIndexTable]]; their
    // star edges (doc -> canonical id) reconstruct the standing
    // connectivity exactly, so running the O(log D) min-label fixpoint
    // over star(E0) ∪ within-delta ∪ cross — an edge set of
    // |clustered docs| + |new pairs| rows, NEVER corpus-sized —
    // produces the identical labeling to a from-scratch CC over all
    // pairs: CC(star(E0) ∪ E1) == CC(E0 ∪ E1), since stars preserve
    // reachability and min-labels are order-independent. Oracle is
    // q54's full-corpus recursive CTE, verbatim.
    QueryDef(
      "q131_incremental_components",
      "incremental connected-components maintenance: PERSISTED standing labels re-entered as star edges, merged with the delta's within + cross pairs through the same O(log D) min-label fixpoint — equals batch q54 over the full corpus exactly (verbatim oracle); per-batch cost scales with clustered docs + new pairs, never the corpus",
      ccOracleSql) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val standing = ccIndexTable(s, dir)
      val starEdges = standing.filter(col("doc_id") =!= col("label"))
        .select(col("doc_id").as("doc_a"), col("label").as("doc_b"))
      val delta = docs.filter(col("doc_id") % 10 === 7)
      val within = pairsOfDocs(delta).select("doc_a", "doc_b")
      val cross = incrementalMatches(s, dir, delta)
        .select(col("delta_id").as("doc_a"), col("corpus_id").as("doc_b"))
      val (labels, _) = connectedComponents(
        starEdges.unionByName(within).unionByName(cross))
      labelCorpus(docs, labels)
    },

    // ------------------------------------------------------------------
    // The q131 contract LIVE — streaming COMPONENT maintenance, closing
    // the CC family's {batch q54, incremental q131, streaming q134}
    // matrix. The delta arrives as 3 ORDERED drops (cross-drop pairs
    // depend on processing order, q107's shape); each micro-batch mines
    // its EDGE contribution — within-batch pairs, plus cross pairs
    // against both the standing band index and the stream-grown delta
    // band index so far — into batch_id-partitioned edge shards
    // (replay-idempotent: the probe reads the grown index MINUS the
    // batch's own partition), then appends its own bands. Post-drain,
    // ONE min-label fixpoint over star(standing labels) ∪ streamed
    // edges — state-sized, never corpus-sized — labels the corpus
    // identically to batch q54: verbatim oracle.
    QueryDef(
      "q134_stream_components",
      "STREAMING connected-components maintenance: delta as 3 ordered drops, each micro-batch mines within + cross edge shards (vs the standing band index AND the stream-grown delta index so far) into replay-idempotent batch_id partitions; post-drain min-label fixpoint over star(standing labels) ∪ streamed edges == batch q54 exactly",
      ccOracleSql) { (s, dir) =>
      streamComponents(s, dir)
    },

    // ------------------------------------------------------------------
    // DELETION/RETRACTION — the maintenance direction every durable
    // artifact lacked (round-11 verdict #1, the top ask): the stack so
    // far only ever GROWS; a real pipeline must also remove documents
    // (takedowns, licensing, contamination discovered late) and have
    // the standing artifacts TRACK the corpus. A delete set (here the
    // doc_id % 10 == 3 slice of the indexed corpus stands in for a
    // takedown batch) tombstones its band rows, retracts its pairs
    // (per-pair facts — removal IS the maintenance, no rescoring), and
    // re-labels ONLY the components containing a deleted doc, over
    // their retained pairs (deletion can split components, never merge
    // them — every other component's labels carry over verbatim). The
    // result equals the batch q54-shape labeling over corpus-minus-
    // deleted, stated independently by the oracle's recursive-CTE
    // reachability over the restricted corpus. Per-delete cost: |D| +
    // affected clusters, never a corpus recompute.
    QueryDef(
      "q143_dedup_retraction",
      "deletion/retraction over the standing band/pair/cc artifacts: delete-set bands tombstoned (anti-join against the broadcast delete set), pairs retracted (per-pair facts, no rescoring), and ONLY components containing a deleted doc re-labeled over their retained pairs — == the batch CC labeling over corpus-minus-deleted exactly",
      ccOracleSqlFor("doc_id % 10 NOT IN (3, 7)")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
      val (_, _, labels1) = retractMaintain(bandIndexTable(s, dir),
        pairIndexTable(s, dir), ccIndexTable(s, dir), del)
      labelCorpus(
        docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 7),
        labels1)
    },

    // ------------------------------------------------------------------
    // Retraction over the DECONTAMINATION stack (q137's artifacts) —
    // the q143 contract applied to the span/contam family, in BOTH its
    // directions at once: corpus docs deleted (takedowns — doc_id % 10
    // == 3) and a benchmark slice RETIRED (an eval set rotated out —
    // bench_id % 10 == 0, i.e. the STANDING half, so the tombstones cut
    // across artifact generations: standing rows retired, appended
    // rows carried). Both are pure tombstones because contamination
    // rows are PER-PAIR facts ((doc, bench, n_shared) depends on the
    // two documents alone) — removal IS the maintenance, no
    // re-probing, no re-tokenization, cost |D| + |B|. The upstream
    // span_index tombstone is the same anti-join shape
    // (RetractionSpec proves it equals the rebuilt index). == q86's
    // oracle over corpus-minus-deleted vs the surviving benchmark.
    QueryDef(
      "q146_decontam_retraction",
      "retraction over the decontamination artifacts: deleted corpus docs AND a retired benchmark slice tombstoned out of the full-benchmark contamination table (per-pair facts — two anti-joins against the broadcast delete sets, no re-probing or re-tokenization) — == batch decontamination over corpus-minus-deleted vs the surviving benchmark exactly",
      decontaminateOracleFor("doc_id % 10 != 3", "doc_id % 10 != 0")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // the full-benchmark contamination artifact, as q137 maintains it
      val idx = spanIndexTable(s, dir)
      val newBench = idx.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id").as("bench_id"), col("h").as("bh"))
      val fresh = idx.join(broadcast(newBench),
          col("h") === col("bh") && col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
      val full = contamIndexTable(s, dir).unionByName(fresh)
      val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
      val retired = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("bench_id"))
      full.join(broadcast(del), Seq("doc_id"), "left_anti")
        .join(broadcast(retired), Seq("bench_id"), "left_anti")
    },

    // ------------------------------------------------------------------
    // Retraction over the N-GRAM family — the subtlest member of the
    // matrix and the mirror of q142: deletion LOWERS df, so stop-
    // shingles can UN-CROSS the cut and surviving documents GAIN
    // admitted shingles — standing pairs between docs that never
    // touched a deleted doc can still change score. The fix-up set is
    // provably delta-bounded (un-crossing shingles ⊆ shingles(D), each
    // naming <= DfCut survivors); pairs outside R ∪ D carry over
    // VERBATIM; zero text is read anywhere — even the delete set's
    // shingles come out of the postings artifact. == full q26 over
    // corpus-minus-deleted. OperatorPropertiesSpec forces an actual
    // un-crossing.
    QueryDef(
      "q150_ngram_retraction",
      s"retraction under df-cut drift, the q142 mirror: deleted docs tombstoned out of the postings artifact, df lowered, stop-shingles that UN-CROSS df<=$DfCut re-admit their <=$DfCut surviving carriers into a delta-bounded re-score set R, standing pairs outside R carried verbatim, zero text read — == full n-gram Jaccard over corpus-minus-deleted exactly",
      sqlNgramOracleFor("doc_id % 10 NOT IN (3, 7)")) { (s, dir) =>
      val del = Tables.documents(s, dir).filter(col("doc_id") % 10 === 3)
        .select("doc_id")
      ngramRetract(ngramPostingsTable(s, dir), ngramPairsTable(s, dir), del,
        ser = corpusBytes(s, dir) >= StageSerMinBytes)
    },

    // ------------------------------------------------------------------
    // The q143 retraction LIVE — takedowns arrive as a FEED, not a
    // batch: 3 ordered drops of delete ids drain into a batch_id-
    // partitioned delete log (the audit trail a real pipeline keeps),
    // and ONE post-drain retraction folds the union — sound because
    // deletions commute and fold: retract∘retract == retract(∪).
    // Retraction is the one maintenance direction idempotent BY
    // NATURE (anti-joins absorb duplicate ids), so replay safety
    // needs no partition-overwrite argument — it gets one anyway.
    // == batch q143 exactly, verbatim oracle; StreamReplaySpec
    // chaos-kill.
    QueryDef(
      "q151_stream_retraction",
      "STREAMING retraction: a takedown feed drained as 3 delete-id drops into a replay-idempotent batch_id-partitioned delete log, one post-drain band/pair/cc retraction over the folded union (deletions commute and fold) — == batch q143 == CC labeling over corpus-minus-deleted exactly",
      ccOracleSqlFor("doc_id % 10 NOT IN (3, 7)")) { (s, dir) =>
      streamRetraction(s, dir)
    },

    // ------------------------------------------------------------------
    // Retraction PERSISTED — the durable half of q143, now with q157's
    // WRITE economics (round-13 verdict #1): a takedown-sized delete no
    // longer rewrites the corpus-scale band/pair/cc artifacts — it
    // publishes ONE O(|D| + affected-clusters) PATCH generation (delete
    // ids + affected labels + relabeled rows in a tiny sidecar) that
    // readers compose over the UNCHANGED base artifacts via broadcast
    // anti-joins; only a sweep past the tombstone-debt gate folds into
    // full generations (q159). First run pays the |D|-bounded patch
    // build once; re-runs re-attach the sidecar and re-compose
    // (RetractionSpec proves patch == full-rewrite == fresh build).
    // Same labeling contract and verbatim oracle as q143.
    QueryDef(
      "q154_retraction_publish",
      s"retraction published durably as a PATCH: an O(|D|+affected-clusters) (corpus fp x delete-set fp)-keyed sidecar (delete ids, affected labels, relabeled rows) composed over the unchanged base band/pair/cc artifacts via broadcast anti-joins — full-generation fold only past the ${(RetractRebuildDebtFraction * 100).toInt}% debt gate — == q143 == batch CC labeling over corpus-minus-deleted exactly",
      ccOracleSqlFor("doc_id % 10 NOT IN (3, 7)")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
      val (_, _, labels1) = retractPublish(s, dir, del)
      labelCorpus(
        docs.filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 7),
        labels1)
    },

    // ------------------------------------------------------------------
    // PAST-THE-BUDGET deletion — the retraction matrix's one open end
    // (round-12 verdict #1): q150's tombstone + delta-bounded fix-up is
    // the takedown-sized contract, but a licensing-sweep-scale delete
    // breaks its economics (R stops being delta-bounded, the delete
    // set stops broadcasting) — and without a fold, every future read
    // pays ever-growing tombstone joins. The debt gate measures the
    // deleted fraction of the postings rows (one doc_id-column scan of
    // the artifact, zero text); past it, deletion IS a rebuild: the
    // base artifacts major-compact over the net corpus and publish as
    // a fresh (corpus fp x delete-set fp) generation — which IS the
    // delete-log truncation, since every later read is a bare scan of
    // an artifact whose identity already contains the delete set. The
    // ~44% delete below trips the gate naturally (no forcing).
    QueryDef(
      "q157_ngram_retraction_rebuild",
      s"past-the-budget deletion is a REBUILD: a sweep-scale delete (~44% of standing postings) trips the ${(NgramRebuildDebtFraction * 100).toInt}% tombstone-debt gate and major-compacts the n-gram family — net postings re-df'd in one window shuffle, pairs fully re-scored, published as a fresh (corpus fp x delete-set fp) generation that truncates the delete log — == full n-gram Jaccard over corpus-minus-deleted exactly",
      sqlNgramOracleFor("doc_id % 2 = 0")) { (s, dir) =>
      val del = Tables.documents(s, dir)
        .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 2 === 1)
        .select("doc_id")
      ngramRetractPublish(s, dir, del)
    },

    // ------------------------------------------------------------------
    // The FULL artifact lifecycle, declared (round-12 verdict #5):
    // RetractionSpec proves the mixed append-delete-append chain
    // spec-side; this is the same defining sequence as an
    // oracle-checked query over the DURABLE standing artifacts — the
    // q130 append decomposition (within ∪ cross against the live band
    // index), the q143 retraction, and the q131 star-edge label merge
    // chained on ONE artifact stack. The delete runs against APPENDED
    // state and the second append against RETRACTED state — the
    // composition no per-direction query covers. == the batch CC
    // labeling over the net corpus (standing ∪ both appends minus the
    // takedown), verbatim oracle.
    QueryDef(
      "q158_artifact_lifecycle",
      "the artifact lifecycle end-to-end: append batch -> takedown retraction -> append batch chained over one band/pair/cc artifact stack (q130 within∪cross appends, q143 tombstone+split relabeling, q131 star-edge merges) — == batch CC labeling over the net corpus exactly",
      ccOracleSqlFor("doc_id % 10 != 3")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // standing artifacts cover doc_id % 10 != 7; the % 10 == 7 slice
      // arrives as two append batches around a % 10 == 3 takedown
      val a1 = docs.filter(col("doc_id") % 20 === 7)
      val a2 = docs.filter(col("doc_id") % 20 === 17)
      val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")

      var bands: DataFrame = bandIndexTable(s, dir)
      var pairs: DataFrame = pairIndexTable(s, dir)
      var labels: DataFrame = ccIndexTable(s, dir)
      def star(l: DataFrame): DataFrame = l.filter(col("doc_id") =!= col("label"))
        .select(col("doc_id").as("doc_a"), col("label").as("doc_b"))
      def append(delta: DataFrame): Unit = {
        val deltaSh = shingle(delta).localCheckpoint()
        // the delta's bands feed THREE consumers (within-delta
        // self-join, cross probe, band growth): signed once. Lazy
        // checkpoint — the first consumer materializes it, the others
        // reuse the blocks without an extra blocking job
        val deltaBands = sigBands(deltaSh).localCheckpoint(eager = false)
        // every chain staging below is LAZY: the driver runs the
        // lifecycle steps sequentially, so the first consuming job
        // materializes each staged state and later steps reuse the
        // blocks — while a state the chain never reads again (pairs
        // and bands after the second append) never materializes at
        // all, instead of paying a dead eager staging job
        val fresh = minhashPairsOf(deltaSh, Some(deltaBands))
          .unionByName(crossPairsAgainstSh(s, dir, deltaSh, bands,
            Some(deltaBands)))
          .localCheckpoint(eager = false)
        pairs = pairs.unionByName(fresh).localCheckpoint(eager = false)
        bands = bands.unionByName(deltaBands).localCheckpoint(eager = false)
        labels = connectedComponents(
          star(labels).unionByName(fresh.select("doc_a", "doc_b")))._1
          .localCheckpoint(eager = false)
      }
      append(a1)
      val (b2, p2, l2) = retractMaintain(bands, pairs, labels, del)
      bands = b2.localCheckpoint(eager = false)
      pairs = p2.localCheckpoint(eager = false)
      labels = l2.localCheckpoint(eager = false)
      append(a2)
      labelCorpus(docs.filter(col("doc_id") % 10 =!= 3), labels)
    },

    // ------------------------------------------------------------------
    // PAST-THE-BUDGET deletion on the band/pair/cc stack — q157's
    // rebuild side applied to the family q154 patches: a sweep-scale
    // takedown (4 of the 9 indexed slices, ~44% of the standing band
    // rows) trips the tombstone-debt gate NATURALLY (no forcing), so
    // the patch economics no longer hold — the affected-component set
    // stops being |D|-bounded and a patch-composed read would anti-join
    // away half its base scan forever. Deletion IS a rebuild here: the
    // post-delete artifacts major-compact into full (corpus fp x
    // delete-set fp) generations (band_index_r bucketed like its base,
    // pair_index_r_b16, cc_index_r), which truncates the patch log —
    // every later read is a bare bucketed scan again. == batch CC
    // labeling over corpus-minus-deleted, verbatim oracle.
    QueryDef(
      "q159_retraction_publish_rebuild",
      s"past-the-budget retraction publish is a FOLD: a sweep-scale takedown (~44% of standing band rows) trips the ${(RetractRebuildDebtFraction * 100).toInt}% tombstone-debt gate and major-compacts band/pair/cc into full (corpus fp x delete-set fp) generations — the patch-log truncation; every later read a bare bucketed scan — == batch CC labeling over corpus-minus-deleted exactly",
      ccOracleSqlFor("doc_id % 10 NOT IN (1, 3, 5, 9, 7)")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val del = docs.filter((col("doc_id") % 10).isin(1, 3, 5, 9))
        .select("doc_id")
      val (_, _, labels1, _) = retractPublishMode(s, dir, del)
      labelCorpus(
        docs.filter(!(col("doc_id") % 10).isin(1, 3, 5, 9, 7)),
        labels1)
    },

    // ------------------------------------------------------------------
    // BENCHMARK RETIREMENT — the decontamination lifecycle cell q146
    // leaves open (round-15 verdict #5): the contam family has build
    // (q86), growth (q137), streaming (q116), and doc-takedown (q146)
    // cells, but an eval set rotated OUT of the suite must drop its
    // contamination rows durably — published once, served by every
    // later session without the retirement batch in hand — and its
    // docs un-flag for free (a doc contaminated only vs the retired
    // benchmark has no surviving rows). The retired slice here is a
    // tenth of the benchmark (bench_id % 50 == 0); the shared debt
    // gate decides the publish — under it, a contam_del patch sidecar
    // readers compose via one broadcast anti-join over the durable
    // full-benchmark table; past it (a sparse corpus can concentrate
    // contamination in few bench docs), a contam_r fold read as a bare
    // scan. Either mode == q86's oracle restricted to the surviving
    // benchmark, verbatim (RetractionSpec pins both).
    QueryDef(
      "q161_bench_retirement",
      s"benchmark retirement over the decontamination artifacts: a rotated-out eval slice (bench_id % 50 == 0) published ONCE as a (corpus fp x retire-set fp) contam_del patch sidecar or, past the shared ${(RetractRebuildDebtFraction * 100).toInt}% debt gate, a contam_r fold; readers compose one broadcast anti-join over the durable full-benchmark contamination table (per-pair facts: no re-probing, no re-tokenization) — == decontamination vs the surviving benchmark exactly",
      decontaminateOracleFor("", "doc_id % 50 != 0")) { (s, dir) =>
      val retired = Tables.documents(s, dir)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_id"))
      contamRetracted(s, dir, Some(retired))
    })
}
