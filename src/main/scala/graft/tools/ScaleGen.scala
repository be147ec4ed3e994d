package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Bumped whenever the generated CONTENT changes (new blocks, remap
    * scheme, normalization) — ScaleGate keys corpus reuse on the marker
    * this version lands in, so a stale corpus regenerates instead of
    * silently gating on old content. v2 = the hhCommonDocs block; v3 =
    * per-sub-block filler prefixes (v2 planted verbatim arriving/standing
    * duplicate pairs). */
  val GenVersion = 3

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
    val skew = args.lift(3).exists(a => a == "skew" || a == "--skew")
    // optional hh-block overrides (standing, arriving per copy) for
    // controlled A/B corpora; defaults are generate()'s
    val hhS = args.lift(4).map(_.toInt).getOrElse(40)
    val hhA = args.lift(5).map(_.toInt).getOrElse(8)
    // shared entry-point session (round-16 advice: one builder site)
    val spark = graft.GraftSession.build()
    generate(spark, src, out, copies, skew,
      hhStandingPerCopy = hhS, hhArrivingPerCopy = hhA)
    spark.stop()
  }

  /** The SKEW blocks (`skew = true`): the uniform replicas are
    * decorrelated by construction, so the engine's size gates — the
    * delta-broadcast gate, the CC driver-union-find gate, the df-cut
    * crossing machinery — are coded for skew the data never exhibits
    * (round-13 verdict #4). Zipfian reality is boilerplate: license
    * headers, templated pages, crawler chrome. Three blocks, appended
    * above the replica id space:
    *
    *   1. BOILERPLATE MEGA-CLUSTER (`megaDocs`, ids ≡ 7 mod 10): 30
    *      shared boilerplate tokens + 2 unique tail tokens per doc —
    *      pairwise Jaccard 28/32 ≈ 0.88 ≥ the 0.8 LSH threshold, so
    *      the block is ONE near-dup clique: C(m,2) pairs, the
    *      mega-component whose doubled edge list blows past the 64 MB
    *      CC driver gate at m ≥ ~2500 (SkewSpec proves the deferral
    *      and the exact labeling);
    *   2. HOT-SHINGLE BLOCK (`hotDocs`, ids ≡ 7 mod 10): every doc
    *      carries one shared HOT trigram (df = hotDocs + crossingDocs
    *      ≫ the df cut) plus 15 unique tokens — 1-of-16 shingle
    *      overlap keeps pairwise Jaccard ~0.03 (no LSH pair blowup)
    *      while the staged delta crosses the 32 MB broadcast gate, so
    *      the n-gram large route fires with NO forceLarge;
    *   3. CROSSING STANDING DOCS (`crossingDocs`, ids ≡ 1 mod 10): the
    *      same hot trigram on the STANDING side at df ≤ the cut, so
    *      the arriving hot block pushes it across — the df-cut
    *      crossing machinery runs on data, not just on forced specs.
    *
    * And two EMBEDDING blocks (ids offset a further 10M above the doc
    * skew ids, so the skew blocks collide with nothing; each skew
    * vec_id gets a mirror STUB document row — see [[skewVecStubDocs]] —
    * so the table-level invariant "embeddings share the documents key
    * space" survives skew and doc/vec joins keep every skew vector):
    *
    *   4. HOT CELL (`hotVecs`, ids ≡ 1 mod 10): identical copies of
    *      one standing vector — they all assign to ONE (cell, sub)
    *      block, the overloaded-IVF-list shape boilerplate embeddings
    *      produce, which the serving probe must survive;
    *   5. SERVING SURGE (`skewVecs`, ids ≡ 7 mod 10): a query batch
    *      past the 32 MB staged-broadcast gate (rotated copies of a
    *      template — the gate is size-based, content is irrelevant),
    *      so the q124 serving route drops its broadcasts with NO
    *      forceLarge (SkewSpec audits the plan and proves route
    *      equality).
    */
  def generate(spark: SparkSession, src: String, out: String, copies: Int,
      skew: Boolean = false, megaDocs: Int = 3000, hotDocs: Int = 65537,
      crossingDocs: Int = 40, skewVecs: Int = 70000, hotVecs: Int = 1000,
      hhStandingPerCopy: Int = 40, hhArrivingPerCopy: Int = 8): Unit = {
    require(copies >= 1 && copies <= 500,
      s"copies=$copies outside [1,500] — remapText injectivity holds to 500")
    require((hotVecs.toLong + skewVecs) * 10 < 10L * 1000 * 1000,
      "embedding skew blocks would collide with the hh block id space")

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
    val docsScaled = (0 until copies).map { i =>
      val shifted = t("documents")
        .withColumn("doc_id", col("doc_id") + lit(docCap * i))
      if (i == 0) shifted else shifted.withColumn("text", remapText("text", i))
    }.reduce(_ unionByName _)
    // the hh block applies in BOTH modes — uniformity is about the
    // replicas, not about the corpus lacking common vocabulary
    val docsWithHh =
      if (hhStandingPerCopy + hhArrivingPerCopy == 0) docsScaled
      else docsScaled.unionByName(hhCommonDocs(spark, docsScaled,
        docCap * copies + 20L * 1000 * 1000,
        hhStandingPerCopy * copies, hhArrivingPerCopy * copies))
    write("documents",
      if (!skew) docsWithHh
      else docsWithHh
        .unionByName(skewBlocks(spark, docsScaled, docCap * copies,
          megaDocs, hotDocs, crossingDocs))
        .unionByName(skewVecStubDocs(spark, docsScaled,
          docCap * copies + 10L * 1000 * 1000, skewVecs, hotVecs)))
    // embeddings share the documents key space (q29 joins vec_id = doc_id).
    // Per-replica dimension ROTATION: permuting coordinates preserves
    // norms and every intra-replica pairwise cosine exactly (planted
    // near-dup structure intact), but a vector and its rotated twin are
    // no longer parallel — without this, 10 verbatim copies per vector
    // inflate the cosine-near-dup set ~100x per bucket and the sf1 run
    // measures duplicate-blowup, not scale.
    val embScaled = (0 until copies).map { i =>
      val shifted = t("embeddings")
        .withColumn("vec_id", col("vec_id") + lit(docCap * i))
      if (i == 0) shifted
      else {
        val d = size(col("embedding"))
        val off = lit(i * 7) % d // mod the dim so any copy count is valid
        shifted.withColumn("embedding",
          concat(slice(col("embedding"), off + 1, d - off),
            slice(col("embedding"), lit(1), off)))
      }
    }.reduce(_ unionByName _)
    write("embeddings",
      if (!skew) embScaled
      else embScaled.unionByName(
        skewVecBlocks(spark, embScaled,
          docCap * copies + 10L * 1000 * 1000, skewVecs, hotVecs)))
    // the reuse marker ScaleGate keys on — written LAST, so a killed
    // generation never leaves a marker over a torn corpus
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out).resolve(MetaFile),
      metaJson(src, copies, skew, megaDocs, hotDocs, crossingDocs,
        skewVecs, hotVecs, hhStandingPerCopy, hhArrivingPerCopy))
  }

  private[tools] val MetaFile = "_scalegen_meta.json"

  /** The generation descriptor ScaleGate compares for corpus reuse —
    * any param or content-version drift regenerates. */
  private[tools] def metaJson(src: String, copies: Int, skew: Boolean,
      megaDocs: Int = 3000, hotDocs: Int = 65537, crossingDocs: Int = 40,
      skewVecs: Int = 70000, hotVecs: Int = 1000,
      hhStandingPerCopy: Int = 40, hhArrivingPerCopy: Int = 8): String =
    s"""{"src":"$src","copies":$copies,"skew":$skew,""" +
      s""""mega":$megaDocs,"hot":$hotDocs,"crossing":$crossingDocs,""" +
      s""""skew_vecs":$skewVecs,"hot_vecs":$hotVecs,""" +
      s""""hh_standing":$hhStandingPerCopy,"hh_arriving":$hhArrivingPerCopy,""" +
      s""""gen_version":$GenVersion}"""

  /** The two embedding skew blocks (see [[generate]]'s Scaladoc):
    * identical copies of one template vector for the hot cell, rotated
    * copies for the serving surge. `vecSkewBase` sits 10M above the
    * doc skew ids so the shared key space stays disjoint. */
  private[tools] def skewVecBlocks(spark: SparkSession, emb: DataFrame,
      vecSkewBase: Long, skewVecs: Int, hotVecs: Int): DataFrame = {
    val template = emb.orderBy("vec_id").limit(1).localCheckpoint()
    val cols = emb.columns
    def block(n: Int, idOf: Column => Column,
        embOf: Column => Column): DataFrame =
      template.crossJoin(spark.range(n).select(col("id").as("_i")))
        .withColumn("vec_id", idOf(col("_i")))
        .withColumn("embedding", embOf(col("_i")))
        .select(cols.map(col).toIndexedSeq: _*)
    val hot = block(hotVecs,
      i => lit(vecSkewBase) + i * 10 + 1,
      _ => col("embedding"))
    val surge = block(skewVecs,
      i => lit(vecSkewBase) + (lit(hotVecs.toLong) + i) * 10 + 7,
      i => {
        val d = size(col("embedding"))
        val off = pmod(i, d - 1).cast("int")
        concat(slice(col("embedding"), off + 1, d - off),
          slice(col("embedding"), lit(1), off))
      })
    hot.unionByName(surge)
  }

  /** Stub document rows mirroring the skew EMBEDDING ids: the shared
    * key-space invariant (every vec_id is a doc_id — the q29-style
    * doc/vec join) must survive the skew blocks, or any such join
    * silently drops the skew vectors (round-15 advice). Texts are
    * unique per doc with zero cross-doc token overlap, so the stubs
    * plant no near-dup pairs, carry no hot shingle, and leave every
    * dedup / df-cut / mega-cluster assertion untouched; they only
    * grow the mod-10 slices the drop predicates already absorb. Id
    * formulas are EXACTLY [[skewVecBlocks]]'s. */
  private[tools] def skewVecStubDocs(spark: SparkSession, docs: DataFrame,
      vecSkewBase: Long, skewVecs: Int, hotVecs: Int): DataFrame = {
    val template = docs.orderBy("doc_id").limit(1).localCheckpoint()
    val cols = docs.columns
    def block(n: Int, idOf: Column => Column, tagPrefix: String): DataFrame =
      template.crossJoin(spark.range(n).select(col("id").as("_i")))
        .withColumn("doc_id", idOf(col("_i")))
        .withColumn("text",
          concat_ws(" ", (0 until 8).map(j =>
            concat(lit(s"$tagPrefix${j}x"), col("_i"))): _*))
        .select(cols.map(col).toIndexedSeq: _*)
    block(hotVecs, i => lit(vecSkewBase) + i * 10 + 1, "vh")
      .unionByName(block(skewVecs,
        i => lit(vecSkewBase) + (lit(hotVecs.toLong) + i) * 10 + 7, "vs"))
  }

  /** The COMMON-VOCABULARY heavy-hitter block (round-16 verdict #5):
    * replication keeps every per-gram count flat while the corpus and
    * the trigram total grow with `copies` (remapText deliberately
    * decorrelates replica text), so relative frequencies FALL ~1/copies
    * and the heavy-hitter families (q117/q135/q144 at support
    * 1/20000) went VACUOUS at sf10-uniform — 0 rows, none of the hh
    * logic exercised. Real corpora have scale-invariant common
    * vocabulary (stopwords, boilerplate phrases); this block plants it:
    * `perCopy * copies` stub docs each opening with one fixed trigram
    * (`uhh0 uhh1 uhh2` — vowel-free tokens, so remapText never collides
    * base text into it) followed by 12 per-doc-unique filler tokens.
    *
    * The planted gram's count (48/copy at defaults) and the corpus
    * total both scale linearly with `copies`, so its relative frequency
    * is SCALE-INVARIANT (~3.7x the 1/20000 support at the sf0.1 base's
    * 13.04 occurrences-per-copy threshold) — a heavy hitter at every
    * sf, making the hh family non-vacuous at any uniform scale.
    *
    * Dedup-neutral by the skew hot-block precedent: 3 shared + 12
    * unique tokens keep pairwise shingle Jaccard ~0.03, far under the
    * 0.8 LSH threshold — no planted near-dup pairs, no CC components,
    * and the filler 13-grams are unique so decontamination is
    * untouched. Ids live 20M above the replica space (above the skew
    * and vec-stub blocks): standing docs ≡ 5 (mod 10) feed the q135
    * hh-store build, arriving docs ≡ 7 land in the delta slice so the
    * incremental/streaming legs see hitter occurrences arrive. */
  private[tools] def hhCommonDocs(spark: SparkSession, docs: DataFrame,
      hhBase: Long, standing: Int, arriving: Int): DataFrame = {
    val template = docs.orderBy("doc_id").limit(1).localCheckpoint()
    val cols = docs.columns
    // the filler prefix differs PER SUB-BLOCK: with a shared prefix the
    // arriving _i range is a subset of the standing one, so every
    // arriving doc was a VERBATIM duplicate of a standing doc — 800
    // unintended jaccard-1.0 pairs at x100, violating the block's
    // dedup-neutrality contract (caught by the round-17 scale gate as
    // +800 q142 rows and extra rescore pressure)
    def block(n: Int, idOf: Column => Column, filler: String): DataFrame =
      template.crossJoin(spark.range(n).select(col("id").as("_i")))
        .withColumn("doc_id", idOf(col("_i")))
        .withColumn("text",
          concat_ws(" ", lit("uhh0") +: lit("uhh1") +: lit("uhh2") +:
            (0 until 12).map(j => concat(lit(s"$filler${j}x"), col("_i"))): _*))
        .select(cols.map(col).toIndexedSeq: _*)
    block(standing, i => lit(hhBase) + i * 10 + 5, "uf")
      .unionByName(block(arriving,
        i => lit(hhBase) + (lit(standing.toLong) + i) * 10 + 7, "ug"))
  }

  /** The three skew blocks (see [[generate]]'s Scaladoc). Non-key
    * non-text columns are cloned from one template row; `skewBase` is
    * a multiple of 10 above every replica id, so the mod-10 slice
    * predicates keep their meaning: mega + hot land in the arriving
    * slice (≡ 7), crossing docs in a standing slice (≡ 1). */
  private[tools] def skewBlocks(spark: SparkSession, docs: DataFrame,
      skewBase: Long, megaDocs: Int, hotDocs: Int,
      crossingDocs: Int): DataFrame = {
    val template = docs.orderBy("doc_id").limit(1).localCheckpoint()
    val cols = docs.columns
    def block(n: Int, idOf: Column => Column, textOf: Column => Column): DataFrame =
      template.crossJoin(spark.range(n).select(col("id").as("_i")))
        .withColumn("doc_id", idOf(col("_i")))
        .withColumn("text", textOf(col("_i")))
        .select(cols.map(col).toIndexedSeq: _*)
    val boiler = (0 until 30).map(j => s"bp$j").mkString(" ")
    val hot = "hotshingle0 hotshingle1 hotshingle2"
    val mega = block(megaDocs,
      i => lit(skewBase) + i * 10 + 7,
      i => concat(lit(boiler + " mg"), i, lit("a mg"), i, lit("b")))
    val hotBlock = block(hotDocs,
      i => lit(skewBase) + (lit(megaDocs.toLong) + i) * 10 + 7,
      i => concat(lit(hot),
        concat_ws("", (0 until 15).map(j =>
          concat(lit(s" hu${j}x"), i)): _*)))
    val crossing = block(crossingDocs,
      i => lit(skewBase) + i * 10 + 1,
      i => concat(lit(hot),
        concat_ws("", (0 until 15).map(j =>
          concat(lit(s" cx${j}x"), i)): _*)))
    mega.unionByName(hotBlock).unionByName(crossing)
  }
}
