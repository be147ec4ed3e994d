package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}

import graft.SparkEntry
import graft.SparkSpec
import graft.queries.DedupQueries

/** Regression-proofs the plan-shape claims the heavy queries make in
  * their Scaladocs: no cartesian products anywhere, declared broadcasts
  * planned as broadcast-hash joins, shuffle counts bounded, and the
  * persisted band-index stage read without a corpus-side Exchange. A
  * future plan regression (a lost broadcast, an extra shuffle, a join
  * degrading to nested-loop) fails CI here instead of waiting for a
  * bench diff or a judge review.
  *
  * All plans are FINAL adaptive plans (the query is executed first), so
  * what is asserted is what actually ran, not the pre-AQE guess.
  */
class PlanAuditSpec extends SparkSpec {

  /** Execute `df` and return its final (post-AQE) physical plan. */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every node in the plan, descending through AQE stage wrappers.
    * Reused exchanges are not re-descended (their referent is counted at
    * its original site). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case r: ReusedExchangeExec => Seq(r)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** Root-to-node path to the first node satisfying `pred`, or None. */
  private def pathTo(p: SparkPlan, pred: SparkPlan => Boolean): Option[List[SparkPlan]] =
    if (pred(p)) Some(List(p))
    else {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      kids.view.flatMap(k => pathTo(k, pred)).headOption.map(p :: _)
    }

  private def shuffles(nodes: Seq[SparkPlan]): Int =
    nodes.count(_.isInstanceOf[ShuffleExchangeExec])
  private def bhjs(nodes: Seq[SparkPlan]): Int =
    nodes.count(_.isInstanceOf[BroadcastHashJoinExec])

  /** (max shuffles in the final plan, min broadcast-hash joins). Bounds
    * are the measured plan +1 shuffle of headroom where AQE has latitude;
    * a query whose staging localCheckpoints subtrees is audited on the
    * post-staging plan (the staged pass's shuffles are its documented
    * one-time cost). */
  private val audited: Map[String, (Int, Int)] = Map(
    "q1_pricing_summary" -> (2, 0),
    "q14_fact_assembly" -> (1, 5), // 6-way dim chain: all dims broadcast
    "q24_minhash_lsh" -> (3, 4),
    "q26_ngram_jaccard" -> (3, 3),
    "q82_ivfpq_adc" -> (3, 1),
    "q85_ann_rerank" -> (4, 3),
    "q86_decontaminate" -> (2, 1), // bench side broadcast
    "q91_dup_spans" -> (3, 1),
    "q100_corpus_pipeline" -> (7, 6),
    "q103_domain_mixture" -> (2, 1), // weights broadcast
    "q37_embedding_neardup" -> (3, 2), // corpus-count broadcast; band self-join
    "q106_semantic_dedup" -> (3, 0), // post-stage keeper argmin + join-back
    "q109_semantic_dedup_kmeans" -> (3, 0), // same tail as q106
    "q110_incremental_semantic_dedup" -> (3, 0), // same tail, keyed by d_id
    "q111_incremental_semantic_large" -> (3, 0), // identical tail, pinned path
    "q112_incremental_semantic_indexed" -> (3, 0), // identical tail, durable index
    "q115_incremental_semantic_indexed_large" -> (3, 0), // identical tail, pinned durable path
    "q117_heavy_hitters" -> (2, 4), // 4 hot-cell semi-joins broadcast; 1 recount shuffle
    "q118_context_packing" -> (1, 0), // post-staging: stateless explode, no join
    "q120_incremental_hll" -> (5, 1)) // delta sketch + merge + estimate; grid broadcast

  test("heavy queries: no cartesian product, bounded shuffles, declared broadcasts") {
    audited.toSeq.sortBy(_._1).foreach { case (name, (maxShuffles, minBhj)) =>
      val nodes = flatten(finalPlan(SparkEntry.queries(name)(spark, sfDir)))
      val (sh, bh) = (shuffles(nodes), bhjs(nodes))
      info(s"$name: shuffles=$sh bhj=$bh nodes=${nodes.size}")
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$name: CartesianProductExec in the final plan")
      assert(sh <= maxShuffles,
        s"$name: $sh shuffles in the final plan, budget $maxShuffles")
      assert(bh >= minBhj,
        s"$name: only $bh broadcast-hash joins, expected >= $minBhj")
    }
  }

  test("drain probe: standing + stream-grown indexes probed Exchange-free as separate relations") {
    // round-18 verdict #6, the q134 drain shape: the standing and
    // stream-grown band indexes are probed as SEPARATE bucketed
    // relations (matchesAgainstIndex.extraIndexes) — their union has
    // no partitioning, so EnsureRequirements used to re-Exchange the
    // corpus-sized standing bands every micro-batch (invisible on
    // local[32] where an Exchange costs no network, a corpus-sized
    // shuffle per batch on a real cluster). Both candidate merge-joins
    // must read their bucketed index side with ZERO Exchange; the
    // delta side pays its one shuffle into the bucket layout.
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val deltaSh = DedupQueries.shingle(docs.filter(col("doc_id") % 10 === 7))
      .localCheckpoint()
    val batchBands = DedupQueries.sigBands(deltaSh).localCheckpoint()
    val standing = DedupQueries.bandIndexTable(spark, sfDir)
    // two DISTINCT bucketed views stand in for (standing, stream-grown)
    // — a filter preserves the bucket layout, and distinct subtrees
    // keep AQE from collapsing the two probes into one reused stage
    val probe = DedupQueries.matchesAgainstIndex(spark, sfDir, deltaSh,
      standing.filter(col("band_idx") < 6), forceLarge = Some(true),
      deltaBandsOpt = Some(batchBands),
      extraIndexes = Seq(standing.filter(col("band_idx") >= 6)))
    val plan = finalPlan(probe)
    def isBandScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("band_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("band_index"))
      case _ => false
    }
    val candJoins = flatten(plan).collect {
      case j: SortMergeJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "band_key")) => j
    }
    assert(candJoins.size == 2,
      s"expected two band_key candidate merge-joins (standing + grown), " +
        s"got ${candJoins.size}")
    candJoins.foreach { j =>
      val path = pathTo(j, isBandScan).getOrElse(
        fail("candidate join has no bucketed band-index scan beneath it"))
      assert(!path.drop(1).exists(_.isInstanceOf[Exchange]),
        "Exchange between a bucketed band-index scan and its candidate " +
          "join — the separate-relations probe lost the bucket property")
    }
  }

  test("q134 DRAIN per-batch probe, as executed inside foreachBatch: Exchange-free, sort-as-spill-barrier") {
    // round-19 verdict #6: the reconstruction test above pins the
    // probe's BATCH plan; this pins what actually runs per micro-batch
    // inside the q134 drain's foreachBatch (the two can diverge — conf
    // binds at action time). A QueryExecutionListener registered
    // before the stream starts is copied into the stream's cloned
    // session and records every action's executed plan during a real
    // drain with the merge-join route pinned on. The per-batch
    // edge-shard write must read BOTH index relations (standing and
    // stream-grown) with zero Exchange — a corpus-sized network
    // shuffle per micro-batch on a real cluster otherwise.
    //
    // The in-task Sort over the standing scan is PRESENT AND PINNED:
    // the single-sorted-file-per-bucket layout could feed the merge
    // join sort-free via spark.sql.legacy.bucketedTableScan
    // .outputOrdering, but round 18 measured that flag dying at
    // sf10-SKEW on the contract heap (q142 dead 2/2 samples — the sort
    // is also a SPILL BARRIER between the bucket-wide pair explosion
    // and the shuffle writers), and the conf cannot be scoped to the
    // probe alone because it binds at action time and the dangerous
    // job IS the probe job (round-19 verdict, recorded negative). See
    // GraftSession's DELIBERATELY-NOT-SET note. If this pin fails
    // because the Sort disappeared, someone flipped that conf —
    // re-prove the skew leg before keeping it.
    import org.apache.spark.sql.execution.{QueryExecution, SortExec}
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[SparkPlan]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = { plans.add(qe.executedPlan); () }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    def isStandingScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("band_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("band_index"))
      case _ => false
    }
    def isGrownScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.contains("stream_cc_bands")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("stream_cc_bands"))
      case _ => false
    }
    def bandKeySmjs(nodes: Seq[SparkPlan]): Seq[SortMergeJoinExec] =
      nodes.collect {
        case j: SortMergeJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "band_key")) => j
      }
    spark.listenerManager.register(listener)
    try {
      DedupQueries.streamComponents(spark, sfDir, forceLarge = Some(true))
        .collect()
      // the listener bus is async: poll until the per-batch writes land
      def probePlans: Seq[SparkPlan] = {
        import scala.jdk.CollectionConverters._
        plans.synchronized(plans.asScala.toList).filter { p =>
          val nodes = flatten(p)
          nodes.exists(isStandingScan) && bandKeySmjs(nodes).nonEmpty
        }
      }
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (probePlans.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val captured = probePlans
      assert(captured.size >= 2,
        s"expected at least 2 per-batch probe plans captured from the " +
          s"drain (batches past the first), got ${captured.size}")
      var grownJoins = 0
      captured.foreach { p =>
        bandKeySmjs(flatten(p)).foreach { j =>
          pathTo(j, isStandingScan).foreach { path =>
            assert(!path.drop(1).exists(_.isInstanceOf[Exchange]),
              "DRAIN plan: Exchange over the standing band-index scan — " +
                "a corpus-sized shuffle per micro-batch on a cluster")
            assert(path.drop(1).exists(_.isInstanceOf[SortExec]),
              "DRAIN plan: the standing-scan Sort disappeared — the " +
                "legacy sorted-bucket-scan conf was flipped on; it OOMed " +
                "the sf10-skew leg in round 18 (see GraftSession) and " +
                "must not return without a fresh skew-leg proof")
          }
          pathTo(j, isGrownScan).foreach { path =>
            grownJoins += 1
            assert(!path.drop(1).exists(_.isInstanceOf[Exchange]),
              "DRAIN plan: Exchange over the stream-grown band index — " +
                "the bucket layout was lost through the appends")
          }
        }
      }
      assert(grownJoins >= 1,
        "no captured batch probed the stream-grown index — the " +
          "separate-relations leg of the drain plan went unexercised")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q93 reads the persisted band index broadcast-joined with zero corpus-side shuffle") {
    val plan = finalPlan(SparkEntry.queries("q93_incremental_dedup")(spark, sfDir))
    def isBandScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("band_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("band_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isBandScan),
      "q93's plan does not read the persisted band-index table")
    val path = pathTo(plan, isBandScan).get
    // the lowest join above the scan is the candidate join: it must be
    // broadcast-hash (delta side broadcast), and the corpus-side segment
    // between it and the scan must carry no Exchange of any kind
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the band-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"candidate join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    // no Exchange of ANY kind on the scan's side of the join: a shuffle
    // is the obvious regression, but a BROADCAST of the corpus index
    // (the thing that cannot scale) would also appear on this path and
    // must fail too — the delta, not the corpus, is the broadcast side
    val corpusSegment = path.drop(joinIdx + 1)
    assert(!corpusSegment.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "corpus-side Exchange between the band-index scan and the candidate join")
  }

  test("q128 reads the persisted fingerprint index broadcast-joined with zero index-side Exchange") {
    val plan = finalPlan(
      SparkEntry.queries("q128_incremental_simhash")(spark, sfDir))
    def isFpScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("simhash_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("simhash_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isFpScan),
      "q128's plan does not read the persisted fingerprint index")
    val path = pathTo(plan, isFpScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the fingerprint-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"probe join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the fingerprint-index scan and the probe join")
  }

  test("q137 span-index probe: broadcast join over the bucketed scan, zero index-side Exchange") {
    // the decontamination maintenance claim: a benchmark update reads
    // the persisted span index (never text) and broadcast-probes it —
    // the index side must be a bare bucketed scan with no Exchange
    // between the scan and the probe join
    val plan = finalPlan(
      SparkEntry.queries("q137_incremental_decontaminate")(spark, sfDir))
    def isSpanScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("span_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("span_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isSpanScan),
      "q137's plan does not read the persisted span index")
    val path = pathTo(plan, isSpanScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the span-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"probe join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the span-index scan and the probe join")
  }

  test("q136 large-delta simhash probe: sort-merge into the bucketed index, zero index-side Exchange") {
    // the SimHash mirror of the q108/q115 audits: the pinned large
    // route must shuffle the DELTA into the index's bucket layout,
    // never broadcast it, and never shuffle the index side
    val plan = finalPlan(
      SparkEntry.queries("q136_incremental_simhash_large")(spark, sfDir))
    def isFpScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("simhash_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("simhash_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isFpScan),
      "q136's plan does not read the persisted fingerprint index")
    val path = pathTo(plan, isFpScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the fingerprint-index scan")
    assert(path(joinIdx).isInstanceOf[SortMergeJoinExec],
      s"large-delta probe join is ${path(joinIdx).getClass.getSimpleName}, not sort-merge")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the fingerprint-index scan and the probe join")
  }

  test("q108 large-delta probe: merge join with zero index-side Exchange and no delta broadcast") {
    // the size-gated non-broadcast path (round-9 verdict #1): past the
    // delta-size gate the probe must shuffle the DELTA into the index's
    // bucket layout, never broadcast it, and never shuffle the index
    val plan = finalPlan(
      SparkEntry.queries("q108_incremental_dedup_bucketed")(spark, sfDir))
    def isBandScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("band_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("band_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isBandScan),
      "q108's plan does not read the persisted band-index table")
    val path = pathTo(plan, isBandScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the band-index scan")
    val join = path(joinIdx)
    assert(join.isInstanceOf[SortMergeJoinExec],
      s"large-delta candidate join is ${join.getClass.getSimpleName}, not sort-merge")
    // index side of the join: no Exchange of any kind — the bucket
    // layout is the corpus-side shuffle, paid once at index-build time
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the band-index scan and the candidate join")
    // and nothing under the candidate join is broadcast: the delta side
    // arrives via its one shuffle into the bucket layout, not a
    // BroadcastExchange (which cannot scale past the gate)
    assert(!flatten(join).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]),
      "broadcast under the large-delta candidate join")
  }

  test("band-index self-join is co-located by the bucket layout: no shuffle under the join") {
    // the q41 property, proven on the persisted stage table itself: a
    // non-broadcast (merge-hinted) equi-join on a superset of the bucket
    // key plans with ZERO Exchange under the join — the bucket layout IS
    // the shuffle, paid once at stage-write time
    val a = DedupQueries.bandIndexTable(spark, sfDir)
    val b = DedupQueries.bandIndexTable(spark, sfDir)
    val joined = a.hint("merge").join(b, Seq("band_key"))
    val plan = finalPlan(joined)
    val smj = flatten(plan).collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "merge-hinted self-join did not plan as sort-merge")
    assert(!flatten(smj.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "Exchange under the bucketed self-join — bucket layout not used")
  }

  test("TPC-H silhouettes: selective predicates reach the parquet scans as PushedFilters") {
    // the filter-before-join claims in the q72/q73/q74 Scaladocs, made
    // mechanical: a refactor that hides a predicate behind a cast or an
    // opaque expression silently turns a pruned scan into a full scan —
    // at 100 TB that is the whole query budget. Assert the predicate
    // text appears in each scan's PushedFilters metadata.
    def scanFilters(name: String): Map[String, String] =
      flatten(finalPlan(SparkEntry.queries(name)(spark, sfDir)))
        .collect { case f: FileSourceScanExec =>
          val table = f.relation.location.rootPaths.headOption
            .map(_.getName).getOrElse("?")
          table -> f.metadata.getOrElse("PushedFilters", "[]")
        }.toMap

    val q72 = scanFilters("q72_tpch3")
    assert(q72("customer.parquet").contains("EqualTo(c_mktsegment,BUILDING)"), q72.toString)
    assert(q72("orders.parquet").contains("LessThan(o_orderdate"), q72.toString)
    assert(q72("lineitem.parquet").contains("GreaterThan(l_shipdate"), q72.toString)

    val q73 = scanFilters("q73_tpch5")
    assert(q73("region.parquet").contains("EqualTo(r_name,ASIA)"), q73.toString)
    assert(q73("orders.parquet").contains("GreaterThanOrEqual(o_orderdate"), q73.toString)
    assert(q73("orders.parquet").contains("LessThan(o_orderdate"), q73.toString)

    val q74 = scanFilters("q74_tpch10")
    assert(q74("lineitem.parquet").contains("EqualTo(l_returnflag,R)"), q74.toString)
    assert(q74("orders.parquet").contains("GreaterThanOrEqual(o_orderdate"), q74.toString)
  }

  test("q83 aggregates lineitem BELOW the joins (aggregate-then-join ordering)") {
    // q83's scale claim is ordering, not pushdown: the HAVING cut runs
    // before the star join, so the biggest shuffle carries (orderkey,
    // sum) pairs, never the joined width. Assert an aggregate sits
    // between the lineitem scan and the lowest join above it.
    val plan = finalPlan(SparkEntry.queries("q83_tpch18")(spark, sfDir))
    def isLineitemScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.getName == "lineitem.parquet")
      case _ => false
    }
    val path = pathTo(plan, isLineitemScan).getOrElse(
      fail("no lineitem scan in q83's plan"))
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec])
    assert(joinIdx >= 0, "no join above the lineitem scan")
    assert(path.drop(joinIdx + 1).exists(
        _.nodeName.toLowerCase.contains("aggregate")),
      "no aggregate between the lineitem scan and the lowest join — " +
        "the HAVING cut is running after the star join")
  }

  test("q107's stream-grown index keeps the bucket layout through appends") {
    // insertInto bucketizes each micro-batch append per the catalog
    // spec; if that ever regressed (e.g. a plain parquet append), the
    // mixed layout would force a shuffle under any bucket-keyed join
    SparkEntry.queries("q107_stream_index_bootstrap")(spark, sfDir).collect()
    val idx = spark.table(
      graft.queries.JvmScratch.tableName("stream_band_index"))
    assert(idx.count() > 0, "stream-grown index is empty after the drain")
    // the declared query's post-drain compaction held: no bucket is
    // left fragmented past the maintenance threshold
    val counts = DedupQueries.bucketFileCounts(spark,
      graft.queries.JvmScratch.tableName("stream_band_index"))
    assert(counts.nonEmpty && counts.values.forall(_ <= 2),
      s"stream-grown index left fragmented after the declared drain: $counts")
    val joined = idx.hint("merge").join(idx, Seq("band_key"))
    val smj = flatten(finalPlan(joined)).collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "merge-hinted self-join did not plan as sort-merge")
    assert(!flatten(smj.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "Exchange under the stream-grown index self-join — an append lost the bucket layout")
  }

  test("q109 training stage: codebooks broadcast, no corpus-side explode or self-join") {
    // the learned-quantizer claim: both assignment passes consume a
    // ONE-ROW broadcast codebook (seed pivot / centroid pivot), so the
    // corpus is never exploded x k, never windowed, and never joined to
    // itself during training — only tiny-side broadcasts touch it
    val nodes = flatten(finalPlan(
      graft.queries.SimilarityQueries.kmeansSemBlocks(spark, sfDir)))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "CartesianProductExec in the q109 training plan")
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "corpus-scale SortMergeJoin in the q109 training plan — " +
        "a codebook stopped broadcasting")
    assert(!nodes.exists(p =>
        p.getClass.getSimpleName.startsWith("Window")),
      "window in the q109 training plan — the argmin degraded to q90's " +
        "corpus x k rank shape")
    val sh = shuffles(nodes)
    info(s"q109 training: shuffles=$sh nodes=${nodes.size}")
    // the k-row shuffles only: seed pivot, mean re-estimation, centroid
    // pivot, corpus count (+1 AQE headroom); a corpus-side shuffle would
    // blow straight past this
    assert(sh <= 7, s"q109 training ran $sh shuffles")
  }

  test("q112 reads the persisted block index broadcast-joined with zero index-side shuffle") {
    // the semantic mirror of the q93 assertion: the probe must consume
    // the durable sem_blocks table as a bucketed scan, join it with the
    // BROADCAST delta blocks, and carry no Exchange on the index side
    // the unstaged probe stage (the query body localCheckpoints it,
    // which would hide the index scan from the returned plan)
    val plan = finalPlan(
      graft.queries.SimilarityQueries.semIndexProbe(spark, sfDir))
    def isBlockScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("sem_blocks")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("sem_blocks"))
      case _ => false
    }
    assert(flatten(plan).exists(isBlockScan),
      "q112's plan does not read the persisted sem_blocks table")
    val path = pathTo(plan, isBlockScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the block-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"probe join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the block-index scan and the probe join")
  }

  test("q115 large-delta durable probe: sort-merge into the bucketed index, zero index-side Exchange") {
    // the q111 treatment on the DURABLE index: the pinned large path
    // must NOT broadcast the delta — it merge-joins the bucketed scan,
    // and the index side carries no Exchange (the delta alone pays the
    // shuffle into the table's HashPartitioning(block_key, 16))
    val plan = finalPlan(graft.queries.SimilarityQueries
      .semIndexProbe(spark, sfDir, forceLarge = Some(true)))
    def isBlockScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("sem_blocks")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("sem_blocks"))
      case _ => false
    }
    assert(flatten(plan).exists(isBlockScan),
      "q115's plan does not read the persisted sem_blocks table")
    val path = pathTo(plan, isBlockScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the block-index scan")
    assert(path(joinIdx).isInstanceOf[SortMergeJoinExec],
      s"pinned probe join is ${path(joinIdx).getClass.getSimpleName}, not sort-merge")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the block-index scan and the probe join")
  }

  test("q124/q125 ANN serving: block index scanned Exchange-free on both routes") {
    // the retrieval read path must inherit the probe family's physical
    // contract: the candidate join runs on the bucketed block_key —
    // broadcast keys on the serving route, sort-merge on the pinned
    // bulk route — and the index side never shuffles or broadcasts
    Seq(
      (None: Option[Boolean]) -> classOf[BroadcastHashJoinExec],
      (Some(true): Option[Boolean]) -> classOf[SortMergeJoinExec]
    ).foreach { case (force, expectedJoin) =>
      val plan = finalPlan(
        graft.queries.SimilarityQueries.semIndexTopK(spark, sfDir, force))
      def isBlockScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("sem_blocks")) ||
            f.relation.location.rootPaths.exists(_.toString.contains("sem_blocks"))
        case _ => false
      }
      assert(flatten(plan).exists(isBlockScan),
        s"serving plan (force=$force) does not read the persisted sem_blocks table")
      val path = pathTo(plan, isBlockScan).get
      val joinIdx = path.lastIndexWhere(p =>
        p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
          || p.isInstanceOf[BroadcastNestedLoopJoinExec]
          || p.isInstanceOf[CartesianProductExec])
      assert(joinIdx >= 0, s"no join found above the block-index scan (force=$force)")
      assert(expectedJoin.isInstance(path(joinIdx)),
        s"candidate join is ${path(joinIdx).getClass.getSimpleName}, " +
          s"expected ${expectedJoin.getSimpleName} (force=$force)")
      assert(!path.drop(joinIdx + 1).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
        s"index-side Exchange under the candidate join (force=$force)")
    }
  }

  test("q110 probe: delta blocks broadcast, no shuffle added on the corpus side") {
    // reconstruct the pre-checkpoint probe stage: the incremental claim
    // is that probing costs ONLY the training shuffles (k-row) plus a
    // broadcast — the corpus-side block stream is never re-partitioned
    import org.apache.spark.sql.functions.{broadcast, col}
    import graft.queries.SimilarityQueries
    val deltaPred = col("vec_id") % 10 === 7
    val seedIds = (0L until 16L).filter(_ % 10 != 7).take(8)
    val blocks = SimilarityQueries.kmeansSemBlocksOf(spark, sfDir, !deltaPred, seedIds)
    val d = blocks.filter(deltaPred)
      .select(col("vec_id").as("d_id"), col("cell"), col("sub"))
    val c = blocks.filter(!deltaPred)
      .select(col("vec_id").as("c_id"),
        col("cell").as("ccell"), col("sub").as("csub"))
    val probe = broadcast(d)
      .join(c, col("cell") === col("ccell") && col("sub") === col("csub"))
    val nodes = flatten(finalPlan(probe))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "q110 probe degraded to a sort-merge join — the delta stopped broadcasting")
    assert(bhjs(nodes) >= 1, "q110 probe is not a broadcast-hash join")
    val sh = shuffles(nodes)
    info(s"q110 probe: shuffles=$sh nodes=${nodes.size}")
    assert(sh <= 7, s"q110 probe ran $sh shuffles — more than training alone")
  }

  test("q111 large-delta semantic probe: sort-merge, delta not broadcast") {
    import org.apache.spark.sql.functions.col
    import graft.queries.SimilarityQueries
    // the pinned large path: the probe must NOT broadcast the delta —
    // a sort-merge join on (cell, sub) is the over-broadcast-range plan
    val deltaPred = col("vec_id") % 10 === 7
    val seedIds = (0L until 16L).filter(_ % 10 != 7).take(8)
    val blocks = SimilarityQueries.kmeansSemBlocksOf(spark, sfDir, !deltaPred, seedIds)
    val d = blocks.filter(deltaPred)
      .select(col("vec_id").as("d_id"), col("cell"), col("sub"))
    val c = blocks.filter(!deltaPred)
      .select(col("vec_id").as("c_id"),
        col("cell").as("ccell"), col("sub").as("csub"))
    val probe = d.hint("merge")
      .join(c, col("cell") === col("ccell") && col("sub") === col("csub"))
    // the OUTERMOST join is the probe; the training stage beneath it
    // legitimately broadcasts its codebooks/geo. Assert the probe
    // itself sort-merges (i.e. the delta is not the build side of a
    // broadcast join at the top).
    val plan = finalPlan(probe)
    val isJoin = (p: SparkPlan) => p.isInstanceOf[SortMergeJoinExec] ||
      p.isInstanceOf[BroadcastHashJoinExec] ||
      p.isInstanceOf[BroadcastNestedLoopJoinExec]
    val outermost = pathTo(plan, isJoin).map(_.last)
    assert(outermost.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"q111's pinned probe join is ${outermost.map(_.nodeName)}, not sort-merge")
  }

  test("q114's stream-grown block index keeps the bucket layout through appends") {
    // the semantic mirror of the q107 invariant: insertInto must
    // bucketize every micro-batch append per the catalog spec, and the
    // post-drain compaction must hold the fragmentation bound
    SparkEntry.queries("q114_stream_sem_index_bootstrap")(spark, sfDir).collect()
    val idx = spark.table(
      graft.queries.JvmScratch.tableName("stream_block_index"))
    assert(idx.count() > 0, "stream-grown block index is empty after the drain")
    val counts = DedupQueries.bucketFileCounts(spark,
      graft.queries.JvmScratch.tableName("stream_block_index"))
    assert(counts.nonEmpty && counts.values.forall(_ <= 2),
      s"stream-grown block index left fragmented after the declared drain: $counts")
    val joined = idx.hint("merge").join(idx, Seq("block_key"))
    val smj = flatten(finalPlan(joined)).collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "merge-hinted self-join did not plan as sort-merge")
    assert(!flatten(smj.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "Exchange under the stream-grown block index self-join — an append lost the bucket layout")
  }

  test("q145 large-delta n-gram probe: merge join into the bucketed postings, no delta broadcast") {
    // the n-gram family's size-gated route (round-11 verdict #2 — the
    // last large-delta asymmetry): past the gate the delta's per-shingle
    // counts must shuffle ONCE into the postings table's 16-bucket sg
    // layout and merge-join the bucketed scan — never broadcast, and
    // never an Exchange on the index side. Audited on the unstaged
    // probe stage (the query body localCheckpoints it, which hides the
    // scan from the final plan).
    val plan = finalPlan(DedupQueries.ngramProbeStage(spark, sfDir, large = true))
    def isPostScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("ngram_postings")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("ngram_postings"))
      case _ => false
    }
    assert(flatten(plan).exists(isPostScan),
      "the large probe stage does not read the persisted postings table")
    val path = pathTo(plan, isPostScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the postings scan")
    val join = path(joinIdx)
    assert(join.isInstanceOf[SortMergeJoinExec],
      s"large-delta df probe is ${join.getClass.getSimpleName}, not sort-merge")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the postings scan and the df probe join")
    assert(!flatten(join).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]),
      "broadcast under the large-delta df probe join")

    // and the small route keeps the broadcast plan on the same stage
    val small = finalPlan(DedupQueries.ngramProbeStage(spark, sfDir, large = false))
    val spath = pathTo(small, isPostScan).get
    val sIdx = spath.lastIndexWhere(_.isInstanceOf[BroadcastHashJoinExec])
    assert(sIdx >= 0, "small-delta df probe is not a broadcast-hash join")
    assert(!spath.drop(sIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange under the small-delta df probe join")
  }

  test("q150 postings tombstone: broadcast anti-join over the bucketed scan, no index-side Exchange") {
    // the n-gram member of the retraction family's plan contract: the
    // deleted docs tombstone out of the bucketed postings artifact via
    // a broadcast anti-join — the index side stays a bare scan
    val plan = finalPlan(DedupQueries.ngramRetractStage(spark, sfDir))
    def isPostScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("ngram_postings")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("ngram_postings"))
      case _ => false
    }
    assert(flatten(plan).exists(isPostScan),
      "the tombstoned view does not read the persisted postings table")
    val path = pathTo(plan, isPostScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the postings scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"tombstone anti-join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the postings scan and the tombstone anti-join")
  }

  test("pair-index probe: anti-joins + doc_a semi-join over the bucketed scan, zero index-side Exchange") {
    // round-12 verdict #2: the standing pair table is now published
    // BUCKETED on doc_a, so the q143 consumer chain — both takedown
    // tombstone anti-joins plus the affected-component semi-join,
    // forced to sort-merge — adds NO Exchange anywhere on the
    // pair-index side: the bucket layout carries the scan's
    // HashPartitioning(doc_a, 16) through the broadcast anti-joins to
    // the semi-join, and only the probe side shuffles
    val plan = finalPlan(DedupQueries.pairRetractStage(spark, sfDir))
    def isPairScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("pair_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("pair_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isPairScan),
      "the retraction stage does not read the persisted pair table")
    val path = pathTo(plan, isPairScan).get
    assert(!path.exists(_.isInstanceOf[Exchange]),
      "Exchange on the pair-index side of the retraction consumer chain")
    val joins = path.filter(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec])
    assert(joins.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      s"expected two broadcast tombstone anti-joins above the pair scan, got $joins")
    assert(joins.head.isInstanceOf[SortMergeJoinExec],
      s"affected-docs semi-join is ${joins.head.getClass.getSimpleName}; " +
        "expected sort-merge into the bucket layout under the forced hint")
  }

  test("q147 ANN tombstone: anti-join broadcast over the bucketed block scan, no index-side Exchange") {
    // the retraction family's plan contract on the similarity index:
    // the deleted-vector tombstone must be a broadcast anti-join
    // CONSUMING the persisted block index as a bare bucketed scan —
    // no Exchange between the scan and the anti-join (the takedown
    // set, not the index, is the build side)
    import org.apache.spark.sql.functions.{broadcast, col}
    val del = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 === 3).select("vec_id")
    val idx = graft.queries.SimilarityQueries.semBlockIndexTable(spark, sfDir)
      .join(broadcast(del), Seq("vec_id"), "left_anti")
    val plan = finalPlan(idx)
    def isBlockScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("sem_blocks")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("sem_blocks"))
      case _ => false
    }
    assert(flatten(plan).exists(isBlockScan),
      "the tombstoned view does not read the persisted sem_blocks table")
    val path = pathTo(plan, isBlockScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the block-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"tombstone anti-join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
      "index-side Exchange between the block-index scan and the tombstone anti-join")
  }

  test("CC labeling: no Window node in the q54/q131 final plans") {
    // cluster_size must come from groupBy+join (map-side-combinable,
    // AQE-skew-splittable), never count(*) OVER (PARTITION BY
    // canonical_id) — a window partition-by sorts whole partitions per
    // key, and a mega-cluster (boilerplate text) would single-thread one
    // executor at 100x (round-11 verdict #4). q134 shares the same
    // labelCorpus tail, so these two audits cover all three family
    // members without paying its streaming drain here.
    Seq("q54_dedup_components", "q131_incremental_components").foreach { name =>
      val nodes = flatten(finalPlan(SparkEntry.queries(name)(spark, sfDir)))
      assert(!nodes.exists(_.getClass.getSimpleName.startsWith("Window")),
        s"$name: Window node in the final plan — cluster_size degraded " +
          "to count(*) OVER (PARTITION BY canonical_id)")
    }
  }

  test("q41 bucketed join plans with zero Exchange on either side") {
    val plan = finalPlan(SparkEntry.queries("q41_bucketed_join")(spark, sfDir))
    val smj = flatten(plan).collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "q41's merge-hinted join did not plan as sort-merge")
    assert(!flatten(smj.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "Exchange under q41's bucketed join")
  }

  test("bucketed artifacts publish ONE sorted file per bucket") {
    // The round-18 q142@skew root cause, pinned: the cold artifact
    // build fed merge-joins whose per-task sorts each covered
    // 1/buckets of a fragmented MULTI-file bucket layout (one file per
    // task x bucket), racing join buffers and shuffle writers for one
    // 8 GiB heap (task OOM). DurableIndex.attachOrBuildFp now
    // repartitions the build to one partition per bucket — a single
    // contiguous sorted file per bucket, so each consumer sort reads
    // presorted runs and the pairs-build pressure stays under the
    // contract heap (SCALE_r18.json, q142@skew 153.1s green).
    //
    // NOTE the deliberately ABSENT second half: trusting SORTED BY via
    // spark.sql.legacy.bucketedTableScan.outputOrdering eliminates the
    // consumer sorts entirely and was measured 24% faster at
    // sf10-uniform — and then the re-run gate caught it OOMing the
    // skew leg at the contract heap (the sort is also a spill
    // barrier; without it the bucket-wide pair explosion pipelines
    // unbuffered into the shuffle writers). See GraftSession for the
    // back-out rationale; do not re-enable without a skew-leg proof.
    val post = DedupQueries.ngramPostingsTable(spark, sfDir)
    val scan = flatten(finalPlan(post))
      .collectFirst { case f: FileSourceScanExec => f }.get
    val root = scan.relation.location.rootPaths.head
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketFiles = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
    assert(bucketFiles.length == 16,
      s"postings table has ${bucketFiles.length} files for 16 buckets — " +
        "a fragmented bucket layout re-opens the q142@skew build OOM")
  }
}
