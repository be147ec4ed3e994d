package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The deletion/retraction contract of the band/pair/cc artifact stack
  * (q143 — round-11 verdict #1, the top ask): given the standing
  * artifacts and a delete set D, [[DedupQueries.retractMaintain]] must
  * return artifacts EQUAL to a from-scratch rebuild over
  * corpus-minus-D — at every level (bands, pairs, labels) — while
  * touching only |D| + the affected components. Two halves:
  *
  *   1. exactness across TWO successive deletes: the second delete runs
  *      against the FIRST delete's outputs, so the proof covers the
  *      maintained-artifact lifecycle (delete-of-a-deleted-state), not
  *      just one hop off the pristine build. The second delete set is
  *      chosen to include a whole small component AND a member of a
  *      larger one, exercising both the retire-the-canonical-id and
  *      the split/shrink paths;
  *   2. the plan claim in the q143 doc: band tombstoning consumes the
  *      persisted band index as a bare scan — the anti-join is
  *      broadcast-hash (the takedown-sized delete set is the build
  *      side) with NO Exchange of any kind on the index side.
  */
class RetractionSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

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

  private def assertSameSet(got: DataFrame, want: DataFrame, what: String): Unit = {
    val g = got.select(want.columns.map(col).toIndexedSeq: _*)
    assert(g.exceptAll(want).isEmpty && want.exceptAll(g).isEmpty,
      s"$what: maintained artifact != from-scratch rebuild")
  }

  test("two successive deletes: every artifact equals the rebuild over corpus-minus-deleted") {
    val docs = graft.sources.Tables.documents(spark, sfDir)

    // standing artifacts over the indexed corpus (doc_id % 10 != 7)
    val bands0 = DedupQueries.bandIndexTable(spark, sfDir)
    val pairs0 = DedupQueries.pairIndexTable(spark, sfDir)
    val labels0 = DedupQueries.ccIndexTable(spark, sfDir)

    // delete 1: the q143 takedown slice
    val del1 = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    val corpus1 = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 3)
    val (bands1, pairs1, labels1) =
      DedupQueries.retractMaintain(bands0, pairs0, labels0, del1)

    assertSameSet(bands1, DedupQueries.bandsOfDocs(corpus1), "delete 1 bands")
    val pairsWant1 = DedupQueries.pairsOfDocs(corpus1)
    assertSameSet(pairs1, pairsWant1, "delete 1 pairs")
    val (labelsWant1, _) = DedupQueries.connectedComponents(
      pairsWant1.select("doc_a", "doc_b"))
    assertSameSet(labels1, labelsWant1, "delete 1 labels")
    assertSameSet(
      DedupQueries.labelCorpus(corpus1, labels1),
      DedupQueries.labelCorpus(corpus1, labelsWant1), "delete 1 labeling")

    // delete 2 runs against delete 1's OUTPUTS — the maintained-state
    // lifecycle, not a second hop off the pristine build. Deleting the
    // minimum doc_id of every remaining cluster forces the
    // retire-the-canonical-id path in each affected component (the
    // sharpest relabeling case: every survivor changes label).
    val del2 = labels1.groupBy("label").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").localCheckpoint()
    assert(del2.count() > 0, "no clusters survived delete 1 — test is vacuous")
    val corpus2 = corpus1.join(broadcast(del2), Seq("doc_id"), "left_anti")
    val (bands2, pairs2, labels2) =
      DedupQueries.retractMaintain(bands1, pairs1, labels1, del2)

    assertSameSet(bands2, DedupQueries.bandsOfDocs(corpus2), "delete 2 bands")
    val pairsWant2 = DedupQueries.pairsOfDocs(corpus2)
    assertSameSet(pairs2, pairsWant2, "delete 2 pairs")
    val (labelsWant2, _) = DedupQueries.connectedComponents(
      pairsWant2.select("doc_a", "doc_b"))
    assertSameSet(labels2, labelsWant2, "delete 2 labels")
    assertSameSet(
      DedupQueries.labelCorpus(corpus2, labels2),
      DedupQueries.labelCorpus(corpus2, labelsWant2), "delete 2 labeling")
  }

  test("mixed lifecycle: append, delete, append — maintained artifacts equal the net rebuild") {
    // the real artifact lifecycle interleaves directions: this chains
    // q130's append contract (per-batch within ∪ cross), q131's
    // star-edge label merge, and q143's retraction on ONE artifact
    // stack — bootstrap, append a batch, delete a takedown slice,
    // append another batch — and proves every level equals the
    // from-scratch build over the net corpus. No per-direction proof
    // implies this: the delete runs against APPENDED state and the
    // second append against RETRACTED state.
    import org.apache.spark.sql.DataFrame
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val s0 = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 9)
    val d1 = docs.filter(col("doc_id") % 10 === 9)
    val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    val d2 = docs.filter(col("doc_id") % 10 === 7)

    var bands = DedupQueries.bandsOfDocs(s0).localCheckpoint()
    var pairs = DedupQueries.pairsOfDocs(s0).localCheckpoint()
    var labels = DedupQueries.connectedComponents(
      pairs.select("doc_a", "doc_b"))._1.localCheckpoint()

    def star(l: DataFrame): DataFrame = l.filter(col("doc_id") =!= col("label"))
      .select(col("doc_id").as("doc_a"), col("label").as("doc_b"))
    def append(delta: DataFrame): Unit = {
      val fresh = DedupQueries.pairsOfDocs(delta)
        .unionByName(DedupQueries.crossPairsAgainst(spark, sfDir, delta, bands))
        .localCheckpoint()
      pairs = pairs.unionByName(fresh).localCheckpoint()
      bands = bands.unionByName(DedupQueries.bandsOfDocs(delta)).localCheckpoint()
      labels = DedupQueries.connectedComponents(
        star(labels).unionByName(fresh.select("doc_a", "doc_b")))._1.localCheckpoint()
    }

    append(d1)
    val (b2, p2, l2) = DedupQueries.retractMaintain(bands, pairs, labels, del)
    bands = b2.localCheckpoint(); pairs = p2.localCheckpoint()
    labels = l2.localCheckpoint()
    append(d2)

    val net = docs.filter(col("doc_id") % 10 =!= 3)
    assertSameSet(bands, DedupQueries.bandsOfDocs(net), "net bands")
    val pairsWant = DedupQueries.pairsOfDocs(net)
    assertSameSet(pairs, pairsWant, "net pairs")
    val labelsWant = DedupQueries.connectedComponents(
      pairsWant.select("doc_a", "doc_b"))._1
    assertSameSet(labels, labelsWant, "net labels")
    assertSameSet(
      DedupQueries.labelCorpus(net, labels),
      DedupQueries.labelCorpus(net, labelsWant), "net labeling")
  }

  test("span-index tombstone equals the rebuilt index over corpus-minus-deleted") {
    // q146's upstream claim: the decontamination stack's first
    // artifact retracts by the same anti-join shape, and the result is
    // exactly the index a from-scratch build over the surviving corpus
    // would produce
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    val tomb = DedupQueries.spanIndexTable(spark, sfDir)
      .join(broadcast(del), Seq("doc_id"), "left_anti")
    val want = DedupQueries.spanHashes13Of(docs.filter(col("doc_id") % 10 =!= 3))
    assertSameSet(tomb, want, "span-index tombstone")
  }

  test("published retraction generation re-attaches byte-untouched and reads as bare scans") {
    // the durable FOLD mode (q159): past the tombstone-debt gate (here
    // pinned, so the test stays delete-set-small and cheap) the
    // post-delete artifacts are a WRITE-once full generation — a second
    // publish with the same corpus + delete set touches no bytes, and
    // the re-read plans carry none of the retraction machinery (no
    // anti-join, no fixpoint)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    val (b1, p1, c1, rebuilt1) =
      DedupQueries.retractPublishMode(spark, sfDir, del, Some(true))
    assert(rebuilt1, "forced fold did not report rebuilt")

    // contents equal the in-flight retraction at every level
    val (bw, pw, cw) = DedupQueries.retractMaintain(
      DedupQueries.bandIndexTable(spark, sfDir),
      DedupQueries.pairIndexTable(spark, sfDir),
      DedupQueries.ccIndexTable(spark, sfDir), del)
    assertSameSet(b1, bw, "published bands")
    assertSameSet(p1, pw, "published pairs")
    assertSameSet(c1, cw, "published labels")

    def partFiles(family: String): Map[String, (Long, Long)] = {
      val base = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"graft_$family")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
      val prefix = s"${family}_${tag}_"
      val live = fs.listStatus(base).map(_.getPath)
        .filter(p => p.getName.startsWith(prefix)
          && p.getName.substring(prefix.length).matches("[0-9a-f]+")).toSeq
      assert(live.length == 1,
        s"expected one live $family generation, got ${live.map(_.getName)}")
      fs.listStatus(live.head)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime))
        .toMap
    }
    val before = Seq("band_index_r", "pair_index_r_b16", "cc_index_r").map(partFiles)
    assert(before.forall(_.nonEmpty), "a published generation has no parquet parts")

    // second publish: a re-attach, not a rebuild
    val (b2, _, c2, _) =
      DedupQueries.retractPublishMode(spark, sfDir, del, Some(true))
    assert(Seq("band_index_r", "pair_index_r_b16", "cc_index_r").map(partFiles) == before,
      "re-publish touched the published generation's bytes")

    // and the re-read plans are bare scans: no join (tombstone),
    // no aggregate (signatures/fixpoint) anywhere
    Seq("band_index_r" -> b2, "cc_index_r" -> c2).foreach { case (what, df) =>
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      assert(!nodes.exists(n => n.nodeName.toLowerCase.contains("join")
          || n.nodeName.toLowerCase.contains("aggregate")),
        s"$what re-read plan carries retraction machinery")
      assert(nodes.exists(_.isInstanceOf[FileSourceScanExec]),
        s"$what re-read plan has no file scan")
    }
  }

  test("patch-mode publish: composed reads == full rewrite == fresh build across two deletes, then the debt fold fires") {
    // round-13 verdict #1: a takedown-sized delete must land an
    // O(|D| + affected-clusters) PATCH generation, not an O(corpus)
    // rewrite. Three publishes against the same base artifacts:
    //   1. a takedown (~6% of indexed docs) — patch mode;
    //   2. a GROWN cumulative takedown log (~11%) — still patch mode,
    //      superseding the first patch generation;
    //   3. a sweep (~44%) — the debt gate fires and the family folds.
    // At each step every composed artifact equals BOTH the forced full
    // rewrite and the fresh build over corpus-minus-deleted. The
    // delete sets are %20-based: the published mode is RECORDED per
    // (corpus fp x delete fp), so reusing the forced-fold test's
    // %10==3 set here would resolve to its recorded fold.
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def check(del: org.apache.spark.sql.DataFrame, corpus: org.apache.spark.sql.DataFrame,
        what: String): Unit = {
      val (b, p, c, rebuilt) = DedupQueries.retractPublishMode(spark, sfDir, del)
      assert(!rebuilt, s"$what tripped the debt gate")
      // == the forced full rewrite (the fold-mode generations)
      val (bw, pw, cw, _) = DedupQueries.retractPublishMode(spark, sfDir, del, Some(true))
      assertSameSet(b, bw, s"$what patch bands vs full rewrite")
      assertSameSet(p, pw, s"$what patch pairs vs full rewrite")
      assertSameSet(c, cw, s"$what patch labels vs full rewrite")
      // == the fresh build over corpus-minus-deleted
      assertSameSet(b, DedupQueries.bandsOfDocs(corpus), s"$what patch bands vs fresh")
      val pairsWant = DedupQueries.pairsOfDocs(corpus)
      assertSameSet(p, pairsWant, s"$what patch pairs vs fresh")
      val (labelsWant, _) = DedupQueries.connectedComponents(
        pairsWant.select("doc_a", "doc_b"))
      assertSameSet(c, labelsWant, s"$what patch labels vs fresh")
    }

    val del1 = docs.filter(col("doc_id") % 20 === 3).select("doc_id")
    check(del1, docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 20 =!= 3),
      "delete 1")

    // the takedown log GROWS (deletes fold): still under the gate, the
    // next patch generation supersedes the first
    val del2 = docs.filter(col("doc_id") % 20 === 3 || col("doc_id") % 20 === 5)
      .select("doc_id")
    check(del2, docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 20 =!= 3
      && col("doc_id") % 20 =!= 5), "delete 2 (grown log)")

    // the patch sidecar is exactly |D| + |affected labels| + |relabeled
    // docs| rows — the O(corpus) write is gone
    val fp = DedupQueries.retractionFp(spark, sfDir,
      del2.select("doc_id").distinct())
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val patch = spark.read.parquet(
      s"$warehouse/graft_retract_patch/retract_patch_${tag}_$fp")
    val nDel = del2.distinct().count()
    val nAff = patch.filter(col("kind") === "aff").count()
    val nCc = patch.filter(col("kind") === "cc").count()
    assert(patch.count() == nDel + nAff + nCc,
      "patch sidecar carries rows beyond |D| + affected + relabeled")
    val nBands = DedupQueries.bandIndexTable(spark, sfDir).count()
    assert(patch.count() < nBands / 2,
      "patch sidecar is not corpus-sublinear")

    // the sweep trips the gate NATURALLY and folds into full generations
    val sweep = docs.filter((col("doc_id") % 10).isin(1, 3, 5, 9)).select("doc_id")
    val (bS, pS, cS, rebuiltS) = DedupQueries.retractPublishMode(spark, sfDir, sweep)
    assert(rebuiltS, "a ~44% sweep did not trip the band/pair/cc debt gate")
    val corpusS = docs.filter(!(col("doc_id") % 10).isin(1, 3, 5, 9, 7))
    assertSameSet(bS, DedupQueries.bandsOfDocs(corpusS), "fold bands vs fresh")
    val pairsWantS = DedupQueries.pairsOfDocs(corpusS)
    assertSameSet(pS, pairsWantS, "fold pairs vs fresh")
    val (labelsWantS, _) = DedupQueries.connectedComponents(
      pairsWantS.select("doc_a", "doc_b"))
    assertSameSet(cS, labelsWantS, "fold labels vs fresh")
  }

  test("patch-composed band read: broadcast anti-join over the bare base scan, zero index-side Exchange") {
    // the plan half of round-13 verdict #1: the patched read must add
    // ONLY a broadcast anti-join (of the tiny sidecar's delete ids) to
    // the base bucketed scan — no Exchange, no rebuild machinery.
    // %20-based delete set: the %10==3 fp carries the forced-fold
    // test's recorded fold mode.
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val del = docs.filter(col("doc_id") % 20 === 3).select("doc_id")
    val (bands, _, _, rebuilt) = DedupQueries.retractPublishMode(spark, sfDir, del)
    assert(!rebuilt, "takedown-sized delete tripped the gate")
    bands.collect()
    val plan = bands.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def isBandScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("band_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("band_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isBandScan),
      "the patch-composed band view does not read the persisted band index")
    val path = pathTo(plan, isBandScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the band-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"patch anti-join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(_.isInstanceOf[Exchange]),
      "index-side Exchange between the band-index scan and the patch anti-join")
  }

  test("patch-composed pair read: two broadcast anti-joins over the bare bucketed scan") {
    // the pairs half of the same claim: the composed pair view adds
    // exactly the doc_a and doc_b tombstone anti-joins — both
    // broadcast-hash — to the bucketed pair-index scan, with no
    // Exchange anywhere on the index side
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val del = docs.filter(col("doc_id") % 20 === 3).select("doc_id")
    val (_, pairs, _, rebuilt) = DedupQueries.retractPublishMode(spark, sfDir, del)
    assert(!rebuilt, "takedown-sized delete tripped the gate")
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def isPairScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("pair_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("pair_index"))
      case _ => false
    }
    val path = pathTo(plan, isPairScan)
      .getOrElse(fail("composed pair view does not read the persisted pair index"))
    val joins = path.filter(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joins.size == 2 && joins.forall(_.isInstanceOf[BroadcastHashJoinExec]),
      s"expected exactly two broadcast-hash anti-joins above the pair scan, " +
        s"got ${joins.map(_.getClass.getSimpleName)}")
    val firstJoin = path.indexWhere(_.isInstanceOf[BroadcastHashJoinExec])
    assert(!path.drop(firstJoin + 1).exists(_.isInstanceOf[Exchange]),
      "index-side Exchange between the pair-index scan and the patch anti-joins")
  }

  test("past-the-budget n-gram delete is a rebuild: debt gate fires, rebuild == fresh build") {
    val docs = graft.sources.Tables.documents(spark, sfDir)

    // a takedown-sized delete (~11% of standing docs) stays on the
    // tombstone + delta-bounded fix-up path, and its published
    // generation equals the in-flight retraction
    val small = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    val (pSmall, rebuiltSmall) =
      DedupQueries.ngramRetractPublishMode(spark, sfDir, small)
    assert(!rebuiltSmall, "a ~11% takedown tripped the tombstone-debt gate")
    assertSameSet(pSmall,
      DedupQueries.ngramRetract(DedupQueries.ngramPostingsTable(spark, sfDir),
        DedupQueries.ngramPairsTable(spark, sfDir), small),
      "tombstone-mode publish")

    // a sweep-scale delete (~44% of standing postings) trips the gate:
    // the family major-compacts, and the published pairs equal the
    // FRESH-FROM-TEXT batch build over corpus-minus-deleted — the
    // strongest form of rebuild == fresh build
    val sweep = docs
      .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 2 === 1)
      .select("doc_id")
    val (pBig, rebuiltBig) =
      DedupQueries.ngramRetractPublishMode(spark, sfDir, sweep)
    assert(rebuiltBig, "a ~44% sweep did not trip the tombstone-debt gate")
    val netDocs = docs.filter(col("doc_id") % 2 === 0) // %10==7 docs are odd
    val fresh = DedupQueries.ngramScoredPairs(
      DedupQueries.ngramPostingsOf(netDocs)
        .filter(col("df") <= DedupQueries.DfCut).select("doc_id", "sg"))
    assertSameSet(pBig, fresh, "rebuild-mode publish vs fresh-from-text build")

    // the rebuilt generation truncates the log: a re-run with the same
    // delete set re-attaches byte-untouched (no retraction work, no
    // tombstone joins — the artifact identity contains the delete set)
    def partFiles(family: String): Map[String, (Long, Long)] = {
      val base = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"graft_$family")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val live = fs.listStatus(base).map(_.getPath)
        .filter(_.getName.matches(s"${family}_.*_[0-9a-f]+")).toSeq
      live.flatMap(d => fs.listStatus(d)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => s"${d.getName}/${f.getPath.getName}" ->
          (f.getLen, f.getModificationTime))).toMap
    }
    val before = (partFiles("ngram_pairs_r"), partFiles("ngram_post_r"))
    assert(before._1.nonEmpty && before._2.nonEmpty,
      "rebuild published no ngram_post_r/ngram_pairs_r parquet parts")
    val (pAgain, rebuiltAgain) =
      DedupQueries.ngramRetractPublishMode(spark, sfDir, sweep)
    assert(rebuiltAgain, "gate decision changed on re-run")
    assert((partFiles("ngram_pairs_r"), partFiles("ngram_post_r")) == before,
      "re-publish touched the rebuilt generation's bytes")
    assertSameSet(pAgain, fresh, "re-attached rebuild generation")
  }

  test("delete-set fingerprint is order-free but not sum-linear") {
    // round-12 advice: the fp must distinguish equal-size, equal-id-sum
    // delete sets ({1,4} vs {2,3} — the linear-hash collision class),
    // while staying order-free (it keys a durable published generation,
    // so a reordered takedown log must re-attach, not rebuild)
    import spark.implicits._
    def fp(ids: Long*): String =
      DedupQueries.deleteSetFp(ids.toDF("doc_id"))
    assert(fp(1L, 4L) == fp(4L, 1L), "fingerprint is order-sensitive")
    assert(fp(1L, 4L) != fp(2L, 3L),
      "equal-sum delete sets collide — the fingerprint is linear in the ids")
    assert(fp(10L, 400L, 95L) != fp(400L, 10L, 96L) &&
      fp(10L, 400L, 95L) != fp(9L, 401L, 95L),
      "near-miss delete sets collide")
    assert(fp() != fp(0L), "empty set collides with {0}")
  }

  test("band tombstoning: broadcast anti-join over the bare index scan, zero index-side Exchange") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val del = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
    val (bands1, _, _) = DedupQueries.retractMaintain(
      DedupQueries.bandIndexTable(spark, sfDir),
      DedupQueries.pairIndexTable(spark, sfDir),
      DedupQueries.ccIndexTable(spark, sfDir), del)
    bands1.collect()
    val plan = bands1.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def isBandScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("band_index")) ||
          f.relation.location.rootPaths.exists(_.toString.contains("band_index"))
      case _ => false
    }
    assert(flatten(plan).exists(isBandScan),
      "the tombstoned band view does not read the persisted band index")
    val path = pathTo(plan, isBandScan).get
    val joinIdx = path.lastIndexWhere(p =>
      p.isInstanceOf[BroadcastHashJoinExec] || p.isInstanceOf[SortMergeJoinExec]
        || p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec])
    assert(joinIdx >= 0, "no join found above the band-index scan")
    assert(path(joinIdx).isInstanceOf[BroadcastHashJoinExec],
      s"tombstone anti-join is ${path(joinIdx).getClass.getSimpleName}, not broadcast-hash")
    assert(!path.drop(joinIdx + 1).exists(_.isInstanceOf[Exchange]),
      "index-side Exchange between the band-index scan and the tombstone anti-join")
  }

  test("a crashed fold's orphan partials are parked by the next patch-mode publish") {
    // a forced fold publishes band_index_r, then pair_index_r_b16, then
    // cc_index_r (the mode record) — a crash between the second and
    // third leaves corpus-scale partials under that fp which a later
    // unforced run (resolving to patch mode) never attaches. Round-15
    // advice: patch resolution PROVES those siblings are dead — park
    // them under the standard one-build grace window.
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // a delete-set fp no other test publishes under (recorded modes are
    // per (corpus fp x delete fp) and the warehouse is suite-shared)
    val del = docs.filter(col("doc_id") % 40 === 23)
      .select("doc_id").distinct().localCheckpoint()
    val fp = DedupQueries.retractionFp(spark, sfDir, del)

    // plant the crash state: band + pair generations live, NO cc record
    val retracted = DedupQueries.retractMaintain(
      DedupQueries.bandIndexTable(spark, sfDir),
      DedupQueries.pairIndexTable(spark, sfDir),
      DedupQueries.ccIndexTable(spark, sfDir), del)
    graft.sources.DurableIndex.attachOrBuildFp(
      spark, sfDir, "band_index_r", fp, Some(("band_key", 16)))(retracted._1)
    graft.sources.DurableIndex.attachOrBuildFp(
      spark, sfDir, "pair_index_r_b16", fp, Some(("doc_a", 16)))(
      retracted._2.repartition(16, col("doc_a")))
    assert(graft.sources.DurableIndex.liveExists(spark, sfDir, "band_index_r", fp)
      && graft.sources.DurableIndex.liveExists(spark, sfDir, "pair_index_r_b16", fp)
      && !graft.sources.DurableIndex.liveExists(spark, sfDir, "cc_index_r", fp),
      "crash-state plant failed")

    // the next unforced publish resolves to patch mode (a ~2.5% delete
    // is far under the gate) and parks the dead partials
    val (b, _, c, rebuilt) = DedupQueries.retractPublishMode(spark, sfDir, del)
    assert(!rebuilt, "a takedown-sized delete tripped the debt gate")
    assert(!graft.sources.DurableIndex.liveExists(spark, sfDir, "band_index_r", fp)
      && !graft.sources.DurableIndex.liveExists(spark, sfDir, "pair_index_r_b16", fp),
      "orphan fold partials still live after a patch-mode publish")
    // parked (grace window), not deleted out from under a reader
    // warehouse.dir is a file: URI — strip the scheme for NIO paths
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    assert({
      val d = java.nio.file.Paths.get(s"$warehouse/graft_band_index_r")
      val st = java.nio.file.Files.list(d)
      try st.anyMatch(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"band_index_r_${tag}_$fp.retired"))
      finally st.close()
    }, "orphan band partial was deleted instead of parked")

    // and the patch-composed read is still exact
    val corpus = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 40 =!= 23)
    assertSameSet(b, DedupQueries.bandsOfDocs(corpus), "post-park bands vs fresh")
    val (labelsWant, _) = DedupQueries.connectedComponents(
      DedupQueries.pairsOfDocs(corpus).select("doc_a", "doc_b"))
    assertSameSet(c, labelsWant, "post-park labels vs fresh")
  }

  test("benchmark retirement: patch mode, fresh-session discovery, then the fold supersedes") {
    // the q161 contract (round-15 verdict #5): an eval set rotated out
    // of the suite publishes ONCE under the shared debt gate, every
    // later session serves the surviving benchmark without the
    // retirement batch in hand, and both modes equal the from-scratch
    // decontamination vs the surviving benchmark.
    val docs = graft.sources.Tables.documents(spark, sfDir)

    // from-scratch expectation, parameterized over the surviving bench
    def freshVs(benchPred: org.apache.spark.sql.Column): DataFrame = {
      val sh13 = DedupQueries.spanHashes13(spark, sfDir)
      val bench = sh13.filter(col("doc_id") % 5 === 0 && benchPred)
        .select(col("doc_id").as("bench_id"), col("h").as("bh"))
      sh13.join(broadcast(bench),
          col("h") === col("bh") && col("doc_id") =!= col("bench_id"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
    }

    // the patch-mode slice must be DATA-DRIVEN: at sf0.001 the contam
    // table is sparse enough that a fixed 1-in-10 benchmark slice can
    // own >20% of its rows and legitimately fold — retire the single
    // bench doc owning the FEWEST contamination rows instead, with the
    // under-the-gate precondition asserted, not assumed
    val full = DedupQueries.contamFullTable(spark, sfDir).localCheckpoint()
    val totalRows = full.count()
    val smallId = full.groupBy("bench_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n"), col("bench_id")).select("bench_id", "n").first()
    assert(smallId.getLong(1) > 0
        && smallId.getLong(1).toDouble <= 0.2 * totalRows.toDouble,
      s"no under-the-gate bench slice exists (min ${smallId.getLong(1)} of $totalRows rows)")
    val retiredSmall = spark.range(1)
      .select(lit(smallId.getLong(0)).as("bench_id"))
    val smallPred = col("doc_id") =!= smallId.getLong(0)

    // 1. takedown-sized retirement resolves to PATCH under the natural
    // gate: contam_del sidecar live, no contam_r fold, result == fresh
    val r1 = DedupQueries.contamRetracted(spark, sfDir, Some(retiredSmall))
    val fpSmall = DedupQueries.retractionFp(spark, sfDir,
      retiredSmall.select(col("bench_id").as("doc_id")))
    assert(graft.sources.DurableIndex.liveExists(spark, sfDir, "contam_del", fpSmall),
      "patch-mode retirement published no contam_del sidecar")
    assert(!graft.sources.DurableIndex.liveExists(spark, sfDir, "contam_r", fpSmall),
      "a takedown-sized retirement folded")
    assertSameSet(r1, freshVs(smallPred), "patch-mode retirement")

    // 2. a FRESH session (no retirement batch in hand) discovers the
    // sidecar and serves the identical surviving relation
    val r2 = DedupQueries.contamRetracted(spark, sfDir, None)
    assertSameSet(r2, freshVs(smallPred), "fresh-session discovery")

    // 3. the composed read's plan: ONE broadcast anti-join over the
    // contam_full scan, zero corpus re-probing (no documents scan)
    val plan = flatten(r2.queryExecution.executedPlan)
    assert(plan.count {
      case j: BroadcastHashJoinExec => j.joinType.sql == "LEFT ANTI"
      case _ => false
    } == 1, "composed retirement read is not exactly one broadcast anti-join")
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]),
      "composed retirement read fell back to a sort-merge join")
    val scanned = plan.collect { case sc: FileSourceScanExec =>
      sc.relation.location.rootPaths.map(_.toString) }.flatten
    assert(!scanned.exists(_.contains("documents.parquet")),
      s"retirement read re-probed the corpus: $scanned")

    // 4. a sweep-scale rotation (the whole standing half, ~50% of the
    // benchmark) trips the gate and FOLDS; its publish supersedes the
    // small sidecar, so a fresh session now serves the fold generation
    val retiredBig = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("bench_id"))
    val r3 = DedupQueries.contamRetracted(spark, sfDir, Some(retiredBig))
    val fpBig = DedupQueries.retractionFp(spark, sfDir,
      retiredBig.select(col("bench_id").as("doc_id")))
    assert(graft.sources.DurableIndex.liveExists(spark, sfDir, "contam_r", fpBig),
      "sweep-scale retirement did not fold")
    assertSameSet(r3, freshVs(col("doc_id") % 10 =!= 0), "fold-mode retirement")
    val r4 = DedupQueries.contamRetracted(spark, sfDir, None)
    assertSameSet(r4, freshVs(col("doc_id") % 10 =!= 0),
      "fresh session did not resolve to the superseding fold")
  }
}
