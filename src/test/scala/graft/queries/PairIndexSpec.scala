package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintenance contract of the persisted standing PAIR table
  * (q130's artifact — round-10 verdict #4): the standing side of the
  * incremental pair-set decomposition must be a table READ, and the
  * per-batch `append(within ∪ cross)` write must leave the table equal
  * to a full recompute. Two halves:
  *
  *   1. the durable artifact re-attaches without recomputing (part
  *      files byte-untouched) and its read plan is a bare parquet scan
  *      — no Exchange, no aggregate, no shingle/minhash machinery;
  *   2. across TWO successive maintenance batches against a growing
  *      corpus, append-then-read == the all-pairs recompute over the
  *      corpus-so-far — the exactness argument q130's doc makes
  *      (per-document bands + shingle counts ⇒ structurally disjoint
  *      decomposition), proven executable.
  */
class PairIndexSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** (name -> (length, mtime)) of every parquet part under the single
    * live published pair-table version for `tag`. */
  private def partFiles(tag: String): Map[String, (Long, Long)] = {
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"),
      "graft_pair_index_b16")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"pair_index_b16_${tag}_"
    val live = fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.startsWith(prefix)
        && p.getName.substring(prefix.length).matches("[0-9a-f]+")).toSeq
    assert(live.length == 1,
      s"expected exactly one live pair-table version for $tag, " +
        s"got ${live.map(_.getName).mkString(", ")}")
    fs.listStatus(live.head)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime))
      .toMap
  }

  private def assertSameSet(got: DataFrame, want: DataFrame, what: String): Unit = {
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"$what: maintained pair table != full recompute")
  }

  test("standing pair table re-attaches untouched and reads as a bare scan") {
    val first = DedupQueries.pairIndexTable(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val recompute = DedupQueries.pairsOfDocs(
      docs.filter(col("doc_id") % 10 =!= 7))
    assertSameSet(first, recompute, "initial build")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val before = partFiles(tag)
    assert(before.nonEmpty, "published pair table has no parquet parts")

    // second attach: byte-for-byte untouched — a read, not a rebuild
    val again = DedupQueries.pairIndexTable(spark, sfDir)
    assert(partFiles(tag) == before,
      "pair-table part files changed — the re-attach recomputed pairs")

    // and the standing side q130 unions in is a BARE parquet scan: no
    // Exchange, no aggregate (minhash signatures), no join (candidate
    // generation) anywhere in its plan
    again.collect()
    val nodes = flatten(again.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[Exchange]),
      "Exchange in the standing pair-table read")
    assert(!nodes.exists(n => n.nodeName.toLowerCase.contains("aggregate")
        || n.nodeName.toLowerCase.contains("join")),
      "recompute machinery (aggregate/join) in the standing pair-table read")
    assert(nodes.exists(_.isInstanceOf[FileSourceScanExec]),
      "no file scan in the standing pair-table read")
  }

  test("two-batch append-then-read equals the full recompute") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val slice0 = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 9)
    val delta1 = docs.filter(col("doc_id") % 10 === 9)
    val delta2 = docs.filter(col("doc_id") % 10 === 7)
    val pairPath = java.nio.file.Files.createTempDirectory("graft_pairtab")
      .resolve("pairs").toString

    // bootstrap: the standing artifact over the initial corpus
    DedupQueries.pairsOfDocs(slice0).write.parquet(pairPath)

    // batch 1: append (within ∪ cross) — the ONLY write the maintenance
    // contract performs; nothing corpus-sized recomputes
    DedupQueries.pairsOfDocs(delta1)
      .unionByName(DedupQueries.crossPairsAgainst(spark, sfDir, delta1,
        DedupQueries.bandsOfDocs(slice0)))
      .write.mode("append").parquet(pairPath)
    val corpus1 = docs.filter(col("doc_id") % 10 =!= 7)
    assertSameSet(spark.read.parquet(pairPath),
      DedupQueries.pairsOfDocs(corpus1), "after batch 1")

    // batch 2 against the GROWN corpus: same contract, second append
    DedupQueries.pairsOfDocs(delta2)
      .unionByName(DedupQueries.crossPairsAgainst(spark, sfDir, delta2,
        DedupQueries.bandsOfDocs(corpus1)))
      .write.mode("append").parquet(pairPath)
    assertSameSet(spark.read.parquet(pairPath),
      DedupQueries.pairsOfDocs(docs), "after batch 2")
  }
}
