package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec

/** One durability check across EVERY round-11 standing artifact: each
  * must publish under the warehouse and re-attach byte-untouched on a
  * second access — a rebuild on re-attach would mean the "built once
  * per corpus fingerprint" cost claim is false for that family. The
  * deeper per-family contracts (staleness rebuild, bucket-layout
  * preservation, catalog re-attach) live in BandIndexSpec /
  * SemIndexSpec / PairIndexSpec; this spec keeps the newer families
  * from silently dropping out of the shared machinery.
  */
class DurableArtifactsSpec extends SparkSpec {

  /** (name -> (length, mtime)) of parquet parts under the single live
    * published version for `family` over the test sf dir. */
  private def partFiles(family: String): Map[String, (Long, Long)] = {
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_$family")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val prefix = s"${family}_${tag}_"
    val live = fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.startsWith(prefix)
        && p.getName.substring(prefix.length).matches("[0-9a-f]+")).toSeq
    assert(live.length == 1,
      s"expected one live $family version, got ${live.map(_.getName)}")
    fs.listStatus(live.head)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime))
      .toMap
  }

  test("every round-11 durable artifact re-attaches byte-untouched") {
    val artifacts: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("pair_index", DedupQueries.pairIndexTable _),
      ("cc_index", DedupQueries.ccIndexTable _),
      ("span_index", DedupQueries.spanIndexTable _),
      ("contam_index", DedupQueries.contamIndexTable _),
      ("sem_codebook_all", SimilarityQueries.semCodebookAllTable _),
      ("hh_store", SketchQueries.hhStoreTable _),
      ("scd2_state", RelationalExtras.scd2StateTable _),
      ("ngram_postings_b16", DedupQueries.ngramPostingsTable _),
      ("ngram_df", DedupQueries.ngramDfTable _),
      ("ngram_pairs", DedupQueries.ngramPairsTable _))
    artifacts.foreach { case (family, attach) =>
      attach(spark, sfDir).count(): Unit
      val before = partFiles(family)
      assert(before.nonEmpty, s"$family published no parquet parts")
      attach(spark, sfDir).count(): Unit
      assert(partFiles(family) == before,
        s"$family part files changed — the re-attach rebuilt the artifact")
    }
  }
}
