package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the two-pass splittable readers ([[SplitCsv]],
  * [[SplitJson]]): glob listing and the chunk-size auto-scale. Both
  * routes are driver-safe by the same argument — the ONLY driver-side
  * materialization is the file listing; chunk scans and ranges stay in
  * RDDs end to end (round-18 verdict #2).
  */
private[ingest] object SplitFiles {

  /** Chunk-count bound the auto-scale targets (round-18 ADVICE: with no
    * bound, 100 TB at 32 MB chunks is ~3.3M pass-1 tasks; at this bound
    * the same corpus reads in ~400 MB chunks — still far under the
    * 1 GiB per-task buffer cap, which auto-scale can never exceed until
    * ~256 PB, where the explicit chunkBytes require fires instead).
    * Callers' EXPLICIT smaller chunkBytes below the bound are honored
    * unchanged (specs force adversarial alignments that way). */
  val MaxChunks: Long = 1L << 18

  /** `(path, length, mtime)` for every non-empty file under the glob,
    * sorted by path, plus the EFFECTIVE chunk size after auto-scaling
    * chunkBytes so the whole-corpus chunk count stays under
    * [[MaxChunks]]. */
  def listing(spark: SparkSession, pattern: String, chunkBytes: Long)
      : (Array[(String, Long, Long)], Long) = {
    require(chunkBytes >= 16, s"chunkBytes=$chunkBytes unreasonably small")
    require(chunkBytes <= (1L << 30),
      s"chunkBytes=$chunkBytes exceeds the 1 GiB per-task buffer bound")
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
      .filter(st => st.isFile && st.getLen > 0)
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
      .sortBy(_._1)
    require(files.nonEmpty, s"no files match $pattern")
    val totalBytes = files.map(_._2).sum
    val eff = math.max(chunkBytes, (totalBytes + MaxChunks - 1) / MaxChunks)
    require(eff <= (1L << 30),
      s"corpus of $totalBytes bytes needs >1 GiB chunks to stay under " +
        s"$MaxChunks chunks — beyond this route's per-task buffer bound")
    (files, eff)
  }

  /** Total matched bytes under a glob — the split-route gate input
    * shared by SourceLoader's csv and json branches. */
  def globBytes(spark: SparkSession, pattern: String): Long = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap(st =>
        if (st.isDirectory) fs.listStatus(st.getPath) else Array(st))
      .filter(_.isFile).map(_.getLen).sum
  }
}
