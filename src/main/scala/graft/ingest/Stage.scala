package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Stage upload / landing copy (SURVEY.md §2.1 S2; ref:
  * step_2_stage_data.py:41-100 — os.walk filtered by extension, then PUT
  * to an internal stage preserving the partition path, overwrite=true).
  *
  * The Spark-native equivalent: a Hadoop `FileSystem` copy of every data
  * file under `srcDir` into `landingDir`, preserving the
  * `source=CC/format=fmt/date=...` relative path so downstream globs see
  * the same layout. Runs driver-side — staging is a control-plane file
  * operation, not a row-level transform (on a cluster the same code works
  * against HDFS/S3 through the same `FileSystem` API; a distributed copy
  * tool only becomes worthwhile when file counts reach millions).
  *
  * Reading in place is equally valid (SURVEY §2.1) — this exists for
  * pipelines that need an immutable landing snapshot decoupled from the
  * upstream drop zone.
  */
object Stage {

  val DataExtensions: Set[String] = Set("csv", "parquet", "json")

  private def extensionOf(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i < 0) "" else name.substring(i + 1).toLowerCase
  }

  /** Copy every data file under `srcDir` to `landingDir`, preserving
    * relative paths; overwrites existing targets (ref: overwrite=True,
    * step_2:79). Returns the copied relative paths, sorted. */
  def copyToLanding(spark: SparkSession, srcDir: String,
      landingDir: String,
      extensions: Set[String] = DataExtensions): Seq[String] = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val dest = new Path(landingDir)
    val srcFs = src.getFileSystem(conf)
    val destFs = dest.getFileSystem(conf)

    val files = {
      val it = srcFs.listFiles(src, /* recursive = */ true)
      val buf = scala.collection.mutable.ListBuffer[Path]()
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && extensions(extensionOf(st.getPath.getName)))
          buf += st.getPath
      }
      buf.toList
    }

    val srcUri = src.toUri.getPath.stripSuffix("/")
    files.map { f =>
      val rel = f.toUri.getPath.stripPrefix(srcUri).stripPrefix("/")
      val target = new Path(dest, rel)
      destFs.mkdirs(target.getParent)
      org.apache.hadoop.fs.FileUtil.copy(
        srcFs, f, destFs, target, /* deleteSource = */ false,
        /* overwrite = */ true, conf)
      rel
    }.sorted
  }
}
