package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE machine-parseable JSON line (also written to
  * `bench_out.json` as a belt-and-braces copy — round-1's number was lost
  * to sbt log decoration).
  *
  * Methodology (fixes round-1 defects called out in VERDICT.md):
  *   - one untimed warm-up pass first, so JVM/codegen/datasource init cost
  *     is not attributed to whichever query happens to run first;
  *   - queries run in stable (sorted-by-name) order;
  *   - each query is timed `iters` times and the MEDIAN is reported;
  *   - the action is a noop-format write, not count(): count() lets
  *     Catalyst prune every computed column, turning projection-heavy
  *     queries into dead code. The noop sink materializes every row and
  *     column without disk cost;
  *   - a failing query is reported as `"failed":[...]` and flips the exit
  *     code — it can never be mistaken for a fast timing.
  */
object Bench {

  private def runOnce(spark: SparkSession, sfDir: String,
      name: String): Unit =
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val failed = scala.collection.mutable.ArrayBuffer[String]()

    // Warm-up: one full untimed pass (JIT, codegen cache, FS metadata).
    names.foreach { n =>
      try runOnce(spark, sfDir, n)
      catch { case _: Throwable => () } // recorded on the timed pass
    }

    val timings: Seq[(String, Double)] = names.map { n =>
      val samples = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try { runOnce(spark, sfDir, n); Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $n failed: ${e.getMessage}")
          None
        }
      }
      if (samples.isEmpty) { failed += n; n -> -1.0 }
      else n -> samples.sorted.apply(samples.size / 2)
    }

    val ok = timings.filter(_._2 >= 0)
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val fs = failed.map(f => s""""$f"""").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"iters":$iters,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
