package graft.tools

/** Splits a query's bench wall into DataFrame BUILD (driver-side plan
  * construction: query-body side effects + analysis) and EXECUTION
  * (the noop action: optimization + scheduling + tasks), per warm
  * iteration — so optimization effort lands on the phase that actually
  * holds the seconds (guide §1: measure first).
  *
  *   runMain graft.tools.PlanCost <sfDir> <iters> [query...]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.drop(2).toSet
    val spark = graft.GraftSession.build()
    graft.GraftSession.quietNoisyLoggers()
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    // warm-up pass
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    names.foreach { n =>
      val builds = Array.ofDim[Double](iters)
      val execs = Array.ofDim[Double](iters)
      (0 until iters).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        builds(i) = (t1 - t0) / 1e9; execs(i) = (t2 - t1) / 1e9
      }
      println(f"""{"query":"$n","build_min_s":${builds.min}%.3f,""" +
        f""""exec_min_s":${execs.min}%.3f}""")
    }
    spark.stop()
  }
}
