package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Fixed-cost breakdown of the heavy streaming drains (round-16
  * verdict #6): q134/q107 hold the bench's 5-6s floor at sf0.1, and
  * the round-15/16 work cut them ~20% then held them flat — before
  * spending another round re-litigating the number, this tool says
  * WHERE the seconds go. It hooks a StreamingQueryListener onto the
  * session, runs a named drain query end to end (Bench's noop action),
  * and attributes wall time to:
  *
  *   - pre-stream setup (artifact attach + drop staging + sink DDL):
  *     t(first batch start) - t0;
  *   - per micro-batch, Spark's own durationMs split — addBatch (the
  *     foreachBatch body), triggerExecution, getBatch/latestOffset
  *     (source listing), queryPlanning, walCommit + commitOffsets
  *     (checkpoint fsync);
  *   - post-stream tail (compaction + final fold + output write):
  *     t_end - t(last batch end).
  *
  *   runMain graft.tools.DrainProfile [queryName] [sfDir] [iters]
  *
  * Prints one JSON line per iteration plus an aggregate; run on a
  * quiet box (the bench stall caveat applies doubly to breakdowns).
  */
object DrainProfile {

  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("q134_stream_components")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.build()
    graft.GraftSession.quietNoisyLoggers()

    final case class BatchRow(batchId: Long, startMs: Long, rows: Long,
        dur: Map[String, Long])
    val batches = scala.collection.mutable.ArrayBuffer[BatchRow]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val p = e.progress
        batches.synchronized {
          batches += BatchRow(p.batchId,
            java.time.Instant.parse(p.timestamp).toEpochMilli,
            p.numInputRows,
            p.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap)
        }
      }
    }
    spark.streams.addListener(listener)

    def fmtAgg(rows: Seq[BatchRow], wallMs: Long, t0Ms: Long,
        tEndMs: Long): String = {
      val keys = rows.flatMap(_.dur.keys).distinct.sorted
      val sums = keys.map(k => k -> rows.map(_.dur.getOrElse(k, 0L)).sum)
      val firstStart = rows.map(_.startMs).minOption.getOrElse(tEndMs)
      val lastEnd = rows.map(r => r.startMs +
        r.dur.getOrElse("triggerExecution", 0L)).maxOption.getOrElse(firstStart)
      val parts = Seq(
        "wall_ms" -> wallMs,
        "pre_stream_ms" -> (firstStart - t0Ms),
        "stream_ms" -> (lastEnd - firstStart),
        "post_stream_ms" -> (tEndMs - lastEnd),
        "n_batches" -> rows.size.toLong) ++ sums
      parts.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    }

    (1 to iters).foreach { i =>
      batches.synchronized(batches.clear())
      val t0 = System.currentTimeMillis()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val tEnd = System.currentTimeMillis()
      val rows = batches.synchronized(batches.toSeq)
      println(s"""{"iter":$i,"query":"$name","sf":"$sfDir",""" +
        fmtAgg(rows, tEnd - t0, t0, tEnd).drop(1))
      rows.sortBy(_.batchId).foreach { b =>
        val ds = b.dur.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        System.err.println(s"  [batch ${b.batchId}] rows=${b.rows} $ds")
      }
    }
    spark.stop()
  }
}
