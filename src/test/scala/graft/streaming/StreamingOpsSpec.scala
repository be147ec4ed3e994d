package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Stream/batch equivalence: a bounded AvailableNow drain of the file
  * source must produce exactly the result of the same transform run as a
  * batch — Structured Streaming's core correctness contract. */
class StreamingOpsSpec extends SparkSpec {

  test("streaming hourly window agg == batch groupBy over the same files") {
    val streamed = StreamingOps.hourlyCounts(spark, sfDir)
      .select("window_start", "event_type", "n", "total_value")

    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful streaming sessionization == batch window sessionization") {
    val streamed = StreamingOps.sessionize(spark, sfDir)

    // independent batch formulation (lag -> gap flag -> running sum)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_type"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"))
      .rowsBetween(Long.MinValue, 0)
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("millisecond", col("ts")).as("ts"),
        col("event_type"))
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)) > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session bounds are consistent: start <= end, n_events >= 1") {
    val s = StreamingOps.sessionize(spark, sfDir)
    assert(s.filter(col("session_start") > col("session_end")).count() == 0)
    assert(s.filter(col("n_events") < 1).count() == 0)
  }
}
