package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Same-window A/B of the two q84 (TPC-H Q21 silhouette) shapes —
  * round-21 verdict #3: the driver's bench measured the round-21
  * aggregate rewrite at 1.5 -> 2.2 s while the builder's same-window
  * A/B measured it 2.4 -> 2.2 s; this tool settles it by alternating
  * BOTH shapes inside one JVM (min-of-k, warm), at whatever SF dir it
  * is pointed at (sf0.1 and the ScaleGen sf1 corpus).
  *
  *   runMain graft.tools.Q84Ab <sfDir> <iters>
  *
  * "old" = the round-20 shape: left-semi + left-anti self-joins of the
  * staged l1. "new" = the round-21 shape: one per-(order, supplier) ->
  * per-order aggregate + a single semi-join. Both end in the identical
  * supplier join + top-20.
  */
object Q84Ab {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  private def l1Of(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.lineitem(s, dir)
      .join(graft.sources.Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAY"))
          .as("late"))
      .localCheckpoint()

  private def finish(s: SparkSession, dir: String, cand: DataFrame): DataFrame =
    cand.join(graft.sources.Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)

  /** Round-20 shape: semi + anti self-joins. */
  def oldShape(s: SparkSession, dir: String): DataFrame = {
    val l1 = l1Of(s, dir)
    val others = l1.select(col("l_orderkey").as("ok"),
      col("l_suppkey").as("sk"), col("late").as("olate"))
    val cand = l1.filter(col("late"))
      .join(others,
        col("ok") === col("l_orderkey") && col("sk") =!= col("l_suppkey"),
        "left_semi")
      .join(others.filter(col("olate")),
        col("ok") === col("l_orderkey") && col("sk") =!= col("l_suppkey"),
        "left_anti")
    finish(s, dir, cand)
  }

  /** Round-21 shape: per-order aggregate + one semi-join (must match
    * WarehouseQueries.q84 exactly — drift here voids the A/B). */
  def newShape(s: SparkSession, dir: String): DataFrame = {
    val l1 = l1Of(s, dir)
    val perOrder = l1.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("slate"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("slate"), 1L).otherwise(0L)).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("ok"))
    val cand = l1.filter(col("late"))
      .join(perOrder, col("ok") === col("l_orderkey"), "left_semi")
    finish(s, dir, cand)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = graft.GraftSession.build()
    graft.GraftSession.quietNoisyLoggers()
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // equivalence first: both shapes must agree row-for-row
    val a = oldShape(spark, sfDir).collect().toSeq
    val b = newShape(spark, sfDir).collect().toSeq
    require(a == b, s"shapes disagree: old=${a.take(3)} new=${b.take(3)}")
    // warm both, then alternate
    time(oldShape(spark, sfDir)); time(newShape(spark, sfDir))
    val olds = Array.ofDim[Double](iters)
    val news = Array.ofDim[Double](iters)
    (0 until iters).foreach { i =>
      olds(i) = time(oldShape(spark, sfDir))
      news(i) = time(newShape(spark, sfDir))
    }
    println(f"""{"sf":"$sfDir","old_min_s":${olds.min}%.3f,"new_min_s":${news.min}%.3f,"old":[${olds.map(x => f"$x%.3f").mkString(",")}],"new":[${news.map(x => f"$x%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
