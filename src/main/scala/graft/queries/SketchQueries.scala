package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Mergeable-sketch aggregation (brief: "a novel sketch"). A count-min
  * sketch is the 100-TB frequency-estimation pattern: each partition
  * builds a (depth x width) counter grid with map-side combine, grids
  * merge by cell-wise addition (the groupBy does this for free), and a
  * point estimate reads one cell per depth and takes the min — the
  * sketch is O(d*w) regardless of key cardinality.
  *
  * Spark's own approx sketches (HLL, CountMinSketch) use engine-private
  * hashing the DuckDB oracle cannot reproduce, so this sketch is built
  * from the CrossEngine universal-hash family — every counter and every
  * estimate is deterministic and oracle-checked exactly. The estimate
  * >= true-count guarantee is asserted by the spec.
  */
object SketchQueries {

  private val Depth = 4
  private val Width = 64
  private val NumProbes = 10

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q46_countmin_sketch",
      s"count-min sketch (${Depth}x$Width, universal-hash family) over events.user_id: build the mergeable counter grid, point-estimate $NumProbes probe keys as min-over-depths, report vs true counts",
      {
        val colSql = (h: String, d: String) =>
          s"((($h * (1000003 * ($d + 1) % $P) + (7777777 * ($d + 1) % $P)) % $P) % $Width)"
        s"""WITH e AS (SELECT user_id, ${sqlTokenHash("user_id::VARCHAR")} AS h FROM events),
           |cells AS (SELECT d, ${colSql("h", "d")} AS cell, count(*) AS c
           |  FROM e CROSS JOIN (SELECT unnest(range($Depth)) AS d) dd
           |  GROUP BY 1, 2),
           |probes AS (SELECT DISTINCT user_id, h FROM e WHERE user_id < $NumProbes),
           |est AS (SELECT user_id, min(c) AS cms_estimate
           |  FROM probes CROSS JOIN (SELECT unnest(range($Depth)) AS d) dd
           |  JOIN cells ON cells.d = dd.d AND cells.cell = ${colSql("h", "dd.d")}
           |  GROUP BY user_id),
           |truth AS (SELECT user_id, count(*) AS true_n FROM events
           |  WHERE user_id < $NumProbes GROUP BY user_id)
           |SELECT user_id, true_n, cms_estimate
           |FROM truth JOIN est USING (user_id)""".stripMargin
      }) { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("user_id"), tokenHash(col("user_id").cast("string")).as("h"))
      def cell(h: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
        (((h * ((lit(1000003L) * (d + 1)) % P) + (lit(7777777L) * (d + 1)) % P) % P) % Width)

      val depths = explode(sequence(lit(0L), lit(Depth - 1L))).as("d")
      // the sketch: one groupBy builds AND merges the counter grid
      val cells = e.select(col("h"), depths)
        .select(col("d"), cell(col("h"), col("d")).as("cell"))
        .groupBy("d", "cell").agg(count(lit(1)).as("c"))

      val probes = e.filter(col("user_id") < NumProbes).distinct()
        .select(col("user_id"), col("h"), depths)
        .select(col("user_id"), col("d").as("pd"), cell(col("h"), col("d")).as("pcell"))
      val est = probes
        .join(broadcast(cells), col("pd") === col("d") && col("pcell") === col("cell"))
        .groupBy("user_id").agg(min(col("c")).as("cms_estimate"))

      val truth = Tables.events(s, dir).filter(col("user_id") < NumProbes)
        .groupBy("user_id").agg(count(lit(1)).as("true_n"))
      truth.join(est, Seq("user_id"))
        .select("user_id", "true_n", "cms_estimate")
    })
}
