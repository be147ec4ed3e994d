package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** IVF-PQ machinery shared by q82 (ADC search) and q85 (re-rank): multi-probe cell selection, PQ code assignment, the ADC scoring plan and its DuckDB oracle CTEs.
  *
  * Pure round-17 refactor: split out of the 1,699-line
  * SimilarityQueries.scala verbatim, per the DedupQueries precedent
  * (self-typed to the object so cross-family references keep
  * resolving; `private` widened to `private[queries]` where a member
  * crosses a trait boundary — traits cannot share plain-private
  * members). */
trait SimIvfPq { self: SimilarityQueries.type =>

  // ---- IVF-PQ machinery shared by q82 (ADC search) and q85 (re-rank) ----

  /** How many IVF cells a query probes (multi-probe): the standard
    * recall/cost dial of a production IVF index. nprobe=1 on this
    * corpus (random unit vectors, no planted clusters) caps recall@3
    * around 0.2 because true neighbors of a query land outside its own
    * Voronoi cell ~2/3 of the time; probing the 3 nearest cells lifts
    * measured recall@3 to 0.53-0.63 while still scanning only 3/8 of
    * the corpus per query. */
  private[queries] val NProbe = 3

  /** (q_id, vec_id, adc): every candidate of every query vector scored
    * by asymmetric distance — one pass assigns each vector its IVF cell
    * + PQ codes, each query probes its NProbe nearest cells, the query
    * side precomputes a PqSub x PqK LUT of exact subspace distances,
    * and a candidate's score is the sum of its codes' LUT entries (its
    * raw vector is never read past the assignment pass). A candidate
    * lives in exactly one cell and the probed cells are distinct, so no
    * (q_id, vec_id) pair is scored twice. */
  private[queries] def adcScored(s: SparkSession, dir: String): DataFrame = {
    import PqGeometry._
    val e = vecs(s, dir)
    val cellDists: Seq[Column] = (0 until NumCells).map { k =>
      sqDistFold(col("v"), array(centroid(k).map(lit): _*)).as(s"d$k")
    }
    val codeDists: Seq[Column] = for (m <- 0 until PqSub; k <- 0 until PqK) yield
      sqDistFold(slice(col("v"), m * PqSubDim + 1, PqSubDim),
        array(pqCentroid(m, k).map(lit): _*)).as(s"c${m}_$k")
    val d = e.select(col("vec_id") +: col("v") +: (cellDists ++ codeDists): _*)
    val cell = (0 until NumCells - 1).foldRight(lit(NumCells - 1): Column) {
      (k, rest) =>
        val leLater = (k + 1 until NumCells)
          .map(j => col(s"d$k") <= col(s"d$j")).reduce(_ && _)
        when(leLater, lit(k)).otherwise(rest)
    }
    def code(m: Int): Column =
      (0 until PqK - 1).foldRight(lit(PqK - 1): Column) { (k, rest) =>
        val leLater = (k + 1 until PqK)
          .map(j => col(s"c${m}_$k") <= col(s"c${m}_$j")).reduce(_ && _)
        when(leLater, lit(k)).otherwise(rest)
      }
    val assigned = d.select(
      col("vec_id") +: col("v") +: cell.as("cell") +:
        (0 until PqSub).map(m => code(m).as(s"code$m")): _*)
    // query-side LUT: exact subspace distance to every codebook entry
    val lutCols: Seq[Column] = for (m <- 0 until PqSub; k <- 0 until PqK) yield
      sqDistFold(slice(col("qv"), m * PqSubDim + 1, PqSubDim),
        array(pqCentroid(m, k).map(lit): _*)).as(s"lut${m}_$k")
    // multi-probe: explode each query's 8 cell distances, keep the
    // NProbe nearest cells ((pdist, pcell) rank — deterministic), then
    // compute the LUT once per probed cell (queries x NProbe rows, tiny)
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("pdist"), col("pcell"))
    val q = d.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        posexplode(array((0 until NumCells).map(k => col(s"d$k")): _*))
          .as(Seq("pcell", "pdist")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= NProbe)
      .select(col("q_id") +: col("pcell").as("qcell") +: lutCols: _*)
    def lutVal(m: Int): Column =
      (0 until PqK - 1).foldRight(col(s"lut${m}_${PqK - 1}")) { (k, rest) =>
        when(col(s"code$m") === k, col(s"lut${m}_$k")).otherwise(rest)
      }
    val adc = (1 until PqSub).foldLeft(lutVal(0))((acc, m) => acc + lutVal(m))
    assigned.drop("v")
      .join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adc.as("adc"))
  }

  /** Oracle CTE list producing `scored(q_id, vec_id, adc)` — the SQL
    * twin of [[adcScored]], shared by q82 and q85. */
  private[queries] lazy val sqlAdcCtes: String = {
    import PqGeometry._
    val cellDists = (0 until NumCells).map { k =>
      val arr = centroid(k).mkString(", ")
      s"${sqlSqDistFold("v", s"[$arr]::DOUBLE[]")} AS d$k"
    }.mkString(",\n    ")
    val codeDists = (for (m <- 0 until PqSub; k <- 0 until PqK) yield {
      val arr = pqCentroid(m, k).mkString(", ")
      val slice = s"v[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}]"
      s"${sqlSqDistFold(slice, s"[$arr]::DOUBLE[]")} AS c${m}_$k"
    }).mkString(",\n    ")
    val cellArgmin = (0 until NumCells - 1).map { k =>
      val leLater = (k + 1 until NumCells).map(j => s"d$k <= d$j").mkString(" AND ")
      s"WHEN $leLater THEN $k"
    }.mkString(" ")
    def codeArgmin(m: Int): String = {
      val cases = (0 until PqK - 1).map { k =>
        val leLater = (k + 1 until PqK).map(j => s"c${m}_$k <= c${m}_$j").mkString(" AND ")
        s"WHEN $leLater THEN $k"
      }.mkString(" ")
      s"CASE $cases ELSE ${PqK - 1} END"
    }
    val lutCols = (for (m <- 0 until PqSub; k <- 0 until PqK) yield {
      val arr = pqCentroid(m, k).mkString(", ")
      val slice = s"qv[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}]"
      s"${sqlSqDistFold(slice, s"[$arr]::DOUBLE[]")} AS lut${m}_$k"
    }).mkString(",\n    ")
    val adcSum = (0 until PqSub).map { m =>
      val cases = (0 until PqK).map(k => s"WHEN $k THEN lut${m}_$k").mkString(" ")
      s"(CASE a.code$m $cases END)"
    }.mkString(" + ")
    val pdistCase = (0 until NumCells).map(k => s"WHEN $k THEN d$k").mkString(" ")
    val probeValues = (0 until NumCells).map(k => s"($k)").mkString(",")
    s"""e AS ($sqlVecs),
       |d AS (SELECT vec_id, v,
       |    $cellDists,
       |    $codeDists
       |  FROM e),
       |assigned AS (SELECT vec_id, v,
       |    CASE $cellArgmin ELSE ${NumCells - 1} END AS cell,
       |    ${(0 until PqSub).map(m => s"${codeArgmin(m)} AS code$m").mkString(",\n    ")}
       |  FROM d),
       |qp AS (SELECT vec_id AS q_id, v AS qv, pc.c AS pcell,
       |    CASE pc.c $pdistCase END AS pdist
       |  FROM d CROSS JOIN (VALUES $probeValues) pc(c)
       |  WHERE vec_id < $NumQueries),
       |probe AS (SELECT q_id, qv, pcell FROM (
       |    SELECT q_id, qv, pcell, row_number() OVER (
       |      PARTITION BY q_id ORDER BY pdist, pcell) AS prk
       |    FROM qp) WHERE prk <= $NProbe),
       |lut AS (SELECT q_id, pcell AS qcell,
       |    $lutCols
       |  FROM probe),
       |scored AS (SELECT q_id, a.vec_id, $adcSum AS adc
       |  FROM lut JOIN assigned a ON a.cell = lut.qcell AND a.vec_id <> q_id)""".stripMargin
  }
}
