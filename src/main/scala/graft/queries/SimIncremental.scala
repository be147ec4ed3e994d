package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Incremental semantic dedup (q110/q111) and the shared Lloyd-trained oracle CTE prefixes the semantic family states in DuckDB.
  *
  * Pure round-17 refactor: split out of the 1,699-line
  * SimilarityQueries.scala verbatim, per the DedupQueries precedent
  * (self-typed to the object so cross-family references keep
  * resolving; `private` widened to `private[queries]` where a member
  * crosses a trait boundary — traits cannot share plain-private
  * members). */
trait SimIncremental { self: SimilarityQueries.type =>

  /** The q109/q114 shared oracle CTE prefix: the full Lloyd-trained
    * block assignment (train on ALL vectors, seeds vec_id 0..7)
    * restated in DuckDB through `cells(vec_id, v, cell, sub)` —
    * centroid arithmetic CTE-for-CTE with the Spark plan. */
  private[graft] lazy val semAllBlocksOracleCtes: String = {
    val k = NumCells
    val svCols = (0 until k)
      .map(c => s"(SELECT q FROM vq WHERE vec_id = $c) AS sv$c")
      .mkString(",\n    ")
    val argmin = (0 until k - 1).map { c =>
      val leLater = (c + 1 until k).map(j => s"d$c <= d$j").mkString(" AND ")
      s"WHEN $leLater THEN $c"
    }.mkString("\n    ")
    val d1 = (0 until k)
      .map(c => s"${sqlSqDistFold("q", s"sv$c")} AS d$c").mkString(",\n      ")
    val sums = (0 until Dim).map(i => s"sum(q[${i + 1}]) AS s$i").mkString(", ")
    val means = (0 until Dim).map(i => s"s$i / c").mkString(", ")
    val mCols = (0 until k)
      .map(c => s"(SELECT m FROM mv WHERE cid = $c) AS m$c")
      .mkString(",\n    ")
    val d2 = (0 until k)
      .map(c => s"${sqlSqDistFold("q", s"m$c")} AS d$c").mkString(",\n      ")
    val mhCols = (0 until SemMaxSub).map { j =>
      val arr = adaptivePlane(2, j).map(d => s"$d").mkString(", ")
      s"${sqlDotFold("m", s"[$arr]::DOUBLE[]")} AS mh$j"
    }.mkString(",\n    ")
    val subSql = (0 until SemMaxSub).map { j =>
      val arr = adaptivePlane(2, j).map(d => s"$d").mkString(", ")
      s"CASE WHEN $j < pc AND ${sqlDotFold("q", s"[$arr]::DOUBLE[]")} * mm > " +
        s"mh$j * ${sqlDotFold("q", "m")} THEN ${1 << j} ELSE 0 END"
    }.mkString(" +\n      ")
    s"""e AS ($sqlVecs),
       |params AS (SELECT $sqlSemSubBits AS pc
       |  FROM (SELECT count(*) AS n_corpus FROM e)),
       |vq AS (SELECT vec_id, v, list_transform(v, x -> floor(x * 1024.0)) AS q FROM e),
       |sb AS (SELECT $svCols),
       |asg1 AS (SELECT vec_id, q, CASE
       |    $argmin
       |    ELSE ${k - 1} END AS cid FROM (
       |  SELECT vec_id, q, $d1 FROM vq CROSS JOIN sb)),
       |cent AS (SELECT cid, count(*) AS c, $sums FROM asg1 GROUP BY cid),
       |mv AS (SELECT cid, [$means]::DOUBLE[] AS m FROM cent),
       |cb AS (SELECT $mCols),
       |asg2 AS (SELECT vec_id, v, q, CASE
       |    $argmin
       |    ELSE ${k - 1} END AS cell FROM (
       |  SELECT vec_id, v, q, $d2 FROM vq CROSS JOIN cb)),
       |geo AS (SELECT cid, m, ${sqlDotFold("m", "m")} AS mm, $mhCols FROM mv),
       |cells AS (SELECT vec_id, v, cell,
       |    $subSql AS sub
       |  FROM asg2 JOIN geo ON geo.cid = asg2.cell CROSS JOIN params)""".stripMargin
  }

  /** The q110/q111 oracle: the full train-assign-probe pipeline
    * restated in DuckDB, centroid arithmetic CTE-for-CTE. */
  /** Shared CTE prefix of the standing-corpus-trained oracles (q110
    * family and q124/q125): codebook trained on vec_id % 10 != 7,
    * every vector assigned to (cell, sub) — ends at `cells`. */
  private[graft] lazy val semStandingCellsOracleCtes: String = {
    val k = NumCells
    val seedIds = (0L until 16L).filter(_ % 10 != 7).take(k)
    val svCols = (0 until k)
      .map(c => s"(SELECT q FROM corpus WHERE vec_id = ${seedIds(c)}) AS sv$c")
      .mkString(",\n    ")
    val argmin = (0 until k - 1).map { c =>
      val leLater = (c + 1 until k).map(j => s"d$c <= d$j").mkString(" AND ")
      s"WHEN $leLater THEN $c"
    }.mkString("\n    ")
    val d1 = (0 until k)
      .map(c => s"${sqlSqDistFold("q", s"sv$c")} AS d$c").mkString(",\n      ")
    val sums = (0 until Dim).map(i => s"sum(q[${i + 1}]) AS s$i").mkString(", ")
    val means = (0 until Dim).map(i => s"s$i / c").mkString(", ")
    val mCols = (0 until k)
      .map(c => s"(SELECT m FROM mv WHERE cid = $c) AS m$c")
      .mkString(",\n    ")
    val d2 = (0 until k)
      .map(c => s"${sqlSqDistFold("q", s"m$c")} AS d$c").mkString(",\n      ")
    val mhCols = (0 until SemMaxSub).map { j =>
      val arr = adaptivePlane(2, j).map(d => s"$d").mkString(", ")
      s"${sqlDotFold("m", s"[$arr]::DOUBLE[]")} AS mh$j"
    }.mkString(",\n    ")
    val subSql = (0 until SemMaxSub).map { j =>
      val arr = adaptivePlane(2, j).map(d => s"$d").mkString(", ")
      s"CASE WHEN $j < pc AND ${sqlDotFold("q", s"[$arr]::DOUBLE[]")} * mm > " +
        s"mh$j * ${sqlDotFold("q", "m")} THEN ${1 << j} ELSE 0 END"
    }.mkString(" +\n      ")
    s"""WITH e AS ($sqlVecs),
       |vq AS (SELECT vec_id, v, list_transform(v, x -> floor(x * 1024.0)) AS q FROM e),
       |corpus AS (SELECT * FROM vq WHERE vec_id % 10 != 7),
       |params AS (SELECT $sqlSemSubBits AS pc
       |  FROM (SELECT count(*) AS n_corpus FROM corpus)),
       |sb AS (SELECT $svCols),
       |asg1 AS (SELECT vec_id, q, CASE
       |    $argmin
       |    ELSE ${k - 1} END AS cid FROM (
       |  SELECT vec_id, q, $d1 FROM corpus CROSS JOIN sb)),
       |cent AS (SELECT cid, count(*) AS c, $sums FROM asg1 GROUP BY cid),
       |mv AS (SELECT cid, [$means]::DOUBLE[] AS m FROM cent),
       |cb AS (SELECT $mCols),
       |asg2 AS (SELECT vec_id, v, q, CASE
       |    $argmin
       |    ELSE ${k - 1} END AS cell FROM (
       |  SELECT vec_id, v, q, $d2 FROM vq CROSS JOIN cb)),
       |geo AS (SELECT cid, m, ${sqlDotFold("m", "m")} AS mm, $mhCols FROM mv),
       |cells AS (SELECT vec_id, v, cell,
       |    $subSql AS sub
       |  FROM asg2 JOIN geo ON geo.cid = asg2.cell CROSS JOIN params)""".stripMargin
  }

  private[graft] lazy val semanticIncrementalOracle: String =
    s"""$semStandingCellsOracleCtes,
       |hits AS (SELECT d.vec_id AS d_id, c.vec_id AS c_id,
       |    ${sqlCosine("d.v", "c.v")} AS cosine
       |  FROM cells d JOIN cells c
       |    ON d.cell = c.cell AND d.sub = c.sub
       |   AND d.vec_id % 10 = 7 AND c.vec_id % 10 != 7
       |  WHERE ${sqlCosine("d.v", "c.v")} >= $NearDupThreshold),
       |keep AS (SELECT d_id, min(c_id) AS keeper_id
       |  FROM hits GROUP BY d_id)
       |SELECT h.d_id AS vec_id, k.keeper_id, h.cosine
       |FROM hits h JOIN keep k
       |  ON h.d_id = k.d_id AND h.c_id = k.keeper_id""".stripMargin

  /** The q110/q111 shared pipeline: train on the standing corpus,
    * assign everything through the broadcast codebook, probe delta
    * blocks against corpus blocks.
    *
    * SIZE-GATED like [[graft.queries.DedupQueries]]'s
    * `matchesAgainstIndex` (the round-9 verdict's q93 lesson, applied
    * at birth): while the delta is genuinely delta-sized (<
    * [[SemDeltaBroadcastMaxVecs]] vectors — the gate count is one
    * column-pruned scan of the delta ids), its blocks broadcast and
    * the corpus side streams through with zero shuffle. A LARGE delta
    * instead drops the hint and equi-joins on (cell, sub) — both
    * sides pay one shuffle into the block key, the standard route
    * when a day's crawl outgrows broadcast range. `forceLarge` pins
    * the path for q111 and the plan audit. */
  private[graft] def semanticIncrementalMatches(s: SparkSession, dir: String,
      forceLarge: Option[Boolean]): DataFrame = {
    val deltaPred = col("vec_id") % 10 === 7
    val seedIds = (0L until 16L).filter(_ % 10 != 7).take(NumCells)
    val large = forceLarge.getOrElse(
      vecs(s, dir).filter(deltaPred).count() > SemDeltaBroadcastMaxVecs)
    val blocks = kmeansSemBlocksOf(s, dir, !deltaPred, seedIds)
    val d = blocks.filter(deltaPred)
      .select(col("vec_id").as("d_id"), col("v").as("dv"), col("cell"), col("sub"))
    val c = blocks.filter(!deltaPred)
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("cell").as("ccell"), col("sub").as("csub"))
    val joinCond = col("cell") === col("ccell") && col("sub") === col("csub")
    // merge-hint pins the large path to a sort-merge join (q108's
    // treatment): without it AQE would re-broadcast at test scale and
    // the audited plan would not be the 100-TB plan
    val hits = (if (large) d.hint("merge").join(c, joinCond)
        else broadcast(d).join(c, joinCond))
      .select(col("d_id"), col("c_id"), cosine(col("dv"), col("cv")).as("cosine"))
      .filter(col("cosine") >= NearDupThreshold)
      .localCheckpoint()
    val keep = hits.groupBy("d_id").agg(min(col("c_id")).as("keeper_id"))
    hits.join(keep, Seq("d_id"))
      .filter(col("c_id") === col("keeper_id"))
      .select(col("d_id").as("vec_id"), col("keeper_id"), col("cosine"))
  }
}
