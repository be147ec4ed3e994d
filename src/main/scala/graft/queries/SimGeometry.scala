package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Vector-similarity geometry: tuning constants, deterministic IVF centroids + hyperplanes, adaptive banded LSH, SemDeDup cell/sub-bucket assignment, the k-means codebook, and the candidate generators (q27/q29/q37/q106/q109).
  *
  * Pure round-17 refactor: split out of the 1,699-line
  * SimilarityQueries.scala verbatim, per the DedupQueries precedent
  * (self-typed to the object so cross-family references keep
  * resolving; `private` widened to `private[queries]` where a member
  * crosses a trait boundary — traits cannot share plain-private
  * members). */
trait SimGeometry { self: SimilarityQueries.type =>


  private[queries] val NumQueries = 10
  private[queries] val TopK = 5
  private[queries] val NumPlanes = 8
  private[queries] val Dim = 64
  private[graft] val NearDupThreshold = "0.38"
  private[queries] val NumCells = 8

  /** q124/q125 top-k per retrieval query. */
  private[graft] val RetrievalK = 3

  /** Deterministic IVF centroids: Hadamard-style sign patterns
    * (-1)^popcount(i & (9k+7)) scaled to +-1/8, so every centroid is a
    * unit vector (norm sqrt(64)/8 = 1) pointing in a distinct direction.
    * Stand-ins for sampled k-means output; +-0.125 is dyadic, so the
    * components are exactly representable doubles on both engines. The
    * round-6 integer-valued stand-ins (components -5..5, norm ~25) sat
    * so far outside the unit-norm data space that ||c||^2 dominated the
    * argmin and 498 of 500 vectors landed in 2 of 8 cells; unit-norm
    * centroids make assignment purely directional and measured-balanced
    * (53-72 per cell at sf0.001). */
  private[queries] def centroid(k: Int): Seq[Double] =
    (0 until Dim).map { i =>
      val sign = if (Integer.bitCount(i & (9 * k + 7)) % 2 == 0) 1.0 else -1.0
      sign / 8.0
    }

  /** Deterministic integer-valued hyperplanes: component (j,i) =
    * ((i*31 + j*17) mod 7) - 3. Integer-exact in double on both engines;
    * generated here and embedded as literals in both plans. */
  private[queries] def plane(j: Int): Seq[Double] =
    (0 until Dim).map(i => (((i * 31 + j * 17) % 7) - 3).toDouble)

  // ---- adaptive banded LSH (q37): planes-per-band from corpus size ----

  /** Target mean bucket occupancy for the near-dup LSH: bucket count per
    * band ~ n / 32, so candidate volume (sum of bucket-size-choose-2)
    * stays LINEAR in the corpus instead of quadratic-at-fixed-buckets. */
  private[graft] val NearDupOccupancy = 32L
  private[graft] val NearDupMinPlanes = 4
  private[graft] val NearDupMaxPlanes = 12

  /** Planes per band for a corpus of n vectors: the smallest p in
    * [Min, Max] with n <= occupancy * 2^p (i.e. ceil(log2(n/32)),
    * clamped). Integer thresholds, so Spark/DuckDB agree exactly.
    * Driver-side mirror of [[nearDupPlanesCol]] / the oracle CASE;
    * TechniqueSpec pins all three to the same escalation points. */
  private[graft] def nearDupPlanes(n: Long): Int = {
    var k = NearDupMinPlanes
    while (k < NearDupMaxPlanes && n > (NearDupOccupancy << k)) k += 1
    k
  }

  private[queries] def nearDupPlanesCol(n: Column): Column =
    (NearDupMinPlanes until NearDupMaxPlanes)
      .foldRight(lit(NearDupMaxPlanes): Column) { (k, rest) =>
        when(n <= lit(NearDupOccupancy << k), lit(k)).otherwise(rest)
      }

  private[queries] def sqlNearDupPlanes: String =
    "CASE " + (NearDupMinPlanes until NearDupMaxPlanes)
      .map(k => s"WHEN n_corpus <= ${NearDupOccupancy << k} THEN $k")
      .mkString(" ") + s" ELSE $NearDupMaxPlanes END"

  /** Hyperplane (band, j) of the adaptive family: component i =
    * ((i*31 + j*57 + band*97 + i*i*11 + i*j*23) mod 13) - 6.
    *
    * Distinct-in-j is NOT enough for the 2^p bucket-count claim — the
    * family must also avoid (a) constant/zero planes (a linear-in-i
    * formula degenerates whenever the i-coefficient hits 0 mod 13, as
    * the first version of this family did at j = 7: its band-2 instance
    * was the literal zero vector) and (b) NEGATED pairs, which produce
    * perfectly anti-correlated bits that halve the effective bucket
    * count (the first version had corr(h0,h1) = -1 in band 2, observed
    * as `sub` taking 2 of 4 values). The i*i quadratic term breaks the
    * linear negation structure; the family is verified numerically:
    * bands 0-2, j < 12 contain no constant plane and worst within-band
    * |corr| = 0.59. */
  private[queries] def adaptivePlane(band: Int, j: Int): Seq[Double] =
    (0 until Dim).map(i =>
      (((i * 31 + j * 57 + band * 97 + i * i * 11 + i * j * 23) % 13) - 6).toDouble)

  /** Distinct near-dup candidate pairs (a_id < b_id) from the adaptive
    * banded LSH — the blocking stage of q37, exposed so TechniqueSpec
    * can measure candidate-volume growth across scale factors. The
    * corpus count rides in via a broadcast one-row aggregate (no driver
    * action), and inactive planes short-circuit in the CASE, so a small
    * corpus pays for p dot products, not MaxPlanes. */
  private[graft] def nearDupCandidates(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val stats = e.agg(count(lit(1)).as("n_corpus"))
    def bucket(band: Int): Column = (0 until NearDupMaxPlanes).map { j =>
      when(lit(j) < col("p") &&
          dotFold(col("v"), array(adaptivePlane(band, j).map(lit): _*)) > 0,
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val bands = e.crossJoin(broadcast(stats))
      .withColumn("p", nearDupPlanesCol(col("n_corpus")))
      .withColumn("b0", bucket(0)).withColumn("b1", bucket(1))
      .select(col("vec_id"),
        posexplode(array(col("b0"), col("b1"))).as(Seq("band_idx", "band_key")))
    val a = bands.as("a"); val y = bands.as("y")
    a.join(y,
        col("a.band_idx") === col("y.band_idx")
          && col("a.band_key") === col("y.band_key")
          && col("a.vec_id") < col("y.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
  }

  // ---- SemDeDup refinement (q106): adaptive sub-bucketing of cells ----

  /** Target mean occupancy of a refined (cell x sub-bucket) block. */
  private[graft] val SemSubOccupancy = 64L
  private[graft] val SemMaxSub = 8

  /** Hyperplane bits subdividing each IVF cell once mean cell occupancy
    * exceeds the target: smallest pc in [0, Max] with n <= NumCells *
    * occupancy * 2^pc. Same adaptive discipline as [[nearDupPlanes]];
    * pc = 0 (pure SemDeDup cells) until the corpus outgrows them. */
  private[graft] def semSubBits(n: Long): Int = {
    var k = 0
    while (k < SemMaxSub && n > ((NumCells * SemSubOccupancy) << k)) k += 1
    k
  }

  private[queries] def semSubBitsCol(n: Column): Column =
    (0 until SemMaxSub).foldRight(lit(SemMaxSub): Column) { (k, rest) =>
      when(n <= lit((NumCells * SemSubOccupancy) << k), lit(k)).otherwise(rest)
    }

  private[queries] def sqlSemSubBits: String =
    "CASE " + (0 until SemMaxSub)
      .map(k => s"WHEN n_corpus <= ${(NumCells * SemSubOccupancy) << k} THEN $k")
      .mkString(" ") + s" ELSE $SemMaxSub END"

  /** Exact dot(c_k, h_j) of sub-plane j with centroid k. Every term is
    * a dyadic (+-0.125) times a small int and every partial sum a
    * multiple of 0.125 with |.| <= 48 — exactly representable at each
    * step, so this Scala fold is EXACT and the same literal lands in
    * both engines' plans.
    *
    * Used to DECORRELATE the sub-planes from the cell direction: a
    * cell's members all point roughly along c_k (that is what a cell
    * IS), so a raw hyperplane leaves most of a cell on one side
    * (measured 8.1x candidate growth at 4x data, vs ~4x for an even
    * split). Projecting the normal orthogonal to the centroid —
    * bit = dot(v, h) - dot(c,h) * dot(v,c) > 0, i.e. dot(v, h - (c.h)c)
    * with unit centroids — tests only the within-cell RESIDUAL, which
    * is near-isotropic, so each plane splits each cone near-evenly
    * (measured: growth back to ~4.4x at 4x data). */
  private[queries] def semPlaneOffset(k: Int, j: Int): Double =
    (0 until Dim).map(i => centroid(k)(i) * adaptivePlane(2, j)(i)).sum

  /** (vec_id, v, cell, sub): every vector's refined semantic block —
    * data-aware IVF cell x adaptive CENTERED-hyperplane sub-bucket
    * (band 2 of the [[adaptivePlane]] family; bands 0/1 belong to q37).
    * Exposed so TechniqueSpec can measure block-candidate growth across
    * SFs. */
  private[graft] def semDedupBlocks(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val stats = e.agg(count(lit(1)).as("n_corpus"))
    val cellDists = (0 until NumCells).map { k =>
      sqDistFold(col("v"), array(centroid(k).map(lit): _*)).as(s"d$k")
    }
    val d = e.crossJoin(broadcast(stats))
      .withColumn("pc", semSubBitsCol(col("n_corpus")))
      .select(col("vec_id") +: col("v") +: col("pc") +: cellDists: _*)
    val cell = (0 until NumCells - 1).foldRight(lit(NumCells - 1): Column) {
      (k, rest) =>
        val leLater = (k + 1 until NumCells)
          .map(j => col(s"d$k") <= col(s"d$j")).reduce(_ && _)
        when(leLater, lit(k)).otherwise(rest)
    }
    val assigned = d.select(col("vec_id"), col("v"), col("pc"), cell.as("cell"))
    // the vector's projection on its own cell's centroid (one fold, the
    // CASE evaluates only the matching branch)
    val dvc = (0 until NumCells).foldLeft(lit(0.0): Column)((acc, k) =>
      when(col("cell") === k,
        dotFold(col("v"), array(centroid(k).map(lit): _*))).otherwise(acc))
    val centered = assigned.withColumn("dvc", dvc)
    def offset(j: Int): Column =
      (0 until NumCells).foldLeft(lit(0.0): Column)((acc, k) =>
        when(col("cell") === k, lit(semPlaneOffset(k, j))).otherwise(acc))
    val sub = (0 until SemMaxSub).map { j =>
      when(lit(j) < col("pc") &&
          dotFold(col("v"), array(adaptivePlane(2, j).map(lit): _*))
            > offset(j) * col("dvc"),
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    centered.select(col("vec_id"), col("v"), col("cell"), sub.as("sub"))
  }

  /** Distinct candidate pairs (a_id < b_id) of the semantic dedup: same
    * refined (cell, sub) block. */
  private[graft] def semDedupCandidates(s: SparkSession, dir: String): DataFrame = {
    val cells = semDedupBlocks(s, dir)
    val a = cells.select(col("vec_id").as("a_id"), col("cell"), col("sub"))
    val y = cells.select(col("vec_id").as("b_id"),
      col("cell").as("ycell"), col("sub").as("ysub"))
    a.join(y, col("cell") === col("ycell") && col("sub") === col("ysub")
        && col("a_id") < col("b_id"))
      .select("a_id", "b_id")
  }

  // ---- data-aware SemDeDup (q109): k-means cells + centered sub-planes ----

  /** (vec_id, v, cell, sub) with DATA-AWARE cells: the coarse quantizer is
    * one distributed Lloyd iteration (q90's training shape — quantized
    * exact distances, per-cluster mean re-estimation), and each k-means
    * cell is subdivided by the same adaptive CENTERED sub-planes as q106.
    * This closes q106's Scaladoc promise that "at 100 TB the cells come
    * from sampled k-means": here the centroids are learned from the
    * corpus itself rather than fixed Hadamard stand-ins.
    *
    * Plan shape (deliberately BETTER than q90's crossJoin+window):
    * the k seed vectors and the k learned centroids are each pivoted into
    * a ONE-ROW broadcast "codebook", so both assignment passes are plain
    * per-row CASE argmins over k distance columns — no corpus×k explode,
    * no window shuffle, no corpus self-join. Total cost: two corpus scans
    * plus two k-row shuffles (the mean re-estimation and the pivot), the
    * I/O-bound floor for Lloyd at 100 TB. Centroid geometry (‖m‖²,
    * dot(m, h_j)) rides in via an 8-row broadcast join on the cell id.
    *
    * Cross-engine exactness: components are quantized floor(x·1024) as in
    * q90 (power-of-two scale, exact product, bit-identical floor), so
    * every seed distance, component sum, and dot(q, ·) fold is INTEGER-
    * valued-double arithmetic — exact in any order; each mean is a single
    * double division and all downstream folds/products are sequential
    * IEEE ops on identical operands. The centered bit generalizes q106's
    * unit-centroid form to arbitrary-norm means without a division:
    * dot(q, h − (m·h/‖m‖²)m) > 0  ⟺  dot(q,h)·‖m‖² > (m·h)·(q·m).
    *
    * Non-empty-cell invariant (argmin CASE is null-hostile): each seed's
    * own vector is at distance 0 to itself and ties break to the lower
    * cid, so every cell keeps ≥1 member and every mean is defined. */
  private[graft] def kmeansSemBlocks(s: SparkSession, dir: String): DataFrame =
    kmeansSemBlocksOf(s, dir, lit(true), (0 until NumCells).map(_.toLong))

  /** [[kmeansSemBlocks]] generalized for the incremental contract
    * (q110): the quantizer is TRAINED only on rows matching `trainPred`
    * (the standing corpus), seeded by the explicit `seedIds`, and pc
    * derives from the TRAIN count — index parameters are fixed at build
    * time, exactly as q93 freezes its band parameterization — while
    * every row (corpus and delta alike) is ASSIGNED through the learned
    * broadcast codebook. */
  private[graft] def kmeansSemBlocksOf(s: SparkSession, dir: String,
      trainPred: Column, seedIds: Seq[Long]): DataFrame =
    assignSemBlocks(quantized(s, dir),
      kmeansCodebook(s, dir, trainPred, seedIds))

  /** (vec_id, v, q): every vector with its floor(x·1024) quantization
    * (power-of-two scale — exact product, bit-identical floor on both
    * engines; every downstream dot/dist fold over q is integer-valued-
    * double arithmetic, exact in any order). */
  private[queries] def quantized(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).select(col("vec_id"), col("v"),
      transform(col("v"), x => floor(x * lit(1024.0)).cast("double")).as("q"))

  /** Exactly one non-null per aggregate, so max() is a deterministic
    * pivot of a ≤k-row frame into ONE broadcastable row. */
  private[queries] def pivotRow(src: DataFrame, key: String, ids: Seq[Long],
      value: String, out: String) =
    src.agg(max(when(col(key) === ids.head, col(value))).as(s"${out}0"),
      (1 until NumCells).map(c =>
        max(when(col(key) === ids(c), col(value))).as(s"$out$c")): _*)

  /** Null-hostile CASE argmin over distance columns d0..d{k-1}; ties
    * break to the lower index, matching the oracle CASE exactly. */
  private[queries] def argminCell: Column =
    (0 until NumCells - 1).foldRight(lit(NumCells - 1): Column) { (c, rest) =>
      val leLater = (c + 1 until NumCells)
        .map(j => col(s"d$c") <= col(s"d$j")).reduce(_ && _)
      when(leLater, lit(c)).otherwise(rest)
    }

  /** (cid, m, n_corpus): the LEARNED codebook — one Lloyd iteration
    * over the rows matching `trainPred`, seeded by `seedIds`, with the
    * train count attached to every row so downstream consumers (and the
    * persisted form, q112) carry the frozen pc parameterization with
    * the centroids. */
  private[graft] def kmeansCodebook(s: SparkSession, dir: String,
      trainPred: Column, seedIds: Seq[Long]): DataFrame = {
    val k = NumCells
    require(seedIds.size == k)
    val train = quantized(s, dir).filter(trainPred)
    val stats = train.agg(count(lit(1)).as("n_corpus"))
    val sb = pivotRow(train.filter(col("vec_id").isin(seedIds: _*)),
      "vec_id", seedIds, "q", "sv")
    val asg1 = train.crossJoin(broadcast(sb))
      .select(col("vec_id") +: col("q") +:
        (0 until k).map(c => sqDistFold(col("q"), col(s"sv$c")).as(s"d$c")): _*)
      .select(col("vec_id"), col("q"), argminCell.as("cid"))
    val sums = (0 until Dim).map(i => sum(element_at(col("q"), i + 1)).as(s"s$i"))
    val cent = asg1.groupBy(col("cid")).agg(count(lit(1)).as("c"), sums: _*)
    cent.select(col("cid"),
        array((0 until Dim).map(i => col(s"s$i") / col("c")): _*).as("m"))
      .crossJoin(broadcast(stats))
  }

  /** Assign every row of `vq` (a [[quantized]] frame) through
    * `codebook` — fresh from [[kmeansCodebook]] or re-read from its
    * persisted parquet form (doubles round-trip bit-exact, so either
    * source yields identical blocks): per-row CASE argmin over the
    * pivoted one-row codebook, then the centered sub-plane bits from
    * the 8-row geometry join. */
  private[graft] def assignSemBlocks(vq: DataFrame, codebook: DataFrame): DataFrame = {
    val k = NumCells
    val stats = codebook.agg(max(col("n_corpus")).as("n_corpus"))
    val cb = pivotRow(codebook, "cid", (0 until k).map(_.toLong), "m", "m")
    val asg2 = vq.crossJoin(broadcast(cb))
      .select(col("vec_id") +: col("v") +: col("q") +:
        (0 until k).map(c => sqDistFold(col("q"), col(s"m$c")).as(s"d$c")): _*)
      .select(col("vec_id"), col("v"), col("q"), argminCell.as("cell"))
    val geo = codebook.select(col("cid") +: col("m") +:
      dotFold(col("m"), col("m")).as("mm") +:
      (0 until SemMaxSub).map(j => dotFold(col("m"),
        array(adaptivePlane(2, j).map(lit): _*)).as(s"mh$j")): _*)
    val sub = (0 until SemMaxSub).map { j =>
      when(lit(j) < col("pc") &&
          dotFold(col("q"), array(adaptivePlane(2, j).map(lit): _*)) * col("mm")
            > col(s"mh$j") * col("qm"),
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    asg2.join(broadcast(geo), col("cell") === col("cid"))
      .crossJoin(broadcast(stats))
      .withColumn("pc", semSubBitsCol(col("n_corpus")))
      .withColumn("qm", dotFold(col("q"), col("m")))
      .select(col("vec_id"), col("v"), col("cell"), sub.as("sub"))
  }

  private[queries] def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private[queries] val sqlVecs =
    "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
}
