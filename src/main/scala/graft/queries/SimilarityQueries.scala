package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Two declared operators:
  *   - brute-force cosine top-k: the correctness baseline — broadcast the
  *     query set, one scan over the corpus, per-query rank;
  *   - random-hyperplane LSH ANN: the scale path — each vector is
  *     bucketed by the sign pattern of 8 fixed hyperplane projections,
  *     candidates come only from the query's own bucket (bucket join,
  *     never the full cross product).
  *
  * All float arrays are widened to double first (exact), and every dot
  * product is a sequential left-fold so Spark and the DuckDB oracle
  * perform bit-identical IEEE arithmetic (see CrossEngine).
  */
object SimilarityQueries {

  private val NumQueries = 10
  private val TopK = 5
  private val NumPlanes = 8
  private val Dim = 64

  /** Deterministic integer-valued hyperplanes: component (j,i) =
    * ((i*31 + j*17) mod 7) - 3. Integer-exact in double on both engines;
    * generated here and embedded as literals in both plans. */
  private def plane(j: Int): Seq[Double] =
    (0 until Dim).map(i => (((i * 31 + j * 17) % 7) - 3).toDouble)

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private val sqlVecs =
    "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q27_ann_bruteforce",
      s"brute-force cosine top-$TopK for $NumQueries query vectors: broadcast queries x corpus scan, deterministic (cosine desc, vec_id) rank",
      s"""WITH e AS ($sqlVecs),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |scored AS (SELECT q_id, vec_id, ${sqlCosine("qv", "v")} AS cosine
         |  FROM q CROSS JOIN e WHERE vec_id <> q_id)
         |SELECT q_id, vec_id, cosine, rk FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
         |  FROM scored) WHERE rk <= $TopK""".stripMargin) { (s, dir) =>
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      // query set is tiny and bounded -> broadcast; the corpus is scanned
      // exactly once regardless of |queries|.
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine(col("qv"), col("v")).as("cosine"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .select("q_id", "vec_id", "cosine", "rk")
    },

    // ------------------------------------------------------------------
    QueryDef(
      "q28_ann_lsh",
      s"random-hyperplane LSH ANN: $NumPlanes-bit sign bucket per vector, candidates only from the query's bucket, cosine top-3 within — the 100-TB path where the bucket join replaces the cross product",
      {
        val planeSql = (0 until NumPlanes).map { j =>
          val arr = plane(j).map(d => s"$d").mkString(", ")
          s"CASE WHEN ${sqlDotFold("v", s"[$arr]::DOUBLE[]")} > 0 THEN ${1 << j} ELSE 0 END"
        }.mkString(" +\n    ")
        s"""WITH e AS ($sqlVecs),
           |b AS (SELECT vec_id, v,
           |    $planeSql AS bucket
           |  FROM e),
           |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < $NumQueries),
           |scored AS (SELECT q_id, b.vec_id, ${sqlCosine("qv", "v")} AS cosine
           |  FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q_id)
           |SELECT q_id, vec_id, cosine, rk FROM (
           |  SELECT *, CAST(row_number() OVER (
           |    PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
           |  FROM scored) WHERE rk <= 3""".stripMargin
      }) { (s, dir) =>
      val e = vecs(s, dir)
      val bucket: Column = (0 until NumPlanes).map { j =>
        val h = array(plane(j).map(lit): _*)
        when(dotFold(col("v"), h) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      val b = e.withColumn("bucket", bucket)
      val q = b.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      b.join(broadcast(q),
          b("bucket") === q("bucket") && b("vec_id") =!= q("q_id"))
        .select(col("q_id"), col("vec_id"),
          cosine(col("qv"), col("v")).as("cosine"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("q_id", "vec_id", "cosine", "rk")
    })
}
