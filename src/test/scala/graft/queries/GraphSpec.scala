package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the connected-components claims the sf-gate graph (tiny 2-3
  * node clusters) cannot exercise: logarithmic convergence on a long
  * chain and correct separation of disjoint components. */
class GraphSpec extends SparkSpec {

  test("connected components: pointer doubling is O(log D) on a 256-node chain") {
    val pairs = spark.range(255)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val (labels, rounds) = DedupQueries.connectedComponents(pairs)
    val rows = labels.collect()
    assert(rows.length == 256)
    assert(rows.forall(_.getLong(1) == 0L), "every label must be the chain min")
    // plain min-label propagation needs ~255 rounds on this graph;
    // pointer doubling needs ~log2(255) + a no-change confirmation round
    assert(rounds <= 12,
      s"expected ~log2(255) rounds with pointer doubling, took $rounds")
  }

  test("connected components: disjoint chains get separate canonical minima") {
    val pairs = spark.range(10)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .where(col("doc_a") =!= 4) // cut 0-1-2-3-4 | 5-6-...-10
    val (labels, _) = DedupQueries.connectedComponents(pairs)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 4L).forall(m(_) == 0L))
    assert((5L to 10L).forall(m(_) == 5L))
  }
}
