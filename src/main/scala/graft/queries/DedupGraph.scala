package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Connected components: star-hooking + pointer-doubling min-label fixpoint with the size-gated driver union-find, and the CC / incremental-dedup oracles (q54/q131/q134).
  *
  * Pure round-16 refactor: split out of the 3,300-line DedupQueries.scala
  * verbatim (self-typed to the object so cross-family references keep
  * resolving; `private` widened to `private[queries]` — traits cannot
  * share plain-private members — and derived vals made lazy so trait
  * initialization order can never observe an unset field). */
trait DedupGraph { self: DedupQueries.type =>
  /** The connected-components oracle (q54's), shared verbatim by the
    * incremental q131: the contract is ONE labeling — every document
    * carries its cluster's canonical (min) id and cluster size over the
    * FULL corpus's near-dup graph — however the components are computed
    * (batch fixpoint or star-edge merge against the standing labels). */
  private[queries] def ccOracleSqlFor(docWhere: String): String = {
    val labeledWhere = if (docWhere.isEmpty) "" else s"\n  WHERE d.$docWhere"
    s"""WITH RECURSIVE ${sqlMinhashCtesFor(docWhere)},
       |pairs AS ($sqlMinhashPairSelect),
       |edges AS (SELECT doc_a AS eu, doc_b AS ev FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (SELECT eu AS u, ev AS v FROM edges
       |          UNION
       |          SELECT e.eu, r.v FROM edges e JOIN reach r ON r.u = e.ev),
       |comp AS (SELECT u, least(u, min(v)) AS cid FROM reach GROUP BY u),
       |labeled AS (SELECT d.doc_id, coalesce(c.cid, d.doc_id) AS canonical_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.u$labeledWhere)
       |SELECT doc_id, canonical_id,
       |  count(*) OVER (PARTITION BY canonical_id) AS cluster_size
       |FROM labeled""".stripMargin
  }

  private[queries] lazy val ccOracleSql: String = ccOracleSqlFor("")

  /** The incremental-dedup oracle (q93's), shared verbatim by q93, the
    * streaming q105 and the large-delta q108: the contract is ONE
    * result — delta (doc_id%10==7) vs indexed corpus pairs at the
    * Jaccard threshold — however the probe is executed (broadcast
    * plan, micro-batched stream, or bucket-join plan). */
  private[queries] lazy val sqlIncrementalDedupOracle: String =
    s"""WITH $sqlSigBandsCtes,
       |cand AS (SELECT DISTINCT d.doc_id AS dd, c.doc_id AS cd
       |  FROM bands d JOIN bands c ON d.band_key = c.band_key
       |  WHERE d.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT dd, cd, count(*) AS c
       |  FROM cand JOIN sh x ON x.doc_id = dd
       |            JOIN sh y ON y.doc_id = cd AND y.sg = x.sg
       |  GROUP BY dd, cd)
       |SELECT dd AS delta_id, cd AS corpus_id,
       |  c::DOUBLE / (xa.n + yb.n - c) AS jaccard
       |FROM common JOIN cnt xa ON xa.doc_id = dd
       |            JOIN cnt yb ON yb.doc_id = cd
       |WHERE c::DOUBLE / (xa.n + yb.n - c) >= $JaccardThreshold""".stripMargin

  /** Connected components over an undirected pair list via min-label
    * propagation with STAR HOOKING and pointer doubling: each round
    * takes the min over each vertex's neighbors' labels (one equi-join
    * + groupBy), hooks each label star's best candidate onto ALL its
    * members (a groupBy-label + join back — the Shiloach-Vishkin
    * hooking step, without which a local minimum's fully-formed star
    * traps the fixpoint in O(diameter) crawling when a lower global
    * min arrives over a bridge), then path-halves — label(v) <-
    * label(label(v)) via a self-join — so a chain of diameter D
    * converges in O(log D) rounds, not O(D) (GraphSpec proves the
    * round count on a 256-node chain AND on the star-trap bridge
    * graph). All three steps only ever LOWER labels toward the
    * component minimum (labels and hooked candidates are always ids of
    * reachable vertices), so the fixpoint is the exact component min
    * and the monotone label-sum convergence test applies.
    * The loop runs ONLY over vertices that appear in the pair list —
    * near-dup pairs are a vanishing fraction of a corpus, so each round
    * touches |pairs|-scale rows, never |corpus|-scale (at 100 TB:
    * millions, not billions; label table hash-partitioned on doc_id).
    * Returns ((doc_id, label) for every pair-graph vertex, rounds).
    *
    * SIZE-GATED like every probe in the library: the near-dup pair
    * graph is pairs-scale, not corpus-scale, and when the staged edge
    * set sits under [[CcDriverMaxBytes]] (block-manager metadata,
    * zero extra jobs to decide) the whole labeling is a driver
    * union-find with path compression — one collect + one local
    * relation, replacing O(log D) join rounds that each cost a
    * multi-stage Spark job. Exactness: union always attaches the
    * larger root under the smaller and every vertex starts as its own
    * root, so each final root is the component minimum — the identical
    * labeling contract (GraphSpec proves path-for-path equality). The
    * distributed fixpoint below remains the at-scale path past the
    * gate — a billion-pair graph never touches the driver —
    * and `forceDistributed` pins it for the convergence specs. */
  private[queries] def connectedComponents(pairs: DataFrame,
      forceDistributed: Boolean = false): (DataFrame, Int) = {
    // The staged relation is the UNDOUBLED pair list (round-22, guide
    // §2.3 shuffle/stage fewer bytes): union-find is symmetric and the
    // distributed fixpoint derives the doubled edges from the staged
    // blocks with one lazy union — so the one eager staging job (which
    // also feeds the size gate its block metadata) writes HALF the
    // bytes the doubled staging did, and the driver path collects half
    // the rows for the same graph.
    val staged = pairs.toDF("u", "v").localCheckpoint()
    // gate compare halved so admission semantics are unchanged: the
    // same graphs whose DOUBLED edge list sat under CcDriverMaxBytes
    // take the driver path (and now move half the bytes to do it)
    if (!forceDistributed &&
        stagedBytes(staged).exists(_ <= CcDriverMaxBytes / 2)) {
      val sess = pairs.sparkSession
      import sess.implicits._
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      // both endpoints enumerate the vertex set (union is symmetric,
      // so the undoubled list carries the same information)
      val verts = scala.collection.mutable.LinkedHashSet.empty[Long]
      staged.select(col("u").cast("long"), col("v").cast("long"))
        .collect().foreach { row =>
          val u = row.getLong(0); val v = row.getLong(1)
          verts += u; verts += v
          if (!parent.contains(u)) parent(u) = u
          if (!parent.contains(v)) parent(v) = v
          val ru = find(u); val rv = find(v)
          if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
        }
      val labels = verts.toSeq.map(v => (v, find(v))).toDF("doc_id", "label")
      staged.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false): Unit
        case _ => ()
      }
      return (labels, 0)
    }
    // the fixpoint needs both directions; derived LAZILY over the
    // staged blocks — each per-round consumer re-reads the blocks
    // (cheap local reads), never the upstream candidate pipeline
    val edges = staged.unionByName(
      staged.select(col("v").as("u"), col("u").as("v")))
    var labels = edges.select(col("u").as("doc_id"))
      .distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    // Labels are monotonically non-increasing, so the fixpoint test is
    // sum(label) unchanged — one aggregate per round instead of a
    // self-join + count. Summed as DECIMAL(38,0): a Long sum wraps mod
    // 2^64 silently at billion-vertex scale, and a wrap that lands on
    // the previous sum would end the loop before the fixpoint.
    def labelSum(): java.math.BigDecimal =
      Option(labels.agg(sum(col("label").cast("decimal(38,0)"))).first().get(0))
        .map(_.asInstanceOf[java.math.BigDecimal])
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum()
    var converged = labels.isEmpty
    var rounds = 0
    // Without unpersisting, block-manager storage grows O(rounds x
    // vertices) within a run — bounded by the O(log D) round count but
    // avoidable: once the convergence aggregate has materialized the new
    // round's labels (truncating their lineage), the previous round's
    // checkpointed blocks are dead.
    def unpersistBlocks(df: DataFrame): Unit =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false): Unit
        case _ => ()
      }
    while (!converged) {
      rounds += 1
      val prevLabels = labels
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("v2"), col("label").as("vl")),
          col("v") === col("v2"))
        .groupBy(col("u")).agg(min(col("vl")).as("nl"))
      // per-vertex candidate: the neighbor-min step alone
      val cand = labels
        .join(nbrMin, col("doc_id") === col("u"), "left")
        .select(col("doc_id"), col("label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("cand"))
      // STAR HOOKING (Shiloach-Vishkin style): broadcast each label
      // star's best candidate to ALL its members. Without it the
      // fixpoint has an O(diameter) trap: once a LOCAL minimum's star
      // forms (every member already points at it), pointer doubling is
      // a no-op — label(label(v)) == label(v) — and a lower global min
      // arriving over a bridge crawls through the star one neighbor
      // hop per round (caught by GraphSpec's two-chain bridge graph:
      // the sum decreased by exactly one hop's delta per round). The
      // star min is a component-mate of every member (candidates never
      // leave the component), so hooking stays monotone and exact.
      val rootMin = cand.groupBy(col("label")).agg(min(col("cand")).as("rm"))
      // lazy checkpoint: the self-join below consumes propagated twice;
      // without it the hook join and projection run twice per round
      val propagated = cand
        .join(rootMin.select(col("label").as("rl"), col("rm")),
          col("label") === col("rl"), "left")
        .select(col("doc_id"),
          least(col("cand"), coalesce(col("rm"), col("cand"))).as("label"))
        .localCheckpoint(eager = false)
      // pointer doubling: follow the label one more hop through the
      // label table itself (labels are vertex ids, so the lookup is a
      // self-join); halves the remaining path length every round.
      // lazy checkpoint: materializes during the convergence aggregate
      // (one job per round, not two) while still truncating lineage
      labels = propagated
        .join(propagated.select(col("doc_id").as("jid"), col("label").as("jl")),
          col("label") === col("jid"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("jl"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
      val s2 = labelSum() // materializes labels (and propagated)
      unpersistBlocks(propagated)
      unpersistBlocks(prevLabels)
      converged = s2.compareTo(prevSum) == 0
      prevSum = s2
    }
    unpersistBlocks(staged)
    (labels, rounds)
  }

}
