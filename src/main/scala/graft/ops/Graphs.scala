package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-analysis over edge lists — the second graph
  * workload (after [[Clusters]]' connected components) a corpus
  * pipeline needs: PageRank-style authority scores for e.g. citation /
  * hyperlink graphs feeding quality-weighted sampling.
  *
  * Same execution discipline as [[Clusters]]: the driver loops over
  * ROUNDS (fixed, small), never over edges; every round is two hash
  * shuffles on the node id (a join edges⋈ranks and a groupBy-sum —
  * both partition on the same key, so the exchange is reused); each
  * round `localCheckpoint`s to keep the lineage flat. At 100 TB the
  * per-round cost is one hash join + one hash aggregate over the edge
  * list — the canonical Spark iterative-algorithm shape.
  */
object Graphs {

  /** PageRank with uniform teleport over an UNWEIGHTED directed edge
    * list `(src, dst)`. Returns `(id, rank)` for every node appearing
    * as a source or destination; ranks sum to the node count (the
    * standard normalization where a rankless graph starts at 1.0 per
    * node).
    *
    * Dangling nodes (no out-edges) redistribute their mass uniformly
    * each round — without that term the total rank leaks and
    * comparisons across graphs are meaningless. Duplicate edges count
    * once (`distinct`): the common corpus-graph convention; pass a
    * pre-weighted multi-edge variant through `distinct = false` if
    * multiplicity should weight the walk.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      dedupEdges: Boolean = true): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val cols = edges.columns
    val e0 = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val e = (if (dedupEdges) e0.distinct() else e0).localCheckpoint(true)

    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val nNodes = nodes.count()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))

    var ranks = nodes.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
      // mass each node sends per out-edge; dangling nodes send nothing
      // via edges — their total is collected and spread uniformly.
      val contribPerEdge = withDeg.select(col("id"),
        (col("rank") / col("__deg")).as("__share"), col("__deg"))
      val danglingMass = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)
      val inbound = e.join(contribPerEdge, e("src") === contribPerEdge("id"))
        .groupBy(col("dst").as("id")).agg(sum("__share").as("__in"))
      val base = (1.0 - damping) + damping * danglingMass / nNodes
      ranks = nodes.join(inbound, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
