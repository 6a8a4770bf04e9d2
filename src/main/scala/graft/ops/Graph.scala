package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed triangle counting over the part co-occurrence graph —
  * the third graph-analytics tier next to connected components
  * (`Dedup.starContract`) and PageRank (`Affinity.partPagerank`).
  * Triangles (cliques of 3) are the base signal for clustering
  * coefficients and community detection; the operator class matters
  * because the naive 3-way self-join explodes on skewed degree
  * distributions.
  *
  * Scale design — DEGREE-ORDERED EDGE ORIENTATION (the standard
  * distributed formulation): orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one. Every triangle then
  * has exactly ONE wedge vertex with two out-edges, so (a) each
  * triangle is found exactly once, and (b) the wedge fan-out per vertex
  * is bounded by its OUT-degree, which orientation caps at O(√|E|) even
  * for a hub that touches everything — the join that would be
  * |hub-degree|² on the raw graph becomes √-bounded on the oriented
  * one. The closing-edge check is an equi-join on the (v, w) pair, and
  * every count is an exact BIGINT — the whole operator hash-verifies.
  */
object Graph {

  /** Per-node triangle participation counts (node, n_triangles) over
    * the frequent-pair co-occurrence graph; nodes in no triangle are
    * omitted (consistent with the edge table's own survivorship). */
  def partTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Affinity.frequentPairEdges(spark, sfDir) // (u, v) with u < v, unique
    val degs = edges.select(col("u").as("n")).union(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(degs.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(degs.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("u")).otherwise(col("v")).as("s"),
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("v")).otherwise(col("u")).as("t"))
    // wedges from a shared oriented source; a.t < b.t canonicalizes so
    // each unordered out-pair is generated once
    val wedges = oriented.as("a")
      .join(oriented.as("b"), col("a.s") === col("b.s") && col("a.t") < col("b.t"))
      .select(col("a.s").as("u"), col("a.t").as("v"), col("b.t").as("w"))
    // the closing v–w edge may be oriented either way by degree order
    val closing = oriented.select(col("s").as("x"), col("t").as("y"))
      .union(oriented.select(col("t").as("x"), col("s").as("y")))
    val triangles = wedges.join(closing,
      col("v") === col("x") && col("w") === col("y"), "left_semi")
    triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("node"))
  }

  /** Local clustering coefficient per node: 2·tri / (deg·(deg−1)) —
    * how close each node's neighborhood is to a clique, THE standard
    * triangle consumer (community structure, spam/bot detection in
    * co-occurrence graphs). Every node of the graph is emitted
    * (triangle-less nodes join as 0); degree-1 nodes get coefficient
    * 0 by definition. The coefficient is the ONE double division over
    * exact BIGINT counts, so rows hash-verify. */
  def clusteringCoefficients(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Affinity.frequentPairEdges(spark, sfDir)
    val degs = edges.select(col("u").as("n")).union(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val tri = partTriangles(spark, sfDir)
      .select(col("node").as("n"), col("n_triangles"))
    degs.join(tri, Seq("n"), "left")
      .select(col("n").as("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2L, lit(0.0d))
          .otherwise((coalesce(col("n_triangles"), lit(0L)) * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .as("clustering"))
      .orderBy(col("node"))
  }

  /** Single-source BFS hop distances over the co-occurrence graph —
    * the traversal tier next to components/PageRank/triangles: every
    * node reachable from the (deterministic) seed = the graph's minimum
    * node id, with its exact hop count, capped at `maxHops`.
    *
    * Scale design — frontier-expansion BFS, the Pregel formulation:
    * each round joins only the CURRENT FRONTIER (nodes first reached
    * last round) against the edge list and anti-joins the visited set,
    * so a round's shuffle carries |frontier| ids, never the whole
    * graph; rounds are bounded by `maxHops` (diameter-bounded in
    * practice — co-occurrence graphs are small-world). Lineage is cut
    * per round with the same lazy localCheckpoint as
    * [[Affinity.partPagerank]], and the early-exit probe on an empty
    * frontier is a count on a frontier-sized frame, not a corpus scan.
    * Distances are exact BIGINTs; the DuckDB recursive-CTE oracle
    * replays the whole traversal. */
  def graphDistances(spark: SparkSession, sfDir: String, maxHops: Int = 6): DataFrame = {
    import spark.implicits._
    val edges = Affinity.frequentPairEdges(spark, sfDir)
    val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val seedRow = edges.agg(min(col("u"))).head()
    if (seedRow.isNullAt(0)) return Seq.empty[(Long, Long)].toDF("node", "dist")
    val seed = seedRow.getLong(0)
    var visited = Seq((seed, 0L)).toDF("node", "dist")
    var frontier = visited
    var hop = 1L
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(bidir, col("node") === col("u"))
        .select(col("v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("dist"))
        .localCheckpoint(eager = false)
      visited = visited.union(next).localCheckpoint(eager = false)
      frontier = next
      hop += 1L
    }
    visited.orderBy(col("node"))
  }

  /** k-core of the co-purchase graph — the DECOMPOSITION member of the
    * graph suite (pagerank ranks, triangles/clustering measure local
    * density, BFS measures reach; the k-core asks which nodes survive
    * when the periphery is peeled away, the standard robust-subgraph /
    * spam-periphery screen). Iterative peeling: drop every node whose
    * degree WITHIN the surviving set is < k, repeat to fixpoint.
    * Peeling is monotone (survivors only shrink, and a degree within a
    * smaller set cannot grow), so an unchanged survivor COUNT proves an
    * unchanged set — the cheap convergence probe. Rounds are bounded by
    * `maxRounds` and the loop THROWS on non-convergence (the
    * `dup_clusters` contract: a silent partial answer is worse than a
    * loud one); the DuckDB oracle unrolls the same `maxRounds` peels,
    * so both engines compute the identical fixpoint.
    *
    * Scale shape: per round, two hash equi-joins of the edge list
    * against the survivor set plus one map-side-combined degree
    * aggregate — shuffle keys are node ids, lineage cut per round with
    * lazy localCheckpoints exactly like [[graphDistances]]. */
  def kCore(spark: SparkSession, sfDir: String, k: Int = 2, maxRounds: Int = 8): DataFrame = {
    import spark.implicits._
    val edges = Affinity.frequentPairEdges(spark, sfDir)
    val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    var survivors = bidir.select(col("u").as("n"), lit(0L).as("d")).distinct()
      .localCheckpoint(eager = false)
    var prevCount = survivors.count()
    var rounds = 0
    var converged = prevCount == 0L
    while (rounds < maxRounds && !converged) {
      val next = bidir
        .join(survivors.select(col("n").as("u")), Seq("u"))
        .join(survivors.select(col("n").as("v")), Seq("v"))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("n"), col("deg").as("d"))
        .localCheckpoint(eager = false)
      val c = next.count()
      converged = c == prevCount
      prevCount = c
      survivors = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peeling did not converge in $maxRounds rounds")
    survivors.select(col("n").as("node"), col("d").as("core_degree"))
      .orderBy(col("node"))
  }

  /** One un-checkpointed BFS round for the plan gate: frontier ⋈ edges
    * expansion + visited anti-join, the join shapes the production loop
    * hides behind its per-round lineage cuts. */
  private[ops] def bfsIterationPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val edges = Affinity.frequentPairEdges(spark, sfDir)
    val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val frontier = Seq((0L, 0L)).toDF("node", "dist")
    frontier.join(bidir, col("node") === col("u"))
      .select(col("v").as("node")).distinct()
      .join(frontier, Seq("node"), "left_anti")
  }
}
