package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived edge lists (kNN graphs, duplicate
  * clusters): centrality-based data selection — rank documents by how
  * central they are in the similarity graph (coreset picks, hub/outlier
  * triage), the graph-side counterpart of the quality classifiers.
  */
object GraphOps {

  /** Simplified PageRank: fixed `iterations` power steps of
    * pr' = (1−d)/N + d·Σ_{src→node} pr(src)/outdeg(src), no
    * dangling-mass redistribution (documented variant — deterministic
    * and exactly replayable; dangling nodes keep contributing nothing,
    * their own rank still receives the base term).
    *
    * Determinism: with `orderedFold` (default) each node's in-flow is
    * folded in ascending source-id order via `aggregate(sort_array(...))`
    * — float addition in a FIXED order, so ranks are bit-identical to
    * the DuckDB oracle's `list_reduce(list(... ORDER BY src))` replay.
    * At production scale pass `orderedFold = false`: plain `sum` enables
    * partial (map-side) aggregation and never gathers a hub node's
    * in-edges into one list; results differ only in float summation
    * order.
    *
    * Scale shape: edges and the rank vector are compact (id, double)
    * tables; each iteration is one join-aggregate shuffled on the
    * destination key. Lineage is truncated per iteration (the iterate-
    * and-checkpoint pattern the CC operator uses).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85,
               orderedFold: Boolean = true): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val base = (1.0 - damping) / n
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    val fold =
      if (orderedFold)
        expr("aggregate(transform(sort_array(collect_list(sc)), x -> x.c)," +
          " 0.0D, (a, x) -> a + x)")
      else expr("sum(sc.c)")
    (1 to iterations).foreach { _ =>
      val inflow = e.join(pr, col("src") === col("node"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          struct(col("src"), (col("pr") / col("odeg")).as("c")).as("sc"))
        .groupBy("dst").agg(fold.as("inflow"))
      pr = nodes.join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Synchronous label propagation (Raghavan et al. 2007 — public
    * knowledge): communities over an undirected edge list. Every node
    * starts labeled with its own id; each round it adopts the PLURALITY
    * label among its neighbors' labels PLUS its own (the self-vote damps
    * the two-node oscillation synchronous LPA is known for; ties →
    * smallest label). A fixed round count with deterministic tie-breaks
    * makes the result a pure function of the edges — no RNG, no
    * update-order dependence — so the DuckDB oracle replays it round
    * for round.
    *
    * Complements [[Dedup.duplicateClusters]]' connected components:
    * CC merges everything reachable (one bridge edge glues two
    * communities); LPA keeps densely-linked neighborhoods separate —
    * the right grain for topic-ish corpus sharding over a kNN graph.
    *
    * Scale shape: edges are symmetrized once and checkpointed; each
    * round is one join + one groupBy over compact (node, label, count)
    * rows — the plurality pick is `min(struct(-count, label))`, a
    * partial-aggregable min, and lineage truncates per round exactly
    * like [[pageRank]]. Rounds are O(diameter-ish) small constants.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"rounds must be in [1, 20], got $rounds")
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    val nodes = sym.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    // the self-vote edge set: every node also "hears" its own label
    val voteEdges = sym.union(
      nodes.select(col("node").as("src"), col("node").as("dst")))
      .localCheckpoint(true)
    var lab = nodes.withColumn("label", col("node"))
    (1 to rounds).foreach { _ =>
      val votes = voteEdges.join(lab, col("src") === col("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        // plurality with smallest-label ties: lexicographic struct min
        // over (−count, label) — partial-aggregable, no row_number window
        .groupBy("dst")
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("w"))
        .select(col("dst"), col("w.label").as("wlabel"))
      lab = lab.join(votes, col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("wlabel"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    lab
  }

  /** Exact triangle counting with local clustering coefficients over an
    * undirected view of the edge list — the density diagnostic that
    * separates "near-duplicate clique" neighborhoods (coefficient → 1)
    * from "hub stitched to strangers" ones (→ 0) on a kNN graph, the
    * triangle-grain complement of [[labelPropagation]]'s communities.
    *
    * Algorithm: degree-ordered compact-forward (Latapy 2008, public
    * knowledge). Every canonical edge is ORIENTED from its
    * (degree, id)-smaller endpoint to the larger, wedges are generated
    * only at a triangle's smallest corner with the two out-neighbors in
    * (degree, id) order, and the closing edge is looked up in the same
    * oriented table — each triangle found exactly once, no dedup pass.
    *
    * Scale shape: the wedge self-join is the ONLY quadratic-risk op and
    * the orientation is precisely what bounds it — an oriented
    * out-degree never exceeds O(√m), so wedge volume is O(m^{3/2})
    * regardless of hubs, where a naive neighbor join explodes on the
    * hottest node. Three hash joins + one aggregation, all on compact
    * id/degree longs; nothing collects.
    *
    * Output per node: `degree`, `n_triangles`, and
    * `clustering_pctx100 = 2·T·10⁴ // (d·(d−1))` (0 for degree < 2) —
    * all-integer, replayable by any engine.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient a→b (a < b) from the (deg, id)-smaller endpoint; the id
    // tie-break is already the canonical order, so only a strictly
    // smaller b-degree flips the edge. Explicit boolean conditions, not
    // struct comparison — the oracle replays the identical CASE.
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("db") < col("da"), col("b")).otherwise(col("a")).as("src"),
        when(col("db") < col("da"), col("a")).otherwise(col("b")).as("dst"),
        when(col("db") < col("da"), col("da")).otherwise(col("db")).as("dd"))
    val e1 = o.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val e2 = o.select(col("src"), col("dst").as("wn"), col("dd").as("dw"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("wn")))
    val closing = o.select(col("src").as("v"), col("dst").as("wn"))
    val tri = wedges.join(closing, Seq("v", "wn"))
      .select(col("src").as("u"), col("v"), col("wn"))
    val tcnt = tri
      .select(explode(array(col("u"), col("v"), col("wn"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("t"))
    deg.join(tcnt, Seq("node"), "left")
      .select(col("node"),
        col("deg").cast("long").as("degree"),
        coalesce(col("t"), lit(0L)).cast("long").as("n_triangles"),
        expr("CAST(CASE WHEN deg >= 2 THEN" +
          " 2 * coalesce(t, 0) * 10000 DIV (deg * (deg - 1))" +
          " ELSE 0 END AS BIGINT)").as("clustering_pctx100"))
  }
}
