package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge tables the other operators already produce —
  * near-dup pair graphs ([[Dedup]]), k-NN similarity graphs
  * ([[Similarity]]), event-transition graphs ([[EventAnalytics]]). The
  * dedup side of graph processing (connected components) lives in
  * [[Dedup.clusters]]; this module adds rank-style centrality, e.g.
  * PageRank over a k-NN embedding graph as a prototype-selection signal
  * (central vectors summarize their neighborhood; peripheral ones are
  * candidates for hard-example mining).
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count (deterministic by
    * construction — no convergence test, so every engine runs the same
    * arithmetic): `r₀ = 1/N`, then `iters` rounds of
    * `r(v) = (1−d)/N + d·Σ_{(u,v)∈E} w(u,v)/outw(u) · r(u)`, every rank
    * rounded to 6 dp per round (the cross-engine float-sum stability
    * device — partial-sum order differs between engines, rounding
    * absorbs it). Requires strictly positive weights (drop or shift
    * non-positive edges upstream); nodes are the union of both
    * endpoints; a dangling node (no out-edges) keeps receiving rank but
    * contributes none — its mass leaks, the standard simplification, so
    * ranks sum to ≤ 1. Output: (node, rank).
    *
    * Scale shape: per round, ONE shuffle — the contribution hash-agg on
    * the destination key (map-side partials) — plus the broadcast-able
    * node join; edges and out-weights are computed once and cached
    * (every round consumes them). The rank chain is lazy: at high
    * `iters`, checkpoint every ~10 rounds to bound plan depth. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, damping: Double = 0.85,
               iters: Int = 3): DataFrame = {
    require(damping > 0 && damping < 1,
      s"pageRank: need 0 < damping < 1, got $damping")
    require(iters >= 1, s"pageRank: need iters >= 1, got $iters")
    // persisted: every iteration consumes the edge and out-weight tables
    val e = graft.core.CacheRegistry.persist(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(weightCol).cast("double").as("__w")))
    val badW = e.where(col("__w").isNull || col("__w") <= 0.0)
    require(badW.isEmpty,
      "pageRank: edge weights must be strictly positive (clip or drop upstream)")
    val outw = graft.core.CacheRegistry.persist(
      e.groupBy(col("__src")).agg(sum("__w").as("__outw")))
    val nodes = graft.core.CacheRegistry.persist(
      e.select(col("__src").as("node"))
        .union(e.select(col("__dst").as("node"))).distinct())
    // N is a driver scalar (like kmeans' k·d floats): one count action
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    val init = nodes.withColumn("rank", round(lit(1.0 / n), 6))
    (1 to iters).foldLeft(init) { (ranks, _) =>
      val contribs = e
        .join(outw, "__src")
        .join(ranks.select(col("node").as("__src"), col("rank")), "__src")
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__w") / col("__outw") * col("rank")).as("__s"))
      nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) + lit(damping) * coalesce(col("__s"), lit(0.0)), 6)
            .as("rank"))
    }
  }

  /** Semi-supervised label propagation (label spread) with a FIXED
    * iteration count — weak labeling for a partially-labeled corpus: seed
    * labels flow over a weighted similarity graph (e.g. a k-NN embedding
    * graph) to the unlabeled nodes. Synchronous update per round: every
    * node's candidate label is the weighted-majority label among its
    * in-neighbors' CURRENT labels (vote = Σ edge weight per label,
    * rounded to 6 dp — the cross-engine float-sum device; ties break to
    * the SMALLEST label, so the winner is engine-deterministic), seeds
    * stay clamped to their given label, and a node with no labeled
    * in-neighbor keeps its previous assignment (null until first
    * reached). Edges are used as given — pass both directions for an
    * undirected spread; strictly positive weights required (same
    * contract as [[pageRank]]).
    *
    * `nodes` carries one row per node with a NULLABLE integral label
    * column (null = unlabeled). Output: (node, label, is_seed) — label
    * nullable for nodes no seed can reach in `iters` rounds.
    *
    * Scale shape: per round, the vote hash-agg keyed on (dst, label)
    * (map-side partials over the edge stream) then the per-dst argmax
    * agg — ≤ \|labels\| rows per node enter the second exchange, the
    * corpus-sized join is the one edge⋈labels equi-join; edges and the
    * seed table are computed once and cached. Like [[pageRank]], the
    * label chain is lazy — checkpoint every ~10 rounds at high `iters`. */
  def labelSpread(nodes: DataFrame, idCol: String, labelCol: String,
                  edges: DataFrame, srcCol: String, dstCol: String,
                  weightCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"labelSpread: need iters >= 1, got $iters")
    val e = graft.core.CacheRegistry.persist(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(weightCol).cast("double").as("__w")))
    val badW = e.where(col("__w").isNull || col("__w") <= 0.0)
    require(badW.isEmpty,
      "labelSpread: edge weights must be strictly positive (clip or drop upstream)")
    // every round's update joins the seed column back in (clamping), so
    // the node⋈seed base is cached once; nodes absent from the edge set
    // still appear in the output (their label is their seed or null)
    val base = graft.core.CacheRegistry.persist(
      nodes.select(col(idCol).as("node"), col(labelCol).as("__seed")))
    val init = base.select(col("node"), col("__seed"), col("__seed").as("label"))
    val fin = (1 to iters).foldLeft(init) { (cur, _) =>
      val votes = e
        .join(cur.where(col("label").isNotNull)
          .select(col("node").as("__src"), col("label").as("__l")), "__src")
        .groupBy(col("__dst"), col("__l"))
        .agg(round(sum("__w"), 6).as("__vote"))
      // argmax by (vote desc, label asc): max_by over the orderable
      // struct (vote, -label) — smallest label wins exact vote ties
      val winners = votes.groupBy(col("__dst").as("node"))
        .agg(expr("max_by(__l, struct(__vote, -__l))").as("__win"))
      cur.join(winners, Seq("node"), "left")
        .select(col("node"), col("__seed"),
          coalesce(col("__seed"), col("__win"), col("label")).as("label"))
    }
    fin.select(col("node"), col("label"), col("__seed").isNotNull.as("is_seed"))
  }

  /** Per-node triangle count and local clustering coefficient over an
    * UNDIRECTED edge list — the graph-QA signal for similarity/dedup
    * graphs: a near-dup component whose nodes have coefficient ≈ 1 is a
    * genuine clique of copies, while a hub with thousands of neighbors
    * and no closed triangles is a false-positive magnet (a boilerplate
    * shingle, a zero vector) that should be cut before clustering.
    * Edges are canonicalized (a < b, dedup'd, self-loops dropped), so
    * either or both directions may arrive. `coeff = 2·triangles /
    * (degree·(degree−1))`, 6 dp; degree-1 nodes get 0, not NaN.
    * Output: (node, degree, triangles, coeff).
    *
    * Scale shape: the classic ordered two-path + closing-edge join —
    * wedges are generated only at their LOWEST-id apex (each triangle
    * counted once, no ×6 blow-up), both joins are equi-joins on edge
    * endpoints, per-node counts are hash-aggs with map-side partials.
    * Wedge volume is Σ_v deg(v)² — cap hub degrees upstream (the
    * [[graft.ops.Joins.skewProfile]] cut) on power-law graphs. */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = graft.core.CacheRegistry.persist(
      edges.select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .where(col("a") =!= col("b"))
        .distinct())
    // degree over both endpoints of the canonical list
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // wedges apex'd at the smallest node: (a < b1 < b2) needs edges
    // (a,b1), (a,b2); the triangle closes iff (b1,b2) is an edge
    val w1 = canon.select(col("a"), col("b").as("b1"))
    val w2 = canon.select(col("a"), col("b").as("b2"))
    val tris = w1.join(w2, "a").where(col("b1") < col("b2"))
      .join(canon.select(col("a").as("b1"), col("b").as("b2")), Seq("b1", "b2"))
    // each closed triangle (a, b1, b2) increments all three corners
    val perNode = tris.select(col("a").as("node"))
      .union(tris.select(col("b1")))
      .union(tris.select(col("b2")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(round(
            lit(2.0) * coalesce(col("triangles"), lit(0L)) /
              (col("degree") * (col("degree") - 1)), 6)).as("coeff"))
  }

  /** One round of GNN-style message passing WITHOUT a GNN: every node's
    * per-dimension mean of its out-neighbors' embedding vectors — the
    * neighborhood-aggregation feature (GraphSAGE mean aggregator,
    * Hamilton et al. 2017) that turns a k-NN or interaction graph into
    * trainable node features, and the smoothing step of label/feature
    * propagation. Nodes with no resolvable neighbor vector drop out;
    * a neighbor listed without an embedding row contributes nothing
    * (inner join semantics). Output: (node, degree, dim, mean_val 6 dp),
    * dims exploded to scalar rows, `degree` = resolved neighbors.
    *
    * Scale shape: ONE shuffle join keys the edge list against the
    * embedding table on the neighbor id, then ONE hash-agg per node
    * over the native element-wise vector-sum buffer
    * ([[graft.functions.VectorFunctions.vectorSumF]]) — map-side
    * partials, so the exchange carries nodes × d doubles, never the
    * posexplode'd N·d element rows; the per-dim divide + explode happen
    * AFTER the reduction on |nodes| rows. Neighbor sums are ≤ degree
    * float terms accumulated in double, 6 dp-rounded. */
  def neighborMeanEmbedding(edges: DataFrame, srcCol: String, dstCol: String,
                            emb: DataFrame, idCol: String,
                            vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.vectorSumF
    val nb = emb.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__nbid"), col(vecCol).as("__v"))
    edges.select(col(srcCol).as("node"), col(dstCol).as("__nbid"))
      .join(nb, Seq("__nbid"))
      .groupBy("node")
      .agg(count(lit(1)).as("degree"), vectorSumF(col("__v")).as("__sums"))
      .select(col("node"), col("degree"),
        posexplode(transform(col("__sums"), x => x / col("degree")))
          .as(Seq("dim", "mean_val")))
      .withColumn("mean_val", round(col("mean_val"), 6))
  }

  /** Bounded k-core peel over an undirected edge table: `rounds` rounds
    * of "drop every node with degree < k, then re-induce the subgraph" —
    * the density filter that separates DENSE duplication cores (template
    * families, mirror farms: every member near-dups many others) from
    * pendant chains (A≈B≈C with no cross links), which [[Dedup.clusters]]
    * deliberately cannot distinguish (both are one component). A FIXED
    * round count keeps every engine running the same arithmetic (the
    * [[labelSpread]] device — the true k-core is this iterated to a
    * fixpoint; each extra round only peels further, and `rounds` bounds
    * the cost at scale). Output: (node, degree) for nodes still carrying
    * edges after the last peel, with their degree in the surviving
    * subgraph.
    *
    * Scale shape: edges symmetrize + dedup once (persisted); each round
    * is ONE degree hash-agg plus two semi-joins against the (shrinking)
    * keep set — per-round cost is bounded by the current edge count,
    * never the original graph. */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"kCorePeel: need k >= 1, got $k")
    require(rounds >= 1 && rounds <= 20,
      s"kCorePeel: need 1 <= rounds <= 20, got $rounds")
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .where(col("__a") =!= col("__b"))
    var live = graft.core.CacheRegistry.persist(
      e.unionAll(e.select(col("__b").as("__a"), col("__a").as("__b")))
        .distinct())
    for (_ <- 1 to rounds) {
      val keep = live.groupBy("__a").agg(count(lit(1)).as("__deg"))
        .where(col("__deg") >= k)
        .select("__a")
      live = graft.core.CacheRegistry.persist(
        live.join(keep, Seq("__a"), "left_semi")
          .join(keep.select(col("__a").as("__b")), Seq("__b"), "left_semi"))
    }
    live.groupBy(col("__a").as("node"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Newman modularity of a node partition over an undirected edge list —
    * "is duplication (or similarity) WITHIN the partition cells or across
    * them", the one-number verdict on a community assignment
    * ([[Dedup.clusters]] labels, or a metadata cut like `source`).
    * `Q = Σ_c [ e_c/m − (d_c/2m)² ]`: e_c = edges with both endpoints in
    * c, d_c = degree sum of c's nodes, m = total undirected edges. Every
    * count is an exact LONG; each cell's contribution is two divisions of
    * those integers (bit-identical IEEE on any engine), 6 dp-snapped.
    * Edges are canonicalized (self-loops dropped, both orientations
    * collapse to one undirected edge); a node missing from `communities`
    * — and a NULL community — forms its own cohort (the null-safe rule).
    * Output per community: (community, n_nodes, degree_sum, within_edges,
    * q_contrib) + the total `modularity` repeated on every row.
    *
    * Scale shape: one distinct over canonical edges, two node-keyed
    * equi-joins to attach communities (broadcast-able when the mapping is
    * a reduction), two hash-aggs, and a single-row total broadcast back.
    * Never node×node. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 communities: DataFrame, nodeCol: String,
                 commCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .where(col("__a") =!= col("__b"))
      .distinct()
    val cm = communities.select(col(nodeCol).as("__node"),
      col(commCol).as("__comm"))
    val tagged = graft.core.CacheRegistry.persist(canon
      .join(cm.select(col("__node").as("__a"), col("__comm").as("__ca")),
        Seq("__a"), "left")
      .join(cm.select(col("__node").as("__b"), col("__comm").as("__cb")),
        Seq("__b"), "left")
      // an unmapped node is its own singleton cohort, keyed by the node
      .select(col("__a"), col("__b"),
        coalesce(col("__ca"), concat(lit("__node:"), col("__a"))).as("__ca"),
        coalesce(col("__cb"), concat(lit("__node:"), col("__b"))).as("__cb")))
    val m = tagged.agg(count(lit(1)).as("__m"))
    val within = tagged.where(col("__ca") <=> col("__cb"))
      .groupBy(col("__ca").as("__wc"))
      .agg(count(lit(1)).as("within_edges"))
    val degrees = tagged.select(col("__a").as("__node"), col("__ca").as("__c"))
      .unionAll(tagged.select(col("__b").as("__node"), col("__cb").as("__c")))
      .groupBy("__c")
      .agg(count(lit(1)).as("degree_sum"),
        count_distinct(col("__node")).as("n_nodes"))
    val cells = degrees
      .join(within, col("__c") <=> col("__wc"), "left")
      .crossJoin(broadcast(m))
      .select(col("__c").as("community"), col("n_nodes"), col("degree_sum"),
        coalesce(col("within_edges"), lit(0L)).as("within_edges"),
        round(coalesce(col("within_edges"), lit(0L)).cast("double")
            / col("__m").cast("double")
          - (col("degree_sum").cast("double")
              / (lit(2.0) * col("__m").cast("double")))
            * (col("degree_sum").cast("double")
              / (lit(2.0) * col("__m").cast("double"))), 6).as("q_contrib"))
    cells.crossJoin(broadcast(
        cells.agg(round(sum("q_contrib"), 6).as("modularity"))))
  }
}
