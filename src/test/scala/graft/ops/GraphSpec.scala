package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the same fixed-iteration recurrence computed
    * driver-side (the asOfJoin naive-oracle pattern). */
  private def refPageRank(edges: Seq[(Long, Long, Double)], d: Double,
                          iters: Int): Map[Long, Double] = {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var ranks = nodes.map(_ -> r6(1.0 / n)).toMap
    (1 to iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => w / outw(u) * ranks(u) }.sum).toMap
      ranks = nodes.map(v =>
        v -> r6((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    ranks
  }

  private val chain = Seq( // a → {b, c}, b → c: c most central
    (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))

  test("pageRank matches an independent driver-side recurrence") {
    val got = Graph.pageRank(chain.toDF("src", "dst", "w"), "src", "dst", "w",
      0.85, 3).as[(Long, Double)].collect().toMap
    got shouldBe refPageRank(chain, 0.85, 3)
    got(3L) should be > got(2L)
    got(2L) should be > got(1L)
    got.values.sum should be <= 1.0 + 1e-9 // dangling mass only leaks
  }

  test("pageRank: a uniform ring is its own fixed point") {
    val ring = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0))
    val got = Graph.pageRank(ring.toDF("src", "dst", "w"), "src", "dst", "w",
      0.85, 4).as[(Long, Double)].collect().toMap
    got.values.toSet shouldBe Set(0.333333)
  }

  test("pageRank: deterministic under partitioning, guards hold") {
    val df = chain.toDF("src", "dst", "w")
    Graph.pageRank(df.repartition(5), "src", "dst", "w", 0.85, 2)
      .as[(Long, Double)].collect().toMap shouldBe
      Graph.pageRank(df, "src", "dst", "w", 0.85, 2)
        .as[(Long, Double)].collect().toMap
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(df, "src", "dst", "w", 1.0, 3)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(df, "src", "dst", "w", 0.85, 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(Seq((1L, 2L, 0.0)).toDF("src", "dst", "w"),
        "src", "dst", "w", 0.85, 1)
  }

  // --- labelSpread -----------------------------------------------------

  private def spread(nodes: Seq[(Long, Option[Int])],
                     edges: Seq[(Long, Long, Double)],
                     iters: Int): Map[Long, (Option[Int], Boolean)] =
    Graph.labelSpread(nodes.toDF("id", "label"), "id", "label",
        edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .as[(Long, Option[Int], Boolean)].collect()
      .map { case (n, l, s) => n -> (l, s) }.toMap

  test("labelSpread: seeds flow hop-by-hop and stay clamped") {
    // 1(seed 10) → 2 → 3; 4(seed 20) → 3 with a heavier edge
    val nodes = Seq((1L, Some(10)), (2L, None), (3L, None), (4L, Some(20)))
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (4L, 3L, 5.0))
    val r1 = spread(nodes, edges, 1)
    r1(2L) shouldBe (Some(10), false)
    r1(3L) shouldBe (Some(20), false) // only 4 is labeled after round 0
    r1(1L) shouldBe (Some(10), true)
    val r2 = spread(nodes, edges, 2)
    // round 2: node 3 hears 10 (w=1) and 20 (w=5) — heavier vote wins
    r2(3L) shouldBe (Some(20), false)
    // a seed keeps its label even when the neighborhood disagrees
    val clamp = spread(Seq((1L, Some(10)), (2L, Some(20))),
      Seq((1L, 2L, 9.0)), 3)
    clamp(2L) shouldBe (Some(20), true)
  }

  test("labelSpread: exact vote ties break to the smallest label") {
    val nodes = Seq((1L, Some(2)), (2L, Some(1)), (3L, None))
    val edges = Seq((1L, 3L, 1.5), (2L, 3L, 1.5))
    spread(nodes, edges, 1)(3L) shouldBe (Some(1), false)
  }

  test("labelSpread: unreachable nodes stay null; non-edge nodes kept") {
    val nodes = Seq((1L, Some(7)), (2L, None), (9L, None))
    val edges = Seq((1L, 2L, 1.0))
    val r = spread(nodes, edges, 2)
    r(2L) shouldBe (Some(7), false)
    r(9L) shouldBe (None, false) // in the node table, not in the graph
    r.size shouldBe 3
  }

  test("triangleStats: hand triangle + pendant; direction/duplicate immune") {
    // triangle 1-2-3 plus pendant 3-4, fed with duplicates and both
    // directions — canonicalization must collapse them
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (3L, 4L), (3L, 3L)).toDF("s", "d")
    val r = Graph.triangleStats(edges, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    r(1L) shouldBe ((2L, 1L, 1.0))
    r(2L) shouldBe ((2L, 1L, 1.0))
    r(3L) shouldBe ((3L, 1L, 0.333333)) // 2·1/(3·2), self-loop dropped
    r(4L) shouldBe ((1L, 0L, 0.0))      // degree-1: coeff 0, not NaN
    graft.core.CacheRegistry.drain()
  }

  test("labelSpread: deterministic under partitioning, guards hold") {
    import org.apache.spark.sql.DataFrame
    val nodes = Seq((1L, Some(1)), (2L, Some(2)), (3L, None), (4L, None))
    val edges = Seq((1L, 3L, 1.0), (2L, 3L, 2.0), (3L, 4L, 1.0))
    def run(n: DataFrame, e: DataFrame) =
      Graph.labelSpread(n, "id", "label", e, "src", "dst", "w", 2)
        .as[(Long, Option[Int], Boolean)].collect().toSet
    run(nodes.toDF("id", "label").repartition(5),
        edges.toDF("src", "dst", "w").repartition(3)) shouldBe
      run(nodes.toDF("id", "label"), edges.toDF("src", "dst", "w"))
    an[IllegalArgumentException] should be thrownBy
      Graph.labelSpread(nodes.toDF("id", "label"), "id", "label",
        Seq((1L, 2L, -1.0)).toDF("src", "dst", "w"), "src", "dst", "w", 1)
    an[IllegalArgumentException] should be thrownBy
      Graph.labelSpread(nodes.toDF("id", "label"), "id", "label",
        edges.toDF("src", "dst", "w"), "src", "dst", "w", 0)
  }

  test("neighborMeanEmbedding: hand means, unresolved neighbors, isolation") {
    val emb = Seq(
      (1L, Some(Seq(1.0f, 0.0f))), (2L, Some(Seq(0.0f, 2.0f))),
      (3L, Some(Seq(4.0f, 4.0f))), (4L, None: Option[Seq[Float]]))
      .toDF("vec_id", "embedding")
    // node 10: neighbors 1, 2 -> mean (0.5, 1.0); node 20: neighbor 3
    // plus a null-vector neighbor (4) and a dangling id (99), both
    // contribute nothing; node 30: only unresolvable neighbors -> absent
    val edges = Seq((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L), (20L, 99L),
      (30L, 99L)).toDF("src", "dst")
    val got = Graph.neighborMeanEmbedding(edges, "src", "dst",
        emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    got((10L, 0)) shouldBe ((2L, 0.5))
    got((10L, 1)) shouldBe ((2L, 1.0))
    got((20L, 0)) shouldBe ((1L, 4.0))
    got((20L, 1)) shouldBe ((1L, 4.0))
    got.keySet.map(_._1) shouldBe Set(10L, 20L)
  }

  test("kCorePeel: triangle survives the 2-core, pendant and chain peel " +
    "away; direction and duplicates don't matter") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 4; separate chain 5-6-7
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L), // duplicate in the other direction - must not double degree
      (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val r = graft.core.CacheRegistry.scoped {
      Graph.kCorePeel(edges, "src", "dst", 2, 2)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    r shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    an[IllegalArgumentException] should be thrownBy
      Graph.kCorePeel(edges, "src", "dst", 0, 2)
    graft.core.CacheRegistry.drain()
  }

  test("modularity: two cliques split by community score high; an " +
    "unmapped node is its own cohort; duplicates and self-loops drop") {
    import spark.implicits._
    // cliques {1,2,3} (X) and {4,5,6} (Y), bridge 3-4, pendant 6-7 with
    // node 7 missing from the mapping; (2,1) duplicates (1,2); (5,5)
    // self-loop must vanish -> m = 8 canonical edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (6L, 7L), (2L, 1L), (5L, 5L)).toDF("src", "dst")
    val comm = Seq((1L, "X"), (2L, "X"), (3L, "X"),
      (4L, "Y"), (5L, "Y"), (6L, "Y")).toDF("node", "comm")
    val r = graft.core.CacheRegistry.scoped {
      Graph.modularity(edges, "src", "dst", comm, "node", "comm")
        .collect().map(x => x.getAs[String]("community") ->
          ((x.getAs[Long]("n_nodes"), x.getAs[Long]("degree_sum"),
            x.getAs[Long]("within_edges"), x.getAs[Double]("q_contrib"),
            x.getAs[Double]("modularity")))).toMap
    }
    graft.core.CacheRegistry.drain()
    // Q_X = 3/8 - (7/16)^2, Q_Y = 3/8 - (8/16)^2, Q_7 = 0 - (1/16)^2
    r("X") shouldBe ((3L, 7L, 3L, 0.183594, 0.304688))
    r("Y") shouldBe ((3L, 8L, 3L, 0.125, 0.304688))
    r("__node:7") shouldBe ((1L, 1L, 0L, -0.003906, 0.304688))
    r.size shouldBe 3
  }
}
