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
}
