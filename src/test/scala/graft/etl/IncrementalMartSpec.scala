package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalMartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private val orders = Seq(
    // (orderkey, custkey, totalprice, orderdate)
    (1L, 10L, 100.10, ts("2024-01-01")),
    (2L, 11L, 200.20, ts("2024-01-01")),
    (3L, 10L, 50.05, ts("2024-01-01")),
    (4L, 12L, 999.99, ts("2024-01-02")),
    (5L, 12L, 0.01, ts("2024-01-02")),
    (6L, 13L, 123.45, ts("2024-01-03")))
    .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")

  private def finalized(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("day").collect().map(r =>
      (r.getDate(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))

  test("merge of any split, in any association order, equals one pass " +
    "- including the sketch estimate") {
    val onePass = finalized(
      IncrementalMart.finalizeMart(IncrementalMart.dailyPartials(orders)))
    val a = IncrementalMart.dailyPartials(
      orders.where($"o_orderkey" <= 2))
    val b = IncrementalMart.dailyPartials(
      orders.where($"o_orderkey" > 2 && $"o_orderkey" <= 4))
    val c = IncrementalMart.dailyPartials(orders.where($"o_orderkey" > 4))
    val leftFold = finalized(IncrementalMart.finalizeMart(
      IncrementalMart.mergePartials(IncrementalMart.mergePartials(a, b), c)))
    val rightFold = finalized(IncrementalMart.finalizeMart(
      IncrementalMart.mergePartials(a, IncrementalMart.mergePartials(b, c))))
    leftFold shouldBe onePass
    rightFold shouldBe onePass
    // hand-check day 1: 3 orders, cents 10010+20020+5005
    val d1 = onePass.find(_._1 == "2024-01-01").get
    d1._2 shouldBe 3L
    d1._3 shouldBe 350.35
    d1._4 shouldBe 50.05
    d1._5 shouldBe 200.20
    d1._6 shouldBe (35035L * 10000L / 3L).toDouble / 1000000.0
    d1._7 shouldBe 2L // custkeys 10, 11
  }

  test("contract: parity-split merge matches full recompute and the HLL " +
    "estimate stays in band on real orders") {
    val o = graft.core.Tables.table(spark, sf0001, "orders")
    val r = IncrementalMart.incrementalMartContract(
      o, pmod($"o_orderkey", lit(2)) === 0)
    val rows = r.collect()
    rows.length should be > 100
    all(rows.map(_.getBoolean(6))) shouldBe true
    // spot-check totals against a direct aggregate
    val direct = o.agg(
      sum(round($"o_totalprice" * 100.0, 0).cast("long"))).head.getLong(0)
    val martTotal = r.agg(sum(round($"revenue" * 100.0, 0).cast("long")))
      .head.getLong(0)
    martTotal shouldBe direct
  }

  test("applyChangeFeed: retractions + additions equal a full recompute; " +
    "fully-retracted days drop out") {
    import org.apache.spark.sql.functions.lit
    val v0 = orders.where($"o_orderkey" <= 5) // days 1 and 2
    // feed: delete order 1 (day1), update order 2 (+100), delete BOTH
    // day-2 orders (4, 5), insert order 7 on a new day
    val feed = Seq(
      (1L, 10L, 100.10, ts("2024-01-01"), "delete"),
      (2L, 11L, 200.20, ts("2024-01-01"), "update_preimage"),
      (2L, 11L, 300.20, ts("2024-01-01"), "update_postimage"),
      (4L, 12L, 999.99, ts("2024-01-02"), "delete"),
      (5L, 12L, 0.01, ts("2024-01-02"), "delete"),
      (7L, 14L, 50.00, ts("2024-01-04"), "insert"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "change")
    val after = IncrementalMart.finalizeInvertible(
      IncrementalMart.applyChangeFeed(
        IncrementalMart.invertibleDailyPartials(v0), feed))
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // day1: orders 3 (50.05) and updated 2 (300.20)
    after("2024-01-01") shouldBe ((2L, 350.25))
    after.get("2024-01-02") shouldBe None // fully retracted
    after("2024-01-04") shouldBe ((1L, 50.0))
    an[IllegalArgumentException] should be thrownBy
      IncrementalMart.invertibleDailyPartials(orders, 0)
  }

  test("null split predicate rows fall to the fresh side, nothing is lost") {
    val withNull = orders.withColumn("flag",
      when($"o_orderkey" === 1, lit(null).cast("boolean"))
        .otherwise($"o_orderkey" % 2 === 0))
    val r = IncrementalMart.incrementalMartContract(withNull, $"flag")
    r.agg(sum("n_orders")).head.getLong(0) shouldBe 6L
  }
}
