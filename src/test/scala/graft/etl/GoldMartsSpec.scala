package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GoldMartsSpec extends SparkSpec {
  import spark.implicits._

  /** Micro-fact: 2 sellers, 2 products, 3 orders over 2 months. */
  private def fact: DataFrame = Seq(
    // OrderID, CustomerID, CustomerName, SellerID, SellerName, ProductID, ProductName, CategoryName, StatusName, qty, price, date
    (1, 10, "cA", 100, "sX", 1000, "p1", "catA", "Delivered", 2.0, 5.0, "2024-01-01"),
    (1, 10, "cA", 100, "sX", 1001, "p2", "catA", "Delivered", 1.0, 3.0, "2024-01-01"),
    (2, 11, "cB", 100, "sX", 1000, "p1", "catA", "Returned", 4.0, 5.0, "2024-02-10"),
    (3, 10, "cA", 200, "sY", 1001, "p2", "catA", "Cancelled", 1.0, 7.0, "2024-02-11")
  ).toDF("OrderID", "CustomerID", "CustomerName", "SellerID", "SellerName",
      "ProductID", "ProductName", "CategoryName", "StatusName", "qd", "pd", "ds")
    .withColumn("Quantity", $"qd".cast("decimal(12,2)"))
    .withColumn("CurrentPrice", $"pd".cast("decimal(12,2)"))
    .withColumn("TotalAmount", ($"qd" * $"pd").cast("decimal(12,2)"))
    .withColumn("OrderDate", $"ds".cast("date"))
    .drop("qd", "pd", "ds")

  test("withDateParts derives order_date/year/quarter/month") {
    val r = GoldMarts.withDateParts(fact)
      .select("order_date", "year", "quarter", "month").distinct()
      .as[(Date, Int, Int, Int)].collect().toSet
    r shouldBe Set(
      (Date.valueOf("2024-01-01"), 2024, 1, 1),
      (Date.valueOf("2024-02-10"), 2024, 1, 2),
      (Date.valueOf("2024-02-11"), 2024, 1, 2))
  }

  test("sellerPerformanceDaily aggregates revenue/quantity/distinct orders") {
    val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(fact))
    val r = daily.select($"SellerID", $"ProductID", $"order_date".cast("string"),
        $"total_revenue".cast("double"), $"total_quantity_sold".cast("double"),
        $"distinct_orders")
      .as[(Int, Int, String, Double, Double, Long)].collect().toSet
    r shouldBe Set(
      (100, 1000, "2024-01-01", 10.0, 2.0, 1L),
      (100, 1001, "2024-01-01", 3.0, 1.0, 1L),
      (100, 1000, "2024-02-10", 20.0, 4.0, 1L),
      (200, 1001, "2024-02-11", 7.0, 1.0, 1L))
  }

  test("monthly re-aggregates daily (sum-of-daily-distinct reference semantics)") {
    val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(fact))
    val m = GoldMarts.sellerPerformanceMonthly(daily)
    val r = m.select($"SellerID", $"ProductID", $"month",
        $"total_revenue".cast("double"), $"distinct_orders")
      .as[(Int, Int, Int, Double, Long)].collect().toSet
    r shouldBe Set(
      (100, 1000, 1, 10.0, 1L), (100, 1001, 1, 3.0, 1L),
      (100, 1000, 2, 20.0, 1L), (200, 1001, 2, 7.0, 1L))
  }

  test("calendar rollup serves every grain from one pass, lvl = grouping_id") {
    val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(fact))
    val r = GoldMarts.sellerPerformanceCalendarRollup(daily)
      .select($"year", $"quarter", $"month", $"total_revenue".cast("double"), $"lvl")
      .as[(Option[Int], Option[Int], Option[Int], Double, Int)].collect().toSet
    r shouldBe Set(
      (Some(2024), Some(1), Some(1), 13.0, 0), // finest grain
      (Some(2024), Some(1), Some(2), 27.0, 0),
      (Some(2024), Some(1), None, 40.0, 1), // quarter grain
      (Some(2024), None, None, 40.0, 3), // year grain
      (None, None, None, 40.0, 7)) // grand total
  }

  test("pre-reduced calendar rollup == rollup of the raw daily mart") {
    // the Expand-input reduction must be value-invisible: sum is
    // distributive over the (year, quarter, month) partition
    val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(fact))
    val direct = daily.rollup($"year", $"quarter", $"month")
      .agg(sum("total_revenue").as("total_revenue"),
        sum("total_quantity_sold").as("total_quantity_sold"),
        sum("distinct_orders").as("distinct_orders"),
        grouping_id().cast("int").as("lvl"))
      .select($"year", $"quarter", $"month", $"total_revenue".cast("double"),
        $"total_quantity_sold".cast("double"), $"distinct_orders", $"lvl")
    val reduced = GoldMarts.sellerPerformanceCalendarRollup(daily)
      .select($"year", $"quarter", $"month", $"total_revenue".cast("double"),
        $"total_quantity_sold".cast("double"), $"distinct_orders", $"lvl")
    reduced.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(reduced).count() shouldBe 0L
  }

  test("sellerRevenueTrend: cumulative revenue and guarded MoM growth per seller") {
    val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(fact))
    val r = GoldMarts.sellerRevenueTrend(daily)
      .select($"SellerID", $"month", $"total_revenue", $"cumulative_revenue",
        $"prev_revenue", $"mom_growth")
      .as[(Int, Int, Double, Double, Option[Double], Option[Double])]
      .collect().toSet
    r shouldBe Set(
      (100, 1, 13.0, 13.0, None, None), // first month: no prior, null growth
      (100, 2, 20.0, 33.0, Some(13.0), Some(math.rint((20.0 - 13.0) / 13.0 * 1e6) / 1e6)),
      (200, 2, 7.0, 7.0, None, None))
  }

  test("orderRates: per-status distinct counts and guarded rates") {
    val r = GoldMarts.orderRates(fact)
      .select($"SellerID", $"total_orders_placed", $"delivered_orders",
        $"cancelled_orders", $"returned_orders", $"cancellation_rate", $"return_rate")
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect().toSet
    // seller 100: orders {1 Delivered, 2 Returned}; seller 200: {3 Cancelled}
    // seller 200 has 0 delivered -> return_rate guard divides by 1
    r shouldBe Set(
      (100, 2L, 1L, 0L, 1L, 0.0, 1.0),
      (200, 1L, 0L, 1L, 0L, 1.0, 0.0))
  }

  test("orderRates matches the naive countDistinct(when(...)) formulation") {
    val naive = fact.groupBy("SellerID", "SellerName").agg(
      countDistinct($"OrderID").as("total_orders_placed"),
      countDistinct(when($"StatusName" === "Delivered", $"OrderID")).as("delivered_orders"),
      countDistinct(when($"StatusName" === "Cancelled", $"OrderID")).as("cancelled_orders"),
      countDistinct(when($"StatusName" === "Returned", $"OrderID")).as("returned_orders"))
    val ours = GoldMarts.orderRates(fact)
      .select("SellerID", "SellerName", "total_orders_placed", "delivered_orders",
        "cancelled_orders", "returned_orders")
    ours.exceptAll(naive).count() shouldBe 0
    naive.exceptAll(ours).count() shouldBe 0
  }

  test("sellerSegmentation applies the reference's when-chain") {
    val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(fact))
    val seg = GoldMarts.sellerSegmentation(daily, GoldMarts.orderRates(fact))
    val r = seg.select($"SellerID", $"seller_segment").as[(Int, String)].collect().toMap
    // revenues are tiny -> everything lands in Risk Seller
    r shouldBe Map(100 -> "Risk Seller", 200 -> "Risk Seller")
  }

  test("customerAnalytics: totals, first/last purchase, customer_type") {
    val r = GoldMarts.customerAnalytics(fact)
      .select($"CustomerID", $"total_orders", $"total_spend".cast("double"),
        $"first_purchase_date".cast("string"), $"last_purchase_date".cast("string"),
        $"customer_type")
      .as[(Int, Long, Double, String, String, String)].collect().toSet
    r shouldBe Set(
      (10, 2L, 20.0, "2024-01-01", "2024-02-11", "Returning Customer"),
      (11, 1L, 20.0, "2024-02-10", "2024-02-10", "New Customer"))
  }
}
