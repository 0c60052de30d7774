package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's Gold aggregate marts
  * (/root/reference/databricks_notebooks/3_Silver_to_Gold.py:49-133),
  * re-expressed as pure DataFrame → DataFrame operators over a fact with the
  * reference's column vocabulary (see [[StarSchema.factOrderDetails]]).
  *
  * Scale notes:
  *  - every mart is a hash aggregation with map-side partial aggregation;
  *    the only shuffle is on the grouping keys.
  *  - [[orderRates]] avoids the 4-way distinct-aggregate Expand (which
  *    multiplies the shuffled rows ×4 in the naive formulation) by first
  *    reducing to distinct (seller, order, status) triples — after that
  *    reduction each per-status distinct count is a plain filtered count.
  *  - monthly/quarterly marts re-aggregate the *daily result* (not the fact);
  *    this reproduces the reference's sum-of-daily-distinct semantics
  *    (3_Silver_to_Gold.py:64-71) and is also the cheap plan: the daily
  *    output is ~|distinct keys|, far smaller than the fact.
  */
object GoldMarts {

  /** order_date / year / quarter / month calendar keys
    * (3_Silver_to_Gold.py:52-55). */
  def withDateParts(fact: DataFrame): DataFrame =
    fact.withColumn("order_date", to_date(col("OrderDate")))
      .withColumn("year", year(col("order_date")))
      .withColumn("quarter", quarter(col("order_date")))
      .withColumn("month", month(col("order_date")))

  private val sellerProductKeys =
    Seq("SellerID", "SellerName", "ProductID", "ProductName", "CategoryName")

  /** seller_performance_daily (3_Silver_to_Gold.py:58-59). Expects the
    * output of [[withDateParts]]. */
  def sellerPerformanceDaily(factWithDates: DataFrame): DataFrame =
    factWithDates
      .groupBy((sellerProductKeys ++ Seq("year", "quarter", "month", "order_date")).map(col): _*)
      .agg(
        sum("TotalAmount").as("total_revenue"),
        sum("Quantity").as("total_quantity_sold"),
        countDistinct(col("OrderID")).as("distinct_orders"))

  /** seller_performance_monthly — re-aggregates the DAILY mart, including its
    * sum-of-daily-distinct order counts (3_Silver_to_Gold.py:64-65). */
  def sellerPerformanceMonthly(daily: DataFrame): DataFrame =
    daily.groupBy((sellerProductKeys ++ Seq("year", "month")).map(col): _*)
      .agg(
        sum("total_revenue").as("total_revenue"),
        sum("total_quantity_sold").as("total_quantity_sold"),
        sum("distinct_orders").as("distinct_orders"))

  /** seller_performance_quarterly (3_Silver_to_Gold.py:70-71). */
  def sellerPerformanceQuarterly(daily: DataFrame): DataFrame =
    daily.groupBy((sellerProductKeys ++ Seq("year", "quarter")).map(col): _*)
      .agg(
        sum("total_revenue").as("total_revenue"),
        sum("total_quantity_sold").as("total_quantity_sold"),
        sum("distinct_orders").as("distinct_orders"))

  /** order_rates (3_Silver_to_Gold.py:82-90): per-seller order totals,
    * per-status distinct order counts, and derived cancellation/return rates
    * with the reference's divide-by-zero guard.
    *
    * Formulated as reduce-to-distinct-triples first (see class doc) — the
    * result is identical to countDistinct(when(status, OrderID)) because
    * after the distinct() each (order, status) pair occurs exactly once.
    */
  def orderRates(fact: DataFrame): DataFrame = {
    val triples = fact.select("SellerID", "SellerName", "OrderID", "StatusName").distinct()
    triples.groupBy("SellerID", "SellerName")
      .agg(
        countDistinct(col("OrderID")).as("total_orders_placed"),
        count(when(col("StatusName") === "Delivered", lit(1))).as("delivered_orders"),
        count(when(col("StatusName") === "Cancelled", lit(1))).as("cancelled_orders"),
        count(when(col("StatusName") === "Returned", lit(1))).as("returned_orders"))
      .withColumn("cancellation_rate",
        col("cancelled_orders").cast("double") / col("total_orders_placed").cast("double"))
      .withColumn("return_rate",
        col("returned_orders").cast("double") /
          when(col("delivered_orders") > 0, col("delivered_orders")).otherwise(lit(1L)).cast("double"))
  }

  /** Calendar ROLLUP of the daily mart: one pass producing the
    * (year, quarter, month), (year, quarter), (year) and grand-total grains
    * that [[sellerPerformanceMonthly]]/[[sellerPerformanceQuarterly]] emit
    * as separate jobs — grouping-sets are the Spark-native way to serve
    * every drill-down level from ONE aggregation (partial aggregation
    * covers all levels in the same shuffle instead of re-scanning per
    * grain). `lvl` is `grouping_id(year, quarter, month)` — 0 = finest
    * grain, 7 = grand total — so consumers can slice one table by grain.
    * Sum-of-daily-distinct semantics are inherited from the daily input,
    * exactly like the monthly/quarterly marts (3_Silver_to_Gold.py:64-71). */
  def sellerPerformanceCalendarRollup(daily: DataFrame): DataFrame =
    // pre-reduce to plain (year, quarter, month) totals BEFORE the rollup:
    // sum is distributive, so rolling up the ~|months| pre-aggregated rows
    // is value-identical to rolling up the full mart — but the Expand (×4
    // grouping sets) then multiplies a handful of rows instead of every
    // (seller, product, day) row (15 s → ~2 s at sf0.1; at 100 TB the
    // difference between quadrupling the corpus and quadrupling a toy)
    daily.groupBy(col("year"), col("quarter"), col("month"))
      .agg(
        sum("total_revenue").as("__tr"),
        sum("total_quantity_sold").as("__tq"),
        sum("distinct_orders").as("__do"))
      .rollup(col("year"), col("quarter"), col("month"))
      .agg(
        sum("__tr").as("total_revenue"),
        sum("__tq").as("total_quantity_sold"),
        sum("__do").as("distinct_orders"),
        // grouping_id() is only resolvable inside the grouping-sets
        // aggregate itself, not as a post-agg projection
        grouping_id().cast("int").as("lvl"))

  /** seller_segmentation (3_Silver_to_Gold.py:102-110): revenue rollup of the
    * daily mart ⋈ order_rates, segmented by the reference's when-chain. */
  def sellerSegmentation(daily: DataFrame, rates: DataFrame): DataFrame = {
    val revenue = daily.groupBy("SellerID", "SellerName")
      .agg(sum("total_revenue").as("total_revenue"))
    revenue.join(rates.drop("SellerName"), Seq("SellerID"), "inner")
      .withColumn("seller_segment",
        when(col("total_revenue") > 10000 && col("return_rate") < 0.015, "Top Seller")
          .when(col("total_revenue") > 2000 && col("return_rate") < 0.03, "Premium Seller")
          .otherwise("Risk Seller"))
  }

  /** Per-seller revenue trend over the monthly grain: running cumulative
    * revenue and month-over-month growth — the windowed time-series mart
    * (§2.6 territory the reference never enters) a revenue dashboard asks
    * for. One window partition per seller, ordered by (year, month):
    * Spark sorts each partition once and computes the running sum and lag
    * in the same pass — no self-join, no re-shuffle between the two
    * window functions (same partitioning AND ordering ⇒ one Window node).
    * Growth is null for a seller's first month and when the prior month's
    * revenue is zero (guarded division). Revenue stays exact decimal
    * through the running sum; doubles only in the final projection. */
  def sellerRevenueTrend(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = daily.groupBy("SellerID", "SellerName", "year", "month")
      .agg(sum("total_revenue").as("rev"))
    val w = Window.partitionBy("SellerID").orderBy("year", "month")
    val prev = lag(col("rev"), 1).over(w)
    monthly.select(
      col("SellerID"), col("SellerName"), col("year"), col("month"),
      col("rev").cast("double").as("total_revenue"),
      sum(col("rev")).over(w).cast("double").as("cumulative_revenue"),
      prev.cast("double").as("prev_revenue"),
      round(
        when(prev.isNull || prev === 0, lit(null))
          .otherwise((col("rev").cast("double") - prev.cast("double")) / prev.cast("double")),
        6).as("mom_growth"))
  }

  /** customer_analytics (3_Silver_to_Gold.py:121-131). */
  def customerAnalytics(fact: DataFrame): DataFrame =
    fact.groupBy("CustomerID", "CustomerName")
      .agg(
        countDistinct(col("OrderID")).as("total_orders"),
        sum("TotalAmount").as("total_spend"),
        min("OrderDate").as("first_purchase_date"),
        max("OrderDate").as("last_purchase_date"))
      .withColumn("customer_type",
        when(col("total_orders") > 1, "Returning Customer").otherwise("New Customer"))
}
