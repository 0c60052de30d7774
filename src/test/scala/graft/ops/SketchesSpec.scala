package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{GoldMarts, StarSchema}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("orderRatesApprox tracks the exact mart within HLL++ error") {
    val fact = StarSchema.factOrderDetails(spark, sf0001)
    val exact = GoldMarts.orderRates(fact)
      .select($"SellerID", $"total_orders_placed".as("exact_n"))
    val approx = Sketches.orderRatesApprox(fact)
      .select($"SellerID", $"total_orders_placed".as("approx_n"))
    val err = exact.join(approx, "SellerID")
      .select(max(abs($"approx_n" - $"exact_n") / $"exact_n")).as[Double].head()
    err should be < 0.15 // 3x the 5% rsd
  }

  test("customerAnalyticsApprox preserves the customer_type split closely") {
    val fact = StarSchema.factOrderDetails(spark, sf0001)
    val exact = GoldMarts.customerAnalytics(fact)
      .groupBy("customer_type").count().as[(String, Long)].collect().toMap
    val approx = Sketches.customerAnalyticsApprox(fact)
      .groupBy("customer_type").count().as[(String, Long)].collect().toMap
    exact.keySet shouldBe approx.keySet
    exact.foreach { case (k, v) =>
      math.abs(approx(k) - v).toDouble / v should be < 0.1
    }
  }

  test("percentiles: p50/p90/p99 ordering and bounds") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
      .select(lit("all").as("g"),
        org.apache.spark.sql.functions.length($"text").as("len"))
    val r = Sketches.percentiles(docs, Seq("g"), "len")
      .select($"n", $"p50".cast("double"), $"p90".cast("double"), $"p99".cast("double"))
      .as[(Long, Double, Double, Double)].head()
    r._1 shouldBe 500L
    r._2 should be <= r._3
    r._3 should be <= r._4
  }

  test("approx percentiles track the exact twin within 5%") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
      .select(lit("all").as("g"),
        org.apache.spark.sql.functions.length($"text").as("len"))
    val approx = Sketches.percentiles(docs, Seq("g"), "len")
      .select($"p50".cast("double"), $"p90".cast("double"))
      .as[(Double, Double)].head()
    val exact = Sketches.percentilesExact(docs, Seq("g"), "len")
      .select($"p50", $"p90").as[(Double, Double)].head()
    math.abs(approx._1 - exact._1) / exact._1 should be < 0.05
    math.abs(approx._2 - exact._2) / exact._2 should be < 0.05
  }
}
