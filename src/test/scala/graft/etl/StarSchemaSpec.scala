package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("factOrderDetails: row count equals lineitem (all FKs resolve)") {
    val fact = StarSchema.factOrderDetails(spark, sf0001)
    fact.count() shouldBe Tables.table(spark, sf0001, "lineitem").count()
  }

  test("fact columns carry the reference vocabulary") {
    val cols = StarSchema.factOrderDetails(spark, sf0001).columns.toSeq
    cols shouldBe Seq("OrderID", "OrderItemID", "CustomerID", "CustomerName",
      "ProductID", "ProductName", "CategoryName", "SellerID", "SellerName",
      "NationName", "RegionName", "StatusName", "Quantity", "CurrentPrice",
      "TotalAmount", "OrderDate")
  }

  test("TotalAmount = Quantity * CurrentPrice in exact decimal") {
    val bad = StarSchema.factOrderDetails(spark, sf0001)
      .where($"TotalAmount" =!= $"Quantity" * $"CurrentPrice")
    bad.count() shouldBe 0
  }

  test("small dimensions are broadcast in the physical plan") {
    val plan = StarSchema.factOrderDetails(spark, sf0001)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("events table reads with microsecond timestamps (nanos truncated)") {
    val ev = Tables.table(spark, sf0001, "events")
    ev.schema("ts").dataType.typeName shouldBe "timestamp"
    ev.where($"ts".isNull).count() shouldBe 0
  }
}
