package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.etl.Scd2

/** Pins the 100 TB SCD2 merge shape: a pk-bucketed target feeds the
  * full-outer diff join with NO shuffle on the target side — only the
  * (incremental) source batch exchanges. */
class BucketedTableStoreSpec extends SparkSpec {

  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00")

  test("scd2 diff against a bucketed target shuffles only the source side") {
    val store = new BucketedTableStore(spark, "graft_bucketed_test", 4)
    val customers = Tables.table(spark, sf0001, "customer")
    store.overwrite("silver_customers",
      Scd2.initialLoad(customers, T0), "c_custkey")
    store.exists("silver_customers") shouldBe true

    // incremental batch: a third of the keys with a changed tracked column
    val batch = customers.where(col("c_custkey") % 3 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + lit(BigDecimal(1)))
    val target = store.read("silver_customers").where(col("is_current"))
    val staged = Scd2.stage(batch, target, "c_custkey")
    staged.collect()

    // AQE's toString renders the initial plan after the final one — count
    // exchanges in the FINAL plan section only
    val plan = staged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // exactly ONE exchange: the source batch (whose window-dedup shuffle the
    // join reuses). The bucketed target scans pre-partitioned on the pk.
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    plan should include("Bucketed: true")

    // and the result equals the same diff against a plain (unbucketed) read
    val plainTarget = Scd2.initialLoad(customers, T0).where(col("is_current"))
    val expected = Scd2.stage(batch, plainTarget, "c_custkey")
    staged.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(staged).count() shouldBe 0
  }

  test("bucketed overwrite replaces the previous state atomically via the catalog") {
    val store = new BucketedTableStore(spark, "graft_bucketed_test", 4)
    import spark.implicits._
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("pk", "v"), "pk")
    store.read("t").count() shouldBe 2
    store.overwrite("t", Seq((3L, "c")).toDF("pk", "v"), "pk")
    store.read("t").as[(Long, String)].collect().toSet shouldBe Set((3L, "c"))
  }
}
