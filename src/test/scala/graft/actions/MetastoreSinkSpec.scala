package graft.actions

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.etl.SilverScd2
import graft.sources.{TableConfig, TableStore, WatermarkStore}

/** S12/S13: the reference's metastore fan-out feed —
  * `CREATE DATABASE IF NOT EXISTS` + `saveAsTable(overwrite)` of the
  * new-customer records (2_Bronze_to_Silver.py:11,114-116), read back the
  * way the downstream email loop reads it (adf/pipeline.json:396-441). */
class MetastoreSinkSpec extends SparkSpec {
  import spark.implicits._

  test("deliver creates the database, overwrites the table, and reads back") {
    val sink = new MetastoreSink("graft_side", "new_customers_for_emailing")
    try {
      sink.deliver(Seq(("alice", "a@x.com")).toDF("Name", "Email"))
      spark.table("graft_side.new_customers_for_emailing")
        .as[(String, String)].collect().toSeq shouldBe Seq(("alice", "a@x.com"))
      // overwrite semantics: each run replaces the feed, never appends
      sink.deliver(Seq(("bob", "b@x.com"), ("eve", "e@x.com")).toDF("Name", "Email"))
      spark.table("graft_side.new_customers_for_emailing")
        .as[(String, String)].collect().toSet shouldBe
        Set(("bob", "b@x.com"), ("eve", "e@x.com"))
    } finally spark.sql("DROP DATABASE IF EXISTS graft_side CASCADE")
  }

  test("SilverScd2 side channel delivers INSERT records through the metastore") {
    val root = Files.createTempDirectory("graft-ms").toString
    val store = new TableStore(spark)
    val wm = new WatermarkStore(spark, s"$root/state")
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-02-01 00:00:00")
    def bronze(rows: Seq[(Int, String, String)], ts: Timestamp) =
      rows.toDF("CustomerID", "Name", "Email")
        .withColumn("ingestion_timestamp", org.apache.spark.sql.functions.lit(ts))
    val sink = new MetastoreSink("graft_side2", "new_customers_for_emailing")
    try {
      // run 1: initial load (no side channel on first load)
      store.append(s"$root/bronze/Customers",
        bronze(Seq((1, "alice", "a@x.com")), t0))
      SilverScd2.run(store, wm, s"$root/bronze", s"$root/silver",
        TableConfig("Customers", "CustomerID"), t0, sink)
      // run 2: one genuinely new customer -> lands in the metastore feed
      store.append(s"$root/bronze/Customers",
        bronze(Seq((1, "alice", "a@x.com"), (2, "bob", "b@x.com")), t1))
      SilverScd2.run(store, wm, s"$root/bronze", s"$root/silver",
        TableConfig("Customers", "CustomerID"), t1, sink)
      spark.table("graft_side2.new_customers_for_emailing")
        .as[(String, String)].collect().toSeq shouldBe Seq(("bob", "b@x.com"))
    } finally spark.sql("DROP DATABASE IF EXISTS graft_side2 CASCADE")
  }
}
