package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.actions.CollectingSink
import graft.sources.TableConfig

/** End-to-end golden test (SURVEY.md §5.2): CSV drops driven through
  * Bronze → Silver → Gold across three incremental runs — initial load, an
  * attribute change, then a new+changed mix — asserting Silver version
  * history, the new-customer side channel, and a Gold mart. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2026-02-01 00:00:00")
  private val t3 = Timestamp.valueOf("2026-03-01 00:00:00")

  /** Replaces the table's landing file, like the reference's per-run ADF
    * copy overwriting `<Table>.csv` (adf/pipeline.json:178). */
  private def writeCsv(dir: JPath, table: String, header: String, rows: Seq[String]): Unit = {
    val d = dir.resolve(table)
    Files.createDirectories(d)
    d.toFile.listFiles().foreach(_.delete())
    Files.writeString(d.resolve("part-0.csv"), (header +: rows).mkString("\n"))
  }

  test("three incremental runs: history, side channel, gold marts") {
    val root = Files.createTempDirectory("graft-e2e")
    val landing = root.resolve("landing")
    val sink = new CollectingSink
    val conf = PipelineConfig(
      landingRoot = landing.toString,
      bronzeRoot = root.resolve("bronze").toString,
      silverRoot = root.resolve("silver").toString,
      goldRoot = root.resolve("gold").toString,
      stateRoot = root.resolve("state").toString,
      tables = Seq(TableConfig("Customers", "CustomerID")))
    val pipe = new Pipeline(spark, conf, sink)

    // -- run 1: initial load ------------------------------------------------
    writeCsv(landing, "Customers", "CustomerID,Name,Email,Segment", Seq(
      "1,Alice,alice@x.com,retail",
      "2,Bob,bob@x.com,retail"))
    val r1 = pipe.run(t1)
    r1.bronze.map(_.action) shouldBe Seq("created")
    r1.silver.map(_.action) shouldBe Seq("initial-load")
    val s1 = pipe.silverTable("Customers")
    s1.count() shouldBe 2
    s1.where($"is_current").count() shouldBe 2
    sink.batches shouldBe Nil // initial load is not an incremental INSERT

    // -- run 2: attribute change for Bob -----------------------------------
    writeCsv(landing, "Customers", "CustomerID,Name,Email,Segment", Seq(
      "1,Alice,alice@x.com,retail",      // unchanged -> NO CHANGE
      "2,Bob,bob@x.com,wholesale"))      // changed segment -> UPDATE
    val r2 = pipe.run(t2)
    r2.silver.map(_.action) shouldBe Seq("merged")
    val s2 = pipe.silverTable("Customers").cache()
    s2.count() shouldBe 3 // 2 current + 1 expired Bob
    s2.where($"CustomerID" === 2 && !$"is_current")
      .select("Segment").as[String].collect() shouldBe Array("retail")
    s2.where($"CustomerID" === 2 && $"is_current")
      .select("Segment", "effective_date").as[(String, Timestamp)]
      .collect() shouldBe Array(("wholesale", t2))
    s2.unpersist()
    sink.batches shouldBe Nil // update, not insert

    // -- run 3: new customer + another change ------------------------------
    writeCsv(landing, "Customers", "CustomerID,Name,Email,Segment", Seq(
      "2,Bob,bob2@x.com,wholesale",      // email changed -> UPDATE
      "3,Carol,carol@x.com,retail"))     // new -> INSERT (side channel!)
    val r3 = pipe.run(t3)
    r3.silver.map(_.action) shouldBe Seq("merged")
    val s3 = pipe.silverTable("Customers").cache()
    s3.count() shouldBe 5 // 3 current + 2 expired Bob versions
    s3.where($"is_current").count() shouldBe 3
    // full Bob history, ordered
    val bob = s3.where($"CustomerID" === 2)
      .orderBy("effective_date")
      .select($"Email", $"is_current", $"end_date".isNull)
      .as[(String, Boolean, Boolean)].collect().toSeq
    bob shouldBe Seq(
      ("bob@x.com", false, false),
      ("bob@x.com", false, false),
      ("bob2@x.com", true, true))
    s3.unpersist()
    // side channel delivered exactly Carol
    sink.batches.map(_.map(m => (m("Name"), m("Email")))) shouldBe
      List(Seq(("Carol", "carol@x.com")))

    // -- gold: customer_analytics over a toy fact --------------------------
    val fact = Seq(
      (1, 10, "Alice", 5.0), (2, 10, "Alice", 7.0), (3, 11, "Bob", 3.0)
    ).toDF("OrderID", "CustomerID", "CustomerName", "amt")
      .withColumn("TotalAmount", $"amt".cast("decimal(12,2)"))
      .withColumn("OrderDate", lit("2024-01-01").cast("date"))
      .drop("amt")
    val g = GoldBuild.run(spark, pipe.store, conf.goldRoot,
      fact.select($"OrderID", $"CustomerID", $"CustomerName",
        lit(1).as("SellerID"), lit("s").as("SellerName"),
        lit(1).as("ProductID"), lit("p").as("ProductName"),
        lit("c").as("CategoryName"), lit("Delivered").as("StatusName"),
        lit(java.math.BigDecimal.ONE).cast("decimal(12,2)").as("Quantity"),
        lit(java.math.BigDecimal.ONE).cast("decimal(12,2)").as("CurrentPrice"),
        $"TotalAmount", $"OrderDate"))
    g.marts("customer_analytics") shouldBe 2
    val ca = pipe.goldTable("customer_analytics")
      .select($"CustomerID", $"total_orders", $"customer_type")
      .as[(Int, Long, String)].collect().toSet
    ca shouldBe Set((10, 2L, "Returning Customer"), (11, 1L, "New Customer"))
  }

  test("bucketed silver target: same SCD2 history, diff plans a single exchange") {
    val root = Files.createTempDirectory("graft-e2e-bucketed")
    val landing = root.resolve("landing")
    val sink = new CollectingSink
    val conf = PipelineConfig(
      landingRoot = landing.toString,
      bronzeRoot = root.resolve("bronze").toString,
      silverRoot = root.resolve("silver").toString,
      goldRoot = root.resolve("gold").toString,
      stateRoot = root.resolve("state").toString,
      tables = Seq(TableConfig("Customers", "CustomerID")),
      silverBuckets = Some(4),
      silverDatabase = "graft_e2e_bucketed")
    val pipe = new Pipeline(spark, conf, sink)

    writeCsv(landing, "Customers", "CustomerID,Name,Email,Segment", Seq(
      "1,Alice,alice@x.com,retail",
      "2,Bob,bob@x.com,retail"))
    pipe.run(t1).silver.map(_.action) shouldBe Seq("initial-load")

    writeCsv(landing, "Customers", "CustomerID,Name,Email,Segment", Seq(
      "1,Alice,alice@x.com,retail",
      "2,Bob,bob@x.com,wholesale"))
    pipe.run(t2).silver.map(_.action) shouldBe Seq("merged")

    writeCsv(landing, "Customers", "CustomerID,Name,Email,Segment", Seq(
      "2,Bob,bob2@x.com,wholesale",
      "3,Carol,carol@x.com,retail"))
    pipe.run(t3).silver.map(_.action) shouldBe Seq("merged")

    // identical history to the path-store run: 3 current + 2 expired Bobs
    val s3 = pipe.silverTable("Customers").cache()
    s3.count() shouldBe 5
    s3.where($"is_current").count() shouldBe 3
    s3.where($"CustomerID" === 2).orderBy("effective_date")
      .select($"Email", $"is_current")
      .as[(String, Boolean)].collect().toSeq shouldBe Seq(
        ("bob@x.com", false), ("bob@x.com", false), ("bob2@x.com", true))
    s3.unpersist()
    sink.batches.map(_.map(m => m("Name"))) shouldBe List(Seq("Carol"))

    // the merge-diff plan against the pipeline's OWN silver target (read
    // through the version-pointer view): one exchange — the batch side —
    // and a bucketed target scan
    val batch = Seq((2, "Bob", "bob3@x.com", "wholesale"))
      .toDF("CustomerID", "Name", "Email", "Segment")
    val staged = Scd2.stage(batch,
      pipe.silverTable("Customers").where($"is_current"), "CustomerID")
    staged.collect()
    val plan = staged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    plan should include("Bucketed: true")

    // retention: vacuum drops superseded versions, the pointer view survives
    val store = new graft.sources.BucketedTableStore(spark, "graft_e2e_bucketed", 4)
    store.vacuum("Customers")
    spark.sql("SHOW TABLES IN graft_e2e_bucketed")
      .select("tableName").as[String].collect()
      .count(_.startsWith("customers__v")) shouldBe 1
    pipe.silverTable("Customers").count() shouldBe 5
  }

  test("streaming bronze ingest: exactly-once file feed through SCD2 to gold " +
    "(Trigger.AvailableNow)") {
    val root = Files.createTempDirectory("graft-e2e-stream")
    val landing = root.resolve("landing")
    val sink = new CollectingSink
    val conf = PipelineConfig(
      landingRoot = landing.toString,
      bronzeRoot = root.resolve("bronze").toString,
      silverRoot = root.resolve("silver").toString,
      goldRoot = root.resolve("gold").toString,
      stateRoot = root.resolve("state").toString,
      tables = Seq(TableConfig("Customers", "CustomerID")),
      streamingBronze = true)
    val pipe = new Pipeline(spark, conf, sink)

    // append-only landing: each run DROPS A NEW FILE (the streaming
    // contract) instead of replacing the old one
    def dropCsv(name: String, rows: Seq[String]): Unit = {
      val d = landing.resolve("Customers")
      Files.createDirectories(d)
      Files.writeString(d.resolve(name),
        ("CustomerID,Name,Email,Segment" +: rows).mkString("\n"))
    }

    // -- run 1: initial snapshot --------------------------------------------
    dropCsv("drop-1.csv", Seq(
      "1,Alice,alice@x.com,retail",
      "2,Bob,bob@x.com,retail"))
    val r1 = pipe.run(t1)
    r1.bronze.map(_.action) shouldBe Seq("created")
    r1.bronze.map(_.rows) shouldBe Seq(2L)
    r1.silver.map(_.action) shouldBe Seq("initial-load")
    pipe.silverTable("Customers").where($"is_current").count() shouldBe 2

    // -- run 2: new drop, Bob changed ---------------------------------------
    dropCsv("drop-2.csv", Seq(
      "1,Alice,alice@x.com,retail",
      "2,Bob,bob@x.com,wholesale"))
    val r2 = pipe.run(t2)
    r2.bronze.map(_.action) shouldBe Seq("appended")
    // exactly-once: ONLY the new file's rows reach bronze (the batch path
    // would re-append drop-1's rows too and rely on the merge to no-op)
    r2.bronze.map(_.rows) shouldBe Seq(2L)
    r2.silver.map(_.action) shouldBe Seq("merged")
    val s2 = pipe.silverTable("Customers")
    s2.count() shouldBe 3
    s2.where($"CustomerID" === 2 && $"is_current")
      .select("Segment").as[String].collect() shouldBe Array("wholesale")

    // -- run 3: nothing new landed → ingest appends nothing, and silver's
    // watermark filter sees an EMPTY batch (the batch path would re-append
    // the whole zone and reach the weaker "no-changes" merge no-op)
    val r3 = pipe.run(t3)
    r3.bronze.map(_.action) shouldBe Seq("skipped-empty")
    r3.bronze.map(_.rows) shouldBe Seq(0L)
    r3.silver.map(_.action) shouldBe Seq("skipped-empty")

    // -- run 4: new customer lands; side channel fires; gold builds ---------
    val t4 = Timestamp.valueOf("2026-04-01 00:00:00")
    dropCsv("drop-3.csv", Seq("3,Carol,carol@x.com,retail"))
    val r4 = pipe.run(t4,
      goldFact = Some { s =>
        import s.implicits._
        Seq((1, 1, "Alice", 5.0), (2, 3, "Carol", 7.0))
          .toDF("OrderID", "CustomerID", "CustomerName", "amt")
          .select($"OrderID", $"CustomerID", $"CustomerName",
            lit(1).as("SellerID"), lit("s").as("SellerName"),
            lit(1).as("ProductID"), lit("p").as("ProductName"),
            lit("c").as("CategoryName"), lit("Delivered").as("StatusName"),
            lit(java.math.BigDecimal.ONE).cast("decimal(12,2)").as("Quantity"),
            lit(java.math.BigDecimal.ONE).cast("decimal(12,2)").as("CurrentPrice"),
            $"amt".cast("decimal(12,2)").as("TotalAmount"),
            lit("2024-01-01").cast("date").as("OrderDate"))
      })
    r4.bronze.map(_.rows) shouldBe Seq(1L)
    r4.silver.map(_.action) shouldBe Seq("merged")
    sink.batches.map(_.map(m => m("Name"))) shouldBe List(Seq("Carol"))
    val s4 = pipe.silverTable("Customers")
    s4.where($"is_current").count() shouldBe 3
    r4.gold.map(_.marts("customer_analytics")) shouldBe Some(2)
  }

  test("re-running the same batch is idempotent (watermark no-change path)") {
    val root = Files.createTempDirectory("graft-idem")
    val landing = root.resolve("landing")
    val conf = PipelineConfig(
      landingRoot = landing.toString,
      bronzeRoot = root.resolve("bronze").toString,
      silverRoot = root.resolve("silver").toString,
      goldRoot = root.resolve("gold").toString,
      stateRoot = root.resolve("state").toString,
      tables = Seq(TableConfig("Customers", "CustomerID")))
    val pipe = new Pipeline(spark, conf)
    writeCsv(landing, "Customers", "CustomerID,Name", Seq("1,Alice"))
    pipe.run(t1)
    // no new files landed: bronze appends the same file again (same content),
    // but the SCD2 stage detects no changes and current rows stay put
    val r2 = pipe.run(t2)
    r2.silver.map(_.action) shouldBe Seq("no-changes")
    val s = pipe.silverTable("Customers")
    s.where($"is_current").count() shouldBe 1
  }
}
