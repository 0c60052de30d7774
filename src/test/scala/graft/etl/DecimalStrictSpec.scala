package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.sources.{LandingSource, TableConfig, TableStore}

/** Decimal-strict schema mode (SURVEY §7.4): the reference declares money
  * columns DECIMAL but CSV inference degrades them to double — the one
  * deliberate deviation round 1 documented. With a type override the landing
  * read parses the text straight into decimal, and later pinned reads
  * inherit strictness from the committed Bronze schema. */
class DecimalStrictSpec extends SparkSpec {
  import spark.implicits._

  test("type override pins money columns to decimal through ingest and re-runs") {
    val root = Files.createTempDirectory("graft-dec").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/landing"))
    Files.writeString(java.nio.file.Paths.get(s"$root/landing/Payments.csv"),
      "PaymentID,Amount\n1,123.45\n2,0.10\n")
    val landing = new LandingSource(spark, s"$root/landing")
    val store = new TableStore(spark)
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

    // without the override, inference degrades Amount to double
    landing.readInferred("Payments").schema("Amount").dataType shouldBe
      org.apache.spark.sql.types.DoubleType

    BronzeIngest.ingestTable(landing, store, s"$root/bronze", "Payments", t0,
      typeOverrides = Map("Amount" -> "decimal(12,2)"))
    val bronze = store.read(s"$root/bronze/Payments")
    bronze.schema("Amount").dataType shouldBe DecimalType(12, 2)
    bronze.select($"Amount".cast("string")).as[String].collect().toSet shouldBe
      Set("123.45", "0.10")

    // second run pins the committed schema — strictness survives with NO
    // override passed (the pinned path never re-infers)
    val t1 = Timestamp.valueOf("2026-01-02 00:00:00")
    BronzeIngest.ingestTable(landing, store, s"$root/bronze", "Payments", t1)
    store.schemaOf(s"$root/bronze/Payments")("Amount").dataType shouldBe
      DecimalType(12, 2)
  }

  test("decimal strictness survives Bronze → Silver → Gold end-to-end") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-dec-e2e")
    Files.createDirectories(root.resolve("landing/Payments"))
    Files.writeString(root.resolve("landing/Payments/part-0.csv"),
      "PaymentID,Customer,Amount\n1,Alice,123.45\n2,Bob,0.10\n3,Alice,999999999999.99\n")
    val conf = PipelineConfig(
      landingRoot = root.resolve("landing").toString,
      bronzeRoot = root.resolve("bronze").toString,
      silverRoot = root.resolve("silver").toString,
      goldRoot = root.resolve("gold").toString,
      stateRoot = root.resolve("state").toString,
      tables = Seq(TableConfig("Payments", "PaymentID",
        typeOverrides = Map("Amount" -> "decimal(18,2)"))))
    val pipe = new Pipeline(spark, conf)
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    pipe.run(t0)

    // Silver: the SCD2 merge carries the committed decimal through
    val silver = pipe.silverTable("Payments")
    silver.schema("Amount").dataType shouldBe DecimalType(18, 2)

    // Gold-style mart straight off Silver: exact-decimal aggregation (the
    // sum widens the scale-preserving way, 18,2 → 28,2), and the extreme
    // value survives bit-exact — double would have rounded 999999999999.99
    val mart = silver.where($"is_current")
      .groupBy("Customer").agg(sum($"Amount").as("total_amount"))
    mart.schema("total_amount").dataType shouldBe DecimalType(28, 2)
    mart.where($"Customer" === "Alice")
      .select($"total_amount".cast("string")).as[String].head() shouldBe
      "1000000000123.44"
  }
}
