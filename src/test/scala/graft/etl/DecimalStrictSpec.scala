package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.sources.{LandingSource, TableStore}

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
}
