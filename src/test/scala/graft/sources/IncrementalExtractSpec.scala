package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drives the extract → land path (SURVEY S14-S16): the two-sided watermark
  * interval against a file-backed source, CSV landing write, and the
  * commit-after-landing watermark ordering. */
class IncrementalExtractSpec extends SparkSpec {

  test("two consecutive extracts partition the change stream with no gaps/overlaps") {
    val root = Files.createTempDirectory("graft-extract")
    val src = new FileIncrementalSource(spark, "/root/testdata/sf0.001")
    val wm = new WatermarkStore(spark, root.resolve("state").toString)
    val landing = root.resolve("landing").toString

    // run 1: everything up to T1 (watermarks travel in the store's UTC ISO
    // form; zone-less strings are the legacy format and get reinterpreted)
    val t1 = "2024-01-05T00:00:00Z"
    val n1 = IncrementalExtract.runTable(src, wm, landing, "events", "ts", t1)
    wm.read("events") shouldBe t1
    // run 2: (T1, T2]
    val t2 = "2024-01-10T00:00:00Z"
    val n2 = IncrementalExtract.runTable(src, wm, landing, "events", "ts", t2)
    wm.read("events") shouldBe t2

    n1 should be > 0L
    n2 should be > 0L
    // the second landing overwrite holds exactly the (T1, T2] interval
    val landed = spark.read.option("header", "true").csv(s"$landing/events")
    landed.count() shouldBe n2
    val total = graft.core.Tables.table(spark, sf0001, "events")
      .where(col("ts") <= lit(t2).cast("timestamp")).count()
    (n1 + n2) shouldBe total // no gaps, no overlaps
  }

  test("empty interval writes nothing but still advances the watermark") {
    val root = Files.createTempDirectory("graft-extract-empty")
    val src = new FileIncrementalSource(spark, "/root/testdata/sf0.001")
    val wm = new WatermarkStore(spark, root.resolve("state").toString)
    val landing = root.resolve("landing").toString
    wm.commit("events", "2030-01-01T00:00:00Z")
    val n = IncrementalExtract.runTable(src, wm, landing, "events", "ts",
      "2030-01-02T00:00:00Z")
    n shouldBe 0L
    wm.read("events") shouldBe "2030-01-02T00:00:00Z"
    new java.io.File(s"$landing/events").exists() shouldBe false
  }
}
