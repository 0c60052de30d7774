package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class WatermarkStoreSpec extends SparkSpec {

  test("missing watermark reads the epoch default; commit round-trips") {
    val wm = new WatermarkStore(spark, Files.createTempDirectory("wm").toString)
    wm.read("Customers") shouldBe wm.default
    wm.commit("Customers", "2026-01-15 10:00:00.0")
    wm.read("Customers") shouldBe "2026-01-15 10:00:00.0"
    // other tables are independent
    wm.read("Orders") shouldBe wm.default
  }
}
