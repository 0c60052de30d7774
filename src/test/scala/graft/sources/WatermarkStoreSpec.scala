package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class WatermarkStoreSpec extends SparkSpec {

  test("missing watermark reads the epoch default; commit round-trips") {
    val wm = new WatermarkStore(spark, Files.createTempDirectory("wm").toString)
    wm.read("Customers") shouldBe wm.default
    wm.commit("Customers", "2026-01-15T10:00:00Z")
    wm.read("Customers") shouldBe "2026-01-15T10:00:00Z"
    // other tables are independent
    wm.read("Orders") shouldBe wm.default
  }

  test("a legacy zone-less watermark is reinterpreted in the JVM default zone on read") {
    val wm = new WatermarkStore(spark, Files.createTempDirectory("wm").toString)
    val prev = java.util.TimeZone.getDefault
    try {
      // file written by the old Timestamp.toString path on a JVM 2h ahead
      // of UTC: "10:00" there is 08:00Z — trusting it as UTC would keep
      // skipping rows in the offset window until the next commit
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Europe/Helsinki"))
      wm.commit("Customers", "2026-01-15 10:00:00.0")
      wm.read("Customers") shouldBe "2026-01-15T08:00:00Z"
      // current-format values pass through untouched
      wm.commit("Orders", "2026-01-15T10:00:00Z")
      wm.read("Orders") shouldBe "2026-01-15T10:00:00Z"
      // the epoch default is not timestamp-shaped and is never rewritten
      WatermarkStore.normalize(wm.default) shouldBe wm.default
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("format serializes the instant in UTC regardless of the JVM default timezone") {
    // Timestamp carries an absolute instant; format must not render it in
    // the (arbitrary) JVM default zone or the committed watermark drifts
    // against the UTC session that reads it back.
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
      val ts = java.sql.Timestamp.valueOf("2024-01-15 10:00:00")
      val utcRendering = WatermarkStore.format(ts)
      utcRendering shouldBe "2024-01-15T10:00:00Z"
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tokyo"))
      // same instant → same serialization, even though Timestamp.toString
      // would now render 19:00 local
      WatermarkStore.format(new java.sql.Timestamp(ts.getTime)) shouldBe utcRendering
      // and Spark's UTC session casts it back to the original instant
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val back = Seq(utcRendering).toDF("s")
        .select(col("s").cast("timestamp")).as[java.sql.Timestamp].head()
      back.getTime shouldBe ts.getTime
    } finally java.util.TimeZone.setDefault(prev)
  }
}
