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
