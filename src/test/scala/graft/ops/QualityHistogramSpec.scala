package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("histogram buckets, saturates edges, and excludes nulls") {
    val df = Seq[java.lang.Double](-10.0, 0.0, 5.0, 10.0, 15.0, 99.0, null)
      .toDF("v")
    val h = Quality.histogram(df, "v", 0, 20, 2)
      .as[(Long, Long, Double, Double)].collect().toSet
    // width 10: bucket0 = [-10 sat, 0, 5], bucket1 = [10, 15, 99 sat]
    h shouldBe Set((0L, 3L, -10.0, 5.0), (1L, 3L, 10.0, 99.0))
  }

  test("histogram accounts for every non-null row") {
    val ev = graft.core.Tables.table(spark, sf0001, "events")
    val h = Quality.histogram(ev, "value", 0, 100, 20)
    h.agg(sum($"n")).as[Long].head() shouldBe ev.where($"value".isNotNull).count()
  }

  test("equiDepthHistogram: equal depths on skewed data, ordered disjoint ranges") {
    // heavy skew: 97 small values + 3 huge — fixed-width would put 97 rows
    // in one bucket; equi-depth must spread them 25/25/25/25
    val d = ((1 to 97).map(_.toDouble) ++ Seq(1e6, 2e6, 3e6)).toDF("v")
    val r = Quality.equiDepthHistogram(d, "v", 4)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect()
    r.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    r.map(_._2).toSeq shouldBe Seq(25L, 25L, 25L, 25L)
    // ranges ascend and do not overlap
    r.sliding(2).foreach { case Array(a, b) => a._4 should be <= b._3 }
    r.last._4 shouldBe 3e6
    // ntile remainder rule: first buckets take the extra rows
    val odd = (1 to 10).map(_.toDouble).toDF("v")
    Quality.equiDepthHistogram(odd, "v", 3).orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect().map(_._2).toSeq shouldBe Seq(4L, 3L, 3L)
  }

  test("madOutliers flags far points against median+MAD, never nulls") {
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 5.0, 1000.0, null).toDF("v")
    val r = Quality.madOutliers(df, "v", 3.0)
      .select($"v", $"is_outlier").collect()
      .map(row => (Option(row.get(0)), row.getBoolean(1))).toSet
    r should contain(Some(1000.0) -> true)
    r should contain(Some(3.0) -> false)
    r should contain(None -> false)
    // only the planted outlier is flagged
    r.count(_._2) shouldBe 1
  }
}
