package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("twoStepFunnel requires B strictly after the FIRST A") {
    val events = Seq(
      // u1: signup then purchase -> converted
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-02 10:00:00"), "purchase"),
      // u2: purchase BEFORE signup only -> not converted (did-both would lie)
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 12:00:00"), "signup"),
      // u3: signup only
      (3L, ts("2024-01-03 08:00:00"), "signup"),
      // u4: purchase only -> not in the funnel at all
      (4L, ts("2024-01-04 08:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.twoStepFunnel(events, "user_id", "ts", "event_type",
      "signup", "purchase")
      .select($"user_id", $"converted").as[(Long, Boolean)].collect().toMap
    f shouldBe Map(1L -> true, 2L -> false, 3L -> false)
  }

  test("twoStepFunnel picks the FIRST qualifying B, not any B") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-05 10:00:00"), "purchase"),
      (1L, ts("2024-01-03 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.twoStepFunnel(events, "user_id", "ts", "event_type",
      "signup", "purchase")
      .select($"ts_b").as[Timestamp].head()
    f shouldBe ts("2024-01-03 10:00:00")
  }

  test("retentionCohorts: offsets count from the user's first week") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"), // Mon wk0
      (1L, ts("2024-01-09 10:00:00"), "view"), // wk1
      (2L, ts("2024-01-03 10:00:00"), "view"), // same cohort wk0
      (3L, ts("2024-01-10 10:00:00"), "view")  // next cohort wk0
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .select($"cohort_week".cast("string"), $"week_offset", $"active_users")
      .as[(String, Long, Long)].collect().toSet
    r shouldBe Set(
      ("2024-01-01 00:00:00", 0L, 2L),
      ("2024-01-01 00:00:00", 1L, 1L),
      ("2024-01-08 00:00:00", 0L, 1L))
  }
}
