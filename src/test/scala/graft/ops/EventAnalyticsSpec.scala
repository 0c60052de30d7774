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

  test("transitionCounts: consecutive pairs per user, deterministic tie-break") {
    val events = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (11L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (12L, 1L, ts("2024-01-01 10:02:00"), "purchase"),
      (20L, 2L, ts("2024-01-01 09:00:00"), "view"),
      (21L, 2L, ts("2024-01-01 09:05:00"), "click"),
      // same-ts tie for user 3: order falls back to event_id 30 -> 31
      (30L, 3L, ts("2024-01-01 08:00:00"), "view"),
      (31L, 3L, ts("2024-01-01 08:00:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val m = EventAnalytics.transitionCounts(events, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long)].collect().toSet
    m shouldBe Set(("view", "click", 3L), ("click", "purchase", 1L))
  }

  test("interArrivalStats: exact integer-microsecond gaps per type") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:00:10"), "click"),  // gap 10s
      (3L, 1L, ts("2024-01-01 10:00:40"), "click")   // gap 30s
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.interArrivalStats(events, "user_id", "ts", "event_type", "event_id")
      .select($"event_type", $"n", $"mean_gap_us", $"p50_gap_us")
      .as[(String, Long, Double, Double)].collect().toList
    r shouldBe List(("click", 2L, 20e6, 20e6))
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

  test("rollingFeatures: bounded trailing frame per user, no future leakage") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, 100L, ts(0), 10.0), (1L, 101L, ts(1), 20.0), (1L, 102L, ts(2), 30.0),
      (1L, 103L, ts(3), 40.0),
      (2L, 200L, ts(0), 5.0) // other user: frames never cross entities
    ).toDF("user_id", "event_id", "ts", "value")
    val r = EventAnalytics.rollingFeatures(ev, "user_id", "ts", "event_id", "value", 3)
      .select($"event_id", $"roll_n", $"roll_sum", $"roll_avg")
      .as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    r(100L) shouldBe ((1L, 10.0, 10.0))           // first event: only itself
    r(101L) shouldBe ((2L, 30.0, 15.0))
    r(102L) shouldBe ((3L, 60.0, 20.0))           // full frame
    r(103L) shouldBe ((3L, 90.0, 30.0))           // event 100 aged out
    r(200L) shouldBe ((1L, 5.0, 5.0))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.rollingFeatures(ev, "user_id", "ts", "event_id", "value", 0)
  }

  test("dailyTypePivot: pinned columns, absent types count 0 with null sum") {
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (ts(1, 1), "click", 1.5), (ts(1, 2), "click", 2.5), (ts(1, 3), "view", 4.0),
      (ts(2, 1), "view", 1.0),
      (ts(2, 2), "other", 9.0) // outside the pinned domain -> dropped
    ).toDF("ts", "event_type", "value")
    val got = EventAnalytics.dailyTypePivot(ev, "ts", "event_type", "value",
      Seq("click", "view"))
    got.columns.toSeq shouldBe Seq("event_date", "click_n", "click_val", "view_n", "view_val")
    val byDay = got.collect().map(r => r.getDate(0).toString -> r).toMap
    byDay("2024-01-01").getLong(1) shouldBe 2L
    byDay("2024-01-01").getDouble(2) shouldBe 4.0
    byDay("2024-01-01").getLong(3) shouldBe 1L
    byDay("2024-01-02").getLong(1) shouldBe 0L   // absent type -> 0, not null
    byDay("2024-01-02").isNullAt(2) shouldBe true // ...but the sum stays null
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.dailyTypePivot(ev, "ts", "event_type", "value", Seq.empty)
  }

  test("hourlySpikes: exact integer moments; singleton types never flag") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // type A hourly counts 1,1,1,10: mean 3.25, sd sqrt((4·103−169)/12) = 4.5
    val a = Seq("00", "01", "02").map(h => (ts(s"2026-01-01 $h:10:00"), "A")) ++
      (1 to 10).map(m => (ts(f"2026-01-01 03:$m%02d:00"), "A"))
    val b = Seq((ts("2026-01-01 00:30:00"), "B")) // single observed hour
    val events = (a ++ b).toDF("ts", "event_type")
    val r = EventAnalytics.hourlySpikes(events, "ts", "event_type", 1.0)
      .select($"hour".cast("string"), $"event_type", $"cnt", $"mean_cnt", $"sd_cnt",
        $"is_spike")
      .as[(String, String, Long, Double, Option[Double], Boolean)].collect()
    val byKey = r.map(x => (x._1, x._2) -> x).toMap
    byKey(("2026-01-01 03:00:00", "A")) shouldBe
      (("2026-01-01 03:00:00", "A", 10L, 3.25, Some(4.5), true)) // 10 > 3.25+4.5
    byKey(("2026-01-01 00:00:00", "A"))._6 shouldBe false
    byKey(("2026-01-01 00:00:00", "B")) shouldBe
      (("2026-01-01 00:00:00", "B", 1L, 1.0, None, false)) // null sd, never flagged
  }

  test("sessionSequences: gap splits, ordered types, deterministic ties") {
    val events = Seq(
      // u1 session 1: three events, two at the SAME ts (tie on event_id)
      (10L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (12L, ts("2024-01-01 10:05:00"), 1L, "click"),
      (11L, ts("2024-01-01 10:05:00"), 1L, "scroll"),
      // u1 session 2: 31 min later
      (13L, ts("2024-01-01 10:36:01"), 1L, "buy"),
      // u2: single-event session
      (20L, ts("2024-01-01 09:00:00"), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = EventAnalytics.sessionSequences(
      events, "user_id", "ts", "event_id", "event_type", 1800000L)
      .select($"user_id", $"session_id", $"n_events", $"event_seq")
      .as[(Long, Long, Long, Seq[String])].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    // ts tie at 10:05 breaks on event_id: 11 (scroll) before 12 (click)
    r((1L, 1L)) shouldBe ((3L, Seq("view", "scroll", "click")))
    r((1L, 2L)) shouldBe ((1L, Seq("buy")))
    r((2L, 1L)) shouldBe ((1L, Seq("view")))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.sessionSequences(events, "user_id", "ts", "event_id",
        "event_type", 0L)
  }

  test("userSnapshot: hand-computed RFM block; null values count but add 0") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some(10.0)),
      (1L, ts("2024-01-01 23:00:00"), 2L, Some(5.0)),   // same day as #1
      (1L, ts("2024-01-10 08:00:00"), 3L, None),        // null value
      (2L, ts("2024-01-05 12:00:00"), 4L, Some(2.5))
    ).toDF("user_id", "ts", "event_id", "value")
    val r = EventAnalytics.userSnapshot(events, "user_id", "ts", "value",
      java.sql.Date.valueOf("2024-01-15"))
      .as[(Long, Long, Long, Double, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    r(1L) shouldBe ((1L, 5L, 3L, 15.0, 14L, 2L))
    r(2L) shouldBe ((2L, 10L, 1L, 2.5, 10L, 1L))
  }

  test("sessionSequences sessions agree with sessionizeBatch on real events") {
    val ev = graft.core.Tables.table(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val seq = EventAnalytics.sessionSequences(
      ev, "user_id", "ts", "event_id", "event_type", 1800000L)
    val base = graft.streaming.EventStream.sessionizeBatch(
      ev.select("user_id", "ts"), 1800000L)
    // same (user, session) keyspace, same per-session event counts, and
    // every sequence length equals its n_events
    val a = seq.select($"user_id", $"session_id", $"n_events")
      .as[(Long, Long, Long)].collect().sorted
    val b = base.select($"user_id", $"session_id", $"n_events")
      .as[(Long, Long, Long)].collect().sorted
    a shouldBe b
    seq.where(org.apache.spark.sql.functions.size($"event_seq") =!= $"n_events")
      .count() shouldBe 0L
  }

  test("funnelSteps: strictly-after ordering, same-ts rejected, repeats legal") {
    val events = Seq(
      // user 1 completes A→B→C in order
      (1L, ts("2024-01-01 10:00:00"), "A"), (1L, ts("2024-01-01 11:00:00"), "B"),
      (1L, ts("2024-01-01 12:00:00"), "C"),
      // user 2: B at the SAME instant as A — not strictly after, depth 1
      (2L, ts("2024-01-01 10:00:00"), "A"), (2L, ts("2024-01-01 10:00:00"), "B"),
      // user 3: B BEFORE A — order matters, depth 1
      (3L, ts("2024-01-01 09:00:00"), "B"), (3L, ts("2024-01-01 10:00:00"), "A"),
      // user 4 never does A — not in the funnel at all
      (4L, ts("2024-01-01 10:00:00"), "B")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnelSteps(events, "user_id", "ts", "event_type",
      Seq("A", "B", "C"))
      .select("step", "step_type", "n_users", "conv_from_first")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    r shouldBe Array((1L, "A", 3L, 1.0), (2L, "B", 1L, 0.333333), (3L, "C", 1L, 0.333333))
    // repeated step types need two distinct instants
    val rep = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"), (1L, ts("2024-01-01 10:30:00"), "A"),
      (2L, ts("2024-01-01 10:00:00"), "A")
    ).toDF("user_id", "ts", "event_type")
    val r2 = EventAnalytics.funnelSteps(rep, "user_id", "ts", "event_type",
      Seq("A", "A")).select("step", "n_users").as[(Long, Long)].collect().toMap
    r2 shouldBe Map(1L -> 2L, 2L -> 1L)
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnelSteps(events, "user_id", "ts", "event_type", Seq("A"))
  }

  test("ewmaSnapshot: hand fold in (ts, id) order, nulls excluded, α guard") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some(8.0)),
      (1L, ts("2024-01-01 11:00:00"), 2L, None),         // excluded
      (1L, ts("2024-01-01 12:00:00"), 3L, Some(4.0)),
      // same ts: id order decides the fold order (4 before 5)
      (2L, ts("2024-01-01 10:00:00"), 4L, Some(1.0)),
      (2L, ts("2024-01-01 10:00:00"), 5L, Some(9.0))
    ).toDF("user_id", "ts", "event_id", "value")
    val r = EventAnalytics.ewmaSnapshot(events, "user_id", "ts", "event_id",
      "value", 0.25).as[(Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    r(1L) shouldBe ((2L, 0.25 * 4.0 + 0.75 * 8.0))  // s1=8, s2=7.0
    r(2L) shouldBe ((2L, 0.25 * 9.0 + 0.75 * 1.0))  // s1=1, s2=3.0
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.ewmaSnapshot(events, "user_id", "ts", "event_id", "value", 0.0)
  }

  test("funnelSteps two-step agrees with twoStepFunnel on real events") {
    val ev = graft.core.Tables.table(spark, sf0001, "events")
    val f2 = EventAnalytics.twoStepFunnel(ev, "user_id", "ts", "event_type",
      "signup", "purchase")
    val expect1 = f2.count()
    val expect2 = f2.where($"converted").count()
    val r = EventAnalytics.funnelSteps(ev, "user_id", "ts", "event_type",
      Seq("signup", "purchase"))
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    r(1L) shouldBe expect1
    r(2L) shouldBe expect2
  }

  test("nextEventExamples: ordered contexts, short history dropped, tie order by id") {
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      (1L, ts(1), 101L, "a"), (1L, ts(2), 102L, "b"),
      (1L, ts(3), 103L, "c"), (1L, ts(4), 104L, "d"),
      // same-ts tie: id order decides which is context vs target
      (2L, ts(1), 201L, "x"), (2L, ts(2), 202L, "y"),
      (2L, ts(2), 203L, "z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.nextEventExamples(ev, "user_id", "ts",
        "event_id", "event_type", 2)
      .as[(Long, Long, String, String)].collect().toSet
    got shouldBe Set(
      (1L, 103L, "a b", "c"), (1L, 104L, "b c", "d"),
      (2L, 203L, "x y", "z")) // user 2's first two have short history
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.nextEventExamples(ev, "user_id", "ts", "event_id",
        "event_type", 0)
  }

  test("hazardTable: hand lifetimes, censoring keeps users at risk but never churned") {
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(s"2024-01-$d 10:00:00")
    val ev = Seq(
      (1L, t("01")),                // life 0, churned
      (2L, t("01")), (2L, t("03")), // life 2, churned
      (3L, t("20")), (3L, t("22")), // life 2, last 10d before asOf → churned
      (4L, t("28")), (4L, t("29"))  // life 1, last 3d before asOf → censored
    ).toDF("user_id", "ts")
    val r = EventAnalytics.hazardTable(ev, "user_id", "ts",
        java.sql.Date.valueOf("2024-02-01"), 7)
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    r(0L) shouldBe ((4L, 1L, 0.25))
    r(1L) shouldBe ((3L, 0L, 0.0)) // the censored user: at risk, no event
    r(2L) shouldBe ((2L, 2L, 1.0))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.hazardTable(ev, "user_id", "ts",
        java.sql.Date.valueOf("2024-02-01"), -1)
  }

  test("basketRules: hand confidence/lift; presence not frequency; directed") {
    import java.sql.Timestamp
    val d1 = Timestamp.valueOf("2024-01-01 10:00:00")
    val ev = Seq(
      (1L, d1, "a"), (1L, d1, "b"), (1L, d1, "a"), // dup 'a' collapses
      (2L, d1, "a"), (2L, d1, "b"),
      (3L, d1, "a")
    ).toDF("user_id", "ts", "event_type")
      .withColumn("day", org.apache.spark.sql.functions.to_date($"ts"))
    val r = EventAnalytics.basketRules(ev, Seq("user_id", "day"), "event_type")
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = r(("a", "b")) // a in 3 baskets, b in 2, both in 2, N = 3
    (ab._3, ab._4, ab._5) shouldBe ((2L, 3L, 2L))
    ab._6 shouldBe r6(2.0 / 3)
    ab._7 shouldBe 1.0 // 2·3/(3·2)
    r(("b", "a"))._6 shouldBe 1.0 // b → a always
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.basketRules(ev, Seq.empty, "event_type")
    graft.core.CacheRegistry.drain()
  }

  test("cusumAlerts: sustained shift alarms where a lone spike decays; hand trace") {
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // drift D = 10 + 2 = 12, threshold 10
    val ev = Seq(
      // user 1: one huge spike then quiet — s: 28, 26, 24 ... stays > 10
      // only while the spike drains; then a long-quiet tail resets to 0
      (1L, ts(1), 11L, Some(40.0)), (1L, ts(2), 12L, Some(10.0)),
      (1L, ts(3), 13L, Some(0.0)), (1L, ts(4), 14L, Some(0.0)),
      (1L, ts(5), 15L, Some(13.0)),
      // user 2: sustained +3 shift — s: 3, 6, 9, 12, 15 (alerts at 12, 15)
      (2L, ts(1), 21L, Some(15.0)), (2L, ts(2), 22L, Some(15.0)),
      (2L, ts(3), 23L, Some(15.0)), (2L, ts(4), 24L, Some(15.0)),
      (2L, ts(5), 25L, Some(15.0)),
      // nulls are excluded before ordering
      (2L, ts(6), 26L, None)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = EventAnalytics.cusumAlerts(ev, "user_id", "ts", "event_id",
        "value", 10.0, 2.0, 10.0)
      .as[(Long, Long, Timestamp, Double, Double)].collect()
      .map(x => x._2 -> x._5).toMap
    // user 1 trace: 28, 26, 14, 2, 3 → alerts at events 11 (28) and 12 (26), 13 (14)
    r.keySet shouldBe Set(11L, 12L, 13L, 24L, 25L)
    r(11L) shouldBe 28.0
    r(13L) shouldBe 14.0
    r(24L) shouldBe 12.0
    r(25L) shouldBe 15.0
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.cusumAlerts(ev, "user_id", "ts", "event_id", "value",
        10.0, 2.0, 0.0)
  }

  test("decayedCounts: hand decay fold, future events excluded, null adds 0") {
    import java.sql.Timestamp
    val asOf = Timestamp.valueOf("2024-01-08 00:00:00")
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), Some(10.0)), // age 7d
      (1L, Timestamp.valueOf("2024-01-08 00:00:00"), Some(4.0)),  // age 0
      (1L, Timestamp.valueOf("2024-01-04 12:00:00"), None),       // age 3.5d
      (2L, Timestamp.valueOf("2024-01-09 00:00:00"), Some(99.0))  // future
    ).toDF("user_id", "ts", "value")
    val got = EventAnalytics.decayedCounts(ev, "user_id", "ts", "value", asOf, 7.0)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w7 = 0.5                  // half-life exactly
    val w35 = math.pow(2.0, -0.5) // 3.5d = half a half-life
    got(1L)._1 shouldBe 3L
    got(1L)._2 shouldBe r6(w7 + 1.0 + w35) +- 1e-6
    got(1L)._3 shouldBe r6(w7 * 10.0 + 1.0 * 4.0) +- 1e-6 // null adds 0
    got.contains(2L) shouldBe false // only future events → filtered out
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.decayedCounts(ev, "user_id", "ts", "value", asOf, 0.0)
  }

  test("rollingActiveUsers: hand dau/wau, gap day kept at 0, within-day dedup") {
    val ev = Seq(
      (Some(1L), Timestamp.valueOf("2024-01-01 09:00:00")),
      (Some(2L), Timestamp.valueOf("2024-01-01 10:00:00")),
      // 2024-01-02: nobody active — the gap day must still report
      (Some(1L), Timestamp.valueOf("2024-01-03 08:00:00")),
      (Some(1L), Timestamp.valueOf("2024-01-03 23:00:00")), // same user+day
      (None: Option[Long], Timestamp.valueOf("2024-01-03 12:00:00")) // null user
    ).toDF("user_id", "ts")
    val got = EventAnalytics.rollingActiveUsers(ev, "user_id", "ts", 2)
      .orderBy("day").as[(java.sql.Date, Long, Long)].collect()
    graft.core.CacheRegistry.drain()
    got.map(_._1.toString) shouldBe Array("2024-01-01", "2024-01-02", "2024-01-03")
    got.map(_._2) shouldBe Array(2L, 0L, 1L) // dau; day 3 dedups user 1
    // wau (window 2): {1,2} on day1; {1,2} active in {day1,day2};
    // {1} in {day2,day3}
    got.map(_._3) shouldBe Array(2L, 2L, 1L)
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.rollingActiveUsers(ev, "user_id", "ts", 0)
  }

  test("ltvCurve: per-user dilution, cumulative by age, null value = 0") {
    def ts(week: Int, dowOff: Int = 0) = new Timestamp(
      Timestamp.valueOf("2024-01-01 10:00:00").getTime // a Monday
        + week * 7L * 86400000L + dowOff * 86400000L)
    val ev = Seq(
      // cohort w0: users 1, 2. week0 value 10 + 20; week1 only user 1: 30
      (1L, ts(0), Some(10.0)), (2L, ts(0, 2), Some(20.0)),
      (1L, ts(1), Some(30.0)),
      (2L, ts(1, 3), None: Option[Double]), // active, null value -> +0
      // cohort w1: user 3 alone, one event
      (3L, ts(1), Some(7.0))
    ).toDF("user_id", "ts", "value")
    val got = EventAnalytics.ltvCurve(ev, "user_id", "ts", "value")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val w0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w1 = Timestamp.valueOf("2024-01-08 00:00:00")
    got((w0, 0L)) shouldBe ((2L, 30.0, 15.0)) // (10+20)/2 users
    got((w0, 1L)) shouldBe ((2L, 30.0, 30.0)) // cum 60 / 2 users
    got((w1, 0L)) shouldBe ((1L, 7.0, 7.0))
    got.size shouldBe 3
  }

  test("theilSenTrend: exact line recovered, outlier day shrugged off") {
    def day(d: Int, v: Double) =
      (Timestamp.valueOf(f"2024-04-${d + 1}%02d 12:00:00"), v)
    // y = 2x + 5 over 7 days, day index 3 poisoned with a huge spike
    val rows = (0 until 7).map(i =>
      day(i, if (i == 3) 10000.0 else 2.0 * i + 5.0))
    val r = EventAnalytics.theilSenTrend(rows.toDF("ts", "v"), "ts", "v")
      .as[(Long, Double, Double)].head()
    graft.core.CacheRegistry.drain()
    r._1 shouldBe 7L
    r._2 shouldBe 2.0 // median of 21 slopes: 15 are exactly 2
    r._3 shouldBe 5.0 // median residual: 6 of 7 are exactly 5
    // within-day summation: two events on one day act as their sum
    val two = Seq(day(0, 1.0), day(0, 4.0), day(1, 7.0)).toDF("ts", "v")
    EventAnalytics.theilSenTrend(two, "ts", "v")
      .as[(Long, Double, Double)].head() shouldBe ((2L, 2.0, 5.0))
    graft.core.CacheRegistry.drain()
  }

  test("attribution: credit models, lookback edges, tie-break, no-touch conv") {
    def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val ev = Seq(
      // user 1: touches at 09:00 (view), 10:00 (click), conversion 11:00
      (1L, 100L, "view", ts(9)), (1L, 101L, "click", ts(10)),
      (1L, 102L, "purchase", ts(11)),
      // touch exactly AT the conversion instant: excluded (strict <)
      (1L, 103L, "view", ts(11)),
      // touch exactly at the lookback edge (2h before): included (>=)
      (2L, 200L, "view", ts(9)), (2L, 201L, "purchase", ts(11)),
      // user 3: conversion with no in-window touch -> absent
      (3L, 300L, "purchase", ts(11)),
      // user 4: timestamp TIE between touches -> id breaks first/last
      (4L, 400L, "view", ts(10)), (4L, 401L, "click", ts(10)),
      (4L, 402L, "purchase", ts(11))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventAnalytics.attribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view", "click"), 2 * 3600 * 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(3)) ->
        ((r.getLong(6), r.getDouble(7), r.getDouble(8), r.getDouble(9)))).toMap
    // user 1: view 09:00 is OUTSIDE the 2h lookback of 11:00? no — exactly
    // at the edge, included; click first=0 last=1, linear 0.5 each
    got((102L, 100L)) shouldBe ((2L, 1.0, 0.0, 0.5))
    got((102L, 101L)) shouldBe ((2L, 0.0, 1.0, 0.5))
    got.contains((102L, 103L)) shouldBe false // at conv instant: strict <
    got((201L, 200L)) shouldBe ((1L, 1.0, 1.0, 1.0)) // edge touch included
    got.keySet.map(_._1) should not contain 300L // unattributable absent
    // tie at 10:00: lower event_id is "first"
    got((402L, 400L)) shouldBe ((2L, 1.0, 0.0, 0.5))
    got((402L, 401L)) shouldBe ((2L, 0.0, 1.0, 0.5))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.attribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq.empty, 1000L)
  }

  test("survivalCurve: KM product of (1-hazard); all-churn day pins 0") {
    // u1: life 0; u2,u3: life 1; u4: life 2 — all observed (asOf far out)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-01 10:00:00")), (3L, ts("2024-01-02 10:00:00")),
      (4L, ts("2024-01-01 10:00:00")), (4L, ts("2024-01-03 10:00:00"))
    ).toDF("user_id", "ts")
    val r = EventAnalytics.survivalCurve(ev, "user_id", "ts",
      java.sql.Date.valueOf("2024-06-01"), 7)
      .orderBy("lifetime_day")
      .select($"lifetime_day", $"n_at_risk", $"n_churned", $"survival")
      .as[(Long, Long, Long, Double)].collect()
    // day 0: 4 at risk, 1 churn -> S = 3/4; day 1: 3 at risk, 2 churn
    // -> S = 3/4 * 1/3 = 1/4; day 2: 1 at risk, 1 churn (hazard 1) -> S = 0
    r(0) shouldBe ((0L, 4L, 1L, 0.75))
    r(1) shouldBe ((1L, 3L, 2L, 0.25))
    r(2) shouldBe ((2L, 1L, 1L, 0.0))
    // censoring: a user last active within censorDays of asOf never churns
    val r2 = EventAnalytics.survivalCurve(ev, "user_id", "ts",
      java.sql.Date.valueOf("2024-01-04"), 7)
      .orderBy("lifetime_day").select($"n_churned").as[Long].collect()
    r2 shouldBe Array(0L, 0L, 0L)
  }

  test("cupedLift: exact-correlate pre removes variance; ALL row never worse") {
    // y = 2x exactly -> theta = 2, y_adj constant -> var_adjusted = 0
    val rows = (1 to 8).flatMap { u =>
      Seq((u.toLong, ts("2024-01-05 10:00:00"), u.toDouble),
        (u.toLong, ts("2024-01-25 10:00:00"), 2.0 * u))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val r = EventAnalytics.cupedLift(df, "user_id", "ts", "value",
      java.sql.Date.valueOf("2024-01-16")).collect()
      .map(x => x.getString(0) -> x).toMap
    r("ALL").getDouble(8) shouldBe 2.0 // theta
    r("ALL").getDouble(5) shouldBe 0.0 // var_adjusted
    r("ALL").getBoolean(7) shouldBe true // never_worse
    r("ALL").getDouble(3) shouldBe r("ALL").getDouble(2) // means agree at ALL
    r.keySet shouldBe Set("A", "B", "ALL")
    (r("A").getLong(1) + r("B").getLong(1)) shouldBe r("ALL").getLong(1)
    graft.core.CacheRegistry.drain()
  }

  test("dowProfile: pure weekly rhythm -> seasonal_strength 1; shares sum 1") {
    // 4 weeks, value depends ONLY on day-of-week
    val days = (0 until 28).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      ("k", ts(s"$date 10:00:00"), (date.getDayOfWeek.getValue % 7) * 10.0)
    }
    val r = EventAnalytics.dowProfile(days.toDF("k", "ts", "value"),
      "k", "ts", "value").collect()
    r.length shouldBe 7
    r.foreach(_.getDouble(6) shouldBe 1.0) // seasonal_strength
    r.map(_.getDouble(5)).sum shouldBe 1.0 +- 1e-5 // shares (6 dp each)
    r.foreach(x => x.getLong(2) shouldBe 4L) // 4 of each dow
    graft.core.CacheRegistry.drain()
  }

  test("seasonalBacktest: linear daily series -> mae_s 7, mae_1 1, mase 7; " +
    "a gap drops the days missing either lag") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00")
    val full = (1 to 16).map(i => ("a", day(i), i.toDouble))
      .toDF("k", "ts", "v")
    val r = EventAnalytics.seasonalBacktest(full, "k", "ts", "v", 7).head()
    // scored days 8..16: |v(d)−v(d−7)| = 7, |v(d)−v(d−1)| = 1 everywhere
    r.getAs[Long]("n_days") shouldBe 9L
    r.getAs[Double]("mae_seasonal") shouldBe 7.0
    r.getAs[Double]("mae_naive") shouldBe 1.0
    r.getAs[Double]("mase") shouldBe 7.0
    graft.core.CacheRegistry.drain()
    // drop day 10: day 10 unscored (absent) and day 11 loses its lag-1
    val gapped = full.where($"v" =!= 10.0)
    val g = EventAnalytics.seasonalBacktest(gapped, "k", "ts", "v", 7).head()
    g.getAs[Long]("n_days") shouldBe 7L
    g.getAs[Double]("mase") shouldBe 7.0
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.seasonalBacktest(full, "k", "ts", "v", 1)
    graft.core.CacheRegistry.drain()
  }

  test("funnelLatency: first-seen deltas, backward users excluded, " +
    "hand percentiles") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(100), "a"), (1L, ts(400), "a"), (1L, ts(110), "b"), // 10s
      (2L, ts(100), "a"), (2L, ts(130), "b"),                     // 30s
      (3L, ts(100), "b"), (3L, ts(200), "a"),  // b BEFORE a: excluded
      (4L, ts(50), "a"))                       // never converts
      .toDF("user_id", "ts", "event_type")
    val r = graft.core.CacheRegistry.scoped {
      EventAnalytics.funnelLatency(ev, "user_id", "ts", "event_type",
        Seq("a", "b")).head()
    }
    r.getLong(2) shouldBe 2L
    r.getDouble(3) shouldBe 20.0 // mean
    r.getDouble(4) shouldBe 20.0 // p50 interpolated between 10 and 30
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnelLatency(ev, "user_id", "ts", "event_type",
        Seq("a"))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnelLatency(ev, "user_id", "ts", "event_type",
        Seq("a", "a"))
    graft.core.CacheRegistry.drain()
  }

  test("spearmanDaily: hand-ranked rho, monotone -> 1, degenerate -> null") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      // key a - day1: v=1, c=3 evts; day2: v=2, c=1; day3: v=3, c=2
      ("a", ts(1, 1), 0.4), ("a", ts(1, 2), 0.3), ("a", ts(1, 3), 0.3),
      ("a", ts(2, 1), 2.0),
      ("a", ts(3, 1), 1.5), ("a", ts(3, 2), 1.5),
      // key b - counts rise with value: perfect monotone
      ("b", ts(1, 1), 1.0),
      ("b", ts(2, 1), 2.0), ("b", ts(2, 2), 2.0),
      ("b", ts(3, 1), 3.0), ("b", ts(3, 2), 3.0), ("b", ts(3, 3), 3.0),
      // key c - single day
      ("c", ts(1, 1), 5.0))
      .toDF("k", "ts", "v")
    val r = EventAnalytics.spearmanDaily(ev, "k", "ts", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    // a: rank pairs (1,3),(2,1),(3,2) -> rho = -0.5
    r("a").getDouble(2) shouldBe -0.5
    r("b").getDouble(2) shouldBe 1.0
    r("c").isNullAt(2) shouldBe true
  }

  test("olsTrendByKey: exact line recovered, single-day key -> nulls, " +
    "multiple events per day sum first") {
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(s"2024-01-0$d 10:00:00")
    val ev = Seq(
      (Some("a"), ts("1"), 4.0), (Some("a"), ts("1"), 6.5), // day 0: 10.5
      (Some("a"), ts("2"), 20.5),                           // day 1
      (Some("a"), ts("3"), 30.5),                           // day 2 - line
      (Some("b"), ts("1"), 7.0),
      (None, ts("1"), 1.0), (None, ts("2"), 2.0)) // null-key cohort
      .toDF("k", "ts", "v")
    val r = EventAnalytics.olsTrendByKey(ev, "k", "ts", "v")
      .collect().map(x => Option(x.getString(0)) -> x).toMap
    r(Some("a")).getLong(1) shouldBe 3L
    r(Some("a")).getDouble(2) shouldBe 10.0 // slope
    r(Some("a")).getDouble(3) shouldBe 10.5 // intercept
    r(Some("b")).getLong(1) shouldBe 1L
    r(Some("b")).isNullAt(2) shouldBe true
    r(Some("b")).isNullAt(3) shouldBe true
    r(None).getLong(1) shouldBe 2L // null keys keep their own trend
    r(None).getDouble(2) shouldBe 1.0
  }

  test("sequentialPairs: existential precede via min/max reduction, " +
    "hand-computed supports") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: a@1 b@2 a@3 -> a precedes b AND b precedes a (interleave)
    // user 2: a@1 only    -> no pairs
    // user 3: a@5 b@6     -> a precedes b only
    val ev = Seq(
      (1L, ts(1), "a"), (1L, ts(2), "b"), (1L, ts(3), "a"),
      (2L, ts(1), "a"),
      (3L, ts(5), "a"), (3L, ts(6), "b"))
      .toDF("user_id", "ts", "event_type")
    val r = graft.core.CacheRegistry.scoped {
      EventAnalytics.sequentialPairs(ev, "user_id", "ts", "event_type")
        .collect().map(x => (x.getString(0), x.getString(1)) ->
          ((x.getLong(2), x.getDouble(3)))).toMap
    }
    r.keySet shouldBe Set(("a", "b"), ("b", "a"))
    r(("a", "b")) shouldBe ((2L, 0.666667))
    r(("b", "a")) shouldBe ((1L, 0.333333))
    graft.core.CacheRegistry.drain()
  }

  test("watermarkPlan: micro-batch watermark semantics by hand - first " +
    "batch never late, per-delay drop counts exact") {
    import org.apache.spark.sql.functions._
    // batch 10us. b0 = {ts 100, ts 200} (no watermark), then wm = 200:
    // lateness 150 / 90 / 95 for the three later events
    val d = Seq((100L, 5L), (200L, 8L), (50L, 15L), (110L, 25L),
      (105L, 35L)).toDF("tsus", "arr")
      .withColumn("ts", timestamp_micros(col("tsus")))
    val r = EventAnalytics.watermarkPlan(d, "ts", "arr", 10L,
        Seq(0L, 90L, 100L, 200L))
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._1).toList
    r shouldBe List(
      (0L, 5L, 3L, 0.6, 150L),
      (90L, 5L, 2L, 0.4, 150L),
      (100L, 5L, 1L, 0.2, 150L),
      (200L, 5L, 0L, 0.0, 150L))
    // perfectly ordered arrivals: nothing is ever late
    val ordered = Seq((100L, 1L), (200L, 2L), (300L, 3L))
      .toDF("tsus", "arr").withColumn("ts", timestamp_micros(col("tsus")))
    EventAnalytics.watermarkPlan(ordered, "ts", "arr", 1L, Seq(0L))
      .as[(Long, Long, Long, Double, Long)].head() shouldBe
      ((0L, 3L, 0L, 0.0, 0L))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.watermarkPlan(d, "ts", "arr", 0L, Seq(0L))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.watermarkPlan(d, "ts", "arr", 10L, Seq(-1L))
  }

  test("holtForecast: hand-traced level/trend recurrence with a " +
    "zero-filled gap day; single-day key yields null trend/forecast") {
    import java.sql.Timestamp
    // k daily series [10, 12, 0(gap), 20], alpha .5 beta .3:
    // init (12, 2); t3: l=7, b=-0.1; t4: l=13.45, b=1.865
    def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")
    val d = Seq(
      ("k", ts("2024-01-01"), 4.0), ("k", ts("2024-01-01"), 6.0),
      ("k", ts("2024-01-02"), 12.0), ("k", ts("2024-01-04"), 20.0),
      ("s", ts("2024-01-05"), 5.0))
      .toDF("key", "ts", "v")
    val r = EventAnalytics.holtForecast(d, "key", "ts", "v", 0.5, 0.3, 2)
      .as[(String, Int, Double, Option[Double], Int, Option[Double])]
      .collect().map(x => (x._1, x._5) -> x).toMap
    r(("k", 1)) shouldBe (("k", 4, 13.45, Some(1.865), 1, Some(15.315)))
    r(("k", 2)) shouldBe (("k", 4, 13.45, Some(1.865), 2, Some(17.18)))
    r(("s", 1)) shouldBe (("s", 1, 5.0, None, 1, None))
    r(("s", 2)) shouldBe (("s", 1, 5.0, None, 2, None))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.holtForecast(d, "key", "ts", "v", 0.0, 0.3, 2)
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.holtForecast(d, "key", "ts", "v", 0.5, 0.3, 0)
  }

  test("overdispersionTest: zero-filled daily counts by hand; bursty key " +
    "flags, Poisson-ish key does not, single day yields nulls") {
    import java.sql.Timestamp
    def ts(day: String) = Timestamp.valueOf(s"2024-01-$day 10:00:00")
    // k: [4, 0, 2] -> mean 2, var 4, D 2, z = 1.0 (not over)
    // b: [5, 0, 0, 0, 1] -> var 4.7, D = 4.7/1.2, z > 1.645
    val rows = Seq.fill(4)(("k", ts("01"))) ++ Seq.fill(2)(("k", ts("03"))) ++
      Seq.fill(5)(("b", ts("01"))) ++ Seq(("b", ts("05"))) ++
      Seq.fill(3)(("s", ts("07")))
    val d = rows.toDF("key", "ts")
    val r = EventAnalytics.overdispersionTest(d, "key", "ts")
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double], Boolean)].collect().map(x => x._1 -> x).toMap
    r("k") shouldBe (("k", 3L, 2.0, Some(4.0), Some(2.0), Some(1.0), false))
    val disp = 4.7 / 1.2
    val zb = (disp - 1.0) * math.sqrt((5.0 - 1.0) / 2.0)
    r("b") shouldBe (("b", 5L, 1.2, Some(4.7), Some(round6(disp)),
      Some(round6(zb)), true))
    r("s") shouldBe (("s", 1L, 3.0, None, None, None, false))
  }

  test("dailyAutocorrelation: alternating series by hand - negative r1, " +
    "positive r2; short-series and constant-series nulls") {
    import java.sql.Timestamp
    def ts(day: String) = Timestamp.valueOf(s"2024-01-$day 10:00:00")
    // k: [1,2,1,2,1]: acf1 = -0.8, acf2 = 0.68/1.2, lag 4 too long
    val rows = Seq(("k", "01", 1), ("k", "02", 2), ("k", "03", 1),
      ("k", "04", 2), ("k", "05", 1), ("c", "01", 2), ("c", "02", 2))
      .flatMap { case (k, day, n) => Seq.fill(n)((k, ts(day))) }
    val d = rows.toDF("key", "ts")
    val r = EventAnalytics.dailyAutocorrelation(d, "key", "ts", Seq(1, 2, 4))
      .as[(String, Int, Long, Option[Double])]
      .collect().map(x => (x._1, x._2) -> x).toMap
    r(("k", 1)) shouldBe (("k", 1, 5L, Some(-0.8)))
    r(("k", 2)) shouldBe (("k", 2, 5L, Some(round6(0.68 / 1.2))))
    r(("k", 4)) shouldBe (("k", 4, 5L, None)) // needs lag+2 days
    r(("c", 1))._4 shouldBe None // zero variance
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.dailyAutocorrelation(d, "key", "ts", Seq(0))
  }

  test("markovAttribution: hand-solved two-channel chain — removal " +
    "effects, equal shares, credited conversions, direct START->CONV") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 10:$i%02d:00")
    // u1 view->purchase, u2 view->nothing, u3 click->purchase,
    // u4 purchase with no touches (START->CONV direct)
    val ev = Seq(
      (1L, ts(1), 101L, "view"), (1L, ts(2), 102L, "purchase"),
      (2L, ts(1), 201L, "view"),
      (3L, ts(1), 301L, "click"), (3L, ts(2), 302L, "purchase"),
      (4L, ts(1), 401L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = EventAnalytics.markovAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("view", "click"), 12)
      .collect().map(x => x.getAs[String]("channel") ->
        ((x.getAs[Double]("removal_effect"), x.getAs[Double]("share"),
          x.getAs[Double]("credited_conversions"),
          x.getAs[Double]("base_conv_prob")))).toMap
    // P(S->v)=.5 P(S->c)=.25 P(S->CONV)=.25, p(v)=.5, p(c)=1
    // base p(START)=.75; remove either channel -> .5 -> effect .25 each
    r("view") shouldBe ((0.25, 0.5, 1.5, 0.75))
    r("click") shouldBe ((0.25, 0.5, 1.5, 0.75))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.markovAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq.empty, 12)
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.markovAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view", "purchase"), 12)
  }

  test("seasonalDecompose: a flat series decomposes to trend=total, " +
    "zero seasonal/residual, no anomalies; a mid-series spike is flagged") {
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-$i%02d 12:00:00")
    val flat = (1 to 14).map(i => (day(i), 10.0)).toDF("ts", "value")
    val rf = EventAnalytics.seasonalDecompose(flat, "ts", "value")
      .collect().map(x => (x.getAs[Double]("total"),
        x.getAs[Double]("trend"), x.getAs[Double]("seasonal"),
        x.getAs[Double]("residual"), x.getAs[Boolean]("anomaly")))
    rf.length shouldBe 14
    rf.foreach(_ shouldBe ((10.0, 10.0, 0.0, 0.0, false)))
    val spiked = (1 to 21).map(i =>
      (day(i), if (i == 11) 1000.0 else 10.0)).toDF("ts", "value")
    val rs = EventAnalytics.seasonalDecompose(spiked, "ts", "value")
      .collect().map(x => x.getAs[java.sql.Date]("day").toString ->
        x.getAs[Boolean]("anomaly")).toMap
    rs("2024-03-11") shouldBe true
    rs.values.count(identity) should be <= 7
    // calendar gap: day 8 has no events -> densified to a zero-filled row
    // (without it the centered window silently widens across the gap)
    val gapped = (1 to 14).filter(_ != 8)
      .map(i => (day(i), 10.0)).toDF("ts", "value")
    val rg = EventAnalytics.seasonalDecompose(gapped, "ts", "value")
      .collect().map(x => x.getAs[java.sql.Date]("day").toString ->
        x.getAs[Double]("total")).toMap
    rg.size shouldBe 14
    rg("2024-03-08") shouldBe 0.0
    rg("2024-03-07") shouldBe 10.0
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.seasonalDecompose(flat, "ts", "value", 0.0)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
