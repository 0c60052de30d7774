package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Quality.Rule("positive", $"v" > 0),
    Quality.Rule("named", $"name".isNotNull))

  private def df = Seq(
    (1, Some(5), Some("a")), // clean
    (2, Some(-1), Some("b")), // fails positive
    (3, None: Option[Int], None: Option[String]), // fails both (nulls violate)
    (4, Some(7), None) // fails named
  ).toDF("id", "v", "name")

  test("auditCounts: one row, per-rule violation counts; nulls violate") {
    val r = Quality.auditCounts(df, rules)
      .as[(Long, Long, Long)].head()
    r shouldBe ((4L, 2L, 2L)) // total, viol_positive, viol_named
  }

  test("withViolations tags each row; split partitions losslessly") {
    val tagged = Quality.withViolations(df, rules)
      .select($"id", $"failed_rules").as[(Int, Seq[String])].collect().toMap
    tagged shouldBe Map(
      1 -> Seq(), 2 -> Seq("positive"), 3 -> Seq("positive", "named"),
      4 -> Seq("named"))
    val (clean, quarantined) = Quality.split(df, rules)
    clean.select("id").as[Int].collect().toSeq shouldBe Seq(1)
    quarantined.count() + clean.count() shouldBe df.count()
  }

  test("SQL CHECK semantics are opt-in: null passes when the rule says so") {
    val sqlStyle = Seq(Quality.Rule("check", $"v".isNull || $"v" > 0))
    Quality.auditCounts(df, sqlStyle).select("viol_check").as[Long]
      .head() shouldBe 1L // only v = -1; nulls pass
  }

  test("columnProfile: counts, nulls, exact distincts; non-numeric ranges null; unknown column throws") {
    val d = Seq(
      (Some(1), Some("a")), (Some(1), Some("b")), (Some(3), None),
      (None: Option[Int], Some("a"))
    ).toDF("num", "str")
    val got = Quality.columnProfile(d, Seq("num", "str")).collect()
      .map(r => r.getString(0) -> r).toMap
    got("num").getLong(1) shouldBe 4L          // n_rows
    got("num").getLong(2) shouldBe 1L          // n_null
    got("num").getLong(3) shouldBe 2L          // distinct {1, 3}
    got("num").getDouble(4) shouldBe 1.0
    got("num").getDouble(5) shouldBe 3.0
    got("str").getLong(2) shouldBe 1L
    got("str").getLong(3) shouldBe 2L
    got("str").isNullAt(4) shouldBe true       // non-numeric: no range
    an[IllegalArgumentException] should be thrownBy
      Quality.columnProfile(d, Seq("nope"))
  }

  test("momentProfile matches brute-force central moments; degenerate groups null out") {
    val vals = Map(
      "a" -> Seq(1.0, 2.0, 3.0, 4.0, 10.0), // right-skewed
      "b" -> Seq(5.0, 5.0, 5.0),            // zero variance -> null g1/g2
      "c" -> Seq(2.5))                      // single row -> variance 0
    val df = vals.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }.toDF("g", "v")
    val got = Quality.momentProfile(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    def brute(vs: Seq[Double]): (Double, Double, Double, Double) = {
      val n = vs.size.toDouble
      val m = vs.sum / n
      val m2 = vs.map(x => math.pow(x - m, 2)).sum / n
      val m3 = vs.map(x => math.pow(x - m, 3)).sum / n
      val m4 = vs.map(x => math.pow(x - m, 4)).sum / n
      (m, m2, m3 / math.pow(m2, 1.5), m4 / (m2 * m2) - 3.0)
    }
    val (am, av, ask, aku) = brute(vals("a"))
    val ra = got("a")
    ra.getLong(1) shouldBe 5L
    ra.getDouble(2) shouldBe am +- 1e-6
    ra.getDouble(3) shouldBe av +- 1e-6
    ra.getDouble(4) shouldBe ask +- 1e-6
    ra.getDouble(5) shouldBe aku +- 1e-6
    ask should be > 0.0 // sanity: the outlier skews right
    got("b").isNullAt(4) shouldBe true
    got("b").isNullAt(5) shouldBe true
    got("b").getDouble(3) shouldBe 0.0
    got("c").getDouble(3) shouldBe 0.0
  }

  test("mergeMoments(momentPartials) equals momentProfile exactly") {
    import org.apache.spark.sql.functions.{col, to_date}
    val ev = graft.core.Tables.table(spark, sf0001, "events")
    val direct = Quality.momentProfile(ev, "event_type", "value").collect().toSet
    // partition by day: partials from disjoint slices, merged back
    val partials = Quality.momentPartials(ev, "event_type", to_date(col("ts")), "value")
    partials.count() should be > partials.select("event_type").distinct().count()
    val merged = Quality.mergeMoments(partials, "event_type").collect().toSet
    merged shouldBe direct // addition-mergeable: EXACT agreement, not approximate
    // partials of partials: re-reduce day rows to month rows by addition,
    // then merge — still the same profile
    import org.apache.spark.sql.functions.sum
    val monthly = partials
      .groupBy(col("event_type"), col("part").cast("string").substr(1, 7).as("part"))
      .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
        sum("s3").as("s3"), sum("s4").as("s4"))
    Quality.mergeMoments(monthly, "event_type").collect().toSet shouldBe direct
  }

  test("curationScorecard: one row per doc, verdict = the documented conjunction, " +
    "components agree with their standalone operators") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val sc = Quality.curationScorecard(docs, "doc_id", "text", 40, 0.99, 0.9)
    sc.count() shouldBe docs.count()
    sc.where($"keep" =!= ($"quality" =!= "low"
      && $"distinct_ngram_ratio" >= 0.99 && $"oov_rate" <= 0.9))
      .count() shouldBe 0L
    // thresholds must actually discriminate on the benchmark corpus
    sc.select($"keep").distinct().count() shouldBe 2L
    val tierMismatch = sc.select($"doc_id", $"quality")
      .join(TextStats.qualityFeatures(docs, "doc_id", "text")
        .select($"doc_id", $"quality".as("q2")), "doc_id")
      .where($"quality" =!= $"q2").count()
    tierMismatch shouldBe 0L
    val repMismatch = sc.select($"doc_id", $"distinct_ngram_ratio")
      .join(TextStats.repetitionScore(docs, "doc_id", "text")
        .withColumnRenamed("distinct_ngram_ratio", "r2"), "doc_id")
      .where($"distinct_ngram_ratio" =!= $"r2").count()
    repMismatch shouldBe 0L
  }

  test("kAnonymityAudit: group sizes exact, at_risk below k, NULL is a cohort") {
    val d = Seq(
      (Some("US"), "M"), (Some("US"), "M"), (Some("US"), "M"),
      (Some("US"), "F"), (Some("US"), "F"),
      (None, "M"), (None, "M")
    ).toDF("country", "seg")
    val r = Quality.kAnonymityAudit(d, Seq("country", "seg"), 3L)
      .as[(Option[String], String, Long, Boolean)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    r((Some("US"), "M")) shouldBe ((3L, false))
    r((Some("US"), "F")) shouldBe ((2L, true))
    // NULL quasi-identifier values still form (and expose) a cohort
    r((None, "M")) shouldBe ((2L, true))
    an[IllegalArgumentException] should be thrownBy
      Quality.kAnonymityAudit(d, Seq.empty, 3L)
    an[IllegalArgumentException] should be thrownBy
      Quality.kAnonymityAudit(d, Seq("country"), 1L)
  }

  test("corpusCard: every grain sums to the grand total; shares exact") {
    import org.apache.spark.sql.functions.{col, split}
    val d = Seq(
      ("web", "en", "a b c"),   // 3 tokens
      ("web", "de", "d e"),     // 2
      ("code", "en", "f")       // 1
    ).toDF("source", "lang", "text")
    val card = Quality.corpusCard(d, "source", "lang",
      org.apache.spark.sql.functions.size(split(col("text"), " ")))
      .as[(Option[String], Option[String], Int, Long, Long, Double)]
      .collect().map(r => (r._1, r._2, r._3) -> (r._4, r._5, r._6)).toMap
    graft.core.CacheRegistry.drain()
    // finest grain (lvl 0)
    card((Some("web"), Some("en"), 0)) shouldBe ((1L, 3L, 0.5))
    // one-dim rollups: lvl encodes WHICH dim rolled up (grouping_id bits)
    card((Some("web"), None, 1)) shouldBe ((2L, 5L, round6(5.0 / 6)))
    card((None, Some("en"), 2)) shouldBe ((2L, 4L, round6(4.0 / 6)))
    // grand total (lvl 3): all docs, share exactly 1
    card((None, None, 3)) shouldBe ((3L, 6L, 1.0))
    card.size shouldBe (3 + 2 + 2 + 1) // cells + sources + langs + total
  }

  test("winsorize: clips into the exact quantile range, flags both tails") {
    import spark.implicits._
    // values 1..10: p10 = 1.9, p90 = 9.1 (linear interpolation)
    val d = ((1 to 10).map(i => (i.toLong, Some(i.toDouble))) :+
      (99L, Option.empty[Double])).toDF("id", "value")
    val r = Quality.winsorize(d, "id", "value", 0.10, 0.90)
      .as[(Long, Double, Double, Boolean, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    r.size shouldBe 10 // the null row is excluded
    r(1L) shouldBe ((1L, 1.0, 1.9, true, false))
    r(5L) shouldBe ((5L, 5.0, 5.0, false, false))
    r(10L) shouldBe ((10L, 10.0, 9.1, false, true))
    an[IllegalArgumentException] should be thrownBy
      Quality.winsorize(d, "id", "value", 0.9, 0.1)
  }

  test("profileDrift: rates, deltas, ranges per column; empty side rates null") {
    import spark.implicits._
    val a = Seq((Some(1), Some("x")), (Some(3), None), (None, Some("y")),
      (Some(5), Some("x"))).toDF("v", "s")
    val b = Seq((Some(2), Some("z")), (Some(4), Some("z"))).toDF("v", "s")
    val got = Quality.profileDrift(a, b, Seq("v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = got("v")
    (v.getLong(1), v.getLong(2)) shouldBe (4L, 2L)          // n_rows a/b
    (v.getDouble(3), v.getDouble(4)) shouldBe (0.25, 0.0)   // null rates
    v.getDouble(5) shouldBe -0.25                           // delta
    (v.getLong(6), v.getLong(7)) shouldBe (3L, 2L)          // distinct
    (v.getDouble(8), v.getDouble(10)) shouldBe (1.0, 5.0)   // min_a, max_a
    (v.getDouble(9), v.getDouble(11)) shouldBe (2.0, 4.0)   // min_b, max_b
    val s = got("s")
    s.getDouble(3) shouldBe 0.25
    s.isNullAt(8) shouldBe true // string column has no numeric range
    // an empty snapshot yields null rates, not NaN or divide-by-zero
    val empty = Quality.profileDrift(a.where($"v" === 99), b, Seq("v"))
      .collect().head
    empty.isNullAt(3) shouldBe true
    empty.isNullAt(5) shouldBe true
  }

  test("psiDrift: identical snapshots score 0; a shift is positive; empty bins finite") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 11.0, 12.0, 25.0).toDF("v")
    val same = Quality.psiDrift(a, a, "v", 0.0, 30.0, 3).collect()
    same.length shouldBe 3
    same.foreach { r =>
      r.getDouble(5) shouldBe 0.0 // contrib
      r.getDouble(6) shouldBe 0.0 // psi
    }
    // everything moves to the top bin → large positive PSI, no ±∞ from
    // the now-empty bottom bins (add-one smoothing)
    val b = Seq(25.0, 26.0, 27.0, 28.0, 29.0, 29.5).toDF("v")
    val shifted = Quality.psiDrift(a, b, "v", 0.0, 30.0, 3).collect()
    val psi = shifted.head.getDouble(6)
    psi should be > 0.25
    psi.isInfinite shouldBe false
    // out-of-range values clamp into the edge bins
    val clamp = Quality.psiDrift(Seq(-5.0).toDF("v"), Seq(99.0).toDF("v"),
      "v", 0.0, 30.0, 3).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    clamp(0L) shouldBe ((1L, 0L))
    clamp(2L) shouldBe ((0L, 1L))
    an[IllegalArgumentException] should be thrownBy
      Quality.psiDrift(a, b, "v", 10.0, 0.0, 3)
  }

  test("calibrationBins: hand gaps and ECE, clamping, null rules, guard") {
    import spark.implicits._
    // all mass in bin 0: mean score 0.05, observed rate 0.25 → gap 0.2
    val df = Seq((0.05, Some(true)), (0.05, Some(false)),
      (0.05, Some(false)), (0.05, None)).toDF("score", "conv")
    val r = Quality.calibrationBins(df, "score", "conv", 10).collect()
      .map(x => x.getLong(0) -> x).toMap
    r.size shouldBe 10
    r(0L).getLong(1) shouldBe 4L
    r(0L).getDouble(2) shouldBe 0.05 +- 1e-9  // mean_score
    r(0L).getDouble(3) shouldBe 0.25          // null outcome counts false
    r(0L).getDouble(4) shouldBe 0.2 +- 1e-9   // gap
    r(0L).getDouble(5) shouldBe 0.2 +- 1e-9   // ECE: only bin 0 has mass
    r(5L).getLong(1) shouldBe 0L              // empty bins kept
    r(5L).isNullAt(2) shouldBe true
    // clamping: 1.0 and out-of-range scores land in the edge bins
    val edges = Quality.calibrationBins(
      Seq((1.0, true), (1.7, true), (-0.2, false)).toDF("score", "conv"),
      "score", "conv", 10).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    edges(9L) shouldBe 2L
    edges(0L) shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      Quality.calibrationBins(df, "score", "conv", 0)
  }

  test("rocAuc: hand tie-corrected value, perfect/inverted/degenerate laws") {
    import spark.implicits._
    // g: positives {3, 2}, negatives {1, 2} → AUC = (1·1.5 + 1·2)/4
    val g = Seq(("g", 3.0, true), ("g", 2.0, true), ("g", 1.0, false),
      ("g", 2.0, false),
      // p: perfect separation; r: inverted; d: no negatives
      ("p", 9.0, true), ("p", 1.0, false),
      ("r", 1.0, true), ("r", 9.0, false),
      ("d", 5.0, true), ("d", 6.0, true)).toDF("grp", "score", "lbl")
    val r = Quality.rocAuc(g, "grp", "score", "lbl").collect()
      .map(x => x.getString(0) -> x).toMap
    r("g").getDouble(3) shouldBe 0.875
    (r("g").getLong(1), r("g").getLong(2)) shouldBe (2L, 2L)
    r("p").getDouble(3) shouldBe 1.0
    r("r").getDouble(3) shouldBe 0.0
    r("d").isNullAt(3) shouldBe true
    // null labels are negatives, null scores excluded
    val n = Quality.rocAuc(Seq(("n", Some(2.0), Some(true)),
        ("n", Some(1.0), None), ("n", None, Some(false)))
        .toDF("grp", "score", "lbl"), "grp", "score", "lbl").collect().head
    (n.getLong(1), n.getLong(2), n.getDouble(3)) shouldBe (1L, 1L, 1.0)
  }

  test("classificationReport: hand confusion block; unpredicted and phantom " +
    "classes; nulls form a class") {
    import spark.implicits._
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: 3 true, tp 2
      ("b", "a"), ("b", "b"),             // b: 2 true, tp 1; pred a gets a fp
      ("c", "a"),                         // c: never predicted → recall 0
      (null: String, null: String)        // null class, perfectly predicted
    ).toDF("lbl", "pred")
    val r = Quality.classificationReport(df, "lbl", "pred").collect()
      .map(x => Option(x.getString(0)) -> x).toMap
    val a = r(Some("a"))
    (a.getLong(1), a.getLong(2), a.getLong(3)) shouldBe (3L, 4L, 2L)
    a.getDouble(4) shouldBe 0.5        // precision 2/4
    a.getDouble(5) shouldBe round6(2.0 / 3)
    val c = r(Some("c"))
    (c.getLong(2), c.getDouble(5)) shouldBe (0L, 0.0)
    c.isNullAt(4) shouldBe true        // precision undefined: never predicted
    c.isNullAt(6) shouldBe true        // f1 undefined too
    val nul = r(None)
    (nul.getLong(3), nul.getDouble(6)) shouldBe (1L, 1.0)
    graft.core.CacheRegistry.drain()
  }

  test("psiTimeline: baseline day scores 0; a shifted day scores positive") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val df = (Seq.fill(20)(1.0) ++ Seq.fill(20)(25.0)).zipWithIndex.map {
      case (v, i) => (ts(1 + i / 20), v) // day 1 all low, day 2 all high
    }.toDF("ts", "v")
    val r = Quality.psiTimeline(df, "ts", "v", 0.0, 30.0, 3).collect()
      .map(x => x.getDate(0).toString -> (x.getLong(1), x.getDouble(2))).toMap
    r("2024-01-01") shouldBe ((20L, 0.0))
    r("2024-01-02")._2 should be > 0.25
    an[IllegalArgumentException] should be thrownBy
      Quality.psiTimeline(df, "ts", "v", 5.0, 1.0, 3)
    graft.core.CacheRegistry.drain()
  }

  test("bootstrapMeanCi: CI brackets the sample mean, partitioning-invariant") {
    val df = (1 to 400).map(i => ("g", i.toLong, (i % 50).toDouble))
      .toDF("grp", "id", "v")
    def run(parts: Int) = Quality.bootstrapMeanCi(
      df.repartition(parts), "grp", "id", "v", 50, 0.05)
      .as[(String, Long, Double, Double, Double)].head()
    val r1 = run(1)
    graft.core.CacheRegistry.drain()
    val (_, n, mean, lo, hi) = r1
    n shouldBe 400L
    lo should be < mean
    hi should be > mean
    // the interval is not degenerate and not absurdly wide for n=400
    (hi - lo) should be > 0.0
    (hi - lo) should be < 10.0
    // md5-derived draws: identical result under any partitioning
    run(7) shouldBe r1
    graft.core.CacheRegistry.drain()
    an[IllegalArgumentException] should be thrownBy
      Quality.bootstrapMeanCi(df, "grp", "id", "v", 1, 0.05)
  }

  test("welchAbTest: hand-computed interval, missing-variant and tiny-side guards") {
    // a: {10, 12, 14}  b: {20, 22, 24} -> diff 10, clearly significant
    val rows = Seq(("g", "a", 10.0), ("g", "a", 12.0), ("g", "a", 14.0),
      ("g", "b", 20.0), ("g", "b", 22.0), ("g", "b", 24.0),
      ("solo", "a", 1.0), ("solo", "a", 2.0), // variant b missing
      ("tiny", "a", 1.0), ("tiny", "b", 2.0)) // n < 2 per side
    val r = Quality.welchAbTest(rows.toDF("grp", "var", "v"), "grp", "var", "v",
      "a", "b").collect().map(x => x.getString(0) -> x).toMap
    val g = r("g")
    g.getLong(1) shouldBe 3L
    g.getLong(2) shouldBe 3L
    g.getDouble(3) shouldBe 12.0
    g.getDouble(4) shouldBe 22.0
    g.getDouble(5) shouldBe 10.0
    // se = sqrt(4/3 + 4/3); z-interval around 10
    val se = math.sqrt(8.0 / 3.0)
    g.getDouble(6) shouldBe round6(10.0 - 1.959963984540054 * se)
    g.getDouble(7) shouldBe round6(10.0 + 1.959963984540054 * se)
    g.getBoolean(8) shouldBe true
    // missing variant b: null CI, not significant
    r("solo").isNullAt(6) shouldBe true
    r("solo").getBoolean(8) shouldBe false
    // one row per side: variance undefined -> null CI, not significant
    r("tiny").isNullAt(6) shouldBe true
    r("tiny").getBoolean(8) shouldBe false
  }

  test("targetEncoding: hand LOO values, null exclusion, singleton guard") {
    // key k1: values 10, 20, 30 (global prior over all = 18)
    // key k2: value 12 only; one null-target row excluded everywhere
    val rows = Seq((1L, "k1", Some(10.0)), (2L, "k1", Some(20.0)),
      (3L, "k1", Some(30.0)), (4L, "k2", Some(12.0)),
      (5L, "k1", None: Option[Double]))
    val df = rows.toDF("id", "k", "v")
    // m = 0: pure leave-one-out
    val loo = Quality.targetEncoding(df, "k", "id", "v", 0.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    loo(1L).getDouble(3) shouldBe 25.0 // (20+30)/2
    loo(2L).getDouble(3) shouldBe 20.0 // (10+30)/2
    loo(3L).getDouble(3) shouldBe 15.0 // (10+20)/2
    loo(4L).isNullAt(3) shouldBe true // singleton, m=0 -> 0/0 guarded null
    loo.contains(5L) shouldBe false // null target dropped, not encoded
    // m = 2: shrunk toward prior 18; k2's singleton now defined
    val sm = Quality.targetEncoding(df, "k", "id", "v", 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    sm(1L) shouldBe round6((50.0 + 2 * 18.0) / 4.0)
    sm(4L) shouldBe round6((0.0 + 2 * 18.0) / 2.0)
    // leakage law (m = 0): changing a row's own target leaves ITS
    // encoding unchanged — the property that makes the feature safe
    val bumped = Seq((1L, "k1", Some(999.0)), (2L, "k1", Some(20.0)),
      (3L, "k1", Some(30.0))).toDF("id", "k", "v")
    Quality.targetEncoding(bumped, "k", "id", "v", 0.0)
      .where($"id" === 1L).select("te").as[Double].head() shouldBe 25.0
    an[IllegalArgumentException] should be thrownBy
      Quality.targetEncoding(df, "k", "id", "v", -1.0)
  }

  test("correlationMatrix: known correlations, listwise filter, degenerate null") {
    // y = 2x exactly -> corr 1; z = -x -> corr -1 with x; w constant -> null
    val rows = Seq(
      (1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0))
    val df = rows.toDF("x", "y", "z", "w")
    val m = Quality.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    m.size shouldBe 6
    m(("x", "y")).getLong(2) shouldBe 4L
    m(("x", "y")).getDouble(3) shouldBe 1.0
    m(("x", "z")).getDouble(3) shouldBe -1.0
    m(("y", "z")).getDouble(3) shouldBe -1.0
    m(("x", "w")).isNullAt(3) shouldBe true // zero variance -> null
    // a null in any column drops the whole row (listwise): n shrinks
    val withNull = (rows :+ ((5.0, 10.0, -5.0, Double.NaN))).toDF("x", "y", "z", "w")
      .withColumn("w", when(isnan($"w"), lit(null)).otherwise($"w"))
    Quality.correlationMatrix(withNull, Seq("x", "y", "w"))
      .select("n_rows").distinct().as[Long].head() shouldBe 4L
    an[IllegalArgumentException] should be thrownBy
      Quality.correlationMatrix(df, Seq("x"))
  }

  test("dpNoisedCounts: deterministic Laplace, correct magnitude, eps scales") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    val r1 = Quality.dpNoisedCounts(df, Seq("g"), 1.0)
      .orderBy("g").collect()
    val r2 = Quality.dpNoisedCounts(df, Seq("g"), 1.0)
      .orderBy("g").collect()
    r1 shouldBe r2 // replay-stable: no fresh noise per run
    r1.map(_.getString(0)) shouldBe Array("a", "b")
    r1.map(_.getLong(1)) shouldBe Array(2L, 1L)
    // noise at eps=4 is exactly 1/4 of the noise at eps=1 (same u)
    val n1 = r1.map(r => r.getDouble(2) - r.getLong(1))
    val n4 = Quality.dpNoisedCounts(df, Seq("g"), 4.0).orderBy("g")
      .collect().map(r => r.getDouble(2) - r.getLong(1))
    n1.zip(n4).foreach { case (a, b) =>
      round6(a) shouldBe round6(b * 4.0) +- 2e-6 }
    // null group value forms its own group
    val withNull = Seq((Some("a"), 1L), (None, 2L), (None, 3L))
      .toDF("g", "id")
    Quality.dpNoisedCounts(withNull, Seq("g"), 1.0).count() shouldBe 2L
    an[IllegalArgumentException] should be thrownBy
      Quality.dpNoisedCounts(df, Seq("g"), 0.0)
    an[IllegalArgumentException] should be thrownBy
      Quality.dpNoisedCounts(df, Seq.empty, 1.0)
  }

  test("woeIv: hand-checked WOE/IV, null label excluded, null category kept") {
    // cat A: 3 pos 1 neg; cat B: 1 pos 3 neg; pt=4 nt=4 C=2
    val df = Seq(
      ("A", 1), ("A", 1), ("A", 1), ("A", 0),
      ("B", 1), ("B", 0), ("B", 0), ("B", 0)).toDF("cat", "y")
    val m = Quality.woeIv(df, "cat", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val spA = 3.5 / 5.0; val snA = 1.5 / 5.0
    m("A").getLong(1) shouldBe 4L
    m("A").getLong(2) shouldBe 3L
    m("A").getLong(3) shouldBe 1L
    m("A").getDouble(4) shouldBe round6(math.log(spA / snA))
    m("A").getDouble(5) shouldBe round6((spA - snA) * math.log(spA / snA))
    // symmetric construction: B mirrors A, IV total = 2x A's contribution
    m("B").getDouble(4) shouldBe -m("A").getDouble(4)
    m("A").getDouble(6) shouldBe round6(2 * m("A").getDouble(5)) +- 2e-6
    // null label rows are excluded; null category is its own row
    val mixed = Seq((Some("A"), Some(1)), (None, Some(0)),
      (Some("A"), None)).toDF("cat", "y")
    val rows = Quality.woeIv(mixed, "cat", "y").collect()
    rows.length shouldBe 2
    rows.map(r => Option(r.getString(0)) -> r.getLong(1)).toMap shouldBe
      Map(Some("A") -> 1L, None -> 1L)
    graft.core.CacheRegistry.drain()
  }

  test("categoricalMI: independent -> 0, determined -> U = 1, nulls " +
    "form their own cohort") {
    val ind = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2),
      ("x", 1), ("x", 2), ("y", 1), ("y", 2)).toDF("a", "b")
    val ri = graft.core.CacheRegistry.scoped {
      Quality.categoricalMI(ind, "a", "b").head()
    }
    ri.getDouble(5) shouldBe 0.0 // mi
    ri.getDouble(6) shouldBe 0.0 // u_a_given_b
    val dep = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2)).toDF("a", "b")
    val rd = graft.core.CacheRegistry.scoped {
      Quality.categoricalMI(dep, "a", "b").head()
    }
    rd.getDouble(5) shouldBe rd.getDouble(3) // mi == h_a (determined)
    rd.getDouble(6) shouldBe 1.0
    rd.getDouble(7) shouldBe 1.0
    val withNull = Seq((Some("x"), 1), (None, 2), (None, 2))
      .toDF("a", "b")
    val rn = graft.core.CacheRegistry.scoped {
      Quality.categoricalMI(withNull, "a", "b").head()
    }
    rn.getLong(1) shouldBe 2L // null is a category of A
    rn.getDouble(6) shouldBe 1.0 // A determines B here
    graft.core.CacheRegistry.drain()
  }

  test("cohensKappa: hand contingency, constant raters -> null, " +
    "null ratings excluded") {
    val df = Seq(("A", "A"), ("A", "B"), ("B", "B"), ("B", "B"))
      .toDF("r1", "r2")
    val r = graft.core.CacheRegistry.scoped {
      Quality.cohensKappa(df, "r1", "r2").head()
    }
    // n=4 agree=3 po=.75; marginals (2,2)x(1,3) -> chance=8, pe=.5
    r.getLong(0) shouldBe 4L
    r.getDouble(1) shouldBe 0.75
    r.getDouble(2) shouldBe 0.5
    r.getDouble(3) shouldBe 0.5
    val const = Seq(("A", "A"), ("A", "A")).toDF("r1", "r2")
    val rc = graft.core.CacheRegistry.scoped {
      Quality.cohensKappa(const, "r1", "r2").head()
    }
    rc.getDouble(1) shouldBe 1.0
    rc.isNullAt(3) shouldBe true // pe = 1: agreement is vacuous
    val withNull = Seq(("A", Some("A")), ("B", None)).toDF("r1", "r2")
    graft.core.CacheRegistry.scoped {
      Quality.cohensKappa(withNull, "r1", "r2").head().getLong(0) shouldBe 1L
    }
    graft.core.CacheRegistry.drain()
  }

  test("gainsTable: exact rank-div buckets, hand-computed capture and lift") {
    val df = (1L to 10L).map(i =>
      (i, (11 - i).toDouble, i <= 3 || i == 10)) // top-3 scores + the worst
      .toDF("id", "score", "y")
    val r = graft.core.CacheRegistry.scoped {
      Quality.gainsTable(df, "id", "score", "y", 2)
        .orderBy("bucket").collect()
    }
    r.length shouldBe 2
    r(0).getLong(1) shouldBe 5L // n
    r(0).getLong(2) shouldBe 3L // n_pos in the top half
    r(0).getDouble(3) shouldBe 0.6
    r(0).getDouble(4) shouldBe 0.75 // 3 of 4 positives captured
    r(0).getDouble(5) shouldBe 1.5  // (3*10)/(5*4)
    r(1).getDouble(4) shouldBe 1.0
    r(1).getDouble(5) shouldBe 0.5
    an[IllegalArgumentException] should be thrownBy
      Quality.gainsTable(df, "id", "score", "y", 1)
    graft.core.CacheRegistry.drain()
  }

  test("benfordAudit: leading SIGNIFICANT digit (sub-unit values " +
    "included), nulls and non-positives dropped, hand-computed shares") {
    // 0.25 contributes digit 2 - the first [1-9], not the character '0'
    val df = Seq(Some(1.5), Some(19.9), Some(12.0), Some(0.25), Some(900.0),
      Some(-5.0), Some(0.0), None).toDF("v")
    val r = Quality.benfordAudit(df, "v").collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    r.keySet shouldBe Set("1", "2", "9")
    r("1") shouldBe ((3L, 0.6, round6(math.log(2.0) / math.log(10.0))))
    r("2")._1 shouldBe 1L
    r("2")._2 shouldBe 0.2
    r("9")._3 shouldBe round6(math.log(1.0 + 1.0 / 9.0) / math.log(10.0))
  }

  test("passAtK: unbiased combinatorial estimator, short tasks excluded " +
    "per k, empty k reports zero tasks") {
    // A: n=3 c=1 -> pass@1 = 1/3, pass@2 = 2/3
    // B: n=2 c=0 -> 0, 0; C: n=1 c=1 -> pass@1 = 1, excluded at k=2
    val df = Seq(("A", true), ("A", false), ("A", false),
      ("B", false), ("B", false), ("C", true)).toDF("task", "ok")
    val r = graft.core.CacheRegistry.scoped {
      Quality.passAtK(df, "task", "ok", Seq(1, 2, 4))
        .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toList
    }
    r shouldBe List(
      (1, 3L, Some(round6(4.0 / 9.0))),
      (2, 2L, Some(round6(1.0 / 3.0))),
      (4, 0L, None))
    an[IllegalArgumentException] should be thrownBy
      Quality.passAtK(df, "task", "ok", Seq(0))
    graft.core.CacheRegistry.drain()
  }

  test("fleissKappa: exact-integer reduction, off-size items and null " +
    "ratings dropped, degenerate panel yields null kappa") {
    // kept items (n=3): (a,a,a) (a,a,b) (b,b,b) ->
    // p_bar = 7/9, p_e = 41/81, kappa = 22/40 = 0.55
    val ratings = Seq(
      ("i1", Some("a")), ("i1", Some("a")), ("i1", Some("a")),
      ("i2", Some("a")), ("i2", Some("a")), ("i2", Some("b")),
      ("i3", Some("b")), ("i3", Some("b")), ("i3", Some("b")),
      ("i4", Some("a")), ("i4", None), ("i4", Some("a")), // null -> size 2
      ("i5", Some("a")), ("i5", Some("a"))) // size 2 -> dropped
      .toDF("item", "cat")
    val r = graft.core.CacheRegistry.scoped {
      Quality.fleissKappa(ratings, "item", "cat", 3)
        .as[(Long, Int, Double, Double, Option[Double])].collect().toList
    }
    r shouldBe List((3L, 3, round6(7.0 / 9.0), round6(41.0 / 81.0),
      Some(0.55)))
    // every rating one category: p_e = 1 -> kappa null, not NaN
    val flat = Seq(("i1", "x"), ("i1", "x"), ("i1", "x")).toDF("item", "cat")
    val d = graft.core.CacheRegistry.scoped {
      Quality.fleissKappa(flat, "item", "cat", 3)
        .as[(Long, Int, Double, Double, Option[Double])].collect().toList
    }
    d shouldBe List((1L, 3, 1.0, 1.0, None))
    an[IllegalArgumentException] should be thrownBy
      Quality.fleissKappa(flat, "item", "cat", 1)
    graft.core.CacheRegistry.drain()
  }

  test("krippendorffAlpha: coincidence-matrix hand example, unpairable " +
    "and null ratings dropped, degenerate pool yields null alpha") {
    // pairable items: i1 (a,a) d=0; i2 (a,b) d=2; i3 (b,b,b) d=0
    // n=7, O=2, n_a=3 n_b=4 -> den = 49-25 = 24
    // d_o = 2/7, d_e = 24/42 = 4/7, alpha = 1 - 2*6/24 = 0.5
    val ratings = Seq(
      ("i1", Some("a")), ("i1", Some("a")),
      ("i2", Some("a")), ("i2", Some("b")),
      ("i3", Some("b")), ("i3", Some("b")), ("i3", Some("b")),
      ("i4", Some("a")), // single rating -> unpairable, dropped
      ("i5", Some("a")), ("i5", None)) // null drops -> i5 unpairable
      .toDF("item", "cat")
    val r = graft.core.CacheRegistry.scoped {
      Quality.krippendorffAlpha(ratings, "item", "cat")
        .as[(Long, Long, Double, Double, Option[Double])].collect().toList
    }
    r shouldBe List((3L, 7L, round6(2.0 / 7.0), round6(4.0 / 7.0),
      Some(0.5)))
    // every pairable rating one category: expected disagreement 0 -> null
    val flat = Seq(("i1", "x"), ("i1", "x"), ("i2", "x"), ("i2", "x"))
      .toDF("item", "cat")
    val d = graft.core.CacheRegistry.scoped {
      Quality.krippendorffAlpha(flat, "item", "cat")
        .as[(Long, Long, Double, Double, Option[Double])].collect().toList
    }
    d shouldBe List((2L, 4L, 0.0, 0.0, None))
    graft.core.CacheRegistry.drain()
  }

  test("brierDecomposition: Murphy identity exact for bin-constant " +
    "forecasts; residual is the within-bin forecast variance") {
    // nBins=2; bin 0 = {0.2 x2}, bin 1 = {0.8 x2} (bin-constant)
    // brier = 0.76/4 = 0.19; rel = (0.18+0.08)/4 = 0.065
    // res = (0.125+0.125)/4 = 0.0625; unc = 0.75*0.25 = 0.1875
    val d1 = Seq((0.2, false), (0.2, true), (0.8, true), (0.8, true))
      .toDF("score", "label")
    val r1 = graft.core.CacheRegistry.scoped {
      Quality.brierDecomposition(d1, "score", "label", 2)
        .as[(Long, Double, Double, Double, Double, Double)].head()
    }
    r1 shouldBe ((4L, 0.19, 0.065, 0.0625, 0.1875, 0.0))
    // varying forecasts inside one bin: residual = within-bin var of f
    // brier = 0.05; rel = (0.4-0)^2/2/2 = 0.04; res = unc = 0
    val d2 = Seq((0.1, false), (0.3, false)).toDF("score", "label")
    val r2 = graft.core.CacheRegistry.scoped {
      Quality.brierDecomposition(d2, "score", "label", 2)
        .as[(Long, Double, Double, Double, Double, Double)].head()
    }
    r2 shouldBe ((2L, 0.05, 0.04, 0.0, 0.0, 0.01))
    an[IllegalArgumentException] should be thrownBy
      Quality.brierDecomposition(d1, "score", "label", 1)
    graft.core.CacheRegistry.drain()
  }

  test("mannWhitneyU: tie-averaged ranks, tie-corrected sigma, Cliff's " +
    "delta; all-tied group yields null z; missing cohort yields nulls") {
    // a = {1,2,2}, b = {2,3}: R_a = 1+3+3 = 7, U = 1, ties T = 24,
    // sigma2 = 6/12*(6 - 24/20) = 2.4, z = -2/sqrt(2.4) = -1.290994
    val d = Seq(
      ("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 2.0),
      ("g", "b", 2.0), ("g", "b", 3.0),
      ("t", "a", 5.0), ("t", "a", 5.0), ("t", "b", 5.0), // all tied
      ("m", "a", 1.0), ("m", "a", 2.0)) // missing cohort b
      .toDF("grp", "variant", "v")
    val r = Quality.mannWhitneyU(d, "grp", "variant", "v", "a", "b")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Boolean)].collect().map(x => x._1 -> x).toMap
    r("g") shouldBe (("g", 3L, 2L, Some(1.0), Some(-1.290994),
      Some(-0.666667), false))
    r("t") shouldBe (("t", 2L, 1L, Some(1.0), None, Some(0.0), false))
    r("m") shouldBe (("m", 2L, 0L, None, None, None, false))
  }

  test("ecdfDistance: KS max gap and Wasserstein-1 area from one grid") {
    // a = {1,2}, b = {2,4}: D = 0.5, W1 = 1*0.5 + 2*0.5 = 1.5
    val d = Seq(
      ("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 2.0), ("g", "b", 4.0),
      ("i", "a", 3.0), ("i", "a", 7.0), ("i", "b", 3.0), ("i", "b", 7.0),
      ("m", "b", 1.0)) // identical cohorts in i; missing cohort in m
      .toDF("grp", "variant", "v")
    val r = Quality.ecdfDistance(d, "grp", "variant", "v", "a", "b")
      .as[(String, Long, Long, Option[Double], Option[Double], Boolean,
        Option[Double])].collect().map(x => x._1 -> x).toMap
    r("g") shouldBe (("g", 2L, 2L, Some(0.5), Some(0.5), false, Some(1.5)))
    r("i") shouldBe (("i", 2L, 2L, Some(0.0), Some(0.0), false, Some(0.0)))
    r("m") shouldBe (("m", 0L, 1L, None, None, false, None))
  }

  test("averagePrecision: step integral over distinct-score thresholds, " +
    "tie-exact; no positives yields null") {
    // desc blocks: (0.9: 1 pos of 1), (0.8: 1 pos of 2), (0.7: 0 of 1)
    // AP = 1/2 + round6(1/3) = 0.833333
    val d = Seq((0.9, true), (0.8, false), (0.8, true), (0.7, false))
      .toDF("score", "label")
    Quality.averagePrecision(d, "score", "label")
      .as[(Long, Long, Double, Option[Double])].head() shouldBe
      ((4L, 2L, 0.5, Some(0.833333)))
    val neg = Seq((0.9, false), (0.1, false)).toDF("score", "label")
    Quality.averagePrecision(neg, "score", "label")
      .as[(Long, Long, Double, Option[Double])].head() shouldBe
      ((2L, 0L, 0.0, None))
  }

  test("giniIndex: rank-block identity; uniform group scores 0; " +
    "negative or all-zero groups yield null") {
    // g = {1,1,2}: G = 2*9/(3*4) - 4/3 = 0.166667
    val d = Seq(("g", 1.0), ("g", 1.0), ("g", 2.0),
      ("u", 3.0), ("u", 3.0), ("u", 3.0),
      ("neg", 1.0), ("neg", -1.0),
      ("z", 0.0), ("z", 0.0))
      .toDF("grp", "v")
    val r = Quality.giniIndex(d, "grp", "v")
      .as[(String, Long, Double, Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    r("g") shouldBe (("g", 3L, 4.0, Some(0.166667)))
    r("u") shouldBe (("u", 3L, 9.0, Some(0.0)))
    r("neg")._4 shouldBe None
    r("z") shouldBe (("z", 2L, 0.0, None))
  }

  test("mcNemar: discordant counts only; continuity correction clamps " +
    "at 0; no discordants yields null chi2") {
    val d = Seq(("x", "x", "x"), ("x", "x", "y"), ("x", "y", "x"),
      ("x", "y", "y"), ("x", "x", "y"),
      ("x", null, "x")) // null prediction excluded
      .toDF("lab", "pa", "pb")
    // b=2, c=1 -> |b-c|-1 = 0 -> chi2 = 0
    Quality.mcNemar(d, "lab", "pa", "pb")
      .as[(Long, Long, Long, Long, Long, Option[Double], Boolean)]
      .head() shouldBe ((5L, 1L, 2L, 1L, 1L, Some(0.0), false))
    // b=10, c=1 -> chi2 = (|9|-1)^2/11 = 64/11 > 3.841459 -> significant
    val skew = (Seq.fill(10)(("x", "x", "y")) :+ (("x", "y", "x")))
      .toDF("lab", "pa", "pb")
    val r = Quality.mcNemar(skew, "lab", "pa", "pb")
      .as[(Long, Long, Long, Long, Long, Option[Double], Boolean)].head()
    r._3 shouldBe 10L
    r._6 shouldBe Some(round6(64.0 / 11.0))
    r._7 shouldBe true
    // concordant-only input: null chi2, not significant
    val conc = Seq(("x", "x", "x"), ("x", "y", "y")).toDF("lab", "pa", "pb")
    Quality.mcNemar(conc, "lab", "pa", "pb")
      .as[(Long, Long, Long, Long, Long, Option[Double], Boolean)]
      .head() shouldBe ((2L, 1L, 0L, 0L, 1L, None, false))
  }

  test("rocAucDelong: exact placements; perfect separation has zero SE; " +
    "interleaved case matches the hand variance; singleton cohort null SE") {
    val perfect = Seq((0.8, true), (0.6, true), (0.4, false), (0.2, false))
      .toDF("score", "label")
    Quality.rocAucDelong(perfect, "score", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].head() shouldBe
      ((2L, 2L, Some(1.0), Some(0.0), Some(1.0), Some(1.0)))
    // pos {0.8, 0.4}, neg {0.6, 0.2}: placements 1.0/0.5 both sides ->
    // AUC 0.75, var10 = var01 = 0.125, se = sqrt(0.125)
    val mixed = Seq((0.8, true), (0.4, true), (0.6, false), (0.2, false))
      .toDF("score", "label")
    val se = math.sqrt(0.125)
    Quality.rocAucDelong(mixed, "score", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].head() shouldBe
      ((2L, 2L, Some(0.75), Some(round6(se)),
        Some(round6(0.75 - 1.959964 * se)),
        Some(round6(0.75 + 1.959964 * se))))
    // full tie: AUC 0.5 from the half-credit placement; n=1 -> null SE
    val tie = Seq((0.5, true), (0.5, false)).toDF("score", "label")
    Quality.rocAucDelong(tie, "score", "label")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].head() shouldBe
      ((1L, 1L, Some(0.5), None, None, None))
  }

  test("mdePower: hand variances through the planning formula; " +
    "undersized cohort yields null MDEs") {
    // a = {10, 14}: mean 12, var 8; b = {1, 3}: var 2
    // mde = (z_a + z_b) * sqrt(8/2 + 2/2)
    val d = Seq(("g", "a", 10.0), ("g", "a", 14.0),
      ("g", "b", 1.0), ("g", "b", 3.0),
      ("s", "a", 5.0), ("s", "b", 1.0), ("s", "b", 2.0)) // n_a = 1
      .toDF("grp", "variant", "v")
    val mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(5.0)
    val r = Quality.mdePower(d, "grp", "variant", "v", "a", "b")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().map(x => x._1 -> x).toMap
    r("g") shouldBe (("g", 2L, 2L, Some(12.0), Some(round6(mde)),
      Some(round6(mde / 12.0))))
    r("s") shouldBe (("s", 1L, 2L, Some(5.0), None, None))
  }

  test("signTest: exact binomial p; zeros and nulls drop; cap at 1; " +
    "n > 50 yields null p") {
    val rows = Seq(("k1", 2.0), ("k1", 1.0), ("k1", 3.0), ("k1", -1.0),
        ("k1", 0.0),
        ("k4", 1.0), ("k4", -1.0)) ++
      Seq(("k1", Double.NaN)).map(x => (x._1, x._2)) ++ // placeholder
      (1 to 6).map(i => ("k2", 1.0)) ++
      (1 to 51).map(i => ("k3", 1.0))
    val d = rows.toDF("key", "diff")
      .withColumn("diff", when(isnan($"diff"), lit(null)).otherwise($"diff"))
    val r = Quality.signTest(d, "key", "diff")
      .as[(String, Long, Long, Long, Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    // k1: n=4, k=1 -> p = 2*(1+4)/16 = 0.625 (zero and null dropped)
    r("k1") shouldBe (("k1", 4L, 3L, 1L, Some(0.625)))
    // k2: n=6 one-sided sweep, k=0 -> p = 2/64
    r("k2") shouldBe (("k2", 6L, 6L, 0L, Some(0.03125)))
    // k3: n=51 past the exactness bound -> null p
    r("k3") shouldBe (("k3", 51L, 51L, 0L, None))
    // k4: n=2 balanced -> 2*(1+2)/4 = 1.5 capped at 1
    r("k4") shouldBe (("k4", 2L, 1L, 1L, Some(1.0)))
  }

  test("bhFdr: step-up property rejects a non-flagged middle rank; " +
    "null p-values leave the family") {
    // m=4, q=0.05: thresholds r*q/m = .0125/.025/.0375/.05
    // p=.031 fails its own threshold but rank 3 (.032) passes -> all 3 in
    val d = Seq(("a", Some(0.011)), ("b", Some(0.031)), ("c", Some(0.032)),
      ("d", Some(0.9)), ("e", None)).toDF("key", "p")
    val r = Quality.bhFdr(d, "key", "p", 0.05)
      .as[(String, Option[Double], Int, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    r.keySet shouldBe Set("a", "b", "c", "d") // e's null p excluded
    r("a") shouldBe (("a", Some(0.011), 1, true))
    r("b") shouldBe (("b", Some(0.031), 2, true)) // step-up rescue
    r("c") shouldBe (("c", Some(0.032), 3, true))
    r("d") shouldBe (("d", Some(0.9), 4, false))
    // nothing flagged -> empty rejection set, not a null comparison
    val none = Seq(("a", 0.5), ("b", 0.9)).toDF("key", "p")
    Quality.bhFdr(none, "key", "p", 0.05)
      .where(col("rejected")).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Quality.bhFdr(none, "key", "p", 1.5)
  }

  test("twoProportionTest: pooled z and Wilson bounds from exact counts; " +
    "degenerate pool and missing cohort yield nulls") {
    // a: 4/10, b: 8/10 -> pool 0.6, se = sqrt(0.048), z = 0.4/se
    val rows = Seq.fill(4)(("g", "a", true)) ++ Seq.fill(6)(("g", "a", false)) ++
      Seq.fill(8)(("g", "b", true)) ++ Seq.fill(2)(("g", "b", false)) ++
      Seq.fill(3)(("z0", "a", false)) ++ Seq.fill(3)(("z0", "b", false)) ++
      Seq.fill(2)(("m", "a", true))
    val d = rows.toDF("grp", "variant", "ok")
    val r = Quality.twoProportionTest(d, "grp", "variant", "ok", "a", "b")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double], Boolean)]
      .collect().map(x => x._1 -> x).toMap
    val z = 1.959964; val z2 = z * z
    def wilson(x: Double, n: Double): (Double, Double) = {
      val h = z * math.sqrt(x * (n - x) / n + z2 / 4.0)
      (round6(((x + z2 / 2.0) - h) / (n + z2)),
        round6(((x + z2 / 2.0) + h) / (n + z2)))
    }
    val g = r("g")
    (g._2, g._3, g._4, g._5) shouldBe ((10L, 4L, 10L, 8L))
    g._6 shouldBe Some(0.4)
    (g._7.get, g._8.get) shouldBe wilson(4.0, 10.0)
    g._9 shouldBe Some(0.8)
    (g._10.get, g._11.get) shouldBe wilson(8.0, 10.0)
    g._12 shouldBe Some(round6(0.4))
    g._13 shouldBe Some(round6(0.4 / math.sqrt(0.048)))
    g._14 shouldBe false // 1.825742 < 1.959964
    // all-failure pool: rates/CIs defined, z null
    r("z0")._13 shouldBe None
    r("z0")._14 shouldBe false
    // missing cohort b: test columns null
    r("m")._12 shouldBe None
    r("m")._14 shouldBe false
  }

  test("quantileTreatmentEffect: exact order statistics per cohort; " +
    "shifted cohort shows a constant QTE; missing cohort nulls") {
    val d = (Seq(1.0, 2.0, 3.0, 4.0).map(v => ("a", v)) ++
      Seq(11.0, 12.0, 13.0, 14.0).map(v => ("b", v)))
      .toDF("variant", "v")
    val r = Quality.quantileTreatmentEffect(d, "variant", "v", "a", "b",
        Seq(0.25, 0.5, 1.0))
      .as[(Double, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._1).toList
    r shouldBe List(
      (0.25, 4L, 4L, Some(1.0), Some(11.0), Some(10.0)),
      (0.5, 4L, 4L, Some(2.0), Some(12.0), Some(10.0)),
      (1.0, 4L, 4L, Some(4.0), Some(14.0), Some(10.0)))
    val onlyA = d.where(col("variant") === "a")
    Quality.quantileTreatmentEffect(onlyA, "variant", "v", "a", "b",
        Seq(0.5))
      .as[(Double, Long, Long, Option[Double], Option[Double],
        Option[Double])].head() shouldBe
      ((0.5, 4L, 0L, Some(2.0), None, None))
    an[IllegalArgumentException] should be thrownBy
      Quality.quantileTreatmentEffect(d, "variant", "v", "a", "b", Seq(0.0))
  }

  test("trimmedMeanDiff: rank-span overlap keeps the middle mass; the " +
    "outlier vanishes; missing cohort nulls") {
    // click {0,10,20,30,1000} trim 20% -> keep {10,20,30} mean 20
    // purchase {5,6,7,8,9} -> keep {6,7,8} mean 7
    val d = (Seq(0.0, 10.0, 20.0, 30.0, 1000.0).map(v => ("click", v)) ++
      Seq(5.0, 6.0, 7.0, 8.0, 9.0).map(v => ("purchase", v)))
      .toDF("variant", "v")
    Quality.trimmedMeanDiff(d, "variant", "v", "click", "purchase", 0.2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].head() shouldBe
      ((5L, 5L, 3L, 3L, Some(20.0), Some(7.0), Some(-13.0)))
    // trim 0 keeps everything (plain means)
    Quality.trimmedMeanDiff(d, "variant", "v", "click", "purchase", 0.0)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].head() shouldBe
      ((5L, 5L, 5L, 5L, Some(212.0), Some(7.0), Some(-205.0)))
    val onlyA = d.where(col("variant") === "click")
    val m = Quality.trimmedMeanDiff(onlyA, "variant", "v", "click",
        "purchase", 0.2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].head()
    m shouldBe ((5L, 0L, 3L, 0L, Some(20.0), None, None))
    an[IllegalArgumentException] should be thrownBy
      Quality.trimmedMeanDiff(d, "variant", "v", "click", "purchase", 0.5)
  }

  test("exponentialGof: step-edge KS against the fitted exponential by " +
    "hand; all-zero group yields null lambda; negatives excluded") {
    // g = {1, 2}: mean 1.5, lambda 2/3; sup sits at the LOWER edge of
    // the first step: |0 - F(1)| = 1 - exp(-2/3)
    val d = Seq(("g", 1.0), ("g", 2.0), ("g", -5.0),
      ("z", 0.0), ("z", 0.0)).toDF("grp", "v")
    val r = Quality.exponentialGof(d, "grp", "v")
      .as[(String, Long, Double, Option[Double], Option[Double], Boolean)]
      .collect().map(x => x._1 -> x).toMap
    r("g") shouldBe (("g", 2L, 1.5, Some(round6(1.0 / 1.5)),
      Some(round6(1.0 - math.exp(-2.0 / 3.0))), false))
    r("z") shouldBe (("z", 2L, 0.0, None, None, false))
  }

  test("simpsonCheck: the classic reversal - every group favors b while " +
    "the pooled rate favors a; cohortless groups leave the verdict") {
    val rows =
      Seq.fill(90)(("g1", "a", true)) ++ Seq.fill(10)(("g1", "a", false)) ++
      Seq.fill(10)(("g1", "b", true)) ++
      Seq.fill(1)(("g2", "a", true)) ++ Seq.fill(9)(("g2", "a", false)) ++
      Seq.fill(30)(("g2", "b", true)) ++ Seq.fill(70)(("g2", "b", false)) ++
      Seq.fill(3)(("g3", "a", true)) // no b cohort: excluded from verdict
    val d = rows.toDF("grp", "variant", "ok")
    val r = Quality.simpsonCheck(d, "grp", "variant", "ok", "a", "b")
      .as[(Long, Option[Double], Option[Double], Option[Double], Long,
        Long, Long, Boolean)].head()
    r shouldBe ((2L, Some(round6(94.0 / 113.0)), Some(round6(40.0 / 110.0)),
      Some(round6(40.0 / 110.0 - 94.0 / 113.0)), 2L, 0L, 0L, true))
    // aligned signs: no reversal
    val ok = (Seq.fill(2)(("g", "a", false)) :+ (("g", "a", true))) ++
      Seq.fill(3)(("g", "b", true))
    Quality.simpsonCheck(ok.toDF("grp", "variant", "ok"),
        "grp", "variant", "ok", "a", "b")
      .as[(Long, Option[Double], Option[Double], Option[Double], Long,
        Long, Long, Boolean)].head()._8 shouldBe false
  }

  test("effectSize: hand pooled SD through the Hedges correction; " +
    "zero-variance and undersized cohorts yield nulls") {
    // a {10,14} ss=8, b {1,3} ss=2: sp = sqrt(5), d = -10/sqrt(5),
    // J = 4/7
    val d = Seq(("g", "a", 10.0), ("g", "a", 14.0),
      ("g", "b", 1.0), ("g", "b", 3.0),
      ("z", "a", 5.0), ("z", "a", 5.0), ("z", "b", 5.0), ("z", "b", 5.0),
      ("m", "a", 1.0), ("m", "b", 2.0), ("m", "b", 3.0))
      .toDF("grp", "variant", "v")
    val r = Quality.effectSize(d, "grp", "variant", "v", "a", "b")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[String])]
      .collect().map(x => x._1 -> x).toMap
    val cd = -10.0 / math.sqrt(5.0)
    r("g") shouldBe (("g", 2L, 2L, Some(-10.0), Some(round6(math.sqrt(5.0))),
      Some(round6(cd)), Some(round6(4.0 / 7.0 * cd)), Some("large")))
    r("z") shouldBe (("z", 2L, 2L, Some(0.0), Some(0.0), None, None, None))
    r("m") shouldBe (("m", 1L, 2L, Some(1.5), None, None, None, None))
  }

  test("kendallsW: perfect agreement scores 1, reversed rankings 0; " +
    "ragged items leave the panel") {
    // 3 raters, identical orderings over 3 items -> W = 1
    val agree = for (r <- 1 to 3; (i, s) <- Seq(("a", 3.0), ("b", 2.0),
      ("c", 1.0))) yield (r.toLong, i, s)
    val w1 = graft.core.CacheRegistry.scoped {
      Quality.kendallsW(agree.toDF("r", "i", "s"), "r", "i", "s")
        .as[(Long, Long, Option[Double])].head()
    }
    w1 shouldBe ((3L, 3L, Some(1.0)))
    // 2 raters with reversed orderings -> W = 0; item d rated by only
    // one rater leaves the common panel
    val rev = Seq((1L, "a", 3.0), (1L, "b", 2.0), (1L, "c", 1.0),
      (2L, "a", 1.0), (2L, "b", 2.0), (2L, "c", 3.0), (2L, "d", 9.0))
    val w0 = graft.core.CacheRegistry.scoped {
      Quality.kendallsW(rev.toDF("r", "i", "s"), "r", "i", "s")
        .as[(Long, Long, Option[Double])].head()
    }
    w0 shouldBe ((2L, 3L, Some(0.0)))
    // one common item: W undefined
    val one = Seq((1L, "a", 1.0), (2L, "a", 2.0), (2L, "b", 3.0))
    graft.core.CacheRegistry.scoped {
      Quality.kendallsW(one.toDF("r", "i", "s"), "r", "i", "s")
        .as[(Long, Long, Option[Double])].head()
    } shouldBe ((2L, 1L, None))
    graft.core.CacheRegistry.drain()
  }

  test("medianCi: binomial order-statistic ranks by hand; singleton " +
    "group clamps to itself") {
    // n=9: median rank 5 -> 5; kl = ceil(4.5-2.939946) = 2 -> 2;
    // kh = floor(4.5+1+2.939946) = 8 -> 8
    val d = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("s", 7.0)))
      .toDF("grp", "v")
    val r = Quality.medianCi(d, "grp", "v")
      .as[(String, Long, Double, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    r("g") shouldBe (("g", 9L, 5.0, 2.0, 8.0))
    r("s") shouldBe (("s", 1L, 7.0, 7.0, 7.0))
  }

  test("jarqueBera: hand moments - symmetric sample keeps normality, " +
    "the scaled skewed sample rejects; constant group yields nulls") {
    // {1..5}: skew 0, kurt 1.7, jb = 5/6 * (1.3^2/4) = 0.352083
    val sym = (1 to 5).map(v => ("sym", v.toDouble))
    // 4:1 zeros/tens at n=250: skew 1.5, kurt 3.25, jb = 250/6*2.265625
    val skewed = Seq.fill(200)(("sk", 0.0)) ++ Seq.fill(50)(("sk", 10.0))
    val flat = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 5.0))
    val d = (sym ++ skewed ++ flat).toDF("grp", "v")
    val r = Quality.jarqueBera(d, "grp", "v")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Boolean)].collect().map(x => x._1 -> x).toMap
    r("sym") shouldBe (("sym", 5L, Some(0.0), Some(1.7),
      Some(round6(5.0 / 6.0 * (1.3 * 1.3 / 4.0))), false))
    val jb = 250.0 / 6.0 * (1.5 * 1.5 + 0.25 * 0.25 / 4.0)
    r("sk") shouldBe (("sk", 250L, Some(1.5), Some(3.25),
      Some(round6(jb)), true))
    r("c") shouldBe (("c", 4L, None, None, None, false))
  }

  test("anovaF: hand-computed F and eta-sq; single-cohort group nulls " +
    "F; a null cohort is its own level") {
    val d = (Seq(1, 2, 3).map(v => ("g", Option("A"), v.toDouble)) ++
      Seq(4, 5, 6).map(v => ("g", Option("B"), v.toDouble)) ++
      Seq(("one", Option("A"), 1.0), ("one", Option("A"), 2.0)) ++
      Seq(("nc", Option("A"), 1.0), ("nc", None: Option[String], 3.0),
        ("nc", None: Option[String], 5.0))).toDF("grp", "coh", "v")
    val r = Quality.anovaF(d, "grp", "coh", "v")
      .as[(String, Long, Long, Double, Double, Option[Double],
        Option[Double])].collect().map(x => x._1 -> x).toMap
    // SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5; SSW = 2+2 = 4;
    // F = (13.5/1)/(4/4) = 13.5; eta = 13.5/17.5
    r("g") shouldBe (("g", 2L, 6L, 0.000014, 0.000004, Some(13.5),
      Some(round6(13.5 / 17.5))))
    r("one") shouldBe (("one", 1L, 2L, 0.0, 0.000001, None, None))
    r("nc")._2 shouldBe 2L // null cohort counted as its own level
    r("nc")._6 shouldBe Some(3.0) // SSB=6 (means 1 vs 4), SSW=2
  }

  test("kruskalWallis: hand ranks with and without ties; all-tied " +
    "group zeroes H and nulls the correction") {
    val plain = Seq(("p", "A", 1.0), ("p", "A", 2.0), ("p", "B", 3.0),
      ("p", "B", 4.0))
    val tied = Seq(("t", "A", 1.0), ("t", "A", 1.0), ("t", "B", 1.0),
      ("t", "B", 2.0))
    val const = Seq(("c", "A", 5.0), ("c", "B", 5.0), ("c", "B", 5.0))
    val r = Quality.kruskalWallis(
      (plain ++ tied ++ const).toDF("grp", "coh", "v"), "grp", "coh", "v")
      .as[(String, Long, Long, Option[Long], Option[Double],
        Option[Double])].collect().map(x => x._1 -> x).toMap
    // plain: R_A=3, R_B=7 -> H = 0.6*(9/2+49/2) - 15 = 2.4, no ties
    r("p") shouldBe (("p", 2L, 4L, Some(1L), Some(2.4), Some(2.4)))
    // tied {1,1,1,2}: avg rank 2 for the 1s -> H = 0.6, corr = 0.6
    r("t") shouldBe (("t", 2L, 4L, Some(1L), Some(0.6), Some(1.0)))
    // all tied: H = 0 and the correction divides by zero -> null
    r("c") shouldBe (("c", 2L, 3L, Some(1L), Some(0.0), None))
  }

  test("brownForsythe: deviations from the exact lower median feed the " +
    "ANOVA tail") {
    val d = (Seq(1, 2, 3).map(v => ("g", "A", v.toDouble)) ++
      Seq(10, 10, 14, 14).map(v => ("g", "B", v.toDouble)))
      .toDF("grp", "coh", "v")
    val r = Quality.brownForsythe(d, "grp", "coh", "v")
      .as[(String, Long, Long, Double, Double, Option[Double],
        Option[Double])].head()
    // medians: A->2, B->10 (lower median on even n); devs A {1,0,1},
    // B {0,0,4,4}; SSB = 64/21, SSW = 50/3, F = (64/21)/(50/15),
    // eta = 64/414
    r shouldBe (("g", 2L, 7L, 0.000003, 0.000017,
      Some(round6(64.0 / 21.0 / (50.0 / 15.0))),
      Some(round6(64.0 / 414.0))))
  }

  test("expectations: metric vs threshold per check; empty metric fails; " +
    "unique is exact; ordering by check_id is the declaration order") {
    import Quality.Expect._
    val d = Seq(
      (Option(1L), Option(10.0), Option("ok")),
      (Option(2L), Option(20.0), Option("ok")),
      (Option(2L), Option(200.0), Option("bad")),
      (Option(3L), None: Option[Double], None: Option[String]))
      .toDF("k", "v", "s")
    val r = Quality.expectations(d, Seq(
      Complete("k"), // 4/4 -> pass
      Complete("v", 0.5), // 3/4 -> pass at 0.5
      ValuesBetween("v", 0.0, 100.0), // 2/3 of non-null -> fail at 1.0
      MatchesRegex("s", "^ok$", 0.5), // 2/3 -> pass
      ValuesIn("s", Seq("ok")), // 2/3 -> fail
      Unique("k"), // dup 2 -> fail
      Unique("s"), // "ok" twice -> fail
      RowCountBetween(1L, 10L), // pass
      MeanBetween("v", 0.0, 100.0))) // mean 76.67 -> pass
      .as[(Long, String, Option[String], Option[Double], Option[Double],
        Option[Double], Boolean)].collect().sortBy(_._1)
    r.map(_._7).toSeq shouldBe Seq(true, true, false, true, false, false,
      false, true, true)
    r(0)._4 shouldBe Some(1.0)
    r(2)._4 shouldBe Some(round6(2.0 / 3.0))
    r(5)._4 shouldBe Some(0.75) // 3 distinct of 4 present
    r(7)._4 shouldBe Some(4.0)
    r(8)._4 shouldBe Some(round6(230.0 / 3.0))
    // a check over an all-null column cannot observe its metric -> FAIL
    val empty = Quality.expectations(
      Seq((None: Option[Double], 1)).toDF("v", "x"),
      Seq(ValuesBetween("v", 0.0, 1.0), Unique("v")))
      .as[(Long, String, Option[String], Option[Double], Option[Double],
        Option[Double], Boolean)].collect()
    empty.map(_._4).toSeq shouldBe Seq(None, None)
    empty.map(_._7).toSeq shouldBe Seq(false, false)
  }

  test("didEstimator: hand-computed DiD, SE, z; missing cell nulls did; " +
    "null flags drop") {
    // treated pre {1,3} post {6,8}; control pre {1,1} post {2,4}:
    // did = (7-2) - (3-1) = 3; each cell var = 2 except control pre = 0
    val d = (Seq((1.0, true, false), (3.0, true, false), (6.0, true, true),
      (8.0, true, true), (1.0, false, false), (1.0, false, false),
      (2.0, false, true), (4.0, false, true))
      .map { case (v, t, p) => ("g", Option(t), p, v) } ++
      Seq(("m", Option(true), true, 1.0), ("m", Option(true), false, 2.0),
        ("m", None: Option[Boolean], true, 9.0)))
      .toDF("grp", "tr", "post", "v")
    val r = Quality.didEstimator(d, "grp", "tr", "post", "v")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    val se = math.sqrt(2.0 / 2 + 2.0 / 2 + 2.0 / 2 + 0.0 / 2)
    r("g") shouldBe (("g", 8L, Some(2.0), Some(7.0), Some(1.0), Some(3.0),
      Some(3.0), Some(round6(se)), Some(round6(3.0 / se))))
    // "m": null-treat row dropped; control cells empty -> did/se/z null
    r("m") shouldBe (("m", 2L, Some(2.0), Some(1.0), None, None, None,
      None, None))
  }

  test("krippendorffAlphaInterval: hand-computed D_o/D_e from the exact " +
    "pair-sum identities; singleton items excluded; all-equal nulls alpha") {
    // A: [1,2] -> pair sum 2, /(m-1)=2; B: [3,3,5] -> 2*(3*43-121)=16,
    // /2 = 8; N=5, D_o = 10/5 = 2; global 2*(5*48-196)=88,
    // D_e = 88/20 = 4.4; alpha = 1 - 2/4.4
    val d = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 3.0), ("B", 5.0),
      ("C", 4.0)).toDF("item", "v")
    val r = Quality.krippendorffAlphaInterval(d, "item", "v")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    r shouldBe ((2L, 5L, 2.0, 4.4, Some(round6(1.0 - 2.0 / 4.4))))
    // all-equal ratings: D_e = 0 -> alpha null
    val const = Seq(("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 2.0))
      .toDF("item", "v")
    Quality.krippendorffAlphaInterval(const, "item", "v")
      .as[(Long, Long, Double, Double, Option[Double])].head() shouldBe
      ((2L, 4L, 0.0, 0.0, None))
  }

  test("wasserstein1: hand ECDF integral vs the pooled corpus; a null " +
    "group is its own cohort with its own counts") {
    // global {1,2,3}: A={1,3} -> |1/2-1/3|+|1/2-2/3| = 1/3;
    // B={2} -> |0-1/3|+|1-2/3| = 2/3
    val d = Seq(("A", 1.0), ("A", 3.0), ("B", 2.0)).toDF("g", "v")
    val r = Quality.wasserstein1(d, "g", "v")
      .as[(String, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    r("A") shouldBe (("A", 2L, 3L, round6(1.0 / 3.0)))
    r("B") shouldBe (("B", 1L, 3L, round6(2.0 / 3.0)))
    graft.core.CacheRegistry.drain()
    // null group: grid {1,5}, dx=4; F_null(1)=0 vs 2/3 -> 8/3
    val dn = Seq((Option("A"), 1.0), (Option("A"), 1.0),
      (None: Option[String], 5.0)).toDF("g", "v")
    val rn = Quality.wasserstein1(dn, "g", "v")
      .as[(Option[String], Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    rn(Some("A")) shouldBe ((Some("A"), 2L, 3L, round6(4.0 / 3.0)))
    rn(None) shouldBe ((None, 1L, 3L, round6(8.0 / 3.0)))
    graft.core.CacheRegistry.drain()
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("quantileMapping: exact lower quartiles per group and corpus; " +
    "shift is the integer difference") {
    // A = {1,2,3,4}, B = {10,20}; corpus quartiles (lower) = 2,3,10
    val d = (Seq(1, 2, 3, 4).map(v => ("A", v.toDouble)) ++
      Seq(("B", 10.0), ("B", 20.0))).toDF("g", "v")
    val r = graft.core.CacheRegistry.scoped {
      Quality.quantileMapping(d, "g", "v", 4)
        .as[(String, Long, Long, Double, Double, Double)]
        .collect().sortBy(x => (x._1, x._2)).toList
    }
    graft.core.CacheRegistry.drain()
    r shouldBe List(
      ("A", 1L, 4L, 1.0, 2.0, -1.0), ("A", 2L, 4L, 2.0, 3.0, -1.0),
      ("A", 3L, 4L, 3.0, 10.0, -7.0),
      ("B", 1L, 2L, 10.0, 2.0, 8.0), ("B", 2L, 2L, 10.0, 3.0, 7.0),
      ("B", 3L, 2L, 20.0, 10.0, 10.0))
    an[IllegalArgumentException] should be thrownBy
      Quality.quantileMapping(d, "g", "v", 1)
  }

  test("isotonicCalibration: PAV pools the non-monotone middle bins; " +
    "fit is non-decreasing and matches the minimax by hand") {
    // 4 bins x 5 rows, positives 0/3/1/5 -> raw rates 0,.6,.2,1;
    // isotonic fit pools bins 1-2 to 4/10 = .4
    val rows = for {
      b <- 0 to 3; i <- 0 until 5
      pos = Seq(0, 3, 1, 5)(b)
    } yield (b * 0.25 + 0.1, i < pos)
    val d = rows.toDF("score", "y")
    val r = graft.core.CacheRegistry.scoped {
      Quality.isotonicCalibration(d, "score", "y", 4)
        .collect().map(x => x.getAs[Long]("bin") ->
          ((x.getAs[Double]("outcome_rate"), x.getAs[Double]("iso_rate"),
            x.getAs[Boolean]("monotone_ok")))).toMap
    }
    graft.core.CacheRegistry.drain()
    r(0L) shouldBe ((0.0, 0.0, true))
    r(1L) shouldBe ((0.6, 0.4, true))
    r(2L) shouldBe ((0.2, 0.4, true))
    r(3L) shouldBe ((1.0, 1.0, true))
    an[IllegalArgumentException] should be thrownBy
      Quality.isotonicCalibration(d, "score", "y", 0)
  }

  test("tCloseness: extreme cohorts hit 0.5 on a two-value table, the " +
    "balanced cohort is 0; a single-value table reports null") {
    val d = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0),
      ("C", 1.0), ("C", 2.0)).toDF("cohort", "v")
    val r = graft.core.CacheRegistry.scoped {
      Quality.tCloseness(d, "cohort", "v", 0.2)
        .collect().map(x => x.getAs[String]("cohort") ->
          ((x.getAs[Long]("n_cohort"), x.getAs[Long]("m_values"),
            x.getAs[java.lang.Double]("t_value"),
            x.getAs[Boolean]("at_risk")))).toMap
    }
    graft.core.CacheRegistry.drain()
    r("A") shouldBe ((2L, 2L, 0.5, true))
    r("B") shouldBe ((2L, 2L, 0.5, true))
    r("C") shouldBe ((2L, 2L, 0.0, false))
    val mono = Seq(("X", 5.0), ("Y", 5.0)).toDF("cohort", "v")
    val rm = graft.core.CacheRegistry.scoped {
      Quality.tCloseness(mono, "cohort", "v", 0.2)
        .collect().map(x => (x.getAs[java.lang.Double]("t_value"),
          x.getAs[Boolean]("at_risk"))).toList
    }
    graft.core.CacheRegistry.drain()
    rm shouldBe List((null, false), (null, false))
    an[IllegalArgumentException] should be thrownBy
      Quality.tCloseness(d, "cohort", "v", 0.0)
  }

  test("hillTailIndex: exact alpha on a log-spaced tail; too-small " +
    "groups report null alpha") {
    // g1: values e^3, e^2, e^1 with k=2 -> alpha = 2/(5 - 2*1) = 2/3
    val d = (Seq(("g1", math.exp(3)), ("g1", math.exp(2)),
      ("g1", math.exp(1))) ++ Seq(("g2", 5.0), ("g2", 1.0)))
      .toDF("g", "v")
    val r = Quality.hillTailIndex(d, "g", "v", 2)
      .collect().map(x => x.getAs[String]("g") ->
        ((x.getAs[Long]("n_pos"), x.getAs[java.lang.Double]("alpha"),
          x.getAs[Boolean]("heavy_tail")))).toMap
    r("g1") shouldBe ((3L, 0.666667, true))
    r("g2") shouldBe ((2L, null, false))
    // degenerate tail: all top k+1 values equal -> Σln = 0; alpha must be
    // NULL (not +Infinity, which would read heavy_tail=false silently)
    val flat = Seq.fill(5)(("g3", 7.0)).toDF("g", "v")
    val rf = Quality.hillTailIndex(flat, "g", "v", 2).head()
    rf.getAs[java.lang.Double]("alpha") shouldBe null
    rf.getAs[Boolean]("heavy_tail") shouldBe false
    an[IllegalArgumentException] should be thrownBy
      Quality.hillTailIndex(d, "g", "v", 1)
  }

  test("permutationTest: add-one p stays in (0,1], significance mirrors " +
    "the 5% rule, and the replicate count is bounded by reps") {
    val rows = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble % 7))
    val d = rows.toDF("id", "v", "value")
    val r = graft.core.CacheRegistry.scoped {
      Quality.permutationTest(d, "id", "v", "value", "a", "b", 8).head()
    }
    graft.core.CacheRegistry.drain()
    r.getAs[Long]("n_a") shouldBe 20L
    r.getAs[Long]("n_b") shouldBe 20L
    // NULL ids are excluded from BOTH cohorts (an md5 of NULL would
    // otherwise silently route the row to pseudo-B)
    val withNull = rows.map { case (id, v, x) => (Option(id), v, x) } :+
      ((Option.empty[Long], "a", 3.0))
    val rn = graft.core.CacheRegistry.scoped {
      Quality.permutationTest(withNull.toDF("id", "v", "value"),
        "id", "v", "value", "a", "b", 8).head()
    }
    graft.core.CacheRegistry.drain()
    rn.getAs[Long]("n_a") shouldBe 20L
    rn.getAs[Long]("n_b") shouldBe 20L
    val p = r.getAs[Double]("p_value")
    p should be > 0.0
    p should be <= 1.0
    r.getAs[Long]("reps") should be <= 8L
    r.getAs[Boolean]("significant") shouldBe (p <= 0.05)
    an[IllegalArgumentException] should be thrownBy
      Quality.permutationTest(d, "id", "v", "value", "a", "b", 3)
  }

  test("msprtSequential: always-valid p is monotone non-increasing over " +
    "days and a decision never un-happens") {
    val rows = (1 to 60).flatMap { i =>
      val day = java.sql.Date.valueOf(f"2024-01-${i % 3 + 1}%02d")
      Seq((day, "a", 10.0 + (i % 5)), (day, "b", 2.0 + (i % 3)))
    }
    val d = rows.toDF("day", "v", "value")
    val out = Quality.msprtSequential(d, col("day"), "v", "value",
      "a", "b", 0.5).orderBy("day").collect()
    out.length shouldBe 3
    // 6 dp rounding can floor a vanishing always-valid p to exactly 0
    val ps = out.map(_.getAs[Double]("p_always_valid"))
    ps.foreach { p => p should be >= 0.0; p should be <= 1.0 }
    ps.sliding(2).foreach { w => w(1) should be <= w(0) }
    val sig = out.map(_.getAs[Boolean]("significant"))
    sig.sliding(2).foreach { w => if (w(0)) w(1) shouldBe true }
    an[IllegalArgumentException] should be thrownBy
      Quality.msprtSequential(d, col("day"), "v", "value", "a", "b", 0.0)
  }

  test("lDiversityAudit: null sensitive values are their own distinct " +
    "value; dominant share ties break to the lowest value") {
    val d = Seq(
      ("g1", Some("A")), ("g1", Some("A")), ("g1", Some("B")),
      ("g2", Some("A")), ("g2", Some("B")), ("g2", Some("C")), ("g2", None))
      .toDF("quasi", "sv")
    val r = Quality.lDiversityAudit(d, Seq("quasi"), "sv", 3L)
      .collect().map(x => x.getAs[String]("quasi") ->
        ((x.getAs[Long]("group_size"), x.getAs[Long]("distinct_sensitive"),
          x.getAs[Double]("dominant_share"), x.getAs[Boolean]("at_risk"))))
      .toMap
    r("g1") shouldBe ((3L, 2L, 0.666667, true))
    r("g2") shouldBe ((4L, 4L, 0.25, false))
    an[IllegalArgumentException] should be thrownBy
      Quality.lDiversityAudit(d, Seq("quasi"), "sv", 1L)
  }

}
