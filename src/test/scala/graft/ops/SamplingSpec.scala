package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.table(spark, sf0001, "documents")

  test("deterministicSplit partitions every row, stable across runs and partitioning") {
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val a = Sampling.deterministicSplit(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.deterministicSplit(docs.repartition(7), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    a shouldBe b                     // membership is a pure function of the id
    a.size shouldBe docs.count()     // every row assigned exactly once
    // ratios approximate the weights (md5 spreads uniformly)
    val n = a.size.toDouble
    a.values.count(_ == "train") / n shouldBe 0.90 +- 0.05
    (a.values.count(_ == "val") + a.values.count(_ == "test")) / n shouldBe 0.10 +- 0.05
  }

  test("stratifiedSample applies per-stratum keep-rates off the same buckets") {
    val strata = docs.select(col("doc_id"),
      (col("doc_id") % 3).cast("string").as("grp"))
    val kept = Sampling.stratifiedSample(strata, "doc_id", "grp",
      Seq("0" -> 0, "1" -> 100), 25)
      .select("doc_id", "grp").as[(Long, String)].collect()
    kept.count(_._2 == "0") shouldBe 0 // 0% stratum fully dropped
    // 100% stratum fully kept
    kept.count(_._2 == "1").toLong shouldBe strata.where($"grp" === "1").count()
    // default stratum keeps ~25% via the shared md5 bucket
    val g2 = strata.where($"grp" === "2").count().toDouble
    kept.count(_._2 == "2") / g2 shouldBe 0.25 +- 0.10
    // membership = deterministicSample membership within each stratum
    val direct = Sampling.deterministicSample(
      strata.where($"grp" === "2"), "doc_id", 25)
      .select("doc_id").as[Long].collect().toSet
    kept.filter(_._2 == "2").map(_._1).toSet shouldBe direct
  }

  test("deterministicSample is the prefix of the same bucketing") {
    val sampled = Sampling.deterministicSample(docs, "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    val buckets = docs.select(col("doc_id"),
      Sampling.md5Bucket(col("doc_id")).as("b")).as[(Long, Long)].collect()
    sampled shouldBe buckets.filter(_._2 < 10).map(_._1).toSet
    sampled.size.toDouble / buckets.length shouldBe 0.10 +- 0.04
  }

  test("rebalanceToWeights hits target proportions; binding stratum kept whole") {
    val kept = Sampling.rebalanceToWeights(docs, "doc_id", "lang",
      Seq("en" -> 0.5, "de" -> 0.2, "fr" -> 0.3))
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    byLang.keySet shouldBe Set("en", "de", "fr") // unweighted strata dropped
    val total = kept.length.toDouble
    // proportions approximate the weights (hash-binomial noise)
    byLang("en") / total shouldBe 0.5 +- 0.08
    byLang("de") / total shouldBe 0.2 +- 0.08
    byLang("fr") / total shouldBe 0.3 +- 0.08
    // the binding stratum (max n/w deficit) survives whole: with the
    // sf0.001 skew that's fr — its keep-rate is 1.0
    val frAll = docs.where($"lang" === "fr").count()
    byLang("fr").toLong shouldBe frAll
  }

  test("capPerStratum caps each group deterministically by md5 order") {
    val kept = Sampling.capPerStratum(docs, "doc_id", "source", 10)
      .select("doc_id", "source").as[(Long, String)].collect()
    kept.groupBy(_._2).values.foreach(_.length should be <= 10)
    // groups smaller than the cap survive whole
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val keptSizes = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    sizes.filter(_._2 <= 10).foreach { case (s, n) => keptSizes(s) shouldBe n }
    // stable under repartitioning (pure function of ids within each stratum)
    val again = Sampling.capPerStratum(docs.repartition(7), "doc_id", "source", 10)
      .select("doc_id", "source").as[(Long, String)].collect()
    again.toSet shouldBe kept.toSet
  }

  test("weightedSample: heavy weights dominate, k per stratum, replay-stable, non-positive excluded") {
    val d = ((1L to 50L).map(i => (i, "s", 1000.0)) ++
      (51L to 100L).map(i => (i, "s", 0.001))).toDF("id", "src", "w")
    val r = Sampling.weightedSample(d, "id", "src", "w", 10)
      .select($"id").as[Long].collect().toSet
    r.size shouldBe 10
    // u^(1/1000) ≈ 1 for any u; u^1000 ≈ 0 — the heavy class sweeps the top
    all(r.toSeq) should be <= 50L
    // pure function of the ids: identical under repartitioning
    val again = Sampling.weightedSample(d.repartition(7), "id", "src", "w", 10)
      .select($"id").as[Long].collect().toSet
    again shouldBe r
    // null/zero/negative weights are excluded even when k > |stratum|
    val few = Seq((1L, "t", 2.0), (2L, "t", 0.0), (3L, "t", -5.0))
      .toDF("id", "src", "w")
    Sampling.weightedSample(few, "id", "src", "w", 5)
      .select($"id").as[Long].collect().toSeq shouldBe Seq(1L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.weightedSample(d, "id", "src", "w", 0)
  }

  test("keepTopQuantile keeps each stratum's top fraction; ties never split") {
    val d = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("a", 5L, 50.0),
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0), ("b", 9L, 1.0) // 3-way tie at the top
    ).toDF("src", "id", "score")
    val r = Sampling.keepTopQuantile(d, "src", "score", 0.4)
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    // stratum a: top 40% of 5 = the 2 best (cume_dist 0.8, 1.0); the
    // boundary row (cume_dist exactly 0.6) is cut — the strict > semantics
    Seq(4L, 5L).foreach(r(_) shouldBe true)
    Seq(1L, 2L, 3L).foreach(r(_) shouldBe false)
    // stratum b: the tied trio shares cume_dist 1.0 -> ALL kept even though
    // 3/4 > 40%; the worst row (cume_dist 0.25) is cut
    Seq(6L, 7L, 8L).foreach(r(_) shouldBe true)
    r(9L) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      Sampling.keepTopQuantile(d, "src", "score", 0.0)
  }

  test("tokenBudgetPlan normalizes weights, computes epochs, drops unlisted sources") {
    val d = Seq(
      ("web", 100L), ("web", 300L),   // 400 tokens
      ("code", 50L), ("code", 50L),   // 100 tokens
      ("junk", 999L)                  // not in weights -> dropped
    ).toDF("src", "n_tok")
    val r = Sampling.tokenBudgetPlan(d, "src", "n_tok",
        Seq("web" -> 3.0, "code" -> 1.0), 1000L)
      .as[(String, Long, Long, Double, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    r.keySet shouldBe Set("web", "code")
    // web: share 0.75 -> 750 target tokens over 400 available = 1.875 epochs
    r("web") shouldBe (("web", 2L, 400L, 0.75, 750L, 1.875))
    // code: share 0.25 -> 250 over 100 = 2.5 epochs
    r("code") shouldBe (("code", 2L, 100L, 0.25, 250L, 2.5))
    an[IllegalArgumentException] should be thrownBy
      Sampling.tokenBudgetPlan(d, "src", "n_tok", Seq("web" -> -1.0), 1000L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.tokenBudgetPlan(d, "src", "n_tok", Seq("web" -> 1.0), 0L)
  }

  test("temperatureMixture: alpha=1 is the natural mix, alpha=0 targets uniform, " +
    "the smallest source always keeps rate 1") {
    // 80/15/5 split over 3 sources
    val d = ((1 to 80).map(_ => "head") ++ (1 to 15).map(_ => "mid") ++
      (1 to 5).map(_ => "tail")).toDF("src")
    def mix(alpha: Double) = graft.core.CacheRegistry.scoped {
      Sampling.temperatureMixture(d, "src", alpha)
        .as[(String, Long, Double, Double, Double)].collect()
        .map(t => t._1 -> t).toMap
    }
    val natural = mix(1.0)
    natural.values.foreach(_._5 shouldBe 1.0) // q == p -> every rate 1
    natural("head")._3 shouldBe 0.8
    val uniform = mix(0.0)
    uniform.values.foreach(_._4 shouldBe (1.0 / 3 +- 1e-6)) // temp_share uniform
    uniform("tail")._5 shouldBe 1.0
    // head keeps 5/80 of the uniform target relative to tail's full keep
    uniform("head")._5 shouldBe (0.0625 +- 1e-6)
    val damped = mix(0.3)
    damped("tail")._5 shouldBe 1.0
    // monotone: tempering never up-weights the head above the tail
    damped("head")._5 should be < damped("mid")._5
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureMixture(d, "src", 1.5)
  }

  test("exactKSample: exactly k rows, the k smallest md5 keys, prefix-stable") {
    val ids = docs.select("doc_id").as[Long].collect()
    def hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expect = ids.sortBy(id => (hex(id), id)).take(40).toSet
    val got = Sampling.exactKSample(docs.select("doc_id", "source"), "doc_id", 40)
      .select("doc_id").as[Long].collect()
    got.length shouldBe 40
    got.toSet shouldBe expect // membership = k-prefix of the md5 total order
    // stable under partitioning, and the k-sample is a prefix of the k'-sample
    val rep = Sampling.exactKSample(
      docs.repartition(7).select("doc_id", "source"), "doc_id", 40)
      .select("doc_id").as[Long].collect()
    rep.toSet shouldBe expect
    val bigger = Sampling.exactKSample(
      docs.select("doc_id", "source"), "doc_id", 60)
      .select("doc_id").as[Long].collect().toSet
    expect.subsetOf(bigger) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      Sampling.exactKSample(docs, "doc_id", 0)
  }

  test("exactKPerStratum: k smallest md5 keys within every stratum") {
    val rows = docs.select("doc_id", "source").as[(Long, String)].collect()
    def hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expect = rows.groupBy(_._2).values
      .flatMap(_.sortBy { case (id, _) => (hex(id), id) }.take(5)).map(_._1).toSet
    val got = Sampling.exactKPerStratum(
      docs.select("doc_id", "source"), "doc_id", "source", 5)
      .select("doc_id").as[Long].collect()
    got.length shouldBe expect.size
    got.toSet shouldBe expect
    // stable under partitioning; short strata keep everything
    Sampling.exactKPerStratum(
      docs.repartition(7).select("doc_id", "source"), "doc_id", "source", 5)
      .select("doc_id").as[Long].collect().toSet shouldBe expect
    val all = Sampling.exactKPerStratum(
      docs.select("doc_id", "source"), "doc_id", "source", 1000000)
    all.count() shouldBe docs.count()
    an[IllegalArgumentException] should be thrownBy
      Sampling.exactKPerStratum(docs, "doc_id", "source", 0)
  }

  test("mixtureSchedule: rank/weight keys, weight ratios hold, unlisted dropped") {
    val d = ((1L to 200L).map(_ -> "a") ++ (201L to 300L).map(_ -> "b") ++
      (301L to 320L).map(_ -> "zz")).toDF("doc_id", "source")
    val weights = Seq("a" -> 2.0, "b" -> 1.0)
    val r = Sampling.mixtureSchedule(d, "doc_id", "source", weights)
      .select("doc_id", "source", "source_rank", "sched_key")
      .as[(Long, String, Long, Double)].collect()
    r.map(_._2).toSet shouldBe Set("a", "b") // 'zz' dropped
    // the key IS rank/weight, exactly
    r.foreach { case (_, s, rank, key) =>
      key shouldBe rank / (if (s == "a") 2.0 else 1.0) }
    // reading the tape in key order interleaves at the weight ratio:
    // keys <= 50 hold src-a ranks 1..100 and src-b ranks 1..50 — 2:1 exact
    val prefix = r.filter(_._4 <= 50.0)
    prefix.count(_._2 == "a") shouldBe 100
    prefix.count(_._2 == "b") shouldBe 50
    // deterministic under partitioning
    val rep = Sampling.mixtureSchedule(d.repartition(7), "doc_id", "source", weights)
      .select("doc_id", "sched_key").as[(Long, Double)].collect().toMap
    r.map(x => x._1 -> x._4).toMap shouldBe rep
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureSchedule(d, "doc_id", "source", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureSchedule(d, "doc_id", "source", Seq("a" -> 0.0))
  }

  test("coordinated sampling preserves referential integrity across tables") {
    val orders = graft.core.Tables.table(spark, sf0001, "orders")
    val items = graft.core.Tables.table(spark, sf0001, "lineitem")
    val so = Sampling.deterministicSample(orders, "o_orderkey", 20)
    val si = Sampling.deterministicSample(items, "l_orderkey", 20)
    // every sampled lineitem's order is in the sampled orders — membership
    // is a function of the shared key, so the join loses NOTHING
    si.join(so, si("l_orderkey") === so("o_orderkey"), "left_anti")
      .count() shouldBe 0L
    // and the coordinated join keeps exactly the full join's sampled keys
    val coord = si.join(so, si("l_orderkey") === so("o_orderkey")).count()
    val full = items.join(orders, items("l_orderkey") === orders("o_orderkey"))
      .where(Sampling.md5Bucket(items("l_orderkey")) < 20).count()
    coord shouldBe full
  }

  test("negativeSamples: never seen, ≤ k per user, pool-bounded, stable") {
    val inter = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L))
      .toDF("user", "item")
    val pool = (10L to 19L).toDF("pid")
    val r = Sampling.negativeSamples(inter, "user", "item", pool, "pid", 10, 3)
      .select("user", "item", "neg_rank").as[(Long, Long, Long)].collect()
    val seen = Set(1L -> 10L, 1L -> 11L, 2L -> 10L, 3L -> 12L)
    r.foreach { case (u, i, _) => seen should not contain (u -> i) }
    r.groupBy(_._1).view.mapValues(_.length).toMap shouldBe
      Map(1L -> 3, 2L -> 3, 3L -> 3)
    r.foreach { case (_, i, _) => i should (be >= 10L and be <= 19L) }
    // partitioning must not change the chosen negatives
    Sampling.negativeSamples(inter.repartition(7), "user", "item",
      pool, "pid", 10, 3).select("user", "item", "neg_rank")
      .as[(Long, Long, Long)].collect().toSet shouldBe r.toSet
    // a user who saw most of a tiny pool gets fewer than k — never a seen item
    val tight = Sampling.negativeSamples(inter, "user", "item",
      Seq(10L, 11L, 12L).toDF("pid"), "pid", 3, 3)
      .select("user", "item").as[(Long, Long)].collect()
    tight.filter(_._1 == 1L).map(_._2).toSet shouldBe Set(12L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.negativeSamples(inter, "user", "item", pool, "pid", 10, 11)
  }

  test("dsirWeights equals an independent per-token log-ratio re-derivation") {
    val raw = Seq((1L, "alpha alpha beta"), (2L, "beta gamma"),
      (3L, "alpha gamma gamma delta")).toDF("id", "text")
    val tgt = Seq((10L, "alpha alpha alpha beta"), (11L, "alpha delta")).toDF("id", "text")
    val b = 16
    // independent bucket: md5 hex prefix, as unsigned int, mod b
    def bucket(term: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(x => f"${x & 0xff}%02x").mkString, 16) % b
    }
    def hist(texts: Seq[String]) = texts.flatMap(_.split(" "))
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val rh = hist(Seq("alpha alpha beta", "beta gamma", "alpha gamma gamma delta"))
    val th = hist(Seq("alpha alpha alpha beta", "alpha delta"))
    val (rt, tt) = (rh.values.sum, th.values.sum)
    def l(bk: Long): Double =
      math.log((th.getOrElse(bk, 0L) + 1.0) / (tt + b)) -
        math.log((rh(bk) + 1.0) / (rt + b))
    val got = Sampling.dsirWeights(raw, tgt, "id", "text", b)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    for ((id, text) <- Seq(1L -> "alpha alpha beta", 2L -> "beta gamma",
                           3L -> "alpha gamma gamma delta")) {
      val toks = text.split(" ")
      val expSum = toks.map(t => l(bucket(t))).sum
      got(id)._2 shouldBe toks.length
      got(id)._3 shouldBe expSum +- 2e-6
      got(id)._4 shouldBe (expSum / toks.length) +- 2e-6
    }
    an[IllegalArgumentException] should be thrownBy
      Sampling.dsirWeights(raw, tgt, "id", "text", 1)
  }

  test("dsirWeights ranks target-like documents above pool-like ones") {
    // target speaks 'wiki'; the raw pool mostly speaks 'spam'
    val raw = Seq((1L, "wiki wiki article fact"), (2L, "spam spam click buy"),
      (3L, "spam buy buy click click")).toDF("id", "text")
    val tgt = Seq((10L, "wiki article fact fact wiki article")).toDF("id", "text")
    val got = Sampling.dsirWeights(raw, tgt, "id", "text", 64)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    got(1L) should be > got(2L)
    got(1L) should be > got(3L)
    got(1L) should be > 0.0 // target-like: ratio favors the target side
  }

  test("groupKFold keeps every group in one fold, stable across partitioning") {
    val d = docs.select(col("doc_id"), col("source"))
    val a = Sampling.groupKFold(d, "source", 5)
      .select("source", "fold").as[(String, Long)].collect()
    a.groupBy(_._1).values.foreach(rows =>
      rows.map(_._2).distinct.length shouldBe 1) // one fold per group
    a.foreach { case (_, f) => f should (be >= 0L and be < 5L) }
    val b = Sampling.groupKFold(d.repartition(7), "source", 5)
      .select("source", "fold").as[(String, Long)].collect().toMap
    a.toMap shouldBe b
    an[IllegalArgumentException] should be thrownBy Sampling.groupKFold(d, "source", 1)
  }

  test("balanceToMinority: every label at the minority count, md5-prefix membership") {
    val d = ((1L to 50L).map(_ -> "a") ++ (51L to 60L).map(_ -> "b") ++
      (61L to 90L).map(_ -> "c")).toDF("id", "label")
    val r = Sampling.balanceToMinority(d, "id", "label")
      .select("id", "label").as[(Long, String)].collect()
    r.groupBy(_._2).view.mapValues(_.length).toMap shouldBe
      Map("a" -> 10, "b" -> 10, "c" -> 10)
    // kept rows are each label's 10 md5-smallest — same rule as exactKPerStratum
    val expect = Sampling.exactKPerStratum(d, "id", "label", 10)
      .select("id", "label").as[(Long, String)].collect().toSet
    r.toSet shouldBe expect
    // partitioning must not change membership
    Sampling.balanceToMinority(d.repartition(7), "id", "label")
      .select("id", "label").as[(Long, String)].collect().toSet shouldBe r.toSet
  }

  test("paretoFrontier2D: == the naive dominance filter; duplicates kept; " +
    "partitioning-stable") {
    val rows = Seq((1L, 1.0, 5.0), (2L, 2.0, 4.0), (3L, 3.0, 3.0),
      (4L, 2.0, 2.0), (5L, 3.0, 1.0), (6L, 3.0, 3.0)).toDF("id", "x", "y")
    val got = Sampling.paretoFrontier2D(rows, "id", "x", "y")
      .select("id").as[Long].collect().toSet
    // frontier points (1,5), (2,4), (3,3); ids 3 AND 6 share (3,3)
    got shouldBe Set(1L, 2L, 3L, 6L)
    // randomized agreement with the O(n²) definition
    val rnd = (1 to 200).map { i =>
      (i.toLong, (i * 37 % 23).toDouble, (i * 53 % 19).toDouble) }
    val df = rnd.toDF("id", "x", "y")
    val naive = rnd.filter { case (_, x, y) =>
      !rnd.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) } }.map(_._1).toSet
    Sampling.paretoFrontier2D(df, "id", "x", "y", numRanges = 5)
      .select("id").as[Long].collect().toSet shouldBe naive
    Sampling.paretoFrontier2D(df.repartition(7), "id", "x", "y", numRanges = 3)
      .select("id").as[Long].collect().toSet shouldBe naive
    graft.core.CacheRegistry.drain()
  }

  test("quantileNormalize: shifted scales map equal ranks to equal globals; " +
    "monotone within source; nulls dropped") {
    // B's scale is A's + 100: after normalization the same within-source
    // rank must land on the same global grid value
    val d = (1 to 4).map(i => (i.toLong, "A", Some(i.toDouble))) ++
      (1 to 4).map(i => (100L + i, "B", Some(100.0 + i))) :+
      ((999L, "A", None: Option[Double]))
    val got = Sampling.quantileNormalize(d.toDF("id", "src", "score"),
        "id", "src", "score", 4)
      .as[(Long, String, Double, Double)].collect()
    got.length shouldBe 8 // null dropped
    val byId = got.map(r => r._1 -> r._4).toMap
    // same source-local rank → same normalized value, across both scales
    (1 to 4).foreach(i => byId(i.toLong) shouldBe byId(100L + i.toLong))
    // monotone within a source
    val aSorted = got.filter(_._2 == "A").sortBy(_._3).map(_._4)
    aSorted shouldBe aSorted.sorted
    // the top of every source maps to the global max
    byId(4L) shouldBe 104.0
    an[IllegalArgumentException] should be thrownBy
      Sampling.quantileNormalize(d.toDF("id", "src", "score"),
        "id", "src", "score", 1)
  }

  test("temporalFolds: hand fold edges, embargo band, range-edge clamp") {
    import java.sql.Timestamp
    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // range [0s, 19s] -> k=2 boundary at 9.5s; embargo 1s flags ~[8.5, 10.5]
    val df = Seq((1L, ts(0)), (2L, ts(5)), (3L, ts(9)), (4L, ts(10)),
      (5L, ts(12)), (6L, ts(19)), (7L, ts(0)))
      .toDF("id", "ts")
    val got = Sampling.temporalFolds(df, "id", "ts", 2, 1000L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getBoolean(3)))).toMap
    got(1L) shouldBe ((0, false)) // clamp at lo: fold(-1s)=fold(0)=0
    got(2L) shouldBe ((0, false))
    got(3L) shouldBe ((0, true)) // 9s: fold(8s)=0, fold(10s)=1
    got(4L) shouldBe ((1, true)) // 10s: fold(9s)=0, fold(11s)=1
    got(5L) shouldBe ((1, false)) // 12s: fold(11s)=fold(13s)=1
    got(6L) shouldBe ((1, false)) // clamp at hi
    // every fold non-empty over a uniform spread; zero embargo flags none
    val wide = (0 until 100).map(i => (i.toLong, ts(i))).toDF("id", "ts")
    val folds = Sampling.temporalFolds(wide, "id", "ts", 5, 0L)
    folds.select("fold").distinct().count() shouldBe 5L
    folds.where(col("is_embargo")).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Sampling.temporalFolds(df, "id", "ts", 1, 0L)
  }

  test("importanceEss: Kish ESS — uniform weights keep the corpus, a " +
    "dominant weight collapses it; nulls excluded") {
    // equal log-weights: every w' = 1 -> ESS = n, ratio = 1
    val eq = Seq(0.0, 0.0, 0.0, 0.0).toDF("log_weight")
    Sampling.importanceEss(eq, "log_weight")
      .as[(Long, Double, Double, Double)].head() shouldBe
      ((4L, 0.0, 4.0, 1.0))
    // one dominant weight: exp(-30) nano-snaps to 0 -> ESS = 1; the
    // null row is excluded from n; max is shift-invariant (5.0 here)
    val dom = Seq(Some(5.0), Some(-25.0), Some(-25.0), None)
      .toDF("log_weight")
    Sampling.importanceEss(dom, "log_weight")
      .as[(Long, Double, Double, Double)].head() shouldBe
      ((3L, 5.0, 1.0, 0.333333))
    // empty / all-null input: zero rows out, not a divide-by-zero
    Sampling.importanceEss(
      Seq.empty[Option[Double]].toDF("log_weight"), "log_weight")
      .count() shouldBe 0L
  }

  test("neymanAllocation: N*sigma weights, largest-remainder integers " +
    "summing to the budget; zero-sigma stratum earns nothing; all-flat " +
    "input yields null allocations") {
    // a {0,10}: sd 5, w 10; b {4,6}: sd 1, w 2; c {7,7}: sd 0
    // budget 7: raw 5.833/1.167/0 -> floors 5/1/0, remainder to a
    val d = Seq(("a", 0.0), ("a", 10.0), ("b", 4.0), ("b", 6.0),
      ("c", 7.0), ("c", 7.0)).toDF("st", "v")
    val r = Sampling.neymanAllocation(d, "st", "v", 7L)
      .as[(String, Long, Double, Option[Double], Option[Long],
        Option[Long])].collect().map(x => x._1 -> x).toMap
    r("a") shouldBe (("a", 2L, 5.0, Some(0.833333), Some(6L), Some(2L)))
    r("b") shouldBe (("b", 2L, 1.0, Some(0.166667), Some(1L), Some(1L)))
    r("c") shouldBe (("c", 2L, 0.0, Some(0.0), Some(0L), Some(0L)))
    r.values.flatMap(_._5).sum shouldBe 7L
    // every stratum constant: no Neyman optimum -> null allocations
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0)).toDF("st", "v")
    val f = Sampling.neymanAllocation(flat, "st", "v", 5L)
      .as[(String, Long, Double, Option[Double], Option[Long],
        Option[Long])].collect()
    all(f.map(_._5)) shouldBe None
    an[IllegalArgumentException] should be thrownBy
      Sampling.neymanAllocation(d, "st", "v", 0L)
  }

  test("tapeMixingAudit: runs, Barton-David expectation/variance, z on " +
    "a hand tape") {
    // order A,A,B,A: runs=3; n_A=3, n_B=1, N=4 -> E[R]=2.5, Var=0.25
    val tape = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "A"))
      .toDF("pos", "src")
    val r = graft.core.CacheRegistry.scoped {
      Sampling.tapeMixingAudit(tape, "pos", "pos", "src")
        .as[(Long, Long, Option[Long], Option[Double], Option[Double],
          Option[Double])].head()
    }
    graft.core.CacheRegistry.drain()
    r shouldBe ((4L, 2L, Some(3L), Some(2.5), Some(0.25), Some(1.0)))
    // single label: one run, zero variance -> null z
    val mono = Seq((1L, "A"), (2L, "A")).toDF("pos", "src")
    val m = graft.core.CacheRegistry.scoped {
      Sampling.tapeMixingAudit(mono, "pos", "pos", "src")
        .as[(Long, Long, Option[Long], Option[Double], Option[Double],
          Option[Double])].head()
    }
    graft.core.CacheRegistry.drain()
    m._3 shouldBe Some(1L)
    m._6 shouldBe None
  }

  test("contrastivePairs: positives pass through ranked, negatives " +
    "never come from the anchor's own cluster") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = graft.core.CacheRegistry.scoped {
      Sampling.contrastivePairs(ids, "doc_id", pairs, "id_a", "id_b", 5, 2)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Boolean]("is_positive"), r.getAs[Long]("pair_rank")))
        .toList
    }
    graft.core.CacheRegistry.drain()
    out.filter(_._3) shouldBe List((1L, 2L, true, 1L))
    val negs = out.filterNot(_._3)
    negs.length shouldBe 2
    negs.foreach { case (a, b, _, _) =>
      a shouldBe 1L
      Set(3L, 4L, 5L) should contain(b) // never 1 or 2 (own cluster)
    }
    negs.map(_._4).sorted shouldBe List(1L, 2L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.contrastivePairs(ids, "doc_id", pairs, "id_a", "id_b", 1, 2)
  }

  test("clusterSafeSplit: clusters stay whole (zero leaked pairs), split " +
    "assignment matches an independent md5 replay, naive leaks counted") {
    // clusters: {1,2,3} (pairs 1-2, 2-3), {5,6}; 4 is a singleton
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = graft.core.CacheRegistry.scoped {
      Sampling.clusterSafeSplit(ids, "doc_id", pairs, "id_a", "id_b", 0.2)
        .collect().map(r => r.getAs[String]("split") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
            r.getAs[Long]("naive_leaked_pairs"),
            r.getAs[Long]("cluster_leaked_pairs")))).toMap
    }
    graft.core.CacheRegistry.drain()
    // independent replay of the md5 cut (cluster ids are min labels 1, 5;
    // 4 is its own cluster)
    val cut = math.floor(0.2 * 4294967296.0).toLong
    def u32(x: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$x".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def side(x: Long): String = if (u32(x) < cut) "test" else "train"
    val docCluster = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L)
    val expDocs = docCluster.groupBy { case (_, c) => side(c) }
    val expNaiveLeaks = Seq((1L, 2L), (2L, 3L), (5L, 6L))
      .count { case (a, b) => side(a) != side(b) }
    for ((sp, rows) <- expDocs) {
      val (nDocs, nClusters, naive, leaked) = out(sp)
      nDocs shouldBe rows.size.toLong
      nClusters shouldBe rows.values.toSet.size.toLong
      naive shouldBe expNaiveLeaks.toLong
      leaked shouldBe 0L
    }
    out.values.map(_._1).sum shouldBe 6L
    an[IllegalArgumentException] should be thrownBy
      Sampling.clusterSafeSplit(ids, "doc_id", pairs, "id_a", "id_b", 0.0)
  }
}
