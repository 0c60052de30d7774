package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{GoldMarts, StarSchema}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("orderRatesApprox tracks the exact mart within HLL++ error") {
    val fact = StarSchema.factOrderDetails(spark, sf0001)
    val exact = GoldMarts.orderRates(fact)
      .select($"SellerID", $"total_orders_placed".as("exact_n"))
    val approx = Sketches.orderRatesApprox(fact)
      .select($"SellerID", $"total_orders_placed".as("approx_n"))
    val err = exact.join(approx, "SellerID")
      .select(max(abs($"approx_n" - $"exact_n") / $"exact_n")).as[Double].head()
    err should be < 0.15 // 3x the 5% rsd
  }

  test("customerAnalyticsApprox preserves the customer_type split closely") {
    val fact = StarSchema.factOrderDetails(spark, sf0001)
    val exact = GoldMarts.customerAnalytics(fact)
      .groupBy("customer_type").count().as[(String, Long)].collect().toMap
    val approx = Sketches.customerAnalyticsApprox(fact)
      .groupBy("customer_type").count().as[(String, Long)].collect().toMap
    exact.keySet shouldBe approx.keySet
    exact.foreach { case (k, v) =>
      math.abs(approx(k) - v).toDouble / v should be < 0.1
    }
  }

  test("percentiles: p50/p90/p99 ordering and bounds") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
      .select(lit("all").as("g"),
        org.apache.spark.sql.functions.length($"text").as("len"))
    val r = Sketches.percentiles(docs, Seq("g"), "len")
      .select($"n", $"p50".cast("double"), $"p90".cast("double"), $"p99".cast("double"))
      .as[(Long, Double, Double, Double)].head()
    r._1 shouldBe 500L
    r._2 should be <= r._3
    r._3 should be <= r._4
  }

  test("approx percentiles track the exact twin within 5%") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
      .select(lit("all").as("g"),
        org.apache.spark.sql.functions.length($"text").as("len"))
    val approx = Sketches.percentiles(docs, Seq("g"), "len")
      .select($"p50".cast("double"), $"p90".cast("double"))
      .as[(Double, Double)].head()
    val exact = Sketches.percentilesExact(docs, Seq("g"), "len")
      .select($"p50", $"p90").as[(Double, Double)].head()
    math.abs(approx._1 - exact._1) / exact._1 should be < 0.05
    math.abs(approx._2 - exact._2) / exact._2 should be < 0.05
  }

  test("kmvSketch: k smallest distinct hashes; duplicates and splits change nothing") {
    import graft.functions.SketchFunctions.kmvSketch
    val vals = (1 to 50).map(i => s"v$i")
    val dup = (vals ++ vals ++ vals).map(Tuple1(_)).toDF("v")
      .select(md5($"v").as("h"))
    val once = vals.map(Tuple1(_)).toDF("v").select(md5($"v").as("h"))
    val k = 16
    val a = dup.agg(kmvSketch($"h", k)).as[Seq[String]].head()
    val b = once.agg(kmvSketch($"h", k)).as[Seq[String]].head()
    a shouldBe b
    a.size shouldBe k
    a shouldBe a.sorted
    // merge law: k-min of two half-sketches == sketch of the whole
    val half1 = vals.take(25).map(Tuple1(_)).toDF("v").select(md5($"v").as("h"))
      .agg(kmvSketch($"h", k)).as[Seq[String]].head()
    val half2 = vals.drop(25).map(Tuple1(_)).toDF("v").select(md5($"v").as("h"))
      .agg(kmvSketch($"h", k)).as[Seq[String]].head()
    (half1 ++ half2).distinct.sorted.take(k) shouldBe a
    // unsaturated sketch IS the distinct set
    val tiny = vals.take(5).map(Tuple1(_)).toDF("v").select(md5($"v").as("h"))
      .agg(kmvSketch($"h", k)).as[Seq[String]].head()
    tiny.size shouldBe 5
  }

  test("sourceOverlapKmv estimates Jaccard/containment of controlled overlap") {
    // source A = tokens t0..t199, B = t100..t299 (1-gram shingles = tokens):
    // |A| = |B| = 200, |A∩B| = 100 -> J = 1/3, containment = 0.5
    val docs = Seq(
      ("A", (0 until 200).map(i => s"t$i").mkString(" ")),
      ("B", (100 until 300).map(i => s"t$i").mkString(" "))
    ).toDF("source", "text")
    val r = Sketches.sourceOverlapKmv(docs, "source", "text", 1, 128)
      .as[(String, String, Double, Double)].head()
    r._1 shouldBe "A"
    r._2 shouldBe "B"
    r._3 shouldBe (1.0 / 3.0) +- 0.15
    r._4 shouldBe 0.5 +- 0.2
  }

  test("kmv_sketch is callable from SQL after registration") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Seq("x", "y", "z").map(Tuple1(_)).toDF("v").createOrReplaceTempView("kmv_in")
    spark.sql("SELECT kmv_sketch(md5(v), 2) AS s FROM kmv_in")
      .as[Seq[String]].head().size shouldBe 2
  }

  test("misraGries: hand-traced decrement on a single partition") {
    // order a,a,a,b,b,c with k=2: a:3,b:2 then c evicts 1 from each and
    // dies -> [(a,2),(b,1)]
    val df = Seq("a", "a", "a", "b", "b", "c").map(Tuple1(_)).toDF("t")
      .repartition(1)
    val r = df.agg(graft.functions.SketchFunctions.misraGries($"t", 2).as("mg"))
      .select(explode($"mg").as("e")).select($"e.item", $"e.est_count")
      .as[(String, Long)].collect().toList
    r shouldBe List(("a", 2L), ("b", 1L))
  }

  test("misraGries guarantees hold vs exact counts on real tokens, any partitioning") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val toks = docs.select(explode(Dedup.tokens($"text")).as("t"))
    val exact = toks.groupBy("t").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val k = 50
    val bound = n / (k + 1) // integer floor is fine: true > N/(k+1) uses it
    for (parts <- Seq(1, 7)) {
      val mg = Sketches.topTermsApprox(
          docs.repartition(parts), Seq.empty, "text", k)
        .as[(String, Long)].collect().toMap
      mg.size should be <= k
      // every guaranteed-heavy term is present
      exact.filter(_._2 > bound).keys.foreach { t =>
        withClue(s"parts=$parts heavy term $t missing: ") {
          mg.contains(t) shouldBe true
        }
      }
      // estimates undercount by at most N/(k+1)
      mg.foreach { case (t, est) =>
        val tru = exact.getOrElse(t, 0L)
        est should be <= tru
        (tru - est) should be <= bound
      }
    }
  }

  test("misraGries is callable from SQL and groups independently") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "v").createOrReplaceTempView("mg_in")
    val r = spark.sql(
      """SELECT g, misra_gries(v, 2) AS mg FROM mg_in GROUP BY g""")
      .select($"g", $"mg".getItem(0).getField("item").as("top"))
      .as[(String, String)].collect().toMap
    r shouldBe Map("g1" -> "x", "g2" -> "z")
  }

  test("countMin: never undercounts, exact when wide, partition-invariant, SQL-callable") {
    import graft.functions.SketchFunctions.countMin
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") :+ "d"
    val df = items.toDF("it")
    def estimates(src: org.apache.spark.sql.DataFrame, width: Int): Map[String, Long] = {
      val sk = src.agg(countMin($"it", 4, width).as("sk"))
      src.distinct().crossJoin(sk)
        .select($"it", Sketches.cmEstimate($"sk", $"it", 4, width).as("est"))
        .as[(String, Long)].collect().toMap
    }
    val truth = Map("a" -> 7L, "b" -> 3L, "c" -> 2L, "d" -> 1L)
    // narrow sketch: estimates bound truth from above
    estimates(df, 4).foreach { case (k, est) => est should be >= truth(k) }
    // wide sketch: 4 items in 64 cells per row — min over 4 rows is exact
    estimates(df, 64) shouldBe truth
    // exact element-wise merge: the MATRIX is partitioning-invariant
    val one = df.coalesce(1).agg(countMin($"it", 4, 16)).as[Seq[Long]].head()
    val many = df.repartition(5).agg(countMin($"it", 4, 16)).as[Seq[Long]].head()
    many shouldBe one
    one.sum shouldBe 4L * items.size // every occurrence lands once per row
    // SQL registration
    df.createOrReplaceTempView("cm_in")
    spark.sql("SELECT count_min(it, 2, 8) FROM cm_in")
      .as[Seq[Long]].head().sum shouldBe 2L * items.size
    an[IllegalArgumentException] should be thrownBy
      Sketches.cmEstimate($"sk", $"it", 5, 16)
  }

  test("kmvCardinalityContract: saturated and unsaturated sources, bound holds") {
    // 200 distinct shingles (saturates k=16), and a tiny source below k
    val big = (1 to 200).map(i => ("big", s"w$i a b"))
    val small = Seq(("small", "x y z"))
    val df = (big ++ small).toDF("source", "text")
    val r = Sketches.kmvCardinalityContract(df, "source", "text", 3, 16, 5.0)
      .as[(String, Long, Double, Double, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    // unsaturated sketch IS the distinct set: est exact, err 0
    r("small")._2 shouldBe 1L
    r("small")._3 shouldBe 1.0
    r("small")._4 shouldBe 0.0
    r("small")._5 shouldBe true
    // saturated: a real estimate within the 5-sigma bound
    r("big")._2 shouldBe 200L
    r("big")._5 shouldBe true
    r("big")._4 should be <= 5.0 * 200.0 / math.sqrt(14.0)
    an[IllegalArgumentException] should be thrownBy
      Sketches.kmvCardinalityContract(df, "source", "text", 3, 2, 5.0)
  }

  test("quantileRankContract: rank guarantee holds, duplicates and coarse sketches ok") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    // coarse sketch (accuracy 10 -> rank tolerance n/10): still within bound
    val r = Sketches.quantileRankContract(df, "grp", "v", Seq(0.5, 0.9), 10)
      .as[(String, Double, Long, Boolean)].collect()
    r.length shouldBe 2
    all(r.map(_._3)) shouldBe 1000L
    all(r.map(_._4)) shouldBe true
    // constant column: every rank is [1, n]; any p is within bound
    val const = Seq.fill(100)(("g", 7.0)).toDF("grp", "v")
    Sketches.quantileRankContract(const, "grp", "v", Seq(0.99), 100)
      .as[(String, Double, Long, Boolean)].head()._4 shouldBe true
    an[IllegalArgumentException] should be thrownBy
      Sketches.quantileRankContract(df, "grp", "v", Seq(1.5), 100)
  }

  test("hllBoundContract: estimate within sigmas*rsd of exact") {
    val df = (1 to 5000).map(i => (s"g${i % 2}", i)).toDF("grp", "id")
    val r = Sketches.hllBoundContract(df, "grp", "id", 0.05, 5.0)
      .as[(String, Long, Boolean)].collect().map(x => x._1 -> x).toMap
    r("g0")._2 shouldBe 2500L
    all(r.values.map(_._3)) shouldBe true
  }

  test("heavyHittersContract: non-vacuous heavy set, theorems hold under repartition") {
    // skewed stream: 'hot' is 60 of 100 tokens -> above N/(k+1) for k=3
    val text = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"w${i % 10}"))
      .mkString(" ")
    val df = Seq(("s0", text)).toDF("source", "text")
    for (parts <- Seq(1, 7)) {
      val r = Sketches.heavyHittersContract(
        df.repartition(parts), "source", "text", 3)
        .as[(String, Long, Long, Boolean, Boolean)].collect()
      r.length shouldBe 1
      val (_, n, heavy, present, bounded) = r.head
      n shouldBe 100L
      heavy should be >= 1L // 'hot' is above 100/4
      present shouldBe true
      bounded shouldBe true
    }
  }

  test("joinSizeContract: exact when wide, never undercounts when narrow") {
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("ka") // f_A = {1:3, 2:1, 3:1}
    val b = Seq(1L, 2L, 2L, 9L).toDF("kb")     // f_B = {1:1, 2:2, 9:1}
    val exact = 3L * 1 + 1L * 2 // = 5
    // wide sketch: no collisions -> inner product is exact
    val wide = graft.ops.Sketches.joinSizeContract(a, "ka", b, "kb", 4, 1024)
      .as[(Long, Long, Boolean)].head()
    wide shouldBe ((exact, exact, true))
    // width 1: every key collides -> est = N_A * N_B, still never under
    val narrow = graft.ops.Sketches.joinSizeContract(a, "ka", b, "kb", 2, 1)
      .as[(Long, Long, Boolean)].head()
    narrow shouldBe ((5L * 4L, exact, true))
    // disjoint keys: exact 0, estimate still >= 0 and the bound holds
    val disj = graft.ops.Sketches.joinSizeContract(
      Seq(1L).toDF("ka"), "ka", Seq(2L).toDF("kb"), "kb", 4, 1024)
      .as[(Long, Long, Boolean)].head()
    disj._2 shouldBe 0L
    disj._3 shouldBe true
    an[IllegalArgumentException] should be thrownBy
      graft.ops.Sketches.joinSizeContract(a, "ka", b, "kb", 5, 16)
  }

  test("rollingActiveContract: bound holds, exact side == exact operator, " +
    "gap days vacuous") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(3)
    // 400 users active on random days over 10 days, plus a silent day 5
    val ev = (1 to 3000).map { _ =>
      val day = { val d = rnd.nextInt(10); if (d == 4) 5 else d } // day idx 4 silent
      (rnd.nextInt(400).toLong + 1L,
        Timestamp.valueOf(f"2024-02-${day + 1}%02d 09:00:00"))
    }.toDF("user_id", "ts")
    val got = graft.ops.Sketches.rollingActiveContract(ev, "user_id", "ts", 3, 12, 5.0)
      .orderBy("day").collect()
    graft.core.CacheRegistry.drain()
    got.foreach(r => r.getBoolean(2) shouldBe true)
    val exact = graft.ops.EventAnalytics.rollingActiveUsers(ev, "user_id", "ts", 3)
      .select("day", "wau").as[(java.sql.Date, Long)].collect().toMap
    graft.core.CacheRegistry.drain()
    got.map(r => r.getDate(0) -> r.getLong(1)).toMap shouldBe exact
    an[IllegalArgumentException] should be thrownBy
      graft.ops.Sketches.rollingActiveContract(ev, "user_id", "ts", 0, 12, 5.0)
  }

  test("weightedPercentiles: the cut lands where the WEIGHT mass says, " +
    "not the row count; non-positive weights excluded") {
    // values 1,2,10 with weights 1,1,8: median weight unit lives at 10
    val d = Seq((1.0, 1.0), (2.0, 1.0), (10.0, 8.0), (5.0, 0.0),
      (6.0, -2.0)).toDF("v", "w")
    val r = graft.ops.Sketches.weightedPercentiles(d, "v", "w",
        Seq(0.1, 0.2, 0.5, 1.0))
      .as[(Double, Double, Double)].collect().sortBy(_._1).toList
    r shouldBe List((0.1, 10.0, 1.0), (0.2, 10.0, 2.0),
      (0.5, 10.0, 10.0), (1.0, 10.0, 10.0))
    an[IllegalArgumentException] should be thrownBy
      graft.ops.Sketches.weightedPercentiles(d, "v", "w", Seq(1.5))
  }
}
