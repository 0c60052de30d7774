package graft.ops

import graft.SparkSpec

class LearnSpec extends SparkSpec {
  import spark.implicits._

  test("logisticGd: separable feature -> perfect sign, deterministic weights") {
    // y == 1 exactly when x is high: after z-scoring x is ±1, so the
    // first-round gradient already points the right way and z >= 0
    // classifies perfectly
    val df = (1 to 40).map { i =>
      val y = i % 2 // alternate to keep both classes balanced
      (if (y == 1) 10.0 else -10.0, y)
    }.toDF("x", "y")
    val r = Learn.logisticGd(df, Seq("x"), "y", 0.5, 3).head()
    r.getAs[Long]("n_rows") shouldBe 40L
    r.getAs[Long]("n_iters") shouldBe 3L
    r.getAs[Double]("bias") shouldBe 0.0 // balanced classes, zero-mean z
    r.getAs[Double]("w_x") should be > 0.0
    r.getAs[Double]("accuracy") shouldBe 1.0
    r.getAs[Double]("log_loss") should be < math.log(2.0) // beats w = 0
    // replay-identical (no RNG anywhere)
    Learn.logisticGd(df, Seq("x"), "y", 0.5, 3).head() shouldBe r
    graft.core.CacheRegistry.drain()
  }

  test("logisticGd: null rows excluded; zero-variance feature rejected") {
    val df = Seq((Some(1.0), Some(1)), (Some(-1.0), Some(0)),
      (None, Some(1)), (Some(2.0), None)).toDF("x", "y")
    Learn.logisticGd(df, Seq("x"), "y", 0.5, 1)
      .head().getAs[Long]("n_rows") shouldBe 2L
    graft.core.CacheRegistry.drain()
    val flat = Seq((1.0, 1), (1.0, 0)).toDF("x", "y")
    an[IllegalArgumentException] should be thrownBy
      Learn.logisticGd(flat, Seq("x"), "y", 0.5, 1)
    an[IllegalArgumentException] should be thrownBy
      Learn.logisticGd(df, Seq.empty, "y", 0.5, 1)
    an[IllegalArgumentException] should be thrownBy
      Learn.logisticGd(df, Seq("x"), "y", 0.0, 1)
    graft.core.CacheRegistry.drain()
  }

  test("nearestCentroidEval: axis-separated classes classify perfectly; " +
    "holdout is id % m == 0; null rows excluded") {
    // class 0 points along +x, class 1 along +y; ids ≡ 0 (mod 2) held
    // out — labels decoupled from the holdout parity so both splits see
    // both classes
    val rows = (1 to 20).map { i =>
      val lab = if (i % 4 < 2) 0 else 1
      val v = if (lab == 0) Array(1.0f, 0.1f * (i % 3))
              else Array(0.1f * (i % 3), 1.0f)
      (i.toLong, v, Some(lab))
    } :+ ((21L, null.asInstanceOf[Array[Float]], Some(0))) :+
      ((22L, Array(1.0f, 0.0f), None: Option[Int]))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = Learn.nearestCentroidEval(emb, "vec_id", "embedding", "label", 2)
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    // even ids 2..20 are held out: 10 rows, alternating labels 1/0
    r.keySet shouldBe Set((0, 0), (1, 1)) // perfect confusion diagonal
    r((0, 0)) shouldBe 5L
    r((1, 1)) shouldBe 5L
    an[IllegalArgumentException] should be thrownBy
      Learn.nearestCentroidEval(emb, "vec_id", "embedding", "label", 1)
    graft.core.CacheRegistry.drain()
  }

  test("conformalCoverage: hand order statistic, measured holdout coverage") {
    // calib (odd ids): values 0..4 → mu = 2, scores sorted 0,1,1,2,2;
    // k = ceil(6·0.8) = 5 → qhat = 2. hold (even ids): |v−2| = 2,0,2,3,98
    // → 3 of 5 inside the interval
    val df = Seq(
      (1L, "a", 0.0), (3L, "a", 1.0), (5L, "a", 2.0), (7L, "a", 3.0),
      (9L, "a", 4.0),
      (2L, "a", 0.0), (4L, "a", 2.0), (6L, "a", 4.0), (8L, "a", 5.0),
      (10L, "a", 100.0)).toDF("id", "g", "v")
    val r = Learn.conformalCoverage(df, "id", "g", "v", 0.8, 2).head()
    r.getAs[Long]("n_calib") shouldBe 5L
    r.getAs[Long]("n_hold") shouldBe 5L
    r.getAs[Double]("mu") shouldBe 2.0
    r.getAs[Double]("qhat") shouldBe 2.0
    r.getAs[Double]("coverage") shouldBe 0.6
    // 5σ slack at n = 5 is generous by design: the contract catches rank
    // bugs, not sampling noise
    r.getAs[Boolean]("covered") shouldBe true
    an[IllegalArgumentException] should be thrownBy
      Learn.conformalCoverage(df, "id", "g", "v", 1.0, 2)
    an[IllegalArgumentException] should be thrownBy
      Learn.conformalCoverage(df, "id", "g", "v", 0.8, 1)
  }

  test("naiveBayesEval: hand-computed smoothed scores, OOV-only docs " +
    "drop out, ties break to the smaller label") {
    import org.apache.spark.sql.functions.col
    // train A: {x:3, y:2} cl=5; train B: {z:3, y:1} cl=4; V=3
    // P(x|A)=4/8 P(y|A)=3/8 P(z|A)=1/8; P(x|B)=1/7 P(y|B)=2/7 P(z|B)=4/7
    val docs = Seq(
      (1L, "x x y", "A", false), (2L, "x y", "A", false),
      (3L, "z z", "B", false), (4L, "z y", "B", false),
      (10L, "x x z", "A", true), // A: ~-4.159 beats B: ~-5.145
      (11L, "z y", "B", true),   // B: ~-2.506 beats A: ~-3.753
      (12L, "x", "B", true),     // misclassified as A
      (13L, "w w", "A", true))   // OOV-only: no prediction row
      .toDF("doc_id", "text", "lang", "is_test")
    val r = graft.core.CacheRegistry.scoped {
      Learn.naiveBayesEval(docs, "doc_id", "text", "lang", col("is_test"))
        .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
        .toMap
    }
    r shouldBe Map(("A", "A") -> 1L, ("B", "B") -> 1L, ("B", "A") -> 1L)
    graft.core.CacheRegistry.drain()
  }

  test("bradleyTerry: two-player fixed point, micro-integer trajectory") {
    // A beats B twice, B beats A once: W_A=2, W_B=1, n=3. Round 1 lands
    // on (1.333333, 0.666667) and the mean-1 normalization holds it
    // there - a hand-checkable fixed point of the snapped MM map.
    val duels = Seq(("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val r = graft.core.CacheRegistry.scoped {
      Learn.bradleyTerry(duels, "winner", "loser", 3)
        .as[(String, Long, Long, Double, Int)].collect().sortBy(_._5).toList
    }
    r shouldBe List(("A", 3L, 2L, 1.333333, 1), ("B", 3L, 1L, 0.666667, 2))
    graft.core.CacheRegistry.drain()
  }

  test("bradleyTerry: chain orders transitively; all-losses player floors " +
    "above zero; self-duels and nulls excluded") {
    val duels = Seq(
      (Some("A"), Some("B")), (Some("B"), Some("C")),
      (Some("C"), Some("C")), (None, Some("A")), (Some("B"), None))
      .toDF("winner", "loser")
    val r = graft.core.CacheRegistry.scoped {
      Learn.bradleyTerry(duels, "winner", "loser", 3)
        .as[(String, Long, Long, Double, Int)].collect().sortBy(_._5).toList
    }
    r.map(_._1) shouldBe List("A", "B", "C")
    r.map(_._2) shouldBe List(1L, 2L, 1L)
    r.map(_._3) shouldBe List(1L, 1L, 0L)
    all(r.map(_._4)) should be > 0.0
    r(0)._4 should be > r(1)._4
    r(1)._4 should be > r(2)._4
    an[IllegalArgumentException] should be thrownBy
      Learn.bradleyTerry(duels, "winner", "loser", 0)
    graft.core.CacheRegistry.drain()
  }

  test("ridgeClosedForm: hand 3x3 Cramer solution; constant-zero feature " +
    "gets weight 0; shrinkage pulls the OLS slope") {
    // y = 2*x1 on {1,2,3}, lambda 1: normal equations give
    // bias = w1 = 12/9 (OLS would be 0 and 2); SST = 8
    val d = Seq((1.0, 0.0, 2.0), (2.0, 0.0, 4.0), (3.0, 0.0, 6.0))
      .toDF("x1", "x2", "y")
    val r = graft.core.CacheRegistry.scoped {
      Learn.ridgeClosedForm(d, "x1", "x2", "y", 1.0)
        .as[(Long, Double, Double, Double, Double, Option[Double])].head()
    }
    r shouldBe ((3L, 1.0, 1.333333, 1.333333, 0.0, Some(0.888889)))
    // constant target: SST 0 -> null r2
    val flat = Seq((1.0, 2.0, 5.0), (2.0, 1.0, 5.0)).toDF("x1", "x2", "y")
    graft.core.CacheRegistry.scoped {
      Learn.ridgeClosedForm(flat, "x1", "x2", "y", 1.0)
        .as[(Long, Double, Double, Double, Double, Option[Double])].head()
    }._6 shouldBe None
    an[IllegalArgumentException] should be thrownBy
      Learn.ridgeClosedForm(d, "x1", "x2", "y", 0.0)
    graft.core.CacheRegistry.drain()
  }

  test("c2st: separable cohorts clear the binomial noise band, identical " +
    "cohorts do not") {
    import org.apache.spark.sql.functions._
    val sep = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", 100.0 + i))).toDF("cohort", "x")
    val r = graft.core.CacheRegistry.scoped {
      Learn.c2st(sep, Seq("x"), "cohort", "a", "b", 0.5, 3)
        .select(col("n_rows"), col("accuracy"), col("shifted"))
        .as[(Long, Double, Boolean)].head()
    }
    r shouldBe ((40L, 1.0, true))
    // same distribution on both sides: the probe cannot tell them apart
    val same = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", i.toDouble))).toDF("cohort", "x")
    val s = graft.core.CacheRegistry.scoped {
      Learn.c2st(same, Seq("x"), "cohort", "a", "b", 0.5, 3)
        .select(col("accuracy"), col("shifted"))
        .as[(Double, Boolean)].head()
    }
    s._2 shouldBe false
    graft.core.CacheRegistry.drain()
  }

  test("sourceInfluence: leave-out algebra on hand centroids; a poison " +
    "shard's removal shows as positive-vs-zero influence; vanished label " +
    "and single-group edges") {
    import org.apache.spark.sql.functions._
    // shard a: clean axis-aligned labels; shard b: label-0 rows at -x
    // full c0 = (-0.2, 0) -> a's label-0 rows flip wrong; acc 5/7
    // without b: c0 = (1, 0) -> b's rows flip wrong; acc 4/7
    // without a: only c0 = (-1, 0) survives (label 1 vanishes); acc 5/7
    val d = Seq(
      (1L, 0, "a", Seq(1f, 0f)), (2L, 0, "a", Seq(1f, 0f)),
      (3L, 1, "a", Seq(0f, 1f)), (4L, 1, "a", Seq(0f, 1f)),
      (5L, 0, "b", Seq(-1f, 0f)), (6L, 0, "b", Seq(-1f, 0f)),
      (7L, 0, "b", Seq(-1f, 0f)))
      .toDF("id", "label", "shard", "vec")
    val r = graft.core.CacheRegistry.scoped {
      Learn.sourceInfluence(d, "id", "vec", "label", "shard")
        .as[(String, Long, Double, Double, Double)]
        .collect().map(x => x._1 -> x).toMap
    }
    r("a") shouldBe (("a", 4L, 0.714286, 0.714286, 0.0))
    r("b") shouldBe (("b", 3L, 0.714286, 0.571429, 0.142857))
    // single group: the leave-out model is empty -> null acc/influence
    val one = d.where(col("shard") === "a")
    val s = graft.core.CacheRegistry.scoped {
      Learn.sourceInfluence(one, "id", "vec", "label", "shard")
        .as[(String, Long, Option[Double], Option[Double], Option[Double])]
        .head()
    }
    s shouldBe (("a", 4L, Some(1.0), None, None))
    graft.core.CacheRegistry.drain()
  }

  test("ipwAte: symmetric propensity degenerates to weight-2 means; " +
    "ate = weighted mean difference; bad inputs throw") {
    // x is symmetric across arms -> every GD gradient is 0, w stays 0,
    // e = 0.5, weight = 2 everywhere: plain arm means
    val d = Seq((0.0, true, 10.0), (0.0, false, 8.0),
      (1.0, true, 20.0), (1.0, false, 12.0)).toDF("x", "tr", "y")
    val r = graft.core.CacheRegistry.scoped {
      Learn.ipwAte(d, Seq("x"), "tr", "y", 0.5, 3)
        .as[(Long, Long, Long, Option[Double], Option[Double],
          Option[Double], Option[Double], Option[Double])].head()
    }
    graft.core.CacheRegistry.drain()
    r shouldBe ((4L, 2L, 2L, Some(2.0), Some(2.0), Some(15.0), Some(10.0),
      Some(5.0)))
    an[IllegalArgumentException] should be thrownBy
      Learn.ipwAte(d, Seq.empty, "tr", "y", 0.5, 3)
    an[IllegalArgumentException] should be thrownBy
      Learn.ipwAte(d, Seq("x"), "tr", "y", 0.5, 3, clip = 0.6)
    // zero-variance feature is rejected like logisticGd
    an[IllegalArgumentException] should be thrownBy
      graft.core.CacheRegistry.scoped {
        Learn.ipwAte(d.withColumn("c",
          org.apache.spark.sql.functions.lit(1.0)), Seq("c"), "tr", "y",
          0.5, 1).collect()
      }
  }

  test("classBalancedWeights: effective numbers at beta=0.5 and the " +
    "k-normalization; beta out of range throws") {
    val d = Seq("a", "a", "a", "b").toDF("lbl")
    val r = Learn.classBalancedWeights(d, "lbl", 0.5)
      .as[(String, Long, Double, Double)].collect().map(x => x._1 -> x).toMap
    // eff_a = (1-0.125)/0.5 = 1.75, eff_b = 1; raw 1/1.75 and 1;
    // weights normalized so they sum to k=2
    r("a") shouldBe (("a", 3L, 1.75, 0.727273))
    r("b") shouldBe (("b", 1L, 1.0, 1.272727))
    an[IllegalArgumentException] should be thrownBy
      Learn.classBalancedWeights(d, "lbl", 1.0)
  }

  test("dataCartography: symmetric signal collapses to one exact " +
    "ambiguous bucket; buckets partition the rows; replay-identical") {
    // x symmetric across labels -> every gradient 0, every snapshot
    // p = 0.5 -> conf 0.5, var 0; medians equal the values, so every
    // row lands in 'ambiguous' with exact means
    val sym = Seq((0.0, 1), (0.0, 0), (1.0, 1), (1.0, 0)).toDF("x", "y")
    val r = graft.core.CacheRegistry.scoped {
      Learn.dataCartography(sym, Seq("x"), "y", 0.5, 3)
        .as[(String, Long, Double, Double)].collect().toList
    }
    graft.core.CacheRegistry.drain()
    r shouldBe List(("ambiguous", 4L, 0.5, 0.0))
    // separable signal: buckets partition all rows, and the run replays
    val sep = (1 to 24).map(i => (if (i % 2 == 1) 10.0 + i % 3
      else -10.0 - i % 3, i % 2)).toDF("x", "y")
    val a = graft.core.CacheRegistry.scoped {
      Learn.dataCartography(sep, Seq("x"), "y", 0.5, 3)
        .as[(String, Long, Double, Double)].collect().sortBy(_._1).toList
    }
    graft.core.CacheRegistry.drain()
    a.map(_._2).sum shouldBe 24L
    val b = graft.core.CacheRegistry.scoped {
      Learn.dataCartography(sep, Seq("x"), "y", 0.5, 3)
        .as[(String, Long, Double, Double)].collect().sortBy(_._1).toList
    }
    graft.core.CacheRegistry.drain()
    b shouldBe a
  }

  test("learningCurve: perfect separable full-fraction point has " +
    "accuracy 1 and no fit (zero error drops out); bad fractions throw") {
    // class 0 along +x, class 1 along +y; ids 5,10,... held out
    val rows = (1 to 30).map { i =>
      val lab = if (i % 4 < 2) 0 else 1
      val v = if (lab == 0) Array(1.0f, 0.1f * (i % 3))
              else Array(0.1f * (i % 3), 1.0f)
      (i.toLong, v, lab)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = graft.core.CacheRegistry.scoped {
      Learn.learningCurve(emb, "vec_id", "embedding", "label", 5, Seq(16))
        .as[(Long, Long, Option[Double], Option[Double], Option[Double],
          Option[Double])].head()
    }
    graft.core.CacheRegistry.drain()
    r._1 shouldBe 16L
    r._2 shouldBe 24L // 30 minus the 6 held-out ids
    r._3 shouldBe Some(1.0)
    r._4 shouldBe Some(0.0)
    r._5 shouldBe None // a zero-error point cannot anchor a log fit
    an[IllegalArgumentException] should be thrownBy
      Learn.learningCurve(emb, "vec_id", "embedding", "label", 5, Seq(0))
    an[IllegalArgumentException] should be thrownBy
      Learn.learningCurve(emb, "vec_id", "embedding", "label", 5,
        Seq(4, 4))
  }
  test("confidentLearning: mislabeled holdout example lands off-diagonal " +
    "with the right suspected label; clean rows stay diagonal") {
    // train rows pin centroid a = +x, centroid b = +y; holdout (id % 5
    // == 0): ids 5, 20 correctly labeled, id 10 labeled a but sits on b's
    // axis -> the confident joint should flag exactly (a -> b)
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.0f), "a"),
      (3L, Array(0.0f, 1.0f), "b"), (4L, Array(0.0f, 1.0f), "b"),
      (5L, Array(1.0f, 0.0f), "a"),
      (10L, Array(0.0f, 1.0f), "a"), // the planted label error
      (15L, Array(0.0f, 1.0f), "b"), (20L, Array(0.0f, 1.0f), "b"),
      // abstainer: cos 0.4 to a < t_a = 0.5 and cos 0.9165 to b < t_b
      // (the mean over given-b holdout, dragged up by 15/20's 1.0s) ->
      // clears NO threshold, must surface as (b, NULL, 1)
      (25L, Array(0.4f, 0.9165151f), "b"))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Learn.confidentLearning(emb, "vec_id", "embedding", "label", 5)
      .collect().map(r => (r.getAs[String]("given_label"),
        r.getAs[String]("suspected_label"), r.getAs[Long]("n"),
        r.getAs[Boolean]("flagged"))).toSet
    out should contain (("a", "b", 1L, true))
    out should contain (("b", "b", 2L, false))
    // id 5 scores 1.0 on a (>= t_a = mean(1.0, 0.0)) and 0.0 on b -> (a, a)
    out should contain (("a", "a", 1L, false))
    // id 25's abstention is visible, not silently dropped
    out should contain (("b", null, 1L, false))
    out.size shouldBe 4
    an[IllegalArgumentException] should be thrownBy
      Learn.confidentLearning(emb, "vec_id", "embedding", "label", 1)
    graft.core.CacheRegistry.drain()
  }

  test("activeLearningBatch: smallest margins picked first, per-cluster " +
    "cap enforces diversity, ties break to the lower label") {
    // train pins centroid a = +x, b = +y; pool: id 5 is a clear 'a'
    // (margin 1.0), id 10 sits on the diagonal (margin 0, tie -> a),
    // id 15 is a clear 'b'. perCluster=1 drops id 5 (second in cell a).
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.0f), "a"),
      (3L, Array(0.0f, 1.0f), "b"), (4L, Array(0.0f, 1.0f), "b"),
      (5L, Array(1.0f, 0.0f), "a"),
      (10L, Array(0.7f, 0.7f), "a"),
      (15L, Array(0.1f, 0.9f), "b"))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Learn.activeLearningBatch(
        emb, "vec_id", "embedding", "label", 5, 2, 1)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[String]("nearest_label"), r.getAs[String]("second_label"),
        r.getAs[Double]("sim"), r.getAs[Double]("margin"),
        r.getAs[Long]("pick_rank"))).toList
    out shouldBe List(
      (10L, "a", "b", 0.707107, 0.0, 1L),
      (15L, "b", "a", 0.993884, 0.883452, 2L))
    an[IllegalArgumentException] should be thrownBy
      Learn.activeLearningBatch(emb, "vec_id", "embedding", "label", 5, 0, 1)
    graft.core.CacheRegistry.drain()
  }
}
