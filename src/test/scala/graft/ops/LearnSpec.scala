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
}
