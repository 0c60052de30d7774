package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model fitting — the "train a small model ON the query engine"
  * surface (TPC-H-era engines stop at aggregation; a training-data engine
  * wants the quick scoring models next to the data). Everything here is
  * full-batch, fixed-iteration, and md5/rounding-deterministic: the same
  * replay-stability contract as [[Sampling]] (a backfill or engine swap
  * reproduces the identical weights, which is what makes model-assisted
  * curation auditable).
  */
object Learn {

  /** Full-batch logistic regression by gradient descent, UNROLLED to a
    * fixed iteration count: features are z-scored against 6 dp-rounded
    * population moments, weights start at 0 and update
    * `w ← round(w − lr·∇, 6)` each round — the 6 dp re-round after every
    * update is what makes the trajectory engine-exact (per-row `exp`
    * ulps vanish into the rounding quantum instead of compounding across
    * iterations; the [[Similarity.kmeansFit]] device). The loss uses the
    * overflow-stable softplus form `max(z,0) − y·z + ln(1+e^{−|z|})`;
    * predictions threshold at `z ≥ 0` (≡ p ≥ 0.5, no transcendentals).
    * Rows with a null label or null feature are excluded.
    * Output: ONE row — (n_rows, n_iters, bias, w_<feature>…,
    * log_loss 6 dp, accuracy 6 dp).
    *
    * Scale shape: one standardization aggregate, then ONE full-scan
    * aggregate per iteration (map-side partial gradients — the classic
    * distributed-GD shape); the driver holds only the (k+1)-vector of
    * weights. Iterations are a fixed hyperparameter, so the plan is
    * O(iters) independent scans, each whole-stage codegen'd. */
  def logisticGd(df: DataFrame, featureCols: Seq[String], labelCol: String,
                 lr: Double, iters: Int): DataFrame = {
    require(featureCols.nonEmpty, "logisticGd: need at least one feature")
    require(lr > 0, s"logisticGd: need lr > 0, got $lr")
    require(iters >= 1 && iters <= 50,
      s"logisticGd: need 1 <= iters <= 50, got $iters")
    val y = col(labelCol).cast("double")
    val raw = df.where(featureCols.map(c => col(c).isNotNull).reduce(_ && _)
        && y.isNotNull)
      .select(y.as("__y") +: featureCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"__x$i") }: _*)
    val k = featureCols.size
    val stats = raw.agg(
      round(avg(col("__x0")), 6).as("m0"),
      (Seq(round(stddev_pop(col("__x0")), 6).as("s0")) ++
        (1 until k).flatMap(i => Seq(
          round(avg(col(s"__x$i")), 6).as(s"m$i"),
          round(stddev_pop(col(s"__x$i")), 6).as(s"s$i")))): _*).head()
    val base = graft.core.CacheRegistry.persist(
      raw.select(col("__y") +: (0 until k).map { i =>
        val m = stats.getAs[Double](s"m$i")
        val s = stats.getAs[Double](s"s$i")
        require(s > 0, s"logisticGd: feature ${featureCols(i)} has zero variance")
        ((col(s"__x$i") - lit(m)) / lit(s)).as(s"__z$i")
      }: _*))
    // HALF_UP to match SQL round() — rint's half-to-even would diverge
    // from the oracle exactly on a 5e-7 boundary
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var w = Array.fill(k + 1)(0.0) // bias :: feature weights
    for (_ <- 1 to iters) {
      val z = (0 until k).foldLeft(lit(w(0)): Column)((acc, i) =>
        acc + lit(w(i + 1)) * col(s"__z$i"))
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val g = base.agg(
        avg(p - col("__y")).as("g0"),
        (0 until k).map(i =>
          avg((p - col("__y")) * col(s"__z$i")).as(s"g${i + 1}")): _*).head()
      w = w.zipWithIndex.map { case (wi, j) =>
        r6(wi - lr * g.getAs[Double](s"g$j")) }
    }
    val zF = (0 until k).foldLeft(lit(w(0)): Column)((acc, i) =>
      acc + lit(w(i + 1)) * col(s"__z$i"))
    val loss = greatest(zF, lit(0.0)) - col("__y") * zF +
      log(lit(1.0) + exp(-abs(zF)))
    base.agg(
      count(lit(1)).as("n_rows"),
      (lit(iters).cast("long").as("n_iters") +:
        lit(w(0)).as("bias") +:
        (0 until k).map(i => lit(w(i + 1)).as(s"w_${featureCols(i)}")) :+
        round(avg(loss), 6).as("log_loss") :+
        round(avg(((zF >= 0).cast("double") === col("__y")).cast("double")), 6)
          .as("accuracy")): _*)
  }
}
