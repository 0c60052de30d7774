package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.core.Tables

/** Quantified recall contracts for the approximate neighbor paths — the
  * plan-shape gates (PlanSpec: no cartesian anywhere) say the ANN operators
  * are CHEAP; this spec pins that they are also GOOD, against the exact
  * brute-force baseline (q24's operator) on the benchmark embeddings.
  *
  * Everything is md5/sign-derived (no RNG), so measured recall is exactly
  * reproducible and the asserted lower bounds are stable pins, not flaky
  * statistics. Bounds sit a few points below the measured values so a
  * benign reordering can't trip them; a real regression (a broken band
  * key, a probe off-by-one) craters recall far past the slack.
  */
class AnnRecallSpec extends SparkSpec {

  private val k = 10
  private lazy val emb = Tables.table(spark, sf0001, "embeddings")
  private lazy val exact =
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", k)
      .select("query_id", "cand_id")
      .persist()

  /** Mean recall@k: |approx ∩ exact| / (k · queries) — every query appears
    * in the exact baseline (500 vectors ≫ k), so the denominator is flat. */
  private def recallAtK(approx: DataFrame): Double = {
    val hits = approx.select("query_id", "cand_id")
      .join(exact, Seq("query_id", "cand_id"), "left_semi")
      .count()
    val nq = exact.select("query_id").distinct().count()
    hits.toDouble / (nq * k)
  }

  test("multi-band LSH recall rises monotonically with bands and clears its floor") {
    val byBands = Seq(1, 4, 8).map { bands =>
      bands -> recallAtK(
        Similarity.multiBandLshTopK(emb, "vec_id", "embedding", k, bits = 8, bands = bands))
    }.toMap
    info(s"sign-LSH recall@$k by bands: $byBands")
    byBands(4) should be >= byBands(1)
    byBands(8) should be >= byBands(4)
    // the benchmark embeddings are near-uniform in 64 dims — the hardest
    // case for sign-LSH (neighbor cosines are weak, so 8-bit agreement is
    // rare). Chance recall for a random k-subset is k/(N-1) ≈ 0.02;
    // measured: bands 1 → 0.0158 (BELOW chance — the single-prefix
    // fragility its scaladoc warns about), 4 → 0.0604, 8 → 0.1168 (~6×
    // chance). Floor set under the measured 8-band value.
    byBands(8) should be >= 0.10
  }

  test("IVF recall rises monotonically with nProbe and clears its floor") {
    val byProbe = Seq(1, 2, 4).map { nProbe =>
      nProbe -> recallAtK(
        Similarity.ivfTopK(emb, "vec_id", "embedding", k, nCells = 16, nProbe = nProbe))
    }.toMap
    info(s"IVF recall@$k by nProbe (16 cells): $byProbe")
    byProbe(2) should be >= byProbe(1)
    byProbe(4) should be >= byProbe(2)
    // measured on the near-uniform benchmark vectors: nProbe 1 → 0.192,
    // 2 → 0.3024, 4 → 0.4658 (~23× the 0.02 chance baseline) — IVF probes
    // whole cells, so it degrades far more gracefully than sign-LSH on
    // weak-neighbor data. Floor set under the measured 4-probe value.
    byProbe(4) should be >= 0.40
  }

  test("a trained quantizer (Lloyd iterations) does not lose recall vs hashed seeds") {
    val seeded = recallAtK(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k, nCells = 16, nProbe = 4))
    val trained = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 3)
    val fitted = recallAtK(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k, nCells = 16, nProbe = 4,
        centroids = Some(trained)))
    info(s"IVF recall@$k nProbe=4: hashed-seed $seeded vs k-means $fitted")
    fitted should be >= seeded - 0.05
  }
}
