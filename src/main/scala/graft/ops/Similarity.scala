package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The arithmetic uses Spark's higher-order functions (`zip_with` +
  * `aggregate`), which fold left-to-right in DOUBLE — deterministic and
  * order-independent of partitioning, so results are bit-reproducible.
  *
  * Scale notes:
  *  - [[bruteForceTopK]] is the exact baseline: a self cross-join, O(N²·d).
  *    Fine to ~10⁴ vectors per side; it is the *verifier*, not the scale path.
  *  - [[lshTopK]] is the scale path: random-hyperplane-style sign bucketing
  *    (here: sign pattern of the first `bits` dimensions — deterministic and
  *    engine-portable) turns the cross join into a per-bucket join; the
  *    shuffle key is the bucket. An IVF refinement would k-means the buckets;
  *    sign-LSH keeps the demo deterministic.
  *  - cosines are rounded to 6 dp before ranking so float noise can't flip
  *    ranks across engines; ties break on candidate id.
  */
object Similarity {

  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Σ aᵢ·bᵢ, folded sequentially in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** All (a,b) pairs, a ≠ b, with rounded cosine. */
  private def pairCosines(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val a = emb.select(col(idCol).as("query_id"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("cand_id"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
  }

  /** Exact top-k nearest neighbors per vector by cosine (brute force). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    pairCosines(emb, idCol, vecCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  /** Sign pattern of the first `bits` dimensions — a deterministic
    * hyperplane-LSH bucket key. */
  def signBucket(vec: Column, bits: Int): Column =
    concat_ws("", (0 until bits).map(i =>
      when(element_at(vec, i + 1) >= 0f, "1").otherwise("0")): _*)

  /** Approximate top-k: candidates restricted to the same sign-LSH bucket.
    * Recall < 1 by design; the bucket join replaces the N² cross join. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = emb.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("cand_id"), col(vecCol).as("vb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold). */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame =
    pairCosines(emb, idCol, vecCol)
      .where(col("query_id") < col("cand_id") && col("cos") >= threshold)
      .select(col("query_id").as("id_a"), col("cand_id").as("id_b"), col("cos"))
}
