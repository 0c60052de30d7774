package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.core.CacheRegistry

/** Property-based dedup invariants: for arbitrary small corpora the
  * end-to-end near-dup removal must be IDEMPOTENT (a deduplicated corpus
  * has no pairs left at the same threshold), survivors must be exactly
  * the per-cluster minimum ids, and survivors + audit rows must partition
  * the corpus. Raw ScalaCheck generators from fixed seeds (the
  * scalatest-scalacheck bridge is not on the classpath). */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  // a tiny vocabulary makes shingle collisions (and thus near-dup chains)
  // common; docs are 3-8 words so 3-gram shingles exist for most docs
  private val docGen: Gen[String] = for {
    n <- Gen.choose(3, 8)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
  } yield ws.mkString(" ")

  private def corpus(seed: Long, size: Int): Seq[(Long, String)] =
    Gen.listOfN(size, docGen)
      .pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }

  test("dropNearDuplicates is idempotent: the survivor set has no pairs left") {
    for (seed <- 1L to 6L) {
      val docs = corpus(seed, 14).toDF("doc_id", "text")
      val survivors = Dedup.dropNearDuplicates(docs, "doc_id", "text", 3, 0.5)
        .as[Long].collect().toSet
      CacheRegistry.drain()
      val kept = docs.where($"doc_id".isin(survivors.toSeq: _*))
      val residualPairs = Dedup.ngramJaccardPairs(kept, "doc_id", "text", 3, 0.5).count()
      withClue(s"seed=$seed survivors=$survivors: ") {
        residualPairs shouldBe 0L
      }
    }
  }

  test("survivors are exactly the per-cluster min ids; survivors+audit partition the corpus") {
    for (seed <- 11L to 16L) {
      val docs = corpus(seed, 14).toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val assign = Dedup.clusters(pairs, "id_a", "id_b", docs.select("doc_id"), "doc_id")
        .as[(Long, Long)].collect()
      CacheRegistry.drain()
      val minPerCluster = assign.groupBy(_._2).map(_._2.map(_._1).min).toSet
      val survivors = Dedup.dropNearDuplicates(docs, "doc_id", "text", 3, 0.5)
        .as[Long].collect().toSet
      CacheRegistry.drain()
      val dropped = Dedup.nearDuplicateAudit(docs, "doc_id", "text", 3, 0.5)
        .select("dropped_id").as[Long].collect().toSet
      CacheRegistry.drain()
      withClue(s"seed=$seed: ") {
        survivors shouldBe minPerCluster
        (survivors intersect dropped) shouldBe empty
        (survivors union dropped) shouldBe assign.map(_._1).toSet
      }
    }
  }

  test("bestRepresentatives: one rep per cluster, rep has the cluster's max length") {
    for (seed <- 21L to 24L) {
      val docs = corpus(seed, 12).toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val assign = Dedup.clusters(pairs, "id_a", "id_b", docs.select("doc_id"), "doc_id")
        .as[(Long, Long)].collect()
      CacheRegistry.drain()
      val reps = Dedup.bestRepresentatives(docs, "doc_id", "text", 3, 0.5)
        .select("cluster_id", "rep_id", "n_members")
        .as[(Long, Long, Long)].collect()
      CacheRegistry.drain()
      val lens = docs.select($"doc_id", org.apache.spark.sql.functions.length($"text"))
        .as[(Long, Int)].collect().toMap
      val byCluster = assign.groupBy(_._2)
      withClue(s"seed=$seed: ") {
        reps.map(_._1).toSet shouldBe byCluster.keySet
        reps.foreach { case (cid, rep, n) =>
          val members = byCluster(cid).map(_._1)
          n shouldBe members.length.toLong
          lens(rep) shouldBe members.map(lens).max
        }
      }
    }
  }
}
