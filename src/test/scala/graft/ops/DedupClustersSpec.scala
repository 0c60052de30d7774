package graft.ops

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("clusters: chains collapse to the minimum id; singletons keep their own") {
    // components: {1,2,3,4} (chain), {5,6}, {7} (no edges)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val ids = (1L to 7L).toDF("doc_id")
    val r = Dedup.clusters(pairs, "id_a", "id_b", ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L)
  }

  test("clusters match a union-find reference on random pair graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 30
      val ids = (0L until n.toLong).toList
      val pairs = (1 to 25).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // union-find, always pointing the larger root at the smaller, so a
      // component's root IS its minimum id — the operator's contract
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.map(i => i -> find(i)).toMap
      val got = Dedup.clusters(pairs.toDF("id_a", "id_b"), "id_a", "id_b",
        ids.toDF("doc_id"), "doc_id", maxIters = 40)
        .as[(Long, Long)].collect().toMap
      got shouldBe expected
    }
  }

  test("clusters throws instead of returning non-converged labels") {
    // a chain of diameter 7 cannot converge in 2 one-hop rounds; silent
    // wrong cluster ids would poison every downstream keep/drop decision
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ids = (1L to 8L).toDF("doc_id")
    intercept[IllegalStateException] {
      Dedup.clusters(chain, "id_a", "id_b", ids, "doc_id", maxIters = 2)
    }
  }

  test("clusters over real near-dup pairs: every pair lands in one cluster") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).cache()
    val assign = Dedup.clusters(pairs, "id_a", "id_b", docs.select("doc_id"), "doc_id")
    val joined = pairs
      .join(assign.toDF("id_a", "ca"), Seq("id_a"))
      .join(assign.toDF("id_b", "cb"), Seq("id_b"))
    joined.where($"ca" =!= $"cb").count() shouldBe 0
    // cluster count = docs - collapsed duplicates
    val nDocs = docs.count()
    val nClusters = assign.select("cluster_id").distinct().count()
    nClusters should be < nDocs
    pairs.unpersist()
  }
}
