package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (1L, Seq(1f, 0f, 0f)),
    (2L, Seq(0.9f, 0.1f, 0f)), // close to 1
    (3L, Seq(0f, 1f, 0f)),     // orthogonal to 1
    (4L, Seq(-1f, 0f, 0f))     // opposite of 1
  ).toDF("vec_id", "embedding")

  test("cosine: known geometry") {
    val pairs = Seq(
      (Seq(1f, 0f, 0f), Seq(1f, 0f, 0f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 0f, 0f), Seq(-1f, 0f, 0f))
    ).toDF("a", "b")
    val r = pairs.select(round(Similarity.cosine($"a", $"b"), 6).as("c"))
      .as[Double].collect().toSeq
    r shouldBe Seq(1.0, 0.0, -1.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val r = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 2)
      .where($"query_id" === 1)
      .select("cand_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    r shouldBe Seq((2L, 1), (3L, 2))
  }

  test("signBucket separates opposite-sign vectors") {
    val b = emb.select($"vec_id", Similarity.signBucket($"embedding", 3).as("b"))
      .as[(Long, String)].collect().toMap
    b(1L) shouldBe b(2L) // same orthant
    b(1L) should not be b(4L)
  }

  test("lshTopK only pairs within a bucket (recall<1 by design)") {
    val r = Similarity.lshTopK(emb, "vec_id", "embedding", 5, 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    // zeros count as non-negative: 1,2,3 share bucket "111"; 4 ("011") is alone
    r shouldBe Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L))
    r.flatMap(p => Seq(p._1, p._2)) should not contain 4L
  }

  test("multiBandLshTopK recalls across bands and never loses to single-band") {
    // real testdata: recall measured against the brute-force ground truth
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding", 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val single = recall(Similarity.lshTopK(e, "vec_id", "embedding", 3, 4))
    val multi = recall(Similarity.multiBandLshTopK(e, "vec_id", "embedding", 3, 4, 4))
    info(f"recall: single-band $single%.3f, 4-band $multi%.3f")
    // measured on the fixed testdata: 0.146 vs 0.453 — the ~3x lift
    // independent bands are supposed to buy (1-(1-r)^B ≈ B·r for small r)
    multi should be > single * 2
    multi should be > 0.4
  }

  test("multiBandLshTopK: a pair agreeing in ANY band is a candidate") {
    // 5 disagrees with 1 in band 0 (dim 0 sign) but agrees in band 1
    // (dims 2-3): multi-band must see it, single-band (bits=2) must not
    val e2 = Seq(
      (1L, Seq(1f, 1f, 1f, 1f)),
      (5L, Seq(-1f, 1f, 1f, 1f))
    ).toDF("vec_id", "embedding")
    val multi = Similarity.multiBandLshTopK(e2, "vec_id", "embedding", 1, 2, 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    multi shouldBe Set((1L, 5L), (5L, 1L))
    val single = Similarity.lshTopK(e2, "vec_id", "embedding", 1, 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    single shouldBe empty
  }

  test("ivfTopK: probing more cells than the home cell recovers cross-cell neighbors") {
    // explicit centroids = vecs 1,2. Cells: {1} and {2,3,4}. With nProbe=1
    // query 1 sees no candidates (alone in its cell); probing 2 cells finds
    // them.
    val cents = Some(emb.where($"vec_id".isin(1L, 2L)))
    val r1 = Similarity.ivfTopK(emb, "vec_id", "embedding", 2, 2, 1, cents)
      .where($"query_id" === 1).count()
    r1 shouldBe 0
    val r2 = Similarity.ivfTopK(emb, "vec_id", "embedding", 2, 2, 2, cents)
      .where($"query_id" === 1)
      .select("cand_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    r2 shouldBe Seq((2L, 1), (3L, 2))
  }

  test("lshNearDupPairs is a subset of the exact pairs with pinned recall") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(e, "vec_id", "embedding", 0.4, 4, 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // candidates are exact-cosine verified, so no false positives ever
    lsh.subsetOf(exact) shouldBe true
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    info(f"lsh near-dup recall (4 bits x 8 bands): $recall%.3f over ${exact.size} pairs")
    recall should be > 0.5
  }

  test("lshNearDupPairsAcross: corpus-batch pairs only, verified subset of exact") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val corpus = e.where($"vec_id" % 2 === 0)
    val batch = e.where($"vec_id" % 2 === 1)
    val across = Similarity.lshNearDupPairsAcross(
      corpus, batch, "vec_id", "embedding", 0.3, 4, 8)
      .as[(Long, Long, Double)].collect()
    // orientation contract: corpus side even, batch side odd — never
    // corpus x corpus or batch x batch
    all(across.map(_._1 % 2)) shouldBe 0L
    all(across.map(_._2 % 2)) shouldBe 1L
    // candidates are exact-cosine verified: every returned pair is a true
    // cross-side near-dup at the threshold (no false positives)
    val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect()
      .flatMap(p => Seq((p._1, p._2), (p._2, p._1))).toSet
    across.map(p => (p._1, p._2)).toSet.subsetOf(exact) shouldBe true
    across should not be empty
  }

  test("mmrRerank: diversity beats a redundant higher-relevance pick; guards") {
    // query (1,0); a duplicates the query, b is a near-copy of a, c is
    // nearly orthogonal. At lambda=0.3 the redundancy penalty makes the
    // diverse c the second pick despite b's far higher relevance.
    val e = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.95f, 0.312f)), (3L, Seq(0.1f, 0.995f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.mmrRerank(e, "vec_id", "embedding", Seq(1f, 0f), 3, 0.3)
      .as[(Long, Long, Double, Option[Double])].collect().sortBy(_._1)
    r.map(_._2).toSeq shouldBe Seq(1L, 3L, 2L)
    r.head._3 shouldBe 1.0 // the first pick maximizes relevance alone
    r.head._4 shouldBe None
    all(r.tail.map(_._4.isDefined)) shouldBe true
    // k beyond the candidate count returns a short list, not an error
    Similarity.mmrRerank(e, "vec_id", "embedding", Seq(1f, 0f), 10, 0.5)
      .count() shouldBe 3
    // empty input yields an empty frame
    Similarity.mmrRerank(e.where($"vec_id" < 0), "vec_id", "embedding",
      Seq(1f, 0f), 3, 0.5).count() shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      Similarity.mmrRerank(e, "vec_id", "embedding", Seq(1f, 0f), 3, 1.5)
    graft.core.CacheRegistry.drain()
  }

  test("ivfTopK seeds centroids by id-hash sample, not id order") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    // the sampled seed set must differ from the first-N-by-id set it
    // replaced (ids track insertion order, which can track content)
    val sampled = e.orderBy(md5($"vec_id".cast("string")), $"vec_id").limit(8)
      .select("vec_id").as[Long].collect().toSet
    val firstN = e.orderBy($"vec_id").limit(8)
      .select("vec_id").as[Long].collect().toSet
    sampled should not be firstN
  }

  test("ivfTopK recall on real embeddings beats its candidate-budget share") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding", 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfTopK(e, "vec_id", "embedding", 3, 8, 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(f"ivf recall (8 cells, 2 probes): $recall%.3f")
    // probing 2/8 cells examines ~25% of candidates; locality must beat that
    recall should be > 0.25
  }

  test("kmeansStep: means per nearest-centroid cell; empty cells drop") {
    // centroids: unit x and unit y; vec 4 (-x) is nearest y? no — cosine to
    // x is -1, to y is 0 -> joins the y cell. Cell means are plain element
    // averages of the members.
    val cents = Seq((1L, Seq(1f, 0f, 0f)), (3L, Seq(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.kmeansStep(emb, "vec_id", "embedding", cents)
      .select($"cell", $"n_members", $"centroid")
      .as[(Long, Long, Seq[Double])].collect()
      .map { case (c, n, v) => (c, n, v.map(x => math.rint(x * 1e6) / 1e6)) }.toSet
    // cell 1: vecs 1, 2 -> mean = [0.95, 0.05, 0]; cell 3: vecs 3, 4
    r shouldBe Set(
      (1L, 2L, Seq(0.95, 0.05, 0.0)),
      (3L, 2L, Seq(-0.5, 0.5, 0.0)))
  }

  test("kmeansStep iterated from the hashed seed converges cells on real embeddings") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val seed = e.orderBy(md5($"vec_id".cast("string")), $"vec_id").limit(8)
    val step1 = Similarity.kmeansStep(e, "vec_id", "embedding", seed)
    // re-key step-1 centroids as the next quantizer (same column names)
    val cents1 = step1.select($"cell".as("vec_id"),
      transform($"centroid", _.cast("float")).as("embedding"))
    val step2 = Similarity.kmeansStep(e, "vec_id", "embedding", cents1)
    val n1 = step1.agg(sum("n_members")).as[Long].head()
    val n2 = step2.agg(sum("n_members")).as[Long].head()
    // every vector stays assigned to exactly one cell in every iteration
    n1 shouldBe e.count()
    n2 shouldBe e.count()
  }

  test("nearDupPairs: symmetric threshold filter, a<b") {
    val r = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    r shouldBe Set((1L, 2L))
  }

  test("kmeansCentroids round-trips into kmeansStep with emb's column names") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 8, 2)
    cents.columns.toSeq shouldBe Seq("vec_id", "embedding")
    cents.count() should be <= 8L
    // feeding them back assigns every vector to exactly one cell
    val step = Similarity.kmeansStep(e, "vec_id", "embedding", cents)
    step.agg(sum("n_members")).as[Long].head() shouldBe e.count()
  }

  test("semanticNearDupPairs = the within-cell subset of the exact pairs") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val sem = Similarity.semanticNearDupPairs(e, "vec_id", "embedding", 8, 2, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    sem.nonEmpty shouldBe true
    sem.subsetOf(exact) shouldBe true
    // the k-means bucketing must retain a usable share of the true pairs
    // (cells are meaning-adjacent, so near-dups mostly co-locate)
    sem.size.toDouble / exact.size.toDouble should be >= 0.3
    // assignedGen form (round 11): passing the fitted assignment frame in
    // must reproduce the direct result exactly — same rows, and the same
    // holds for the outlier audit sharing that frame
    val assigned = Similarity.kmeansAssignment(e, "vec_id", "embedding", 8, 2)
    val semGen = Similarity.semanticNearDupPairs(e, "vec_id", "embedding",
        8, 2, 0.3, assignedGen = Some(assigned))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    semGen shouldBe sem
    val outDirect = Similarity.ivfKthNnOutliers(e, "vec_id", "embedding", 8, 2, 3)
      .collect().map(_.toSeq).toSet
    val outGen = Similarity.ivfKthNnOutliers(e, "vec_id", "embedding", 8, 2, 3,
        assignedGen = Some(assigned)).collect().map(_.toSeq).toSet
    outGen shouldBe outDirect
    graft.core.CacheRegistry.drain()
  }

  test("ivfPqTopK with nProbe = nCells equals pqTopK on the same codes") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
      .where($"embedding".isNotNull)
    val queries = e.where($"vec_id" % 40 === 0)
    val corpus = e.where($"vec_id" % 40 =!= 0)
    val cb = Embeddings.pqTrain(e, "vec_id", "embedding", 64, 4, 8, 1)
    val ivfpq = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", cb, 64, 4, 5, 6, 6)
      .as[(Long, Long, Double, Int)].collect().toSet
    val codes = Embeddings.pqEncode(corpus, "vec_id", "embedding", cb, 64, 4)
    val full = Embeddings.pqTopK(codes, "vec_id", "codes",
        queries, "vec_id", "embedding", cb, 64, 4, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    ivfpq shouldBe full
    ivfpq.nonEmpty shouldBe true
  }

  test("ivfPqTopK pruning keeps per-query result shape and scores consistent") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
      .where($"embedding".isNotNull)
    val queries = e.where($"vec_id" % 40 === 0)
    val corpus = e.where($"vec_id" % 40 =!= 0)
    val cb = Embeddings.pqTrain(e, "vec_id", "embedding", 64, 4, 8, 1)
    val r = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", cb, 64, 4, 5, 6, 2)
      .as[(Long, Long, Double, Int)].collect()
    r.nonEmpty shouldBe true
    // ranks are 1..n per query, scores non-increasing in rank
    r.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._4)
      byRank.map(_._4).toSeq shouldBe (1 to rows.length)
      byRank.map(_._3).toSeq.sliding(2).foreach {
        case Seq(a, b) => a should be >= b
        case _         =>
      }
    }
    // pruned candidates score identically where both rankings kept them:
    // scores depend only on (query, codes), not on the probe set
    val full = Embeddings.pqTopK(
        Embeddings.pqEncode(corpus, "vec_id", "embedding", cb, 64, 4),
        "vec_id", "codes", queries, "vec_id", "embedding", cb, 64, 4, 5)
      .as[(Long, Long, Double, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    r.foreach { case (q, c, s, _) =>
      full.get((q, c)).foreach(_ shouldBe s)
    }
  }

  test("hardNegativesExact: nearest wrong-label neighbors only, null-label semantics") {
    val d = Seq(
      (1L, Seq(1f, 0f, 0f), Some(0)),
      (2L, Seq(0.9f, 0.1f, 0f), Some(0)),  // closest to 1 but SAME label
      (3L, Seq(0.8f, 0.2f, 0f), Some(1)),  // closest wrong-label to 1
      (4L, Seq(0f, 1f, 0f), Some(1)),
      (5L, Seq(-1f, 0f, 0f), None)         // null label: differs from every set label
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegativesExact(d, "vec_id", "embedding", "label", 2)
      .as[(Long, Option[Int], Long, Option[Int], Double, Int)].collect()
    r.foreach { case (_, ql, _, cl, _, _) => ql should not be cl }
    val q1 = r.filter(_._1 == 1L).sortBy(_._6).map(_._3).toSeq
    q1 shouldBe Seq(3L, 4L)                // 2 excluded (same label), 3 first
    // the null-label vector treats every labeled vector as a negative;
    // its top-2 by cosine are 4 (orthogonal, cos 0) then 3 (cos -0.970)
    r.filter(_._1 == 5L).sortBy(_._6).map(_._3).toSeq shouldBe Seq(4L, 3L)
    an[IllegalArgumentException] should be thrownBy
      Similarity.hardNegativesExact(d, "vec_id", "embedding", "label", 0)
  }

  test("hardNegativesLsh is a wrong-label subset of exact with the banded candidates") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val exact = Similarity.hardNegativesExact(e, "vec_id", "embedding", "label", 3)
      .select("query_id", "cand_id", "cos")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Similarity.hardNegativesLsh(e, "vec_id", "embedding", "label", 3, 4, 8)
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    graft.core.CacheRegistry.drain()
    lsh.foreach { case (_, ql, _, cl, _, _) => ql should not be cl }
    // every LSH pair's cosine equals the exact computation where both rank
    val cosByPair = lsh.map(t => (t._1, t._3) -> t._5).toMap
    cosByPair.foreach { case (pair, c) => exact.get(pair).foreach(_ shouldBe c) }
    // banded candidates recover most of the true hard-negative mass
    val recall = lsh.count(t => exact.contains((t._1, t._3))).toDouble / exact.size
    info(f"hard-negative recall (4 bits x 8 bands, k=3): $recall%.3f")
    recall should be > 0.5
  }

  test("ANN recall grid: ivfTopK recall@3 rises with nProbe and hits asserted " +
    "floors; nProbe=nCells is exhaustive") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding", 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def recall(nCells: Int, nProbe: Int): Double = {
      val got = Similarity.ivfTopK(e, "vec_id", "embedding", 3, nCells, nProbe)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    // the quantified recall contract for the scale path, not just plan
    // shape: measured once on the fixed sf0.001 data, asserted as floors
    val grid = for (p <- Seq(1, 2, 4)) yield p -> recall(8, p)
    grid.foreach { case (p, r) => info(f"ivf nCells=8 nProbe=$p: recall $r%.3f") }
    // monotone in probes (same centroids, strictly larger candidate set)
    grid.sliding(2).foreach { case Seq((_, lo), (_, hi)) => hi should be >= lo }
    // measured on the fixed data: 0.257 / 0.427 / 0.709 — floors pinned
    // just under so a candidate-generation regression trips them
    grid.head._2 should be > 0.2  // single-probe floor
    grid.last._2 should be > 0.65 // 4-of-8-probes floor
    recall(8, 8) shouldBe 1.0 // probing every cell is exhaustive
  }

  test("kCenterCoreset: hand farthest-point traversal, radii, k=1, determinism") {
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(0f, 10f)),
      (4L, Seq(5f, 5f)), (5L, Seq(1f, 0f))).toDF("id", "v")
    val r = Similarity.kCenterCoreset(pts, "id", "v", 5)
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    r.map(_._2) shouldBe Array(1L, 2L, 3L, 4L, 5L)
    r.map(_._3) shouldBe Array(None, Some(100.0), Some(100.0), Some(50.0), Some(1.0))
    Similarity.kCenterCoreset(pts, "id", "v", 1)
      .as[(Long, Long, Option[Double])].collect() shouldBe Array((1L, 1L, None))
    Similarity.kCenterCoreset(pts.repartition(4), "id", "v", 3)
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1) shouldBe r.take(3)
    an[IllegalArgumentException] should be thrownBy
      Similarity.kCenterCoreset(pts, "id", "v", 0)
    graft.core.CacheRegistry.drain()
  }

  test("silhouette: tight separated clusters score near 1, none negative") {
    // two orthogonal direction bundles -> k=2 cells are pure; every
    // point is far closer (cosine) to its own centroid than the other
    val pts = (1 to 6).map { i =>
      if (i % 2 == 0) (i.toLong, Seq(1f, 0.01f * i))
      else (i.toLong, Seq(0.01f * i, 1f))
    }.toDF("id", "v")
    val r = Similarity.silhouette(pts, "id", "v", 2, 2).collect()
    r.map(_.getLong(1)).sum shouldBe 6L
    r.foreach { row =>
      row.getDouble(2) should be > 0.8 // mean_silhouette
      row.getDouble(3) shouldBe 0.0 // share_negative
    }
    an[IllegalArgumentException] should be thrownBy
      Similarity.silhouette(pts, "id", "v", 1, 2)
    graft.core.CacheRegistry.drain()
  }

  test("marginMates: mutual cross-pool argmax pairs, self-mate margin " +
    "1.0, null sides excluded") {
    // two near-identical cross-side twins; all vectors share the sign
    // bucket (bits=2, bands=1: everything positive), so the banded
    // candidates cover every cross pair and the result is exact
    val emb = Seq(
      (1L, Seq(1f, 0.10f), Some("a")),
      (3L, Seq(0.10f, 1f), Some("a")),
      (2L, Seq(1f, 0.12f), Some("b")),
      (4L, Seq(0.12f, 1f), Some("b")),
      (9L, Seq(1f, 0.10f), None)) // null side: must not participate
      .toDF("id", "v", "side")
    val r = Similarity.marginMates(emb, "id", "v", "side", 1, 2, 1)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // with k=1 each endpoint's denominator IS its best cosine, and the
    // best-by-margin of a twin is the twin: margin = cos/cos = 1.0
    r.map(x => (x._1, x._2)) shouldBe Array((1L, 2L), (3L, 4L))
    r.foreach { x =>
      x._3 should be > 0.9 // cos of the twin pair
      x._4 shouldBe 1.0 // margin of a mutual top-1
    }
    an[IllegalArgumentException] should be thrownBy
      Similarity.marginMates(emb, "id", "v", "side", 0, 2, 1)
    graft.core.CacheRegistry.drain()
  }

  test("ivfKthNnOutliers: isolated vector scores 1, duplicated pair " +
    "scores 0; a cell smaller than kNn+1 reports null") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = graft.core.CacheRegistry.scoped {
      Similarity.ivfKthNnOutliers(emb, "vec_id", "embedding", 1, 1, 1)
        .collect().map(x => x.getAs[Long]("vec_id") ->
          ((x.getAs[Long]("n_in_cell"), x.getAs[java.lang.Double]("kth_cos"),
            x.getAs[java.lang.Double]("outlier_score")))).toMap
    }
    graft.core.CacheRegistry.drain()
    r(1L) shouldBe ((3L, 1.0, 0.0))
    r(2L) shouldBe ((3L, 1.0, 0.0))
    r(3L) shouldBe ((3L, 0.0, 1.0))
    // kNn larger than any cell population: every kth_cos is null
    val rBig = graft.core.CacheRegistry.scoped {
      Similarity.ivfKthNnOutliers(emb, "vec_id", "embedding", 1, 1, 5)
        .collect().map(_.getAs[java.lang.Double]("kth_cos")).toList
    }
    graft.core.CacheRegistry.drain()
    rBig shouldBe List(null, null, null)
    an[IllegalArgumentException] should be thrownBy
      Similarity.ivfKthNnOutliers(emb, "vec_id", "embedding", 1, 1, 0)
  }

  test("recommendedBits/recommendedCells: the SCALE10X granularity rule, " +
    "monotone in n, clamped") {
    // occupancy n / 2^bits stays at or below the target
    for (n <- Seq(2000L, 20000L, 200000L, 2000000L)) {
      val bits = Similarity.recommendedBits(n, 150)
      (n.toDouble / (1L << bits)) should be <= 150.0
    }
    Similarity.recommendedBits(2000, 150) shouldBe 4   // the q44 1x point
    Similarity.recommendedBits(20000, 150) shouldBe 8  // the SCALE10X remedy
    Similarity.recommendedBits(1, 150) shouldBe 2      // clamp floor
    Similarity.recommendedBits(Long.MaxValue, 1) shouldBe 24 // clamp ceiling
    Similarity.recommendedCells(10000) shouldBe 100    // sqrt rule
    Similarity.recommendedCells(1) shouldBe 4
    (Similarity.recommendedCells(20000) * Similarity.recommendedCells(20000)).toLong should be >= 20000L
    an[IllegalArgumentException] should be thrownBy Similarity.recommendedBits(0)
    an[IllegalArgumentException] should be thrownBy Similarity.recommendedCells(0)
    // integer form is exact at power-of-two boundaries: n = 150·2^b
    // derives exactly b (a float log2 pairing could ulp-drift to b±1)
    Similarity.recommendedBits(150L * 16, 150) shouldBe 4
    Similarity.recommendedBits(150L * 16 + 1, 150) shouldBe 5
    // bands yield dimensions to bucket width as bits grows, capped at 8
    Similarity.recommendedBands(2000, 64) shouldBe 8   // bits 4 → 16 dims free
    Similarity.recommendedBands(20000, 64) shouldBe 8  // bits 8 → exactly fits
    Similarity.recommendedBands(200000, 64) shouldBe 5 // bits 11 → 64/11
    Similarity.recommendedBands(1, 4) shouldBe 2       // dim-bound: 4/2
    an[IllegalArgumentException] should be thrownBy Similarity.recommendedBands(1, 0)
  }

  test("lshMultiProbeNearDupPairs: flipping the least-confident bit finds " +
    "the pair single-probe misses; candidates are a superset (contract " +
    "laws pinned)") {
    // two vectors that agree in sign everywhere EXCEPT dim 2, where both
    // are tiny (the least-confident bit of band 0 at bits=4): single-probe
    // separates them into different buckets, the flip probe reunites them
    val a = Array(1f, 1f, 0.001f, 1f, 1f, 1f, 1f, 1f) ++ Array.fill(56)(1f)
    val b = Array(1f, 1f, -0.001f, 1f, 1f, 1f, 1f, 1f) ++ Array.fill(56)(1f)
    val c = Array.fill(64)(-1f) // unrelated
    val emb = Seq((1L, a.toSeq), (2L, b.toSeq), (3L, c.toSeq))
      .toDF("vec_id", "embedding")
    val (single, multi, contract) = graft.core.CacheRegistry.scoped {
      val s0 = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.9, 4, 1)
        .as[(Long, Long, Double)].collect().toSet
      val m0 = Similarity.lshMultiProbeNearDupPairs(emb, "vec_id", "embedding", 0.9, 4, 1)
        .as[(Long, Long, Double)].collect().toSet
      val c0 = Similarity.lshMultiProbeGainContract(emb, "vec_id", "embedding", 0.9, 4, 1).head()
      (s0, m0, c0)
    }
    graft.core.CacheRegistry.drain()
    single shouldBe empty // signs differ at dim 2 → different 4-bit buckets
    multi.map(p => (p._1, p._2)) shouldBe Set((1L, 2L))
    contract.getAs[Long]("n_exact") shouldBe 1L
    contract.getAs[Double]("recall_base") shouldBe 0.0
    contract.getAs[Double]("recall_multiprobe") shouldBe 1.0
    contract.getAs[Boolean]("multiprobe_superset") shouldBe true
    contract.getAs[Boolean]("gain_nonneg") shouldBe true
    // baseGen/multiGen form (round 11): passing the maintained pair
    // frames in must reproduce the direct contract row exactly
    val viaGen = graft.core.CacheRegistry.scoped {
      Similarity.lshMultiProbeGainContract(emb, "vec_id", "embedding", 0.9, 4, 1,
        baseGen = Some(
          Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.9, 4, 1)),
        multiGen = Some(Similarity.lshMultiProbeNearDupPairs(
          emb, "vec_id", "embedding", 0.9, 4, 1))).head()
    }
    graft.core.CacheRegistry.drain()
    viaGen shouldBe contract
  }

  test("rpPlanes: deterministic ±1 from the md5 nibble parity, i.i.d.-ish " +
    "balance; rpLshNearDupPairs is a subset of exact with higher recall " +
    "headroom than the dim-capped band count") {
    val planes = Similarity.rpPlanes(16, 4, 64)
    planes.length shouldBe 64
    all(planes.flatten.toSeq) should (be(1f) or be(-1f))
    // pinned derivation: md5("rp:1:3:17") = fb14... → nibble 15, odd → -1
    planes(1 * 4 + 3)(17) shouldBe -1f
    // md5("rp:0:0:0") = 0551... → nibble 0, even → +1
    planes(0)(0) shouldBe 1f
    // deterministic across invocations
    Similarity.rpPlanes(16, 4, 64)(7)(13) shouldBe planes(7)(13)
    // rough balance: a 4096-coin md5 flip stays within ±10% of half
    val pos = planes.flatten.count(_ == 1f)
    pos should be > 1640
    pos should be < 2460

    // tiny geometric fixture: two near-identical vectors + one opposite
    val mk = (s: Double) => Array.tabulate(64)(d => (s * math.sin(d + 1)).toFloat)
    val emb = Seq(
      (1L, mk(1.0).toSeq), (2L, mk(0.99).toSeq), (3L, mk(-1.0).toSeq))
      .toDF("vec_id", "embedding")
    val pairs = graft.core.CacheRegistry.scoped {
      Similarity.rpLshNearDupPairs(emb, "vec_id", "embedding", 0.9, 2, 16, 64)
        .as[(Long, Long, Double)].collect().toSet
    }
    graft.core.CacheRegistry.drain()
    pairs.map(p => (p._1, p._2)) shouldBe Set((1L, 2L)) // opposite vector excluded
    val contract = graft.core.CacheRegistry.scoped {
      Similarity.rpLshRecallContract(emb, "vec_id", "embedding", 0.9, 2, 16, 64, 0.5).head()
    }
    graft.core.CacheRegistry.drain()
    contract.getAs[Long]("n_exact") shouldBe 1L
    contract.getAs[Double]("recall") shouldBe 1.0
    contract.getAs[Boolean]("banded_subset_exact") shouldBe true
    contract.getAs[Boolean]("meets_floor") shouldBe true
    // bandedGen form (round 11): a maintained RP-LSH pair frame passed in
    // must reproduce the direct contract row exactly
    val viaGen = graft.core.CacheRegistry.scoped {
      Similarity.rpLshRecallContract(emb, "vec_id", "embedding", 0.9, 2, 16, 64, 0.5,
        bandedGen = Some(Similarity.rpLshNearDupPairs(
          emb, "vec_id", "embedding", 0.9, 2, 16, 64))).head()
    }
    graft.core.CacheRegistry.drain()
    viaGen shouldBe contract
  }
}
