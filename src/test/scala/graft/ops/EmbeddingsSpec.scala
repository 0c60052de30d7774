package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: max element hits ±127, zero vector stays zero") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Double, Array[Int])].collect().toMap2
    val (s1, q1) = q(1L)
    s1 shouldBe (2.0 / 127.0) +- 1e-12
    q1 shouldBe Array(64, -127, 32) // round(1/(2/127)) = round(63.5) = 64 (half-up)
    q(2L)._1 shouldBe 0.0
    q(2L)._2 shouldBe Array(0, 0, 0)
  }

  test("dequantize error is bounded by scale/2 per element") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
    val q = Embeddings.quantizeInt8(emb, "vec_id", "embedding")
    val deq = q.join(emb, "vec_id")
      .select($"vec_id", $"scale", $"embedding",
        Embeddings.dequantize(q, "qvec", "scale").as("deq"))
    val bad = deq
      .select($"scale",
        array_max(expr(
          "zip_with(embedding, deq, (a, b) -> abs(cast(a as double) - cast(b as double)))"))
          .as("maxerr"))
      .where($"maxerr" > $"scale" / 2 * 1.0000001) // float slack
    bad.count() shouldBe 0L
  }

  test("kmeansFit converges assignments on a separable micro set") {
    // two tight clusters; k=2, any seeds -> each cluster gets its own cell
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)), (3L, Array(0.98f, -0.01f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.01f, 0.99f)), (6L, Array(-0.01f, 0.98f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.kmeansFit(pts, "vec_id", "embedding", 2, 3)
      .select($"cell", $"n_members").as[(Long, Long)].collect().toMap
    r.values.toList.sorted shouldBe List(3L, 3L)
  }

  test("hashEmbed: deterministic dims, signed integer accumulation, sparse output") {
    val docs = Seq((1L, "tok tok tok"), (2L, "tok")).toDF("doc_id", "text")
    val r = Embeddings.hashEmbed(docs, "doc_id", "text", 16)
      .as[(Long, Int, Long)].collect()
    val byDoc = r.groupBy(_._1)
    byDoc(1L).size shouldBe 1                 // one distinct token → one dim
    val (dim1, v1) = (byDoc(1L).head._2, byDoc(1L).head._3)
    math.abs(v1) shouldBe 3L                  // same token accumulates with one sign
    byDoc(2L).head._2 shouldBe dim1           // same token → same dim across docs
    v1 / 3 shouldBe byDoc(2L).head._3         // and the same sign
    dim1 should (be >= 0 and be < 16)
  }

  test("labelCentroids: per-label member counts and element means") {
    val pts = Seq(
      (1L, Array(1.0f, 3.0f), 1),
      (2L, Array(3.0f, 5.0f), 1),
      (3L, Array(10.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val r = Embeddings.labelCentroids(pts, "label", "embedding")
      .as[(Int, Long, Int, Double)].collect().toSet
    r shouldBe Set(
      (1, 2L, 0, 2.0), (1, 2L, 1, 4.0),
      (2, 1L, 0, 10.0), (2, 1L, 1, 0.0))
  }

  test("labelOutliers flags the vector pointing away from its label centroid") {
    val emb = Seq(
      (1L, 0, Seq(1f, 0f, 0f)), (2L, 0, Seq(1f, 0.1f, 0f)),   // tight cluster
      (3L, 0, Seq(-1f, 0f, 0f)),                              // points AWAY
      (4L, 1, Seq(0f, 1f, 0f)), (5L, 1, Seq(0f, 1f, 0.1f)),
      (6L, 2, Seq(0f, 0f, 0f))                                // zero norm -> null
    ).toDF("vec_id", "label", "embedding")
    val got = Embeddings.labelOutliers(emb, "vec_id", "label", "embedding", 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    got(3L).getBoolean(3) shouldBe true
    got(3L).getDouble(2) should be < 0.0 // anti-aligned with the centroid
    Seq(1L, 2L, 4L, 5L).foreach { id =>
      got(id).getBoolean(3) shouldBe false
      got(id).getDouble(2) should be > 0.9
    }
    got(6L).isNullAt(2) shouldBe true   // zero vector: null cosine...
    got(6L).getBoolean(3) shouldBe false // ...and never flagged
  }

  test("topPrincipalComponent recovers the dominant axis of an anisotropic cloud") {
    // Gram matrix diag(13, 1, 0): the first axis dominates
    val emb = Seq(
      (1L, Seq(2f, 0f, 0f)),
      (2L, Seq(3f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Embeddings.topPrincipalComponent(emb, "embedding", 3, 3)
      .orderBy("dim").as[(Int, Double, Double)].collect()
    r.map(_._1).toSeq shouldBe Seq(0, 1, 2)
    r(0)._2 should be > 0.999              // aligned with the dominant axis
    math.abs(r(1)._2) should be < 0.01
    r(2)._2 shouldBe 0.0
    r(0)._3 shouldBe 13.0 +- 0.2           // Rayleigh estimate of λ₁ = 13
    an[IllegalArgumentException] should be thrownBy
      Embeddings.topPrincipalComponent(emb, "embedding", 3, 0)
  }

  test("hashEmbed kernel == explode+groupBy formulation on real documents") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val kernel = Embeddings.hashEmbed(docs, "doc_id", "text", 16)
      .as[(Long, Int, Long)].collect().toSet
    val agg = Embeddings.hashEmbedAgg(docs, "doc_id", "text", 16)
      .as[(Long, Int, Long)].collect().toSet
    kernel shouldBe agg
    kernel.nonEmpty shouldBe true
  }

  test("semanticContamination flags near-bench vectors, clears orthogonal ones") {
    val bench = Seq((100L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.99f, 0.1f, 0f)),  // nearly the bench vector
      (2L, Seq(0f, 1f, 0f)),       // orthogonal
      (3L, Seq(-1f, 0f, 0f)),      // opposite
      (4L, null.asInstanceOf[Seq[Float]]) // null vector: excluded
    ).toDF("vec_id", "embedding")
    val r = Embeddings.semanticContamination(corpus, bench, "vec_id", "embedding", 0.9)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    r.map(_._1) shouldBe Array(1L, 2L, 3L)
    r(0)._3 shouldBe true
    r(0)._2 should be > 0.99
    r(1) shouldBe ((2L, 0.0, false))
    r(2) shouldBe ((3L, -1.0, false))
  }

  test("pqTrain + pqEncode separate per-subspace clusters independently") {
    // subspace 0 (dims 1-2) clusters around (1,0) / (0,1); subspace 1
    // (dims 3-4) around (2,2) / (-2,-2) — with the cluster memberships
    // CROSSED, so only independent per-subspace codebooks separate both
    val df = Seq(
      (1L, Seq(1.0f, 0.1f, 2.0f, 2.1f)),
      (2L, Seq(0.9f, 0.0f, -2.0f, -1.9f)),
      (3L, Seq(0.1f, 1.0f, 2.1f, 1.9f)),
      (4L, Seq(0.0f, 0.9f, -2.1f, -2.0f))
    ).toDF("vec_id", "embedding")
    val cb = Embeddings.pqTrain(df, "vec_id", "embedding", 4, 2, 2, 2)
    cb.count() shouldBe 4 // 2 subspaces x 2 codes
    val codes = Embeddings.pqEncode(df, "vec_id", "embedding", cb, 4, 2)
      .as[(Long, Array[Int])].collect().toMap
    // subspace 0: {1,2} together, {3,4} together; subspace 1: {1,3}, {2,4}
    codes(1L)(0) shouldBe codes(2L)(0)
    codes(3L)(0) shouldBe codes(4L)(0)
    codes(1L)(0) should not be codes(3L)(0)
    codes(1L)(1) shouldBe codes(3L)(1)
    codes(2L)(1) shouldBe codes(4L)(1)
    codes(1L)(1) should not be codes(2L)(1)
  }

  test("pqEncode maps a codebook member to its own code") {
    val cb = Seq(
      (0, 0, Seq(1.0f, 0.0f)), (0, 1, Seq(0.0f, 1.0f)),
      (1, 0, Seq(1.0f, 1.0f)), (1, 1, Seq(2.0f, 0.0f))
    ).toDF("subspace", "code", "cvec")
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f, 0.0f)),  // -> codes [0, 1]
      (2L, Seq(0.0f, 1.0f, 1.0f, 1.0f))   // -> codes [1, 0]
    ).toDF("vec_id", "embedding")
    val codes = Embeddings.pqEncode(df, "vec_id", "embedding", cb, 4, 2)
      .as[(Long, Array[Int])].collect().toMap
    codes(1L) shouldBe Array(0, 1)
    codes(2L) shouldBe Array(1, 0)
  }

  test("pqTopK scores are the sum of per-subspace LUT entries, ranked with id ties") {
    val cb = Seq(
      (0, 0, Seq(1.0f, 0.0f)), (0, 1, Seq(0.0f, 1.0f)),
      (1, 0, Seq(1.0f, 1.0f)), (1, 1, Seq(2.0f, 0.0f))
    ).toDF("subspace", "code", "cvec")
    val codes = Seq(
      (10L, Seq(0, 0)), (20L, Seq(1, 0)), (30L, Seq(1, 1))
    ).toDF("vec_id", "codes")
    val queries = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    // lut0 = [q03·(1,0), q03·(0,1)] = [1, 2]; lut1 = [q14·(1,1), q14·(2,0)] = [7, 6]
    // scores: 10 -> 1+7=8, 20 -> 2+7=9, 30 -> 2+6=8 (ties 10<30 by id)
    val r = Embeddings.pqTopK(codes, "vec_id", "codes",
        queries, "vec_id", "embedding", cb, 4, 2, 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    r shouldBe Array((1L, 20L, 9.0, 1), (1L, 10L, 8.0, 2), (1L, 30L, 8.0, 3))
  }

  test("pqTopK recall@10 vs exact inner-product ranking clears the floor on real vectors") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
      .where($"embedding".isNotNull)
    val queries = emb.where($"vec_id" % 40 === 0)
    val corpus = emb.where($"vec_id" % 40 =!= 0)
    val cb = Embeddings.pqTrain(emb, "vec_id", "embedding", 64, 16, 16, 2)
    val codes = Embeddings.pqEncode(corpus, "vec_id", "embedding", cb, 64, 16)
    val approx = Embeddings.pqTopK(codes, "vec_id", "codes",
        queries, "vec_id", "embedding", cb, 64, 16, 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    import graft.functions.VectorFunctions.dotF
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy($"ip".desc, $"cand_id".asc)
    val exact = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
      .crossJoin(corpus.select($"vec_id".as("cand_id"), $"embedding".as("cv")))
      .select($"query_id", $"cand_id", dotF($"qv", $"cv").as("ip"))
      .withColumn("r", row_number().over(w)).where($"r" <= 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map(q =>
      (approx.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    // m=16 x k=16 sub-quantizers on 64-dim vectors: far above the ~10/800
    // chance floor; exact level varies with the draw, so pin a safe bound
    mean should be > 0.25
  }

  test("binarize packs sign bits into 32-bit words, dimension i -> bit i mod 32") {
    // 40 dims: word 0 = bits 0..31, word 1 = bits 0..7
    val v = Array.tabulate(40)(i => if (i == 0 || i == 33 || i == 39) 1.0f else -1.0f)
    val z = Array.fill(40)(0.0f) // zero is >= 0: all bits set
    val df = Seq((1L, v.toSeq), (2L, z.toSeq)).toDF("vec_id", "embedding")
    val r = Embeddings.binarize(df, "vec_id", "embedding", 40)
      .as[(Long, Array[Long])].collect().toMap
    r(1L) shouldBe Array(1L, (1L << 1) | (1L << 7))
    r(2L) shouldBe Array(0xFFFFFFFFL, 0xFFL)
  }

  test("hammingTopK ranks by exact popcount distance with id ties") {
    val codes = Seq(
      (10L, Seq(0x0FL, 0L)),   // vs query 0x0F,0 -> 0
      (20L, Seq(0x0EL, 0L)),   // -> 1
      (30L, Seq(0x0FL, 3L)),   // -> 2
      (40L, Seq(0x0EL, 1L))    // -> 2 (ties with 30 -> id order)
    ).toDF("vec_id", "code")
    val q = Seq((1L, Seq(0x0FL, 0L))).toDF("vec_id", "code")
    val r = Embeddings.hammingTopK(codes, "vec_id", "code", q, "vec_id", "code", 2, 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    r shouldBe Array(
      (1L, 10L, 0L, 1), (1L, 20L, 1L, 2), (1L, 30L, 2L, 3), (1L, 40L, 2L, 4))
  }

  test("hamming neighbors approximate cosine neighbors on real vectors") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
      .where($"embedding".isNotNull)
    val queries = emb.where($"vec_id" % 40 === 0)
    val corpus = emb.where($"vec_id" % 40 =!= 0)
    val qc = Embeddings.binarize(queries, "vec_id", "embedding", 64)
    val cc = Embeddings.binarize(corpus, "vec_id", "embedding", 64)
    val approx = Embeddings.hammingTopK(cc, "vec_id", "code", qc, "vec_id", "code", 2, 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    import graft.functions.VectorFunctions.{dotF, normF}
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy($"cos".desc, $"cand_id".asc)
    val exact = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
      .crossJoin(corpus.select($"vec_id".as("cand_id"), $"embedding".as("cv")))
      .select($"query_id", $"cand_id",
        (dotF($"qv", $"cv") / (normF($"qv") * normF($"cv"))).as("cos"))
      .withColumn("r", row_number().over(w)).where($"r" <= 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map(q =>
      (approx.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
    // 64 sign bits on 64 dims: well above the ~10/800 chance floor
    (recalls.sum / recalls.size) should be > 0.15
  }

  test("dimStats: exact micro case; real-table agreement with stddev_pop") {
    val d = Seq((1L, Array(1f, 10f)), (3L, Array(3f, 10f))).toDF("id", "vec")
    Embeddings.dimStats(d, "vec").as[(Int, Double, Double)]
      .collect().sortBy(_._1) shouldBe Array((0, 2.0, 1.0), (1, 10.0, 0.0))
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
    val got = Embeddings.dimStats(emb, "embedding")
      .as[(Int, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // reference: double-domain explode+stddev_pop (different squaring
    // precision, so tolerance, not equality)
    val exp = emb.where($"embedding".isNotNull)
      .select(posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(avg($"v".cast("double")).as("m"),
        stddev_pop($"v".cast("double")).as("sd"))
      .as[(Int, Double, Double)].collect()
    exp.length shouldBe got.size
    exp.foreach { case (dim, m, sd) =>
      got(dim)._1 shouldBe (m +- 1e-4)
      got(dim)._2 shouldBe (sd +- 1e-4)
    }
  }

  test("standardize z-scores per dim; zero-variance dims map to 0, not inf") {
    val d = Seq((1L, Array(1f, 10f)), (3L, Array(3f, 10f))).toDF("id", "vec")
    val z = Embeddings.standardize(d, "id", "vec")
      .as[(Long, Seq[Double])].collect().toMap
    z(1L) shouldBe Seq(-1.0, 0.0)
    z(3L) shouldBe Seq(1.0, 0.0)
    // standardizing the standardized output is a fixed point: mean 0, std 1
    // (up to the 6 dp the op rounds at) on every non-degenerate dim
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
    val zz = Embeddings.standardize(emb, "vec_id", "embedding")
      .withColumn("zvec", transform($"zvec", x => x.cast("float")))
    Embeddings.dimStats(zz, "zvec").as[(Int, Double, Double)].collect()
      .foreach { case (_, m, sd) =>
        m shouldBe (0.0 +- 1e-3)
        sd shouldBe (1.0 +- 1e-3)
      }
  }

  test("centroidDrift: hand-computed micro cosines; zero-norm group reports 0") {
    val pts = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.0f), "a"),
      (3L, Array(0.0f, 1.0f), "b"),
      (4L, Array(0.0f, 0.0f), "z")
    ).toDF("vec_id", "embedding", "label")
    val r = Embeddings.centroidDrift(pts, "label", "embedding")
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // global centroid = (0.5, 0.25); a=(1,0) -> cos = 0.5/sqrt(0.3125)
    r("a")._1 shouldBe 2L
    r("a")._2 shouldBe 0.894427 +- 1e-6
    r("b")._1 shouldBe 1L
    r("b")._2 shouldBe 0.447214 +- 1e-6
    r("z")._2 shouldBe 0.0 // zero-norm centroid: 0, never NULL/NaN
  }

  test("centroidDrift of a single-label corpus is exactly 1") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
      .withColumn("label", lit("all"))
    val r = Embeddings.centroidDrift(emb, "label", "embedding")
      .as[(String, Long, Double)].collect()
    r.length shouldBe 1
    r.head._2 shouldBe emb.count()
    r.head._3 shouldBe 1.0 +- 1e-6 // group centroid IS the global centroid
  }

  test("intraGroupDiversity: identity matches hand pairs; degenerate groups NULL") {
    val pts = Seq(
      (1L, Array(1.0f, 0.0f), "orth"), (2L, Array(0.0f, 3.0f), "orth"),
      (3L, Array(2.0f, 0.0f), "same"), (4L, Array(1.0f, 0.0f), "same"),
      (5L, Array(1.0f, 1.0f), "mix"), (6L, Array(1.0f, 0.0f), "mix"),
      (7L, Array(0.0f, 0.0f), "zed"), (8L, Array(1.0f, 0.0f), "zed")
    ).toDF("vec_id", "embedding", "label")
    val r = Embeddings.intraGroupDiversity(pts, "label", "embedding")
      .as[(String, Long, Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    r("orth") shouldBe (2L, Some(0.0))              // orthogonal pair
    r("same")._2.get shouldBe 1.0 +- 1e-6           // parallel pair
    r("mix")._2.get shouldBe 0.707107 +- 1e-5       // cos 45°
    r("zed") shouldBe (1L, None)                    // zero vector excluded -> n=1 -> NULL
  }

  test("intraGroupDiversity agrees with brute-force pairwise cosine per label") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
    val got = Embeddings.intraGroupDiversity(emb, "label", "embedding")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3.get).toMap
    val vecs = emb.select($"label".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (d, na, nb) = (a.zip(b).map { case (x, y) => x.toDouble * y }.sum,
        math.sqrt(a.map(x => x.toDouble * x).sum), math.sqrt(b.map(x => x.toDouble * x).sum))
      d / (na * nb)
    }
    for ((label, group) <- vecs.groupBy(_._1) if group.length >= 2) {
      val vs = group.map(_._2)
      val pairs = for (i <- vs.indices; j <- i + 1 until vs.length) yield cos(vs(i), vs(j))
      got(label) shouldBe (pairs.sum / pairs.size) +- 1e-4
    }
  }

  test("truncateRenorm: slice + unit L2, zero-norm guard, short vectors") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f, 99.0f)),   // truncating to 2 dims: norm 5
      (2L, Array(0.0f, 0.0f, 7.0f)),    // truncated prefix is all-zero
      (3L, Array(2.0f))                 // shorter than dim: kept as-is
    ).toDF("vec_id", "embedding")
    val r = Embeddings.truncateRenorm(df, "vec_id", "embedding", 2)
      .as[(Long, Array[Double])].collect().toMap
    r(1L) shouldBe Array(0.6, 0.8)
    r(2L) shouldBe Array(0.0, 0.0)
    r(3L) shouldBe Array(1.0)
    // re-normalized vectors are unit up to the 6 dp element rounding
    math.abs(r(1L).map(x => x * x).sum - 1.0) should be < 1e-5
    an[IllegalArgumentException] should be thrownBy
      Embeddings.truncateRenorm(df, "vec_id", "embedding", 0)
  }

  private implicit class TripleOps(rows: Array[(Long, Double, Array[Int])]) {
    def toMap2: Map[Long, (Double, Array[Int])] =
      rows.map { case (id, s, q) => id -> (s, q) }.toMap
  }

  test("randomProjection: == driver-side replay with the same sign matrix; " +
    "deterministic, guards hold") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1f, 2f, -3f, 0.5f)), (2L, Seq(0f, 0f, 0f, 0f)),
      (3L, Seq(-1f, 1f, 1f, -1f))).toDF("id", "vec")
    val got = Embeddings.randomProjection(vecs, "id", "vec", 4, 2)
      .as[(Long, Seq[Double])].collect().toMap
    val signs = Embeddings.projectionSigns(4, 2)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ref(v: Seq[Float]): Seq[Double] = signs.map(row =>
      r6(row.zip(v).map { case (s, x) => s.toDouble * x }.sum / math.sqrt(2.0)))
    got(1L).zip(ref(Seq(1f, 2f, -3f, 0.5f))).foreach { case (a, b) =>
      a shouldBe b +- 1e-6 }
    got(2L) shouldBe Seq(0.0, 0.0) // zero vector projects to zero
    // same matrix every call and under any partitioning
    Embeddings.randomProjection(vecs.repartition(3), "id", "vec", 4, 2)
      .as[(Long, Seq[Double])].collect().toMap shouldBe got
    an[IllegalArgumentException] should be thrownBy
      Embeddings.randomProjection(vecs, "id", "vec", 4, 5)
  }

  test("hammingRecallContract: perfect on ±1 vectors, bounded in general") {
    val rnd = new scala.util.Random(11)
    // ±1 vectors: cos = (64 − 2·hamming)/64, monotone — binary ranking
    // is EXACTLY the cosine ranking, so recall@k must be 1.0
    def pm(n: Int) = (1 to n).map(_ =>
      (0 until 64).map(_ => if (rnd.nextBoolean()) 1.0f else -1.0f))
    val corpus = pm(40).zipWithIndex.map { case (v, i) => (i + 100L, v) }
      .toDF("vec_id", "embedding")
    val queries = pm(3).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val perfect = Embeddings.hammingRecallContract(
        corpus, queries, "vec_id", "embedding", 64, 5)
      .as[(Long, Long, Double)].collect()
    perfect.length shouldBe 3
    perfect.foreach { case (_, n, r) => n shouldBe 5L; r shouldBe 1.0 }
    // magnitude-skewed vectors: sign codes lose information; recall is
    // still a valid ratio bounded by the list size
    val skew = pm(40).zipWithIndex.map { case (v, i) =>
      (i + 100L, v.zipWithIndex.map { case (x, d) =>
        if (d == 0) x * 50f else x })
    }.toDF("vec_id", "embedding")
    Embeddings.hammingRecallContract(
        skew, queries, "vec_id", "embedding", 64, 5)
      .as[(Long, Long, Double)].collect().foreach { case (_, n, r) =>
        n should be <= 5L
        r should (be >= 0.0 and be <= 1.0)
      }
    an[IllegalArgumentException] should be thrownBy
      Embeddings.hammingRecallContract(
        corpus, queries, "vec_id", "embedding", 64, 0)
    // int8 tier: 255 quantization levels preserve the top-5 even on the
    // magnitude-skewed family the binary tier loses
    Embeddings.int8RecallContract(skew, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Double)].collect().foreach { case (_, n, r) =>
        n shouldBe 5L; r shouldBe 1.0
      }
    an[IllegalArgumentException] should be thrownBy
      Embeddings.int8RecallContract(corpus, queries, "vec_id", "embedding", 0)
  }
}
