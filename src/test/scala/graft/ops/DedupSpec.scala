package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown fox leaps"), // 2 of 3 trigrams shared with doc 1
    (3L, "completely different text here now"),
    (4L, "the quick brown fox jumps") // exact dup of doc 1
  ).toDF("doc_id", "text")

  test("shingles: n-grams with guard for short documents") {
    val r = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .where($"doc_id" === 1).as[(Long, Seq[String])].head()
    r._2 shouldBe Seq("the quick brown", "quick brown fox", "brown fox jumps")
    // shorter than n -> empty array, not a descending sequence
    val short = Seq((9L, "one two")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 3).as("sh")).as[Seq[String]].head()
    short shouldBe Seq.empty
  }

  test("exact dedup keeps min id and counts copies") {
    val r = Dedup.exact(docs.select(md5($"text").as("k"), $"doc_id"), Seq("k"), "doc_id")
      .select("kept_id", "n_copies").as[(Long, Long)].collect().toSet
    r shouldBe Set((1L, 2L), (2L, 1L), (3L, 1L))
  }

  test("ngramJaccardPairs computes exact jaccard over distinct shingles") {
    val r = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .as[(Long, Long, Double)].collect().toSet
    // docs 1&2 share 2 of 4 distinct trigrams -> jaccard 0.5
    // docs 1&4 identical -> 1.0 (and 2&4 same as 1&2)
    r shouldBe Set((1L, 2L, 0.5), (1L, 4L, 1.0), (2L, 4L, 0.5))
  }

  test("minHashLshPairs finds exact duplicates and verifies candidates") {
    val r = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 4, 3, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // identical docs collide in every band and survive verification
    r shouldBe Set((1L, 4L, 1.0))
  }

  test("LSH candidates are a superset filter: verified pairs ⊆ exact pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 4, 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    lsh.subsetOf(exact) shouldBe true
  }

  test("dropNearDuplicates keeps one representative per near-dup cluster") {
    // docs 1,2,4 form one cluster (Jaccard >= 0.5 chain); 3 is a singleton
    val survivors = Dedup.dropNearDuplicates(docs, "doc_id", "text", 3, 0.5)
      .as[Long].collect().toSet
    survivors shouldBe Set(1L, 3L)
    graft.core.CacheRegistry.drain()
  }

  test("duplicationWeights carries each survivor's cluster multiplicity") {
    // same fixture: cluster {1,2,4} -> survivor 1 weight 3; singleton 3 weight 1
    val w = Dedup.duplicationWeights(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long)].collect().toMap
    w shouldBe Map(1L -> 3L, 3L -> 1L)
    // survivors and weights are consistent with the drop + audit twins:
    // keys == dropNearDuplicates survivors, Σ weight == input cardinality
    w.keySet shouldBe Dedup.dropNearDuplicates(docs, "doc_id", "text", 3, 0.5)
      .as[Long].collect().toSet
    w.values.sum shouldBe docs.count()
    graft.core.CacheRegistry.drain()
  }

  test("ngramNovelty: duplicated docs score 0, unique docs 1, mixtures exact") {
    val d = Seq(
      (1L, "a b c d"),        // trigrams {a b c, b c d} — both shared with doc 2
      (2L, "a b c d"),
      (3L, "x y z w"),        // all grams unique -> novelty 1
      (4L, "a b c q r s")     // {a b c}(shared), {b c q, c q r, q r s}(unique) -> 3/4
    ).toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(d, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_unique", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    r(1L) shouldBe ((1L, 2L, 0L, 0.0))
    r(2L) shouldBe ((2L, 2L, 0L, 0.0))
    r(3L) shouldBe ((3L, 2L, 2L, 1.0))
    r(4L) shouldBe ((4L, 4L, 3L, 0.75))
  }

  test("bestRepresentatives keeps the longest member, ties to the smallest id") {
    // cluster {1, 2, 4}: doc 2 is strictly longer ("leaps" has the same
    // length as "jumps", so extend it) — make 2 the longest member
    val d = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps again"), // longest in its cluster
      (3L, "completely different text here now"),
      (4L, "the quick brown fox jumps")        // same length as 1 -> id tiebreak
    ).toDF("doc_id", "text")
    val reps = Dedup.bestRepresentatives(d, "doc_id", "text", 3, 0.5)
      .select("cluster_id", "rep_id", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    reps shouldBe Set((1L, 2L, 3L), (3L, 3L, 1L))
    graft.core.CacheRegistry.drain()
    // all-equal lengths: the smallest id wins
    val tie = Seq((7L, "a b c d"), (9L, "a b c d")).toDF("doc_id", "text")
    Dedup.bestRepresentatives(tie, "doc_id", "text", 3, 0.5)
      .select("rep_id").as[Long].collect().toSeq shouldBe Seq(7L)
    graft.core.CacheRegistry.drain()
  }

  test("splitLeakage: duplicated text across the split leaks 1.0, unique leaks 0") {
    // md5Bucket(id) < 90 -> train; find one id of each side deterministically
    val ids = (1L to 40L)
    val buckets = ids.map(i => i ->
      Seq(i).toDF("id").select(Sampling.md5Bucket($"id")).as[Long].head())
    val trainId = buckets.find(_._2 < 90).get._1
    val heldDup = buckets.find(_._2 >= 90).get._1
    val heldUniq = buckets.findLast(_._2 >= 90).get._1
    heldDup should not be heldUniq
    val d = Seq(
      (trainId, "alpha beta gamma delta epsilon"),
      (heldDup, "alpha beta gamma delta epsilon"),   // fully contained in train
      (heldUniq, "zeta eta theta iota kappa lambda") // shares nothing
    ).toDF("doc_id", "text")
    val got = Dedup.splitLeakage(d, "doc_id", "text", 3, 90, 0.5)
      .select("doc_id", "leak_ratio", "leaky")
      .as[(Long, Double, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    got(heldDup) shouldBe ((1.0, true))
    got(heldUniq) shouldBe ((0.0, false))
  }

  test("minHashLshPairsAcross equals the self-dedup pairs restricted to cross pairs") {
    // corpus = even ids, batch = odd ids; doc 5 duplicates corpus doc 4,
    // doc 7 near-dups corpus doc 2
    val all = Seq(
      (2L, "the quick brown fox leaps over it"),
      (4L, "the quick brown fox jumps over it"),
      (6L, "completely different corpus text here now"),
      (5L, "the quick brown fox jumps over it"), // exact dup of 4
      (7L, "the quick brown fox leaps over us"), // near-dup of 2
      (9L, "nothing in common with anything else at all")
    ).toDF("doc_id", "text")
    val corpus = all.where($"doc_id" % 2 === 0)
    val batch = all.where($"doc_id" % 2 === 1)
    val got = Dedup.minHashLshPairsAcross(corpus, batch,
      "doc_id", "text", 3, 4, 3, 0.5)
      .select("corpus_id", "batch_id").as[(Long, Long)].collect().toSet
    // oracle: self-dedup over the union, keep only (even, odd) pairs
    val self = Dedup.minHashLshPairs(all, "doc_id", "text", 3, 4, 3, 0.5)
      .as[(Long, Long, Double)].collect()
      .collect {
        case (a, b, _) if a % 2 == 0 && b % 2 == 1 => (a, b)
        case (a, b, _) if a % 2 == 1 && b % 2 == 0 => (b, a)
      }.toSet
    got shouldBe self
    got should contain((4L, 5L)) // the planted exact duplicate
  }

  test("simHash16: identical docs get identical signatures, in [0, 65535]") {
    val sig = Dedup.simHash16(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    sig(1L) shouldBe sig(4L)
    all(sig.values) should (be >= 0L and be <= 65535L)
    // near-dup docs differ in few bits
    val xor = sig(1L) ^ sig(2L)
    java.lang.Long.bitCount(xor) should be <= 8
  }

  test("simHash64 mirrors simHash16 semantics on xxhash64") {
    val sig = Dedup.simHash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    sig(1L) shouldBe sig(4L)
    java.lang.Long.bitCount(sig(1L) ^ sig(2L)) should be <= 24
  }

  test("sourceOverlap: containment of the smaller set; disjoint sources absent") {
    val d = Seq(
      ("s1", "a b c d"), // 3-shingles: {a b c, b c d}
      ("s2", "a b c x"), // {a b c, b c x} — shares one with s1
      ("s3", "p q r s")  // disjoint
    ).toDF("source", "text")
    val r = Dedup.sourceOverlap(d, "source", "text", 3, exact = true)
      .as[(String, String, Long, Long, Long, Double)].collect().toList
    r shouldBe List(("s1", "s2", 1L, 2L, 2L, 0.5))
    graft.core.CacheRegistry.drain()
  }

  test("sourceOverlap without the exact opt-in refuses and points at the KMV twin") {
    val d = Seq(("s1", "a b c d")).toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.sourceOverlap(d, "source", "text", 3)
    }
    e.getMessage should include("sourceOverlapKmv")
    e.getMessage should include("exact = true")
  }

  test("repeatedSpans merges consecutive duplicated gram positions into maximal spans") {
    val d = Seq(
      (1L, "a b c d e"),             // grams: (1)"a b c" (2)"b c d" (3)"c d e"
      (2L, "x a b c d y"),           // grams: (1)"x a b" (2)"a b c" (3)"b c d" (4)"c d y"
      (3L, "p q r s"),               // all grams unique corpus-wide
      (4L, "m n o m n o m n o"),     // every gram repeats within the doc itself
      (5L, "z z")                    // shorter than n: no grams at all
    ).toDF("doc_id", "text")
    val r = Dedup.repeatedSpans(d, "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().toSet
    // docs 1&2 share "a b c"+"b c d": runs [1,2] and [2,3] -> 4-token spans
    // doc 4: positions 1..7 all duplicated -> one span covering all 9 tokens
    r shouldBe Set((1L, 1L, 4L), (2L, 2L, 4L), (4L, 1L, 9L))
    graft.core.CacheRegistry.drain()
  }

  test("removeRepeatedSpans splices covered tokens out and keeps full cardinality") {
    val d = Seq(
      (1L, "a b c d e"),         // covered: starts {1,2} -> tokens 1..4
      (2L, "x a b c d y"),       // covered: starts {2,3} -> tokens 2..5
      (3L, "p q r s"),           // untouched
      (4L, "m n o m n o m n o"), // fully boilerplate -> empty clean_text
      (5L, "z z")                // shorter than n: passes through
    ).toDF("doc_id", "text")
    val r = Dedup.removeRepeatedSpans(d, "doc_id", "text", 3)
      .as[(Long, String, Long)].collect().toSet
    r shouldBe Set(
      (1L, "e", 4L), (2L, "x y", 4L), (3L, "p q r s", 0L),
      (4L, "", 9L), (5L, "z z", 0L))
    graft.core.CacheRegistry.drain()
  }

  test("removeRepeatedSpans: null text passes through as empty, 0 dropped") {
    val d = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Dedup.removeRepeatedSpans(d, "doc_id", "text", 3)
      .as[(Long, String, Long)].collect().toSet
    r shouldBe Set((1L, "a b c", 0L), (2L, "", 0L))
    graft.core.CacheRegistry.drain()
  }

  test("repeatedSpans rejects degenerate n / minOccurrences") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.repeatedSpans(d, "doc_id", "text", 0)
    an[IllegalArgumentException] should be thrownBy
      Dedup.removeRepeatedSpans(d, "doc_id", "text", 3, minOccurrences = 0L)
  }

  test("clusterMedoids: min summed edit distance wins, ties to min id, " +
    "singletons cost 0, null text compares as empty") {
    val docs = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "solo"),
      (5L, null: String), (6L, "ab")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Dedup.clusterMedoids(docs, "doc_id", "text", 3, 0.5,
        pairGen = Some(pairs))
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    // cluster {1,2,3}: costs 1→1+3=4, 2→1+3=4, 3→3+3=6; tie 1 vs 2 → 1
    r(1L) shouldBe ((1L, 3L, 4L))
    r(4L) shouldBe ((4L, 1L, 0L)) // singleton: itself, cost 0
    // cluster {5,6}: null text is '' — lev('', "ab") = 2 both ways, tie → 5
    r(5L) shouldBe ((5L, 2L, 2L))
    graft.core.CacheRegistry.drain()
  }

  test("containmentPairs: quote found inside a long doc despite tiny Jaccard; " +
    "directional; cap excludes long contained sides") {
    val quote = "alpha beta gamma delta epsilon"
    val article = s"intro words here $quote and then much more trailing content " +
      "one two three four five six seven eight nine ten"
    val docs = Seq((1L, quote), (2L, article), (3L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8, 10)
      .as[(Long, Long, Double)].collect()
    r.map(p => (p._1, p._2)) shouldBe Array((1L, 2L)) // quote ⊂ article only
    r.head._3 shouldBe 1.0 // every quote shingle appears in the article
    // Jaccard on the same pair is far below any dedup threshold
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count() shouldBe 0
    // the article itself (>10 tokens) is never a "contained" candidate
    Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.1, 10)
      .where($"contained_id" === 2L).count() shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.0, 10)
    graft.core.CacheRegistry.drain()
  }

  test("repeatedSpans honors the minOccurrences threshold") {
    val d = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a b c f") // "a b c" occurs 3x
    ).toDF("doc_id", "text")
    // at >=3 only the triple-shared gram survives; each doc gets its 3-token span
    val r = Dedup.repeatedSpans(d, "doc_id", "text", 3, minOccurrences = 3L)
      .as[(Long, Long, Long)].collect().toSet
    r shouldBe Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L))
    graft.core.CacheRegistry.drain()
  }

  test("lshRecallContract: subset law (recall <= 1), near-dup floor, counts") {
    // 10 near-dup pairs (one token changed out of 12) + unrelated docs
    val docs = ((1 to 10).flatMap { i =>
      val base = (0 until 12).map(t => s"tok_${i}_$t")
      Seq((i * 2L, base.mkString(" ")),
        (i * 2L + 1L, base.updated(5, "CHANGED").mkString(" ")))
    } ++ Seq((100L, "totally different text with no overlap at all here")))
      .toDF("doc_id", "text")
    val r = Dedup.lshRecallContract(docs, "doc_id", "text", 3, 4, 3, 0.5)
      .as[(Long, Long, Option[Double])].head()
    graft.core.CacheRegistry.drain()
    r._1 should be >= 10L // every constructed pair is above 0.5 Jaccard
    r._2 should be <= r._1 // verified-LSH is a subset of exact
    r._3.get should be <= 1.0
    r._3.get should be >= 0.5 // 4x3 banding at j~0.58: most pairs collide
    // empty corpus edge: no exact pairs -> null recall
    val empty = Dedup.lshRecallContract(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 3, 4, 3, 0.5)
      .as[(Long, Long, Option[Double])].head()
    graft.core.CacheRegistry.drain()
    empty shouldBe ((0L, 0L, None))
    // pairGen form (round 11): a caller holding the maintained pair
    // indexes passes both sides in — the contract row must be identical
    // to the direct build
    val viaGen = Dedup.lshRecallContract(docs, "doc_id", "text", 3, 4, 3, 0.5,
      exactGen = Some(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)),
      lshGen = Some(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 4, 3, 0.5)))
      .as[(Long, Long, Option[Double])].head()
    graft.core.CacheRegistry.drain()
    viaGen shouldBe r
  }

  test("sourceDedupRates: per-source attribution incl. cross-source drops") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, txt, "A"), (2L, txt, "A"), // within-A dup: id 2 drops
      (3L, "unique one text here with many tokens inside", "A"),
      (9L, txt, "B"), // cross-source dup of id 1: drops, charged to B
      (10L, "another unique doc entirely different words", "B")
    ).toDF("doc_id", "text", "source")
    val r = Dedup.sourceDedupRates(docs, "doc_id", "text", "source", 3, 0.5)
      .as[(String, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    graft.core.CacheRegistry.drain()
    r("A") shouldBe (("A", 3L, 2L, 0.333333))
    r("B") shouldBe (("B", 2L, 1L, 0.5))
  }

  test("goldenRecord: per-field survivorship, tie orders, null rules") {
    import Dedup.Survivorship._
    val rows = Seq(
      // cluster c1: primary id 1 carries a null brand; longest name on id 3
      (1L, "c1", "ab", Some(10.0), None: Option[String]),
      (2L, "c1", "abcd", Some(30.0), Some("B2")),
      (3L, "c1", "abce", None: Option[Double], Some("B3")),
      // singleton cluster
      (9L, "c9", "zz", Some(5.0), Some("B9"))
    ).toDF("id", "cl", "nm", "price", "brand")
    val g = Dedup.goldenRecord(rows, "id", "cl",
        Seq(Longest("nm"), MaxNum("price"), FromPrimary("brand")))
      .collect().map(r => r.getString(0) -> r).toMap
    val c1 = g("c1")
    c1.getLong(1) shouldBe 1L // survivor = min id
    c1.getLong(2) shouldBe 3L
    c1.getString(3) shouldBe "abce" // longest, tie (abcd/abce) -> greatest
    c1.getDouble(4) shouldBe 30.0 // max ignores the null
    c1.isNullAt(5) shouldBe true // FromPrimary trusts the master verbatim
    g("c9").getString(3) shouldBe "zz"
    // deterministic under repartition
    Dedup.goldenRecord(rows.repartition(7), "id", "cl",
        Seq(Longest("nm"), MaxNum("price"), FromPrimary("brand")))
      .collect().map(_.toSeq).toSet shouldBe g.values.map(_.toSeq).toSet
    an[IllegalArgumentException] should be thrownBy
      Dedup.goldenRecord(rows, "id", "cl", Seq.empty)
  }

  test("minHashEstimateContract: identical docs estimate J=1 exactly; " +
    "low-J floor rejected") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val r = Dedup.minHashEstimateContract(docs, "doc_id", "text", 3, 4, 3, 0.2)
      .collect()
    // only the identical pair survives the 0.2 verify floor
    r.map(x => (x.getLong(0), x.getLong(1))).toSeq shouldBe Seq((1L, 2L))
    val p = r.head
    p.getAs[Long]("n_matches") shouldBe 12L
    p.getAs[Double]("est") shouldBe 1.0
    p.getAs[Double]("jaccard") shouldBe 1.0
    p.getAs[Boolean]("within") shouldBe true
    // bound at J=1 collapses to the discretization quantum 1/h
    p.getAs[Double]("bound") shouldBe (1.0 / 12.0) +- 1e-12
    an[IllegalArgumentException] should be thrownBy
      Dedup.minHashEstimateContract(docs, "doc_id", "text", 3, 4, 3, 0.1)
    graft.core.CacheRegistry.drain()
  }

  test("dedupSavings: per-source doc and token budgets, emptied and " +
    "null sources survive the report") {
    val all = Seq(
      (1L, "a b c", Some("s1")),   // kept (cluster rep)
      (2L, "a b c d", Some("s2")), // near-dup of 1, dropped -> s2 empties
      (3L, "x y", Some("s1")),     // unique, kept
      (4L, "p q r s", None))       // unique, null source
      .toDF("doc_id", "text", "source")
    val kept = Seq(1L, 3L, 4L).toDF("doc_id")
    val r = Dedup.dedupSavings(all, kept, "doc_id", "text", "source")
      .collect().map(x => Option(x.getString(0)) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6)))).toMap
    r(Some("s1")) shouldBe ((2L, 2L, 5L, 5L, 0.0, 0.0))
    r(Some("s2")) shouldBe ((1L, 0L, 4L, 0L, 1.0, 1.0))
    r(None) shouldBe ((1L, 1L, 4L, 4L, 0.0, 0.0))
  }

  test("thresholdSweep: counts fall with the cut, involved docs are " +
    "distinct endpoints, unreachable thresholds zero-fill") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.95), (2L, 3L, 0.5), (4L, 5L, 0.3))
      .toDF("id_a", "id_b", "jaccard")
    val r = graft.core.CacheRegistry.scoped {
      Dedup.thresholdSweep(pairs, "id_a", "id_b", "jaccard",
        Seq(0.3, 0.4, 0.9, 0.99))
        .collect().map(x => x.getAs[Double]("threshold") ->
          ((x.getAs[Long]("pairs_kept"), x.getAs[Long]("docs_involved"))))
        .toMap
    }
    graft.core.CacheRegistry.drain()
    r(0.3) shouldBe ((3L, 5L))
    r(0.4) shouldBe ((2L, 3L))
    r(0.9) shouldBe ((1L, 2L))
    r(0.99) shouldBe ((0L, 0L))
    an[IllegalArgumentException] should be thrownBy
      Dedup.thresholdSweep(pairs, "id_a", "id_b", "jaccard", Seq.empty)
  }

  test("corpusDiff: added/removed/changed/unchanged by content hash; " +
    "rekey audit separates id-churn from data-churn") {
    val old = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"),
      (5L, Option.empty[String].orNull)).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha"),          // unchanged
      (2L, "beta EDITED"),    // changed
      (3L, "gamma"),          // unchanged
      // 4 removed, but its content survives under a new id -> rekeyed out
      (40L, "delta"),         // added, content existed in old -> rekeyed in
      (6L, "epsilon"),        // genuinely added
      (5L, Option.empty[String].orNull)) // NULL text: hashes like '' both sides
      .toDF("doc_id", "text")
    val r = graft.core.CacheRegistry.scoped {
      Dedup.corpusDiff(old, neu, "doc_id", "text")
        .collect().map(x => x.getAs[String]("status") ->
          ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_content_rekeyed"))))
        .toMap
    }
    graft.core.CacheRegistry.drain()
    r("unchanged") shouldBe ((3L, 0L)) // 1, 3, and the NULL-text 5
    r("changed") shouldBe ((1L, 0L))
    r("added") shouldBe ((2L, 1L))     // 40 rekeyed, 6 genuinely new
    r("removed") shouldBe ((1L, 1L))   // 4's content survives as 40
  }
}
