package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy: offsets are the running total per shard; bins honor the budget") {
    val docs = (1L to 40L).map(i => (i, 100L + i)).toDF("doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", 300L, 3)
      .select($"doc_id", $"n_tokens", $"shard", $"start_offset", $"bin")
      .as[(Long, Long, Long, Long, Long)].collect()
    packed.length shouldBe 40
    // per shard: offsets are the exclusive prefix sum in doc_id order
    packed.groupBy(_._3).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, n, _, off, bin) =>
        off shouldBe cum
        bin shouldBe off / 300L
        cum += n
      }
    }
  }

  test("packGreedy is deterministic and stable under repartitioning") {
    val docs = (1L to 100L).map(i => (i, (i % 7) * 13L + 5L)).toDF("doc_id", "n_tokens")
    val a = Packing.packGreedy(docs, "doc_id", "n_tokens", 200L, 4)
      .select("doc_id", "shard", "bin", "start_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Packing.packGreedy(docs.repartition(11), "doc_id", "n_tokens", 200L, 4)
      .select("doc_id", "shard", "bin", "start_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    a shouldBe b
  }

  test("materializeBins concatenates each bin's documents in offset order") {
    val docs = Seq(
      (1L, "alpha", 60L), (2L, "bravo", 60L), (3L, "charlie", 60L)
    ).toDF("doc_id", "text", "n_tokens")
    // single shard, budget 100: docs 1+2 fill bin 0 (offsets 0, 60 — the
    // second STARTS inside bin 0), doc 3 starts at 120 -> bin 1
    val bins = Packing.materializeBins(
      Packing.packGreedy(docs, "doc_id", "n_tokens", 100L, 1), "text")
      .select($"bin", $"n_docs", $"bin_tokens", $"packed_text")
      .as[(Long, Long, Long, String)].collect().toSet
    bins shouldBe Set(
      (0L, 2L, 120L, "alpha\n\nbravo"),
      (1L, 1L, 60L, "charlie"))
  }

  test("oversize documents are flagged and never silently merged") {
    val docs = Seq((1L, 50L), (2L, 900L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val r = Packing.packGreedy(docs, "doc_id", "n_tokens", 100L, 1)
      .select($"doc_id", $"oversize").as[(Long, Boolean)].collect().toMap
    r shouldBe Map(1L -> false, 2L -> true, 3L -> false)
  }

  test("paddingBuckets: smallest power-of-two bucket, exact waste accounting") {
    val docs = Seq(
      (1L, "t"),                       // 1 token  -> bucket 1
      (2L, "t t"),                     // 2 tokens -> bucket 2 (exact power)
      (3L, "t t t"),                   // 3 tokens -> bucket 4
      (4L, "t t t t t"),               // 5 tokens -> bucket 8
      (5L, "t t t t t t t t")          // 8 tokens -> bucket 8 (exact power)
    ).toDF("doc_id", "text")
    val r = Packing.paddingBuckets(docs, "text")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4, x._5)).toMap
    r(1L) shouldBe ((1L, 1L, 1L, 0.0))
    r(2L) shouldBe ((1L, 2L, 2L, 0.0))
    r(4L) shouldBe ((1L, 3L, 4L, 0.25))
    r(8L) shouldBe ((2L, 13L, 16L, 0.1875))
  }

  test("sortedBatches: length-ordered cuts, per-batch max padding, short tail") {
    // token counts 1..5 → batches of 2: {1,2} {3,4} {5}
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d"), (5L, "a b c d e")).toDF("doc_id", "text")
    val r = Packing.sortedBatches(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    r(0L) shouldBe ((0L, 2L, 2L, 3L, 4L, 0.25))
    r(1L) shouldBe ((1L, 2L, 4L, 7L, 8L, 0.125))
    r(2L) shouldBe ((2L, 1L, 5L, 5L, 5L, 0.0)) // short tail batch
    // partitioning must not change the batch assignment
    Packing.sortedBatches(docs.repartition(4), "doc_id", "text", 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap shouldBe r
    an[IllegalArgumentException] should be thrownBy
      Packing.sortedBatches(docs, "doc_id", "text", 0)
    graft.core.CacheRegistry.drain()
  }

  test("binMixing: per-bin group entropy, null cohort, single-source bin " +
    "emits +0.0") {
    val packed = Seq(
      (0L, 0L, Some("a")), (0L, 0L, Some("a")),
      (0L, 0L, Some("b")), (0L, 0L, Some("b")),
      (0L, 1L, Some("a")), (0L, 1L, Some("a")),
      (1L, 0L, None), (1L, 0L, Some("a")))
      .toDF("shard", "bin", "source")
    val r = Packing.binMixing(packed, "source")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5, x._6))).toMap
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r((0L, 0L)) shouldBe ((4L, 2L, ln2, 0.5))
    r((0L, 1L)) shouldBe ((2L, 1L, 0.0, 1.0))
    // +0.0, not -0.0: the driver's repr-level compare distinguishes them
    java.lang.Double.doubleToRawLongBits(r((0L, 1L))._3) shouldBe 0L
    r((1L, 0L)) shouldBe ((2L, 2L, ln2, 0.5))
  }
}
