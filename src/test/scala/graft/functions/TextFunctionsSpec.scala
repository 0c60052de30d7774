package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.ops.{Dedup, EquivalenceWitnesses}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles is byte-identical to the built-in formulation (incl. edge cases)") {
    val docs = Seq(
      "the quick brown fox jumps",
      "one two",                 // shorter than n
      "a  b c",                  // repeated separator -> empty token preserved
      " leading and trailing ",  // boundary empties
      "single"
    ).toDF("text")
    val cmp = docs.select(
      Dedup.shingles($"text", 3).as("fast"),
      EquivalenceWitnesses.shinglesHof($"text", 3).as("ref"))
    cmp.where(!($"fast" <=> $"ref")).count() shouldBe 0
  }

  test("wordShingles matches on real documents") {
    val docs = Tables.table(spark, sf0001, "documents")
    docs.select(Dedup.shingles($"text", 3).as("fast"),
        EquivalenceWitnesses.shinglesHof($"text", 3).as("ref"))
      .where(!($"fast" <=> $"ref")).count() shouldBe 0
  }

  test("minHashSig equals the explode/groupBy/min aggregation") {
    val docs = Tables.table(spark, sf0001, "documents").limit(100)
    val fast = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 6)
    // the replaced formulation: explode distinct shingles, 6 min-aggs
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val aggs = (0 until 6).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"sig_$i"))
    val ref = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    fast.exceptAll(ref).count() shouldBe 0
    ref.exceptAll(fast).count() shouldBe 0
  }

  test("minHashSig is null for documents shorter than n") {
    val r = Seq((1L, "too short")).toDF("doc_id", "text")
      .select(TextFunctions.minHashSig(Dedup.shingles($"text", 3), 4).as("sig"))
      .select($"sig".isNull).as[Boolean].head()
    r shouldBe true
  }

  test("simHash16 kernel equals the explode/groupBy vote aggregation") {
    val docs = Tables.table(spark, sf0001, "documents")
    val fast = Dedup.simHash16(docs, "doc_id", "text")
    val ref = EquivalenceWitnesses.simHash16Agg(docs, "doc_id", "text")
    fast.exceptAll(ref).count() shouldBe 0
    ref.exceptAll(fast).count() shouldBe 0
  }

  test("simHash64 kernel equals the explode/groupBy vote aggregation") {
    val docs = Tables.table(spark, sf0001, "documents")
    val fast = Dedup.simHash64(docs, "doc_id", "text")
    val ref = EquivalenceWitnesses.simHash64Agg(docs, "doc_id", "text")
    fast.exceptAll(ref).count() shouldBe 0
    ref.exceptAll(fast).count() shouldBe 0
  }

  test("simHash kernels handle edge-case texts like the agg formulation") {
    // empty text (one empty token), repeated separators, unicode, single tok
    val docs = Seq((1L, ""), (2L, "a  b"), (3L, "的 是 在"), (4L, "x"),
      (5L, " trailing "), (6L, "naïve café résumé"))
      .toDF("doc_id", "text")
    Dedup.simHash16(docs, "doc_id", "text")
      .exceptAll(EquivalenceWitnesses.simHash16Agg(docs, "doc_id", "text")).count() shouldBe 0
    Dedup.simHash64(docs, "doc_id", "text")
      .exceptAll(EquivalenceWitnesses.simHash64Agg(docs, "doc_id", "text")).count() shouldBe 0
  }

  test("minGramMd5 kernel equals the higher-order formulation") {
    import graft.ops.TextStats
    val real = Tables.table(spark, sf0001, "documents")
    TextStats.fingerprints(real, "doc_id", "text")
      .exceptAll(EquivalenceWitnesses.fingerprintsHof(real, "doc_id", "text"))
      .count() shouldBe 0
    // edge cases: short (<8 chars), exactly 8, multi-byte chars (substr
    // counts code points — the kernel must slice UTF-8 byte ranges, not
    // UTF-16 units)
    val edge = Seq((1L, "short"), (2L, "exactly8"), (3L, "的是在了的是在了的"),
      (4L, "naïve café résumé x"), (5L, ""))
      .toDF("doc_id", "text")
    TextStats.fingerprints(edge, "doc_id", "text")
      .exceptAll(EquivalenceWitnesses.fingerprintsHof(edge, "doc_id", "text"))
      .count() shouldBe 0
  }

  test("charEntropy: hand-computed values, unicode code points, empty edge") {
    val df = Seq(
      (1L, "aaaa"),      // one symbol -> 0 bits
      (2L, "abab"),      // two equiprobable -> 1 bit
      (3L, "abcd"),      // four equiprobable -> 2 bits
      (4L, "aab"),       // 2/3, 1/3 -> 0.918296
      (5L, "日本語"),     // three CJK code points, equiprobable -> log2(3)
      (6L, "")           // empty -> 0 by definition
    ).toDF("doc_id", "text")
    val r = df.select($"doc_id",
        round(graft.functions.TextFunctions.charEntropy($"text"), 6).as("h"))
      .as[(Long, Double)].collect().toMap
    r(1L) shouldBe 0.0
    r(2L) shouldBe 1.0
    r(3L) shouldBe 2.0
    r(4L) shouldBe 0.918296
    r(5L) shouldBe 1.584963
    r(6L) shouldBe 0.0
  }

  test("charEntropy kernel equals the explode/groupBy formulation on real documents") {
    val docs = Tables.table(spark, sf0001, "documents")
    val kernel = docs.select($"doc_id",
        round(graft.functions.TextFunctions.charEntropy($"text"), 6).as("h"))
      .as[(Long, Double)].collect().toMap
    val agg = docs
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy($"doc_id", $"c").count()
      .withColumn("tn", sum($"count").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .groupBy($"doc_id")
      .agg(round(-sum(($"count" / $"tn") * log(2.0, $"count" / $"tn")), 6).as("h"))
      .as[(Long, Double)].collect().toMap
    kernel shouldBe agg
    kernel.size should be > 0
  }

  test("nfcNormalize composes decomposed sequences; NFC text passes through") {
    val df = Seq(
      (1L, "éclair"),  // e + combining acute -> é (single code point)
      (2L, "éclair"),   // already composed
      (3L, "Å"),       // A + combining ring -> Å
      (4L, "plain ascii")
    ).toDF("doc_id", "text")
    val r = df.select($"doc_id",
        graft.functions.TextFunctions.nfcNormalize($"text").as("n"))
      .as[(Long, String)].collect().toMap
    r(1L) shouldBe "éclair"
    r(2L) shouldBe "éclair"
    r(1L) shouldBe r(2L) // the dedup property: equal-looking -> equal bytes
    r(3L) shouldBe "Å"
    r(4L) shouldBe "plain ascii"
    // md5 now agrees where the raw bytes disagreed
    df.select(md5(graft.functions.TextFunctions.nfcNormalize($"text")).as("h"))
      .where($"h".isNotNull).distinct().count() shouldBe 3
  }

  test("text kernels are callable from SQL") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_kernel_docs")
    val r = spark.sql(
      """SELECT simhash16(text) AS h16, simhash64(text) AS h64,
        |  min_gram_md5(text) AS mg, size(word_shingles(text, 3)) AS n_sh,
        |  size(minhash_sig(word_shingles(text, 3), 4)) AS n_sig
        |FROM sql_kernel_docs""".stripMargin).head()
    r.getLong(0) should (be >= 0L and be <= 65535L)
    r.getString(2) should fullyMatch regex "[0-9a-f]{32}"
    r.getInt(3) shouldBe 7
    r.getInt(4) shouldBe 4
    // non-literal static args are rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, doc_id) FROM sql_kernel_docs").head()
    }
    e.getMessage should include("literal INT")
  }

  test("simHash16 plan is shuffle-free (single scan-stage project)") {
    val docs = Tables.table(spark, sf0001, "documents")
    val df = Dedup.simHash16(docs, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
