package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.ops.Dedup

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
      Dedup.shinglesHof($"text", 3).as("ref"))
    cmp.where(!($"fast" <=> $"ref")).count() shouldBe 0
  }

  test("wordShingles matches on real documents") {
    val docs = Tables.table(spark, sf0001, "documents")
    docs.select(Dedup.shingles($"text", 3).as("fast"),
        Dedup.shinglesHof($"text", 3).as("ref"))
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
}
