package graft.ops

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq((1L, "hello world, 42 times!")).toDF("doc_id", "text")
    val r = df.select(
      TextStats.tokenCount($"text"),
      TextStats.bpeishTokenCount($"text")).as[(Int, Int)].head()
    r._1 shouldBe 4
    // [hello][world][,][4][2][times][!] = 7
    r._2 shouldBe 7
  }

  test("qualityFeatures: ratios and bucket") {
    val low = Seq((1L, "tiny text")).toDF("doc_id", "text")
    val l = TextStats.qualityFeatures(low, "doc_id", "text")
      .select($"n_chars", $"n_tokens", $"quality").as[(Int, Int, String)].head()
    l shouldBe ((9, 2, "low"))

    val highText = (1 to 60).map(i => "word" + (i % 10)).mkString(" ")
    val h = TextStats.qualityFeatures(Seq((2L, highText)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select($"quality", $"stopword_ratio").as[(String, Double)].head()
    h._1 shouldBe "high"
    h._2 shouldBe 0.0
  }

  test("langId picks argmax language with first-wins tiebreak") {
    val df = Seq(
      (1L, "the cat is one of the best"),
      (2L, "der hund und die katze und das haus"),
      (3L, "el que los las"),
      (4L, "xyz qqq zzz") // no markers: all scores 0 -> first lang (en) wins
    ).toDF("doc_id", "text")
    val r = TextStats.langId(df, "doc_id", "text")
      .select("doc_id", "detected_lang").as[(Long, String)].collect().toMap
    r shouldBe Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "en")
  }

  test("repetitionScore: looping text scores low, varied text 1.0, short text 1.0") {
    val df = Seq(
      (1L, "a b c a b c a b c"),          // 7 trigram slots, 3 distinct
      (2L, "one two three four five six"), // all distinct
      (3L, "too short")                    // < n words
    ).toDF("doc_id", "text")
    val r = TextStats.repetitionScore(df, "doc_id", "text", 3)
      .as[(Long, Double)].collect().toMap
    r(1L) shouldBe (3.0 / 7.0) +- 1e-12
    r(2L) shouldBe 1.0
    r(3L) shouldBe 1.0
  }

  test("scrubPii masks urls, emails, and digit runs with audit counts") {
    val df = Seq(
      (1L, "mail me at a.b@x-corp.io or visit https://x.io/p?q=1 ref 12345678 ok")
    ).toDF("doc_id", "text")
    val r = TextStats.scrubPii(df, "doc_id", "text").collect().head
    r.getAs[String]("clean_text") shouldBe
      "mail me at <EMAIL> or visit <URL> ref <NUM> ok"
    r.getAs[Int]("n_emails") shouldBe 1
    r.getAs[Int]("n_urls") shouldBe 1
    r.getAs[Int]("n_digit_runs") shouldBe 1
  }

  test("fingerprints: min-gram is stable under suffix edits, md5 is not") {
    val df = Seq(
      (1L, "abcdefghijklmnop"),
      (2L, "abcdefghijklmnopXYZ") // same prefix; extra tail grams only
    ).toDF("doc_id", "text")
    val r = TextStats.fingerprints(df, "doc_id", "text")
      .select("doc_id", "content_md5", "min_gram_md5")
      .as[(Long, String, String)].collect().sortBy(_._1)
    r(0)._2 should not be r(1)._2
    // min over a superset of grams can only stay equal or get smaller;
    // here both docs share the minimizing gram
    val shortDoc = Seq((3L, "abc")).toDF("doc_id", "text")
    val s = TextStats.fingerprints(shortDoc, "doc_id", "text")
      .select("content_md5", "min_gram_md5").as[(String, String)].head()
    s._1 shouldBe s._2 // <8 chars: min-gram falls back to content hash
  }
}
