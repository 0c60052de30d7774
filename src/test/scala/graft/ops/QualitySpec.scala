package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Quality.Rule("positive", $"v" > 0),
    Quality.Rule("named", $"name".isNotNull))

  private def df = Seq(
    (1, Some(5), Some("a")), // clean
    (2, Some(-1), Some("b")), // fails positive
    (3, None: Option[Int], None: Option[String]), // fails both (nulls violate)
    (4, Some(7), None) // fails named
  ).toDF("id", "v", "name")

  test("auditCounts: one row, per-rule violation counts; nulls violate") {
    val r = Quality.auditCounts(df, rules)
      .as[(Long, Long, Long)].head()
    r shouldBe ((4L, 2L, 2L)) // total, viol_positive, viol_named
  }

  test("withViolations tags each row; split partitions losslessly") {
    val tagged = Quality.withViolations(df, rules)
      .select($"id", $"failed_rules").as[(Int, Seq[String])].collect().toMap
    tagged shouldBe Map(
      1 -> Seq(), 2 -> Seq("positive"), 3 -> Seq("positive", "named"),
      4 -> Seq("named"))
    val (clean, quarantined) = Quality.split(df, rules)
    clean.select("id").as[Int].collect().toSeq shouldBe Seq(1)
    quarantined.count() + clean.count() shouldBe df.count()
  }

  test("SQL CHECK semantics are opt-in: null passes when the rule says so") {
    val sqlStyle = Seq(Quality.Rule("check", $"v".isNull || $"v" > 0))
    Quality.auditCounts(df, sqlStyle).select("viol_check").as[Long]
      .head() shouldBe 1L // only v = -1; nulls pass
  }

  test("curationScorecard: one row per doc, verdict = the documented conjunction, " +
    "components agree with their standalone operators") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val sc = Quality.curationScorecard(docs, "doc_id", "text", 40, 0.99, 0.9)
    sc.count() shouldBe docs.count()
    sc.where($"keep" =!= ($"quality" =!= "low"
      && $"distinct_ngram_ratio" >= 0.99 && $"oov_rate" <= 0.9))
      .count() shouldBe 0L
    // thresholds must actually discriminate on the benchmark corpus
    sc.select($"keep").distinct().count() shouldBe 2L
    val tierMismatch = sc.select($"doc_id", $"quality")
      .join(TextStats.qualityFeatures(docs, "doc_id", "text")
        .select($"doc_id", $"quality".as("q2")), "doc_id")
      .where($"quality" =!= $"q2").count()
    tierMismatch shouldBe 0L
    val repMismatch = sc.select($"doc_id", $"distinct_ngram_ratio")
      .join(TextStats.repetitionScore(docs, "doc_id", "text")
        .withColumnRenamed("distinct_ngram_ratio", "r2"), "doc_id")
      .where($"distinct_ngram_ratio" =!= $"r2").count()
    repMismatch shouldBe 0L
  }
}
