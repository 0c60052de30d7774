package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Seq((1L, "hello"), (2L, "")).toDF("id", "content"), "id", "content", "text")

  test("asMediaTable: payload bytes + typed metadata struct") {
    media.schema.fieldNames shouldBe Array("id", "payload", "meta")
    val r = media.select($"id", $"meta.byteLen", $"meta.kind")
      .as[(Long, Long, String)].collect().toSet
    r shouldBe Set((1L, 5L, "text"), (2L, 0L, "text"))
  }

  test("metadataOnly prunes the payload column from the plan") {
    val plan = Multimodal.metadataOnly(media).queryExecution.optimizedPlan
    // the payload column must not survive into the optimized projection
    plan.output.map(_.name) should not contain "payload"
  }

  test("fakeDecode: md5-derived features, partition-wise contract") {
    val d1 = Multimodal.fakeDecode(spark, media).collect().sortBy(_.id)
    val d2 = Multimodal.fakeDecode(spark, media.repartition(3)).collect().sortBy(_.id)
    d1 shouldBe d2 // partitioning must not change results
    d1.map(_.id).toSeq shouldBe Seq(1L, 2L)
    val f = d1.head
    f.byteLen shouldBe 5L
    f.channels shouldBe 3
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592; features are pinned
    // nibble arithmetic over it (what the DuckDB oracle recomputes)
    val hx = "5d41402abc4b2a76b9719d911017c592"
    f.width shouldBe 16 + (java.lang.Long.parseLong(hx.substring(0, 4), 16) % 240).toInt
    f.height shouldBe 16 + (java.lang.Long.parseLong(hx.substring(4, 8), 16) % 240).toInt
    f.meanLuma shouldBe java.lang.Long.parseLong(hx.substring(8, 16), 16).toDouble / 4294967296.0
    // empty payload decodes from md5("") — no crash, still deterministic
    d1(1).byteLen shouldBe 0L
    val he = "d41d8cd98f00b204e9800998ecf8427e"
    d1(1).width shouldBe 16 + (java.lang.Long.parseLong(he.substring(0, 4), 16) % 240).toInt
  }

  test("orphanAudit: byte accounting over the reference set, empty refs") {
    val m = Multimodal.asMediaTable(
      Seq((1L, "hello"), (2L, "abc"), (3L, "xy")).toDF("id", "content"),
      "id", "content", "text")
    val refs = Seq(1L, 3L, 99L).toDF("doc_id") // 99 references nothing — harmless
    val r = Multimodal.orphanAudit(m, refs, "doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().head
    r shouldBe ((3L, 1L, 10L, 3L, 0.3)) // only doc 2 (3 bytes of 10) is orphaned
    val empty = Multimodal.orphanAudit(m, refs.where($"doc_id" < 0L), "doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().head
    empty shouldBe ((3L, 3L, 10L, 10L, 1.0)) // nothing referenced: all orphans
  }
}
