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

  test("fakeDecode: deterministic features, partition-wise contract") {
    val d1 = Multimodal.fakeDecode(spark, media).collect().sortBy(_.id)
    val d2 = Multimodal.fakeDecode(spark, media.repartition(3)).collect().sortBy(_.id)
    d1 shouldBe d2 // partitioning must not change results
    d1.map(_.id).toSeq shouldBe Seq(1L, 2L)
    val f = d1.head
    f.byteLen shouldBe 5L
    f.channels shouldBe 3
    f.meanLuma shouldBe ("hello".getBytes.map(_ & 0xff).sum.toDouble / 5) +- 1e-9
    // empty payload decodes to zeroed features, not a crash
    d1(1).meanLuma shouldBe 0.0
  }
}
