package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType().add("k", "int").add("tag", "string")

  test("parseJson extracts typed fields; malformed/null rows degrade to null") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": 8}"""), // missing field -> null field
      (3L, """not json at all"""), // malformed -> null struct
      (4L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val r = SemiStructured.parseJson(df, "props", schema)
      .select($"id", $"j.k", $"j.tag")
      .as[(Long, Option[Int], Option[String])].collect().toSet
    r shouldBe Set(
      (1L, Some(7), Some("a")), (2L, Some(8), None),
      (3L, None, None), (4L, None, None))
  }

  test("quarantine filter: malformed rows are identifiable, not silently lost") {
    // a malformed doc parses to all-null FIELDS — indistinguishable from
    // {"k": null}; the corrupt-record column is the quarantine signal
    val df = Seq(
      (1L, """{"k": 1}"""), (2L, "oops"), (3L, null.asInstanceOf[String]),
      (4L, """{"k": null}""") // legitimately null field — NOT corrupt
    ).toDF("id", "props")
    val parsed = SemiStructured.parseJson(df, "props",
      schema.add("_corrupt_record", "string"))
    val bad = parsed.where($"j._corrupt_record".isNotNull)
      .select("id").as[Long].collect().toSeq
    bad shouldBe Seq(2L)
  }

  test("extractPath equals the parsed-struct field on real event props") {
    val ev = graft.core.Tables.table(spark, sf0001, "events").limit(200)
    val both = SemiStructured.parseJson(ev, "props", new StructType().add("k", "int"))
      .select($"j.k".as("parsed"),
        SemiStructured.extractPath($"props", "$.k").cast("int").as("pathed"))
    both.where(!($"parsed" <=> $"pathed")).count() shouldBe 0
  }

  test("unaccessed struct fields are pruned out of the parse") {
    val ev = graft.core.Tables.table(spark, sf0001, "events")
    val one = SemiStructured.parseJson(ev, "props", schema).select($"j.k")
    // the optimizer rewrites from_json to parse only the accessed field —
    // the full two-field schema must not survive into the physical plan
    one.queryExecution.executedPlan.toString should not include "tag"
  }
}
