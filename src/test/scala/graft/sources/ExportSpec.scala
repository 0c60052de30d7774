package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("jsonlShards: content-derived membership, lossless roundtrip, stable re-run") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val dir1 = java.nio.file.Files.createTempDirectory("graft-export1").toString
    val m1 = Export.jsonlShards(spark, docs, "doc_id", dir1, 4)
      .orderBy("shard").as[(Long, Long, Long, Long)].collect().toList
    m1.map(_._2).sum shouldBe docs.count()
    m1.size should be <= 4
    // membership is md5-derived from the id, not writer partitioning
    val back = spark.read.json(dir1)
    back.where(col("shard").cast("long") =!=
      graft.ops.Sampling.md5Mod(col("doc_id"), 4L)).count() shouldBe 0L
    // ids roundtrip losslessly
    back.select("doc_id").as[Long].collect().toSet shouldBe
      docs.select("doc_id").as[Long].collect().toSet
    // a re-run from a differently-partitioned source lands identical shards
    val dir2 = java.nio.file.Files.createTempDirectory("graft-export2").toString
    val m2 = Export.jsonlShards(spark, docs.repartition(7), "doc_id", dir2, 4)
      .orderBy("shard").as[(Long, Long, Long, Long)].collect().toList
    m2 shouldBe m1
  }
}
