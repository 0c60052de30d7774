package graft.ops

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens covers every token with stride-spaced overlapping windows") {
    // 7 tokens, window 4, stride 2 -> starts 0, 2 (ceil((7-4)/2)=2 -> starts 0,2,4)
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 2)
      .select($"chunk_id", $"chunk_text", $"n_chunk_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    chunks shouldBe List(
      (0L, "t0 t1 t2 t3", 4L),
      (1L, "t2 t3 t4 t5", 4L),
      (2L, "t4 t5 t6", 3L))
  }

  test("short documents yield exactly one chunk; boundary doc has no ragged tail") {
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 2)
      .select($"doc_id", $"chunk_id", $"n_chunk_tokens")
      .as[(Long, Long, Long)].collect().toSet
    chunks shouldBe Set((1L, 0L, 2L), (2L, 0L, 4L))
  }

  test("every token position is covered at least once (coverage law)") {
    val docs = graft.core.Tables.table(spark, sf0001, "documents")
    val w = 64; val s = 48
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", w, s)
    import org.apache.spark.sql.functions._
    // per doc: sum of chunk tokens >= token count (overlap >= 0) and the
    // max chunk end == token count (tail covered)
    val law = chunks.groupBy("doc_id")
      .agg(max(col("chunk_id") * s + col("n_chunk_tokens")).as("covered"),
        sum("n_chunk_tokens").as("sum_tok"))
      .join(docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(split(col("text"), " "))
          .cast("long").as("n")), "doc_id")
    law.where(col("covered") =!= col("n")).count() shouldBe 0L
    law.where(col("sum_tok") < col("n")).count() shouldBe 0L
  }
}
