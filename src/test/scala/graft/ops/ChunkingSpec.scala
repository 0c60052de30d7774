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

  test("spanCorruptionPlan: JVM md5 replay, island laws, determinism") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 30L)
      .map(i => (i, (0 until 40).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")
    val startMod = 7
    val maxSpan = 3
    val got = Chunking.spanCorruptionPlan(docs, "doc_id", "text", startMod, maxSpan)
      .as[(Long, Int, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._3, r._4)).sortBy(_._1)).toMap
    // reference implementation: same md5 arithmetic + island merge in JVM
    def md5mod(s: String, m: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % m).toInt
    }
    val expected = (1L to 30L).map { id =>
      val n = 40
      val raw = (0 until n).filter(p => md5mod(s"$id|$p", startMod) == 0)
        .map(p => (p, math.min(n - 1, p + md5mod(s"$id|$p|L", maxSpan))))
      val merged = raw.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, (s0, e0)) =>
          if (acc.nonEmpty && s0 <= acc.last._2 + 1)
            acc.init :+ ((acc.last._1, math.max(acc.last._2, e0)))
          else acc :+ ((s0, e0))
      }
      id -> merged
    }.filter(_._2.nonEmpty).toMap
    got.view.mapValues(_.toVector).toMap shouldBe expected
    // island laws on every doc: in-bounds, ordered, gap >= 2 between spans
    got.values.foreach { spans =>
      spans.foreach { case (s0, e0) => s0 should be >= 0; e0 should be <= 39
        e0 should be >= s0 }
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => s2 should be > (e1 + 1)
        case _ =>
      }
    }
    // deterministic under repartition
    Chunking.spanCorruptionPlan(docs.repartition(7), "doc_id", "text",
        startMod, maxSpan)
      .as[(Long, Int, Int, Int, Int)].collect().toSet shouldBe
      Chunking.spanCorruptionPlan(docs, "doc_id", "text", startMod, maxSpan)
        .as[(Long, Int, Int, Int, Int)].collect().toSet
    an[IllegalArgumentException] should be thrownBy
      Chunking.spanCorruptionPlan(docs, "doc_id", "text", 1, 3)
  }

  test("truncationLoss: exact per-length doc and token losses from one scan") {
    // lengths 3, 1, 5; total 9 tokens
    val docs = Seq((1L, "a b c"), (2L, "a"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val r = Chunking.truncationLoss(docs, "doc_id", "text", Seq(4, 2))
      .as[(Int, Long, Long, Double, Long, Long, Double)]
      .collect().sortBy(_._1).toList
    r shouldBe List(
      // L=2: docs 1,3 cut; lose (3-2)+(5-2)=4 of 9 tokens
      (2, 3L, 2L, 0.666667, 9L, 4L, 0.444444),
      // L=4: doc 3 cut; lose 1 of 9
      (4, 3L, 1L, 0.333333, 9L, 1L, 0.111111))
    // no doc exceeds the window -> zero-loss rows, not missing rows
    val none = Chunking.truncationLoss(docs, "doc_id", "text", Seq(10))
      .as[(Int, Long, Long, Double, Long, Long, Double)].collect().toList
    none shouldBe List((10, 3L, 0L, 0.0, 9L, 0L, 0.0))
    an[IllegalArgumentException] should be thrownBy
      Chunking.truncationLoss(docs, "doc_id", "text", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Chunking.truncationLoss(docs, "doc_id", "text", Seq(0))
  }
}
