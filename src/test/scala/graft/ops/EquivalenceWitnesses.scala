package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Built-in-function formulations of the native text kernels, kept ONLY as
  * equivalence oracles for the specs (TextFunctionsSpec pins kernel ==
  * witness on real and edge-case data). They are deliberately NOT in the
  * main API: each shuffles or interprets per element what its kernel
  * computes in one scan-stage pass, and a public slow twin invites the
  * wrong call at 100 TB (round-3 verdict item 7).
  */
object EquivalenceWitnesses {

  /** Built-in formulation of [[Dedup.shingles]] (WordShingles kernel).
    * Guarded so documents shorter than n yield an empty array — Spark's
    * `sequence(1, k)` for k < 1 would otherwise count *down*. */
  def shinglesHof(text: Column, n: Int): Column = {
    val ts = Dedup.tokens(text)
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(ts) - lit(n - 1)),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
  }

  /** Aggregation formulation of [[Dedup.simHash16]] (SimHash16 kernel).
    * Shuffles O(total tokens). */
  def simHash16Agg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val votes = (0 until 16).map { i =>
      sum(when(substring(col("h"), i + 1, 1).isin(hi: _*), 1).otherwise(-1)).as(s"v_$i")
    }
    val voted = tok.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val sig = (0 until 16).map { i =>
      when(col(s"v_$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col(idCol), sig.as("simhash16"))
  }

  /** Aggregation formulation of [[Dedup.simHash64]] (SimHash64 kernel).
    * Shuffles O(total tokens). */
  def simHash64Agg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v_$i")
    }
    val voted = tok.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"v_$i") > 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col(idCol), sig.as("simhash64"))
  }

  /** Higher-order-function formulation of [[TextStats.fingerprints]]
    * (MinGramMd5 kernel) — a lambda frame + md5 string per character
    * position, interpreted per element. */
  def fingerprintsHof(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      md5(t).as("content_md5"),
      array_min(when(length(t) < 8, array(md5(t)))
        .otherwise(transform(sequence(lit(1), length(t) - lit(7)),
          i => md5(t.substr(i, lit(8)))))).as("min_gram_md5"))
  }

  /** Aggregation formulation of [[Multimodal.perceptualHash64]]'s
    * mapPartitions kernel: decode the payload, explode code-point
    * 4-grams, md5 each, vote per bit of the first 64 digest bits (bit p
    * lives at hex char (63−p)/4 + 1, nibble bit p%4), fold bits back to
    * a signed long. Shuffles O(shingles)·64 — witness only. Spark's
    * `substring`/`length` count code points, matching the kernel's
    * codePoints walk. */
  def perceptualHash64Agg(media: DataFrame): DataFrame = {
    val content = coalesce(decode(col("payload"), "utf-8"), lit(""))
    val base = media.select(col("id"), content.as("__c"))
    val sh = base
      .where(length(col("__c")) >= 4)
      .select(col("id"), explode(transform(
        sequence(lit(1), length(col("__c")) - lit(3)),
        i => substring(md5(col("__c").substr(i, lit(4))), 1, 16))).as("h"))
    val votes = (0 until 64).map { p =>
      val c = (63 - p) / 4 + 1
      val v = conv(substring(col("h"), c, 1), 16, 10).cast("int")
      sum(when(shiftright(v, p % 4).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v_$p")
    }
    val voted = sh.groupBy("id").agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { p =>
      when(col(s"v_$p") > 0, lit(1L) * lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    base.select(col("id")).join(voted, Seq("id"), "left")
      .select(col("id"),
        coalesce(sig, lit(0L)).as("phash64"))
  }
}
