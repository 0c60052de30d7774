package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based SCD2 invariants (SURVEY.md §5.3): for arbitrary target
  * states and batches, a merge preserves ≤1 current row per key,
  * end_date-null iff current, and batch values become the current versions.
  * Uses raw ScalaCheck generators sampled from fixed seeds (the
  * scalatest-scalacheck bridge is not on the classpath). */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-02-01 00:00:00")

  private val rowGen: Gen[(Int, String)] = for {
    id <- Gen.choose(1, 8)
    v <- Gen.oneOf("a", "b", "c")
  } yield (id, v)

  private val batchGen: Gen[List[(Int, String)]] =
    Gen.listOf(rowGen).map(_.groupBy(_._1).map(_._2.head).toList) // unique pks

  private def sample(seed: Long): List[(Int, String)] =
    batchGen.pureApply(Gen.Parameters.default.withSize(12), Seed(seed))

  test("merge invariants hold when the batch carries multiple versions per pk") {
    // at-least-once ingestion: a batch may hold several rows for one key
    // (ordered by ingestion_timestamp); the LATEST version must win and the
    // one-current-per-pk invariant must survive
    val dupBatchGen: Gen[List[(Int, String)]] = Gen.nonEmptyListOf(rowGen)
    for (seed <- 1L to 10L) {
      val initial = sample(seed)
      val rows = dupBatchGen.pureApply(Gen.Parameters.default.withSize(16), Seed(seed + 2000))
      val batchDf = rows.zipWithIndex.map { case ((id, v), i) =>
        (id, v, new Timestamp(t1.getTime + i * 1000L))
      }.toDF("id", "v", "ingestion_timestamp")
      val lastPerId = rows.zipWithIndex
        .groupBy(_._1._1).view.mapValues(_.maxBy(_._2)._1._2).toMap
      val tgt = Scd2.initialLoad(initial.toDF("id", "v"), t0)
      val staged = Scd2.stage(batchDf, tgt.where($"is_current"), "id")
      val merged = Scd2.applyMerge(tgt, staged, "id", t1).cache()
      try {
        withClue(s"seed=$seed initial=$initial rows=$rows: ") {
          merged.where($"is_current").groupBy("id").count()
            .where($"count" > 1).count() shouldBe 0
          val cur = merged.where($"is_current").select("id", "v")
            .as[(Int, String)].collect().toMap
          lastPerId.foreach { case (id, v) => cur.get(id) shouldBe Some(v) }
        }
      } finally merged.unpersist()
    }
  }

  test("merge invariants hold for arbitrary targets and batches") {
    for (seed <- 1L to 10L) {
      val initial = sample(seed)
      val batch = sample(seed + 1000)
      val tgt = Scd2.initialLoad(initial.toDF("id", "v"), t0)
      val staged = Scd2.stage(batch.toDF("id", "v"), tgt.where($"is_current"), "id")
      val merged = Scd2.applyMerge(tgt, staged, "id", t1).cache()
      try {
        withClue(s"seed=$seed initial=$initial batch=$batch: ") {
          merged.where($"is_current").groupBy("id").count()
            .where($"count" > 1).count() shouldBe 0
          merged.where($"is_current" =!= $"end_date".isNull).count() shouldBe 0
          // every batch key ends up with exactly one current row carrying the batch value
          val cur = merged.where($"is_current").select("id", "v")
            .as[(Int, String)].collect().toMap
          batch.foreach { case (id, v) => cur.get(id) shouldBe Some(v) }
          // keys absent from the batch keep their initial current value (no deletes)
          initial.filterNot(r => batch.exists(_._1 == r._1)).foreach {
            case (id, v) => cur.get(id) shouldBe Some(v)
          }
        }
      } finally merged.unpersist()
    }
  }
}
