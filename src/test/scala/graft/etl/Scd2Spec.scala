package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-02-01 00:00:00")
  private val t2 = Timestamp.valueOf("2026-03-01 00:00:00")

  private def target0: DataFrame = Seq(
    (1, "alice", "A"), (2, "bob", "B"), (3, "carol", "C")
  ).toDF("id", "name", "seg")

  test("trackedColumns excludes pk and audit columns") {
    val df = Seq((1, "x", "f.csv")).toDF("id", "name", "source_file")
      .withColumn("ingestion_timestamp", current_timestamp())
    Scd2.trackedColumns(df, "id") shouldBe Seq("name")
  }

  test("stage classifies INSERT / UPDATE and drops NO CHANGE") {
    // id=2 changed, id=3 unchanged, id=4 new, id=1 absent from batch (no delete tracking)
    val batch = Seq((2, "bob", "B2"), (3, "carol", "C"), (4, "dave", "D"))
      .toDF("id", "name", "seg")
    val staged = Scd2.stage(batch, target0, "id")
    val actions = staged.select("id", "action").as[(Int, String)].collect().toMap
    actions shouldBe Map(2 -> "UPDATE", 4 -> "INSERT")
  }

  test("stage reduces a multi-row-per-pk batch to the latest version (replay safety)") {
    // id=2 arrives twice across two bronze appends: older B2 then newer B3;
    // id=4 is a replayed duplicate (identical rows). Only the latest/one row
    // per pk may stage, else applyMerge inserts >1 is_current version.
    val batch = Seq(
      (2, "bob", "B2", Timestamp.valueOf("2026-01-05 00:00:00")),
      (2, "bob", "B3", Timestamp.valueOf("2026-01-06 00:00:00")),
      (4, "dave", "D", Timestamp.valueOf("2026-01-05 00:00:00")),
      (4, "dave", "D", Timestamp.valueOf("2026-01-05 00:00:00"))
    ).toDF("id", "name", "seg", "ingestion_timestamp")
    val staged = Scd2.stage(batch, target0, "id")
    staged.groupBy("id").count().where($"count" > 1).count() shouldBe 0
    val rows = staged.select("id", "seg", "action").as[(Int, String, String)]
      .collect().toSet
    rows shouldBe Set((2, "B3", "UPDATE"), (4, "D", "INSERT"))

    // and the merge invariant holds end-to-end with the multi-row batch
    val tgt = Scd2.initialLoad(target0, t0)
    val merged = Scd2.applyMerge(tgt,
      Scd2.stage(batch, tgt.where($"is_current"), "id"), "id", t1)
    merged.where($"is_current").groupBy("id").count()
      .where($"count" > 1).count() shouldBe 0
  }

  test("stageWithDeletes classifies a vanished key as DELETE with the target's pk") {
    // id=1 absent from the snapshot -> DELETE; id=2 changed -> UPDATE;
    // id=3 unchanged -> dropped; id=4 new -> INSERT
    val snapshot = Seq((2, "bob", "B2"), (3, "carol", "C"), (4, "dave", "D"))
      .toDF("id", "name", "seg")
    val staged = Scd2.stageWithDeletes(snapshot, target0, "id")
    val actions = staged.select("id", "action").as[(Int, String)].collect().toMap
    actions shouldBe Map(1 -> "DELETE", 2 -> "UPDATE", 4 -> "INSERT")
    // DELETE rows have no source columns (there is no source row)
    staged.where($"action" === "DELETE").select("name", "seg")
      .as[(Option[String], Option[String])].collect().toSeq shouldBe Seq((None, None))
  }

  test("applyMergeWithDeletes expires the deleted key without a successor version") {
    val tgt = Scd2.initialLoad(target0, t0)
    val snapshot = Seq((2, "bob", "B2"), (3, "carol", "C"), (4, "dave", "D"))
      .toDF("id", "name", "seg")
    val staged = Scd2.stageWithDeletes(snapshot, tgt.where($"is_current"), "id")
    val merged = Scd2.applyMergeWithDeletes(tgt, staged, "id", t1)
    // deleted key: history ends — one expired row, zero current rows
    val deleted = merged.where($"id" === 1)
    deleted.count() shouldBe 1
    deleted.where($"is_current").count() shouldBe 0
    deleted.select("end_date").as[Timestamp].head() shouldBe t1
    // updated key: expired old + new current; unchanged key untouched
    merged.where($"id" === 2 && $"is_current").select("seg").as[String]
      .collect().toSeq shouldBe Seq("B2")
    merged.where($"id" === 2).count() shouldBe 2
    merged.where($"id" === 3 && $"is_current").count() shouldBe 1
    merged.where($"id" === 4 && $"is_current").count() shouldBe 1
    // global invariant: at most one current row per pk
    merged.where($"is_current").groupBy("id").count()
      .where($"count" > 1).count() shouldBe 0
  }

  test("fingerprint replicates the concat_ws NULL-skip collision; nullSafe mode does not") {
    val df = Seq(
      (1, Some("a"), None: Option[String]),
      (2, None: Option[String], Some("a"))
    ).toDF("id", "x", "y")
    val plain = df.select(Scd2.fingerprint(Seq("x", "y")).as("h")).as[String].collect()
    plain(0) shouldBe plain(1) // reference semantics: ("a",NULL) == (NULL,"a")
    val safe = df.select(Scd2.fingerprint(Seq("x", "y"), nullSafe = true).as("h"))
      .as[String].collect()
    safe(0) should not be safe(1)
  }

  test("expireKeys returns distinct UPDATE keys only") {
    val staged = Seq((2, "UPDATE"), (2, "UPDATE"), (4, "INSERT"))
      .toDF("id", "action")
    Scd2.expireKeys(staged, "id").as[Int].collect().toSeq shouldBe Seq(2)
  }

  test("insertedRecords projects INSERT rows (new-customer side channel)") {
    val staged = Seq((4, "dave", "INSERT"), (2, "bob", "UPDATE"))
      .toDF("id", "name", "action")
    Scd2.insertedRecords(staged, Seq("id", "name")).as[(Int, String)]
      .collect().toSeq shouldBe Seq((4, "dave"))
  }

  test("applyMerge: SCD2 invariants hold after a merge") {
    val tgt = Scd2.initialLoad(target0, t0)
    val batch = Seq((2, "bob", "B2"), (4, "dave", "D")).toDF("id", "name", "seg")
    val staged = Scd2.stage(batch, tgt.where($"is_current"), "id")
    val merged = Scd2.applyMerge(tgt, staged, "id", t1).cache()

    // one current row per key; expired rows keep history
    merged.where($"is_current").groupBy("id").count()
      .where($"count" > 1).count() shouldBe 0
    // end_date is null iff current
    merged.where($"is_current" && $"end_date".isNotNull).count() shouldBe 0
    merged.where(!$"is_current" && $"end_date".isNull).count() shouldBe 0
    // id=2 has two versions: expired B + current B2
    val v2 = merged.where($"id" === 2).select("seg", "is_current")
      .as[(String, Boolean)].collect().toSet
    v2 shouldBe Set(("B", false), ("B2", true))
    // id=4 inserted as current with effective_date = runTs
    val v4 = merged.where($"id" === 4)
      .select("is_current", "effective_date").as[(Boolean, Timestamp)].collect()
    v4 shouldBe Array((true, t1))
    // untouched keys pass through unchanged
    merged.where($"id" === 1).select("is_current").as[Boolean].collect() shouldBe Array(true)
    merged.unpersist()
  }

  test("asOf reconstructs any past state; at most one version per key") {
    val tgt = Scd2.initialLoad(target0, t0)
    val batch = Seq((2, "bob", "B2"), (4, "dave", "D")).toDF("id", "name", "seg")
    val hist = Scd2.applyMerge(tgt,
      Scd2.stage(batch, tgt.where($"is_current"), "id"), "id", t1)
    // as of t0: the ORIGINAL values, including the since-expired bob v1;
    // dave (inserted at t1) absent
    val at0 = Scd2.asOf(hist, t0).select("id", "name", "seg")
      .as[(Int, String, String)].collect().toSet
    at0 shouldBe Set((1, "alice", "A"), (2, "bob", "B"), (3, "carol", "C"))
    // as of t2 (after the merge): identical to the current slice
    val at2 = Scd2.asOf(hist, t2).select("id", "seg")
      .as[(Int, String)].collect().toSet
    at2 shouldBe hist.where($"is_current").select("id", "seg")
      .as[(Int, String)].collect().toSet
    // invariant: no instant ever sees two versions of one key
    Seq(t0, t1, t2).foreach { ts =>
      Scd2.asOf(hist, ts).groupBy("id").count()
        .where($"count" > 1).count() shouldBe 0L
    }
  }

  test("applyMerge: replaying the same batch is a no-op on current rows") {
    val tgt = Scd2.initialLoad(target0, t0)
    val batch = Seq((2, "bob", "B2")).toDF("id", "name", "seg")
    val s1 = Scd2.stage(batch, tgt.where($"is_current"), "id")
    val m1 = Scd2.applyMerge(tgt, s1, "id", t1).cache()
    // replay: same batch against the merged target stages nothing
    val s2 = Scd2.stage(batch, m1.where($"is_current").drop("is_current", "effective_date", "end_date"), "id")
    s2.count() shouldBe 0
    // so the next merge preserves current rows exactly
    val m2 = Scd2.applyMerge(m1, s2, "id", t2)
    val cur1 = m1.where($"is_current").select("id", "seg").as[(Int, String)].collect().toSet
    val cur2 = m2.where($"is_current").select("id", "seg").as[(Int, String)].collect().toSet
    cur2 shouldBe cur1
    m1.unpersist()
  }
}
