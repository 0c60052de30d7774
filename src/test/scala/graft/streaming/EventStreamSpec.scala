package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("hourlyAggregate: streaming over file drops equals the batch result") {
    val root = Files.createTempDirectory("graft-stream")
    val in = root.resolve("in").toString
    val events = Tables.table(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.repartition(4).write.mode("overwrite").option("header", "true").csv(in)

    // complete-mode memory sink: deterministic full-aggregate comparison
    val stream = EventStream.readCsvStream(spark, in, events.schema, maxFilesPerTrigger = 2)
    val q = EventStream.hourlyAggregate(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
      val batch = EventStream.hourlyAggregate(events)
      streamed.exceptAll(batch).count() shouldBe 0
      batch.exceptAll(streamed).count() shouldBe 0
    } finally q.stop()
  }

  test("slidingCounts: streaming equals batch; every event lands in size/slide windows") {
    val root = Files.createTempDirectory("graft-sliding")
    val in = root.resolve("in").toString
    val events = Tables.table(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.repartition(4).write.mode("overwrite").option("header", "true").csv(in)

    val stream = EventStream.readCsvStream(spark, in, events.schema, maxFilesPerTrigger = 2)
    val q = EventStream.slidingCounts(stream)
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding")
      val batch = EventStream.slidingCounts(events)
      streamed.exceptAll(batch).count() shouldBe 0
      batch.exceptAll(streamed).count() shouldBe 0
      // membership law: 1h/15m overlap → each event counted exactly 4×
      import org.apache.spark.sql.functions.sum
      batch.agg(sum("n_events")).head.getLong(0) shouldBe 4L * events.count()
    } finally q.stop()
  }

  test("runAvailableNow: watermarked append-mode parquet sink terminates, output ⊆ batch") {
    val root = Files.createTempDirectory("graft-stream-an")
    val in = root.resolve("in")
    Files.createDirectories(in)
    val events = Tables.table(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    // time-ordered file drops (range-split on ts, lexicographic file order =
    // time order) so the event-time watermark never drops late data
    val rows = events.orderBy("ts").collect()
    val header = "event_id,ts,user_id,event_type,value"
    rows.grouped(math.max(1, rows.length / 4)).zipWithIndex.foreach { case (chunk, i) =>
      val lines = chunk.map(r => s"${r.getLong(0)},${r.getTimestamp(1)},${r.getLong(2)},${r.getString(3)},${r.getDouble(4)}")
      Files.writeString(in.resolve(f"drop-$i%03d.csv"), (header +: lines).mkString("\n"))
    }

    val stream = EventStream.readCsvStream(spark, in.toString, events.schema, maxFilesPerTrigger = 1)
    val q = EventStream.runAvailableNow(stream,
      root.resolve("ckpt").toString, root.resolve("out").toString)
    q.awaitTermination(120000) shouldBe true
    val streamed = spark.read.parquet(root.resolve("out").toString)
    val batch = EventStream.hourlyAggregate(events)
    // append mode emits exactly the closed windows: all emitted rows match
    // the batch aggregate; only windows past the final watermark are held
    streamed.exceptAll(batch).count() shouldBe 0
    streamed.count() should be > (batch.count() / 2)
  }

  test("streamToBronze drains file drops into the TableStore; replays are no-ops") {
    val root = Files.createTempDirectory("graft-stream-bronze")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val events = Tables.table(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").limit(500)
    events.repartition(3).write.option("header", "true").csv(in)
    val store = new graft.sources.TableStore(spark)
    val table = root.resolve("tables/events_bronze").toString

    val stream = EventStream.readCsvStream(spark, in, events.schema, maxFilesPerTrigger = 2)
    val q1 = EventStream.streamToBronze(stream, store, table, ckpt)
    q1.awaitTermination()
    val afterFirst = store.read(table)
    afterFirst.count() shouldBe events.count()
    // every micro-batch committed as its own table version, none half-written
    store.currentVersion(table).get should be >= 1L

    // restart with the SAME checkpoint and no new files: nothing re-appends
    val q2 = EventStream.streamToBronze(
      EventStream.readCsvStream(spark, in, events.schema, maxFilesPerTrigger = 2),
      store, table, ckpt)
    q2.awaitTermination()
    store.read(table).count() shouldBe events.count()

    // new file drop after restart: only the increment lands
    events.limit(50).write.mode("append").option("header", "true").csv(in)
    val q3 = EventStream.streamToBronze(
      EventStream.readCsvStream(spark, in, events.schema, maxFilesPerTrigger = 2),
      store, table, ckpt)
    q3.awaitTermination()
    store.read(table).count() shouldBe events.count() + 50
  }

  test("streamMartMerge maintains the partial-aggregate mart across " +
    "micro-batches; replays no-op; late drops merge in") {
    import graft.etl.IncrementalMart
    val root = Files.createTempDirectory("graft-stream-mart")
    val in = root.resolve("in").toFile; in.mkdirs()
    val ckpt = root.resolve("ckpt").toString
    val orders = Tables.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    def drop(df: org.apache.spark.sql.DataFrame, name: String, mod: Long): Unit = {
      val stage = root.resolve(s"stage_$name").toString
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mod)
    }
    import org.apache.spark.sql.functions._
    val firstTwo = orders.where(pmod(col("o_orderkey"), lit(3)) < 2)
    drop(orders.where(pmod(col("o_orderkey"), lit(3)) === 0), "b0", 1000000L)
    drop(orders.where(pmod(col("o_orderkey"), lit(3)) === 1), "b1", 2000000L)
    def stream() = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", 1)
      .option("basePath", in.toString)
      .parquet(s"$in/*.parquet")
    val store = new graft.sources.TableStore(spark)
    val table = root.resolve("tables/mart").toString

    def finalized(p: org.apache.spark.sql.DataFrame) =
      IncrementalMart.finalizeMart(p).orderBy("day").collect().toSeq
    EventStream.streamMartMerge(stream(), store, table, ckpt)
      .awaitTermination()
    finalized(store.read(table)) shouldBe
      finalized(IncrementalMart.dailyPartials(firstTwo))
    val versionAfter = store.currentVersion(table).get

    // restart with the same checkpoint and no new files: version unchanged
    EventStream.streamMartMerge(stream(), store, table, ckpt)
      .awaitTermination()
    store.currentVersion(table).get shouldBe versionAfter

    // a late drop merges in - the final mart equals the one-pass batch mart
    drop(orders.where(pmod(col("o_orderkey"), lit(3)) === 2), "b2", 3000000L)
    EventStream.streamMartMerge(stream(), store, table, ckpt)
      .awaitTermination()
    finalized(store.read(table)) shouldBe
      finalized(IncrementalMart.dailyPartials(orders))
  }

  test("streamMomentsMerge: additive power-sum merges finish to the " +
    "one-pass batch profile; replays no-op") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-stream-mom")
    val in = root.resolve("in").toFile; in.mkdirs()
    val ckpt = root.resolve("ckpt").toString
    val ev = Tables.table(spark, sf0001, "events")
      .select("event_id", "event_type", "value")
    def drop(df: org.apache.spark.sql.DataFrame, name: String, mod: Long): Unit = {
      val stage = root.resolve(s"stage_$name").toString
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mod)
    }
    drop(ev.where(pmod(col("event_id"), lit(2)) === 0), "b0", 1000000L)
    drop(ev.where(pmod(col("event_id"), lit(2)) === 1), "b1", 2000000L)
    def stream() = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .option("basePath", in.toString)
      .parquet(s"$in/*.parquet")
    val store = new graft.sources.TableStore(spark)
    val table = root.resolve("tables/moments").toString
    EventStream.streamMomentsMerge(stream(), store, table, ckpt,
      "event_type", "value").awaitTermination()
    val streamed = graft.ops.Quality.mergeMoments(store.read(table), "event_type")
      .orderBy("event_type").collect().toSeq
    val batch = graft.ops.Quality.momentProfile(ev, "event_type", "value")
      .orderBy("event_type").collect().toSeq
    streamed.map(_.getLong(1)) shouldBe batch.map(_.getLong(1))
    // mean/variance agree to the shared 6 dp rounding; higher moments are
    // merge-order sensitive in the last ulp, so compare within 1e-5
    streamed.zip(batch).foreach { case (s, b) =>
      s.getDouble(2) shouldBe b.getDouble(2) +- 1e-5
      s.getDouble(3) shouldBe b.getDouble(3) +- 1e-5
      s.getDouble(4) shouldBe b.getDouble(4) +- 1e-5
      s.getDouble(5) shouldBe b.getDouble(5) +- 1e-5
    }
    val v = store.currentVersion(table).get
    EventStream.streamMomentsMerge(stream(), store, table, ckpt,
      "event_type", "value").awaitTermination()
    store.currentVersion(table).get shouldBe v // replay is a no-op
  }

  test("streamToSilverScd2 merges micro-batches with full SCD2 semantics; replays no-op") {
    val root = Files.createTempDirectory("graft-stream-scd2")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val silver = root.resolve("tables/customers_silver").toString
    val store = new graft.sources.TableStore(spark)
    val t1 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2026-02-01 00:00:00")
    def drop(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("id", "name", "ingestion_timestamp")
        .write.mode("append").option("header", "true").csv(in)
    val schema = Seq((0L, "", t1)).toDF("id", "name", "ingestion_timestamp").schema

    // batch 1: initial load
    drop(Seq((1L, "alice", t1), (2L, "bob", t1)))
    EventStream.streamToSilverScd2(
      EventStream.readCsvStream(spark, in, schema), store, silver,
      "id", "ingestion_timestamp", ckpt).awaitTermination()
    val s1 = store.read(silver)
    s1.where(col("is_current")).count() shouldBe 2L
    s1.select(max("effective_date")).as[Timestamp].head() shouldBe t1

    // restart, no new data: replay is a no-op (version unchanged)
    val v1 = store.currentVersion(silver).get
    EventStream.streamToSilverScd2(
      EventStream.readCsvStream(spark, in, schema), store, silver,
      "id", "ingestion_timestamp", ckpt).awaitTermination()
    store.currentVersion(silver).get shouldBe v1

    // batch 2: update id=1, insert id=3 -> expire + insert, bob untouched
    drop(Seq((1L, "alice2", t2), (3L, "carol", t2)))
    EventStream.streamToSilverScd2(
      EventStream.readCsvStream(spark, in, schema), store, silver,
      "id", "ingestion_timestamp", ckpt).awaitTermination()
    val s2 = store.read(silver)
    s2.count() shouldBe 4L // 1v1(expired), 1v2, 2v1, 3v1
    s2.where(col("is_current")).select("id", "name").as[(Long, String)]
      .collect().toSet shouldBe Set((1L, "alice2"), (2L, "bob"), (3L, "carol"))
    val expired = s2.where(!col("is_current"))
    expired.select("id", "name").as[(Long, String)].collect().toList shouldBe
      List((1L, "alice"))
    expired.select("end_date").as[Timestamp].head() shouldBe t2
  }

  test("sessionizeBatch: gap splits sessions, counts and durations") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(0)), (1L, ts(5)), (1L, ts(40)), // gap 35min > 30 -> 2 sessions
      (2L, ts(10))
    ).toDF("user_id", "ts")
    val r = EventStream.sessionizeBatch(ev, gapMs = 30 * 60 * 1000)
      .select($"user_id", $"n_events", $"duration_ms")
      .as[(Long, Long, Long)].collect().toSet
    r shouldBe Set((1L, 2L, 5 * 60 * 1000L), (1L, 1L, 0L), (2L, 1L, 0L))
  }

  test("dedupStream drops duplicate keys within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val input = MemoryStream[(Long, Timestamp)]
    input.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2))) // dup key 1
    val q = EventStream.dedupStream(
        input.toDF().toDF("event_id", "ts"), Seq("event_id"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData((1L, ts(5)), (3L, ts(6))) // replayed key 1 in a later batch
      q.processAllAvailable()
      spark.table("dedup_stream").select($"event_id").as[Long]
        .collect().sorted.toSeq shouldBe Seq(1L, 2L, 3L)
    } finally q.stop()
  }

  test("intervalJoinStream attributes right events within the horizon, == batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    clicks.addData((1L, ts(0), "ad_a"), (1L, ts(20), "ad_b"), (2L, ts(5), "ad_a"))
    buys.addData(
      (1L, ts(10), 9.99),  // within 30 min of click@0 AND click@20? 10<20 -> only ad_a
      (1L, ts(45), 5.00),  // within 30 of click@20 only
      (2L, ts(50), 1.00),  // 45 min after the only click -> no match
      (3L, ts(7), 2.00))   // no click at all
    val q = EventStream.intervalJoinStream(
        clicks.toDF().toDF("user_id", "click_ts", "ad"),
        buys.toDF().toDF("user_id", "buy_ts", "amount"),
        "user_id", "click_ts", "buy_ts", "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attribution")
        .select($"user_id", $"ad", $"amount").as[(Long, String, Double)]
        .collect().toSet
      got shouldBe Set((1L, "ad_a", 9.99), (1L, "ad_b", 5.00))
      // equals the batch inequality join on the same data
      val bc = Seq((1L, ts(0), "ad_a"), (1L, ts(20), "ad_b"), (2L, ts(5), "ad_a"))
        .toDF("user_id", "click_ts", "ad")
      val bb = Seq((1L, ts(10), 9.99), (1L, ts(45), 5.00), (2L, ts(50), 1.00),
        (3L, ts(7), 2.00)).toDF("u2", "buy_ts", "amount")
      val batch = bc.join(bb, $"user_id" === $"u2" &&
          $"buy_ts" >= $"click_ts" &&
          $"buy_ts" <= $"click_ts" + expr("INTERVAL 30 minutes"))
        .select($"user_id", $"ad", $"amount").as[(Long, String, Double)]
        .collect().toSet
      got shouldBe batch
    } finally q.stop()
    an[IllegalArgumentException] should be thrownBy
      EventStream.intervalJoinStream(
        clicks.toDF().toDF("user_id", "ts", "x"),
        buys.toDF().toDF("user_id", "ts", "amount"),
        "user_id", "ts", "ts", "30 minutes", "2 hours")
  }

  test("sessionize splits intra-batch gaps and emits closed sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(m: Int) = new Timestamp(base + m * 60000L)
    def ev(m: Int) = EventStream.Event(1L, ts(m), "a")
    val gap = 30 * 60 * 1000L
    val input = MemoryStream[EventStream.Event]
    // ONE micro-batch containing an internal 35-min gap: the first segment
    // must close within the batch, not fold into a single session
    input.addData(ev(0), ev(5), ev(40), ev(45))
    val q = EventStream.sessionize(input.toDS(), gap,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("gap_sessions")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // a later batch past the gap closes the carried-over open session too
      input.addData(ev(80))
      q.processAllAvailable()
      val r = spark.table("gap_sessions")
        .select($"sessionStartMs", $"nEvents", $"durationMs", $"closed")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      r shouldBe Set(
        (ts(0).getTime, 2L, 5 * 60000L, true),   // closed inside batch 1
        (ts(40).getTime, 2L, 5 * 60000L, false), // open at end of batch 1
        (ts(40).getTime, 2L, 5 * 60000L, true),  // closed by batch 2's gap
        (ts(80).getTime, 1L, 0L, false))         // open at end of batch 2
      // closed sessions + final open session == the batch oracle's sessions
      val streamSessions = r.collect {
        case (s, n, d, true) => (s, n, d)
        case (s, n, d, false) if s == ts(80).getTime => (s, n, d)
      }
      val batchSessions = EventStream.sessionizeBatch(
        Seq(0, 5, 40, 45, 80).map(m => (1L, ts(m))).toDF("user_id", "ts"), gap)
        .select($"session_start", $"n_events", $"duration_ms")
        .as[(Timestamp, Long, Long)].collect()
        .map { case (s, n, d) => (s.getTime, n, d) }.toSet
      streamSessions shouldBe batchSessions
    } finally q.stop()
  }

  test("sessionizeEventTime closes idle sessions when the watermark passes the gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeEventTime(
        input.toDS().withWatermark("ts", "0 seconds"), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode("update").start()
    try {
      input.addData(EventStream.Event(1L, ts(10, 0), "a"),
        EventStream.Event(1L, ts(10, 5), "a"))
      q.processAllAvailable()
      // a later event for ANOTHER user advances the watermark past
      // 10:05 + 30min; user 1's open session must close by event time
      input.addData(EventStream.Event(2L, ts(11, 0), "b"))
      q.processAllAvailable()
      input.addData(EventStream.Event(2L, ts(11, 1), "b"))
      q.processAllAvailable()
      val closed = spark.table("et_sessions").where($"closed")
        .select($"user_id", $"nEvents", $"durationMs")
        .as[(Long, Long, Long)].collect().toSet
      closed shouldBe Set((1L, 2L, 5 * 60000L))
    } finally q.stop()
  }

  test("q90 drains the events file through event-time sessionization") {
    val out = graft.SparkEntry.queries("q90_stream_sessionize")(spark, sf0001)
    out.count() should be > 0L
    // every user seen by the stream sessionized; ids match the batch table
    val streamUsers = out.select($"user_id").distinct().as[Long].collect().toSet
    val batchUsers = Tables.table(spark, sf0001, "events")
      .select($"user_id").distinct().as[Long].collect().toSet
    streamUsers shouldBe batchUsers
  }

  test("streamDedupedIngest drops standing near-dups, keeps novel rows, replays no-op") {
    val root = Files.createTempDirectory("graft-stream-dedup")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val bronze = root.resolve("tables/bronze").toString
    val store = new graft.sources.TableStore(spark)
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely unrelated corpus text about database engines")
    ).toDF("doc_id", "text")
    val schema = corpus.schema
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.mode("append").option("header", "true").csv(in)

    // batch 1: one corpus near-dup (one word changed), one novel doc
    drop(Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "a totally new document about training data pipelines")))
    EventStream.streamDedupedIngest(
      EventStream.readCsvStream(spark, in, schema), corpus, store, bronze,
      "doc_id", "text", 3, 4, 3, 0.5, ckpt).awaitTermination()
    graft.core.CacheRegistry.drain()
    store.read(bronze).select("doc_id").as[Long].collect().toSet shouldBe Set(2L)

    // restart, no new files: replay is a no-op
    val v1 = store.currentVersion(bronze).get
    EventStream.streamDedupedIngest(
      EventStream.readCsvStream(spark, in, schema), corpus, store, bronze,
      "doc_id", "text", 3, 4, 3, 0.5, ckpt).awaitTermination()
    graft.core.CacheRegistry.drain()
    store.currentVersion(bronze).get shouldBe v1

    // batch 2: a near-dup of batch 1's SURVIVOR (standing side grew) and
    // a fresh doc — only the fresh one lands
    drop(Seq(
      (3L, "a totally new document about training data pipeline"),
      (4L, "yet another entirely distinct subject matter entry")))
    EventStream.streamDedupedIngest(
      EventStream.readCsvStream(spark, in, schema), corpus, store, bronze,
      "doc_id", "text", 3, 4, 3, 0.5, ckpt).awaitTermination()
    graft.core.CacheRegistry.drain()
    store.read(bronze).select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 4L)

    // the committed-batch marker rides IN the data commit (atomic with
    // the version), and the standing side is a MAINTAINED index: band
    // rows + verify arrays for corpus (signed once) + every admitted row
    store.versionMeta(bronze).get("committedBatch") shouldBe defined
    val sigs = store.read(s"${bronze}_minhash_sigs")
    sigs.select("doc_id").distinct().as[Long].collect().toSet shouldBe
      Set(100L, 101L, 2L, 4L)
    sigs.groupBy("doc_id").count().select("count").distinct()
      .as[Long].collect().toSeq shouldBe Seq(4L) // one row per band
    store.read(s"${bronze}_minhash_arrays").select("doc_id").distinct()
      .as[Long].collect().toSet shouldBe Set(100L, 101L, 2L, 4L)
  }

  test("streamDedupedIngest self-heals a signature index that lags the " +
    "data table (the crash window between the data and sibling commits)") {
    val root = Files.createTempDirectory("graft-stream-dedup-heal")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val bronze = root.resolve("tables/bronze").toString
    val store = new graft.sources.TableStore(spark)
    val corpus = Seq(
      (100L, "completely unrelated corpus text about database engines")
    ).toDF("doc_id", "text")
    val schema = corpus.schema
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.mode("append").option("header", "true").csv(in)
    def ingest(): Unit = {
      EventStream.streamDedupedIngest(
        EventStream.readCsvStream(spark, in, schema), corpus, store, bronze,
        "doc_id", "text", 3, 4, 3, 0.5, ckpt).awaitTermination()
      graft.core.CacheRegistry.drain()
    }
    drop(Seq((1L, "the quick brown fox jumps over the lazy dog tonight")))
    ingest()
    store.read(bronze).select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
    // clean history: neither sibling lags — the heal scan is skipped
    EventStream.indexLags(store, bronze, s"${bronze}_minhash_sigs") shouldBe false
    EventStream.indexLags(store, bronze, s"${bronze}_minhash_arrays") shouldBe false
    // simulate the crash window: an admitted row whose sibling appends
    // never landed — roll BOTH siblings back to the corpus-only bootstrap
    store.restore(s"${bronze}_minhash_sigs", 0L)
    store.restore(s"${bronze}_minhash_arrays", 0L)
    EventStream.indexLags(store, bronze, s"${bronze}_minhash_sigs") shouldBe true
    // next trigger: a near-dup of the orphaned survivor MUST still be
    // rejected — the heal re-signs row 1 before the batch is checked
    drop(Seq((2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "yet another entirely distinct subject matter entry")))
    ingest()
    store.read(bronze).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L)
    store.read(s"${bronze}_minhash_sigs").select("doc_id").distinct()
      .as[Long].collect().toSet shouldBe Set(100L, 1L, 3L)
    EventStream.indexLags(store, bronze, s"${bronze}_minhash_sigs") shouldBe false
  }

  test("streamDedupedIngest intraBatch reduces a micro-batch to cluster " +
    "representatives before the standing join") {
    val root = Files.createTempDirectory("graft-stream-dedup-intra")
    val ckpt = root.resolve("ckpt").toString
    val bronze = root.resolve("tables/bronze").toString
    val store = new graft.sources.TableStore(spark)
    val corpus = Seq(
      (100L, "completely unrelated corpus text about database engines")
    ).toDF("doc_id", "text")
    // two near-dups of EACH OTHER (novel vs the corpus) land in ONE batch
    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "yet another entirely distinct subject matter entry"))
      .toDF("doc_id", "text")
      .write.option("header", "true").csv(root.resolve("in").toString)
    EventStream.streamDedupedIngest(
      EventStream.readCsvStream(spark, root.resolve("in").toString,
        corpus.schema), corpus, store, bronze,
      "doc_id", "text", 3, 4, 3, 0.5, ckpt, intraBatch = true)
      .awaitTermination()
    graft.core.CacheRegistry.drain()
    // without the flag both 1 and 2 would land; with it the cluster
    // keeps its min id only
    store.read(bronze).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L)
  }

  test("streamToBronze replay marker survives a compact (marker-less " +
    "maintenance commit) — a redelivered batch does not re-append") {
    val root = Files.createTempDirectory("graft-stream-bronze-compact")
    val in = root.resolve("in").toString
    val events = Tables.table(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").limit(100)
    events.coalesce(1).write.option("header", "true").csv(in)
    val store = new graft.sources.TableStore(spark)
    val table = root.resolve("tables/bronze").toString
    EventStream.streamToBronze(
      EventStream.readCsvStream(spark, in, events.schema), store, table,
      root.resolve("ckpt1").toString).awaitTermination()
    store.read(table).count() shouldBe 100L
    // compact folds the data dirs and states NO markers of its own
    store.compact(table)
    store.versionMeta(table) shouldBe Map.empty
    // a FRESH checkpoint redelivers the same files as batch 0 — the
    // history-max marker still skips it (pre-fix: count doubled)
    EventStream.streamToBronze(
      EventStream.readCsvStream(spark, in, events.schema), store, table,
      root.resolve("ckpt2").toString).awaitTermination()
    store.read(table).count() shouldBe 100L
  }

  test("streamAnnDedupedIngest drops cosine near-dups vs the standing side, " +
    "keeps novel vectors, replays no-op") {
    val root = Files.createTempDirectory("graft-stream-ann")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("tables/vectors").toString
    val store = new graft.sources.TableStore(spark)
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (100L, vec(1, 0.1, 0, 0, 0, 0, 0, 0)),
      (101L, vec(0, 1, 0.1, 0, 0, 0, 0, 0))
    ).toDF("vec_id", "embedding")
    val schema = corpus.schema
    def drop(rows: Seq[(Long, Array[Float])]): Unit =
      rows.toDF("vec_id", "embedding").write.mode("append").parquet(in)
    def ingest(): Unit = {
      EventStream.streamAnnDedupedIngest(
        spark.readStream.schema(schema).parquet(in), corpus, store, table,
        "vec_id", "embedding", 0.8, 2, 4, ckpt).awaitTermination()
      graft.core.CacheRegistry.drain()
    }

    // batch 1: one corpus near-dup (cos ≈ 0.99 vs v100), one orthogonal
    drop(Seq((1L, vec(0.9, 0.12, 0, 0, 0, 0, 0, 0)),
      (2L, vec(0, 0, 0, 1, 0.1, 0, 0, 0))))
    ingest()
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe Set(2L)

    // restart with no new files: replay is a no-op version-wise
    val v1 = store.currentVersion(table).get
    ingest()
    store.currentVersion(table).get shouldBe v1

    // batch 2: a near-dup of batch 1's SURVIVOR (the standing side grew)
    // and a fresh orthogonal vector — only the fresh one lands
    drop(Seq((3L, vec(0, 0, 0, 0.95, 0.11, 0, 0, 0)),
      (4L, vec(0, 0, 0, 0, 0, 0, 1, 0.1))))
    ingest()
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe Set(2L, 4L)

    // the committed-batch marker rides IN the data commit (atomic with
    // the version), and the standing side's signatures are a MAINTAINED
    // index: corpus (signed once) + every admitted row, 4 bands each
    store.versionMeta(table).get("committedBatch") shouldBe defined
    val sigs = store.read(s"${table}_sigs")
    sigs.select("vec_id").distinct().as[Long].collect().toSet shouldBe
      Set(100L, 101L, 2L, 4L)
    sigs.groupBy("vec_id").count().select("count").distinct()
      .as[Long].collect().toSeq shouldBe Seq(4L)
    // the verify vectors live BESIDE the index — the exact-cosine fetch
    // reads this narrow sibling, never the data table or the corpus plan
    store.read(s"${table}_vecs").select("vec_id").as[Long].collect().toSet shouldBe
      Set(100L, 101L, 2L, 4L)
    // clean history: no sibling lags — the self-heal scan is gated off
    EventStream.indexLags(store, table, s"${table}_sigs") shouldBe false
    EventStream.indexLags(store, table, s"${table}_vecs") shouldBe false
  }

  test("streamAnnDedupedIngest intraBatch reduces a micro-batch of mutual " +
    "near-dups to one representative") {
    val root = Files.createTempDirectory("graft-stream-ann-intra")
    val in = root.resolve("in").toString
    val table = root.resolve("tables/vectors").toString
    val store = new graft.sources.TableStore(spark)
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq((100L, vec(1, 0.1, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    // rows 1 and 2 are near-dups of EACH OTHER (cos ≈ 0.9998), both
    // novel vs the corpus; row 3 is orthogonal to everything
    Seq((1L, vec(0, 0, 1, 0.1, 0, 0, 0, 0)),
      (2L, vec(0, 0, 0.95, 0.11, 0, 0, 0, 0)),
      (3L, vec(0, 0, 0, 0, 0, 1, 0.1, 0))).toDF("vec_id", "embedding")
      .write.parquet(in)
    EventStream.streamAnnDedupedIngest(
      spark.readStream.schema(corpus.schema).parquet(in), corpus, store,
      table, "vec_id", "embedding", 0.8, 2, 4, root.resolve("ckpt").toString,
      intraBatch = true).awaitTermination()
    graft.core.CacheRegistry.drain()
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L)
  }

  test("streamAnnDedupedIngest self-heals a signature index that lags the " +
    "data table (the crash window between the two commits)") {
    val root = Files.createTempDirectory("graft-stream-ann-heal")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("tables/vectors").toString
    val store = new graft.sources.TableStore(spark)
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq((100L, vec(1, 0.1, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val schema = corpus.schema
    def ingest(): Unit = {
      EventStream.streamAnnDedupedIngest(
        spark.readStream.schema(schema).parquet(in), corpus, store, table,
        "vec_id", "embedding", 0.8, 2, 4, ckpt).awaitTermination()
      graft.core.CacheRegistry.drain()
    }
    Seq((1L, vec(0, 0, 1, 0.1, 0, 0, 0, 0))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(in)
    ingest()
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe Set(1L)
    // simulate the crash window: an admitted row whose sig append never
    // landed — roll the SIG table back to its corpus-only bootstrap
    store.restore(s"${table}_sigs", 0L)
    store.read(s"${table}_sigs").select("vec_id").distinct()
      .as[Long].collect().toSet shouldBe Set(100L)
    // next trigger: a near-dup of the orphaned survivor MUST still be
    // rejected — the heal re-signs row 1 before the batch is checked
    Seq((2L, vec(0, 0, 0.95, 0.11, 0, 0, 0, 0)),
      (3L, vec(0, 0, 0, 0, 0, 1, 0.1, 0))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(in)
    ingest()
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L)
    store.read(s"${table}_sigs").select("vec_id").distinct()
      .as[Long].collect().toSet shouldBe Set(100L, 1L, 3L)
  }

  test("a compacted sibling index (marker-less maintenance commit) is " +
    "re-stamped by the next trigger's heal, not re-scanned forever") {
    val root = Files.createTempDirectory("graft-stream-ann-compact")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("tables/vectors").toString
    val store = new graft.sources.TableStore(spark)
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq((100L, vec(1, 0.1, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val schema = corpus.schema
    def ingest(): Unit = {
      EventStream.streamAnnDedupedIngest(
        spark.readStream.schema(schema).parquet(in), corpus, store, table,
        "vec_id", "embedding", 0.8, 2, 4, ckpt).awaitTermination()
      graft.core.CacheRegistry.drain()
    }
    Seq((1L, vec(0, 0, 1, 0.1, 0, 0, 0, 0))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(in)
    ingest()
    // maintenance: compact the sig sibling (it accumulates one data dir
    // per trigger — compacting it is the expected operator action). The
    // compact commit states no markers, so the sibling now TRAILS
    store.compact(s"${table}_sigs")
    EventStream.indexLags(store, table, s"${table}_sigs") shouldBe true
    // next trigger: correctness holds (near-dup of the admitted row is
    // rejected — nothing was actually missing from the index)...
    Seq((2L, vec(0, 0, 0.95, 0.11, 0, 0, 0, 0)),
      (3L, vec(0, 0, 0, 0, 0, 1, 0.1, 0))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(in)
    ingest()
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L)
    // ...and the heal RE-STAMPED the marker instead of leaving the lag
    // in place, so later triggers skip the heal scan again
    EventStream.indexLags(store, table, s"${table}_sigs") shouldBe false
    store.read(s"${table}_sigs").select("vec_id").distinct()
      .as[Long].collect().toSet shouldBe Set(100L, 1L, 3L)
  }

  test("streamAnnDedupedIngest milestone re-bands the sigs index when the " +
    "standing side grows a decade past the bootstrap calibration") {
    val root = Files.createTempDirectory("graft-stream-ann-reband")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val table = root.resolve("tables/vectors").toString
    val store = new graft.sources.TableStore(spark)
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    def basis(j: Int, sign: Double): Array[Float] = {
      val a = Array.fill(8)(0f); a(j) = sign.toFloat; a
    }
    val corpus = Seq((100L, vec(1, 0.1, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    // the calibration rule of the test universe: past a standing count
    // of 10, widen buckets (2→3 bits) and re-fit bands to the 8-dim
    // vectors (4→2) — the shape recommendedBits/recommendedBands take
    // at real scale
    val rule: Long => (Int, Int) =
      m => if (m >= 10L) (3, 2) else (2, 4)
    def ingest(): Unit = {
      EventStream.streamAnnDedupedIngest(
        spark.readStream.schema(corpus.schema).parquet(in), corpus, store,
        table, "vec_id", "embedding", 0.8, 2, 4, ckpt,
        recalib = Some(rule)).awaitTermination()
      graft.core.CacheRegistry.drain()
    }
    // batch 1: nine pairwise-far novel vectors — standing grows 1 → 10
    val novel = (2 to 7).map(j => (j.toLong, basis(j, 1.0))) ++
      (2 to 4).map(j => (j + 10L, basis(j, -1.0)))
    novel.toDF("vec_id", "embedding").write.mode("append").parquet(in)
    ingest()
    store.read(table).count() shouldBe 9L
    // bootstrap calibration still governs (the milestone fires on the
    // NEXT trigger — the decade was crossed by this batch's append)
    store.versionMeta(s"${table}_sigs").get("calibBits") shouldBe Some("2")
    store.versionMeta(s"${table}_sigs").get("standingCount") shouldBe Some("10")
    // batch 2: one novel + one near-dup of an ADMITTED row (cos ≈ 0.99
    // vs vec 2) — the trigger must first re-band, then still reject the
    // near-dup against the REBUILT index
    Seq((50L, vec(0, -1, 0.1, 0, 0, 0, 0, 0)),
      (51L, vec(0, 0, 0.95, 0.11, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(in)
    ingest()
    store.read(table).select("vec_id").as[Long].collect().toSet should
      (contain(50L) and not contain 51L)
    // the sigs sibling was rebuilt at the re-derived calibration: new
    // markers, 2 band rows per id, every standing id present
    val meta = store.versionMeta(s"${table}_sigs")
    meta.get("calibBits") shouldBe Some("3")
    meta.get("calibBands") shouldBe Some("2")
    meta.get("calibCount") shouldBe Some("10")
    val sigs = store.read(s"${table}_sigs")
    sigs.groupBy("vec_id").count().select("count").distinct()
      .as[Long].collect().toSeq shouldBe Seq(2L)
    sigs.select("vec_id").distinct().count() shouldBe 11L // corpus + 10 admitted
    // replay safety across the milestone: a fresh checkpoint redelivers
    // both batches; the data marker skips them and versions stand still
    val v = store.currentVersion(table).get
    EventStream.streamAnnDedupedIngest(
      spark.readStream.schema(corpus.schema).parquet(in), corpus, store,
      table, "vec_id", "embedding", 0.8, 2, 4,
      root.resolve("ckpt2").toString, recalib = Some(rule)).awaitTermination()
    graft.core.CacheRegistry.drain()
    store.currentVersion(table).get shouldBe v
  }

  test("streamDedupedIngest milestone re-bands from the stored shingle " +
    "arrays — the rebuilt index still rejects near-dups of admitted rows") {
    val root = Files.createTempDirectory("graft-stream-text-reband")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val bronze = root.resolve("tables/bronze").toString
    val store = new graft.sources.TableStore(spark)
    val corpus = Seq(
      (100L, "corpus zero anchors the standing side before any batch"))
      .toDF("doc_id", "text")
    val schema = corpus.schema
    // past a standing count of 10, add one signature row per band (the
    // recommendedBanding step at one decade, with bands re-fit)
    val rule: Long => (Int, Int) = m => if (m >= 10L) (6, 4) else (4, 3)
    def doc(i: Int): String =
      (0 until 8).map(w => s"tok${i}w$w").mkString(" ")
    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.mode("append")
        .option("header", "true").csv(in)
    def ingest(): Unit = {
      EventStream.streamDedupedIngest(
        EventStream.readCsvStream(spark, in, schema), corpus, store, bronze,
        "doc_id", "text", 3, 4, 3, 0.5, ckpt,
        recalib = Some(rule)).awaitTermination()
      graft.core.CacheRegistry.drain()
    }
    // batch 1: nine disjoint-vocabulary docs — standing grows 1 → 10
    drop((1 to 9).map(i => (i.toLong, doc(i))))
    ingest()
    store.read(bronze).count() shouldBe 9L
    store.versionMeta(s"${bronze}_minhash_sigs")
      .get("calibRows") shouldBe Some("3")
    // batch 2: one novel + one EXACT duplicate of ADMITTED doc 3 (same
    // shingle set → identical signature at ANY calibration, so the
    // candidate collision is deterministic) — the trigger re-bands
    // (rebuilding the sigs from the stored arrays sibling, no text
    // re-shingling) and must still reject the duplicate against the
    // REBUILT index
    drop(Seq((50L, doc(77)), (51L, doc(3))))
    ingest()
    store.read(bronze).select("doc_id").as[Long].collect().toSet should
      (contain(50L) and not contain 51L)
    val meta = store.versionMeta(s"${bronze}_minhash_sigs")
    meta.get("calibBands") shouldBe Some("6")
    meta.get("calibRows") shouldBe Some("4")
    meta.get("calibCount") shouldBe Some("10")
    val sigs = store.read(s"${bronze}_minhash_sigs")
    sigs.groupBy("doc_id").count().select("count").distinct()
      .as[Long].collect().toSeq shouldBe Seq(6L)
    sigs.select("doc_id").distinct().count() shouldBe 11L
    // the rebuilt-from-arrays signatures are BYTE-IDENTICAL to signing
    // the original text at the new calibration (MinHash mins are
    // invariant under the arrays' distinct)
    val direct = graft.ops.Dedup.minHashBandTable(
      store.read(bronze).select("doc_id", "text").unionByName(corpus),
      "doc_id", "text", 3, 6, 4)
    sigs.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(sigs).count() shouldBe 0L
  }

  test("a legacy index without calibration markers recovers: the gate " +
    "recounts the standing side and rebuilds the sigs sibling") {
    val root = Files.createTempDirectory("graft-stream-ann-legacy")
    val in = root.resolve("in").toString
    val table = root.resolve("tables/vectors").toString
    val store = new graft.sources.TableStore(spark)
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq((100L, vec(1, 0.1, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    // a round-10-era index: bootstrap marker only, NO calibration meta
    store.overwriteWithMeta(s"${table}_sigs",
      graft.ops.Similarity.signBandTable(corpus, "vec_id", "embedding", 2, 4),
      Map("committedBatch" -> "-1"))
    store.overwriteWithMeta(s"${table}_vecs", corpus,
      Map("committedBatch" -> "-1"))
    // one batch: a corpus near-dup and a novel vector
    Seq((1L, vec(0.9, 0.12, 0, 0, 0, 0, 0, 0)),
      (2L, vec(0, 0, 0, 1, 0.1, 0, 0, 0))).toDF("vec_id", "embedding")
      .write.parquet(in)
    EventStream.streamAnnDedupedIngest(
      spark.readStream.schema(corpus.schema).parquet(in), corpus, store,
      table, "vec_id", "embedding", 0.8, 2, 4,
      root.resolve("ckpt").toString).awaitTermination()
    graft.core.CacheRegistry.drain()
    // dedup held (the rebuilt index covered the corpus), and the sigs
    // sibling now carries the full calibration protocol
    store.read(table).select("vec_id").as[Long].collect().toSet shouldBe Set(2L)
    val meta = store.versionMeta(s"${table}_sigs")
    meta.get("calibBits") shouldBe Some("2")
    meta.get("calibBands") shouldBe Some("4")
    meta.get("standingCount") shouldBe Some("2") // corpus + 1 admitted
  }

  test("sessionize (mapGroupsWithState) matches batch sessionization on a drained stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(1L, ts(0), "a"), EventStream.Event(1L, ts(5), "a"),
      EventStream.Event(2L, ts(10), "b"))
    val q = EventStream.sessionize(input.toDS(), gapMs = 30 * 60 * 1000,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val r = spark.table("sessions")
        .select($"user_id", $"nEvents", $"durationMs")
        .as[(Long, Long, Long)].collect().toSet
      r shouldBe Set((1L, 2L, 5 * 60 * 1000L), (2L, 1L, 0L))
    } finally q.stop()
  }

  test("streamWatermarkDropCount: a real withWatermark over disordered " +
    "drops lands inside the analytic envelope - drops happen, and never " +
    "more than the one-batch-lag lateness bound") {
    // the EXACT count is scheduler-internal (absorbed-vs-dropped depends
    // on state-eviction timing and batch planning), so the pin is the
    // envelope: > 0 under a jitter that skips whole batches, and <= the
    // count of rows late vs the previous batch's max-event watermark
    val tmp = Files.createTempDirectory("wm-audit").toString
    val srcDir = new java.io.File(s"$tmp/drops"); srcDir.mkdirs()
    val all = Tables.table(spark, "/root/testdata/sf0.01", "events")
    val day0 = all.agg(min(to_date($"ts"))).head().getDate(0)
    val ev = all.where(to_date($"ts") === lit(day0))
      .select($"event_id", $"ts")
      .withColumn("arr", unix_micros($"ts") +
        graft.ops.Sampling.md5Mod($"event_id", 43200L) * 1000000L)
    val b = ev.agg(min("arr"), max("arr")).head()
    val (amin, amax) = (b.getLong(0), b.getLong(1))
    val staged = ev.withColumn("__b", least(lit(5L),
      floor(($"arr" - amin) * 6 / (amax - amin + 1)).cast("long")))
    for (i <- 0 to 5) {
      val stage = s"$tmp/stage_b$i"
      staged.where($"__b" === i).select("event_id", "ts")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val schema = spark.read.parquet(s"$srcDir/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*.parquet")
    val observed = EventStream.streamWatermarkDropCount(stream, "ts",
      "5 seconds", "5 minutes", s"$tmp/ckpt")
    // one-batch-lag upper bound, ms-truncated watermark, 5-min windows
    val wend = unix_micros($"ts") -
      pmod(unix_micros($"ts"), lit(300000000L)) + 300000000L
    val W = org.apache.spark.sql.expressions.Window
    val wm1 = staged.groupBy("__b").agg(max(unix_micros($"ts")).as("mx"))
      .select($"__b", max("mx").over(W.orderBy($"__b")
        .rowsBetween(W.unboundedPreceding, -1)).as("w1"))
    val upper = staged.join(wm1, Seq("__b"))
      .where(wend <= (floor($"w1" / 1000) - 5000) * 1000)
      .count()
    observed should be > 0L
    observed should be <= upper
  }
}
