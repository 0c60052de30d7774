package graft

/** Driver-contract smoke: `entry` returns rows at sf0.001 (the driver's t1
  * gate) and every `oracleSql` key has a matching `queries` entry. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
  }

  test("queries and oracles cover each other exactly") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    (o -- q) shouldBe empty
    (q -- o) shouldBe empty
  }

  test("artifact consumer lists name only registered queries") {
    val q = SparkEntry.queries.keySet
    val bad = SparkEntry.artifactConsumers.toSeq.flatMap { case (art, consumers) =>
      (consumers -- q).map(c => s"$art -> $c")
    }
    bad shouldBe empty
  }

  test("warmCachesFor warms only consumed artifacts, and release is by last consumer") {
    SparkEntry.clearCaches(spark)
    // a query family with no maintained artifacts warms nothing
    SparkEntry.warmCachesFor(spark, sf0001,
      Seq("q01_pricing_summary", "q61_histogram")) shouldBe empty
    // the pair-index family warms exactly its closure
    val warmed = SparkEntry.warmCachesFor(spark, sf0001,
      Seq("q22_dedup_minhash_lsh")).map(_._1)
    warmed shouldBe Seq("lsh_pairs")
    val before = spark.sparkContext.getPersistentRDDs.size
    before should be >= 1
    // q22 still pending: release keeps the frame
    SparkEntry.releaseSpentCaches(spark, sf0001, Seq("q22_dedup_minhash_lsh"))
    spark.sparkContext.getPersistentRDDs.size shouldBe before
    // last consumer done: release drops it
    SparkEntry.releaseSpentCaches(spark, sf0001, Seq("q01_pricing_summary"))
    spark.sparkContext.getPersistentRDDs.size should be < before
    SparkEntry.clearCaches(spark)
  }

  test("all queries run and return rows at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { if (fn(spark, sf0001).count() > 0) None else Some(s"$name: 0 rows") }
      catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    failures shouldBe empty
  }
}
