package graft

import graft.core.CacheRegistry

/** Pins the harness cache contract (round-1 judge finding: operator-internal
  * persists accumulated across a 30-query session and contributed to the
  * bench JVM's death): after each query's result is consumed, a drain must
  * release every ephemeral persist, and suite-end clearCaches must release
  * the memoized fact/staged caches — storage stays flat across queries. */
class CacheLifecycleSpec extends SparkSpec {

  test("cache-heavy queries drain back to baseline storage") {
    // normalize whatever earlier suites left behind
    CacheRegistry.drain()
    SparkEntry.clearCaches(spark)
    val baseline = spark.sparkContext.getPersistentRDDs.size

    // the three heaviest cache users: shingle tables, LSH candidates,
    // label-propagation rounds
    Seq("q21_dedup_ngram_jaccard", "q22_dedup_minhash_lsh", "q33_dedup_clusters")
      .foreach { name =>
        SparkEntry.queries(name)(spark, sf0001).count()
        CacheRegistry.size should be > 0
        CacheRegistry.drain()
        withClue(s"after draining $name: ") {
          spark.sparkContext.getPersistentRDDs.size shouldBe baseline
        }
      }

    // memoized cross-query caches release at suite end
    SparkEntry.queries("q03_seller_perf_daily")(spark, sf0001).count()
    CacheRegistry.drain()
    spark.sparkContext.getPersistentRDDs.size should be >= baseline
    SparkEntry.clearCaches(spark)
    spark.sparkContext.getPersistentRDDs.size shouldBe baseline
  }
}
