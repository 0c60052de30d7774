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

  test("all queries run and return rows at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { if (fn(spark, sf0001).count() > 0) None else Some(s"$name: 0 rows") }
      catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    failures shouldBe empty
  }
}
