package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join and spreads the hot key") {
    // pathological skew: one key carries 90% of the big side
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"tail$i")))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "dim")
    val salted = Joins.saltedEquiJoin(big, small, "k", 8)
    val plain = big.join(small, Seq("k"))
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
    // the salt actually fans the hot key out across several values
    val hotSalts = big.where($"k" === 1L)
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    hotSalts should be > 4L
  }

  test("saltedEquiJoin is deterministic across runs (no rand salting)") {
    val big = (1 to 50).map(i => (1L, s"v$i")).toDF("k", "v")
    val small = Seq((1L, "d")).toDF("k", "d")
    val a = Joins.saltedEquiJoin(big, small, "k", 4).collect().sortBy(_.toString)
    val b = Joins.saltedEquiJoin(big, small, "k", 4).collect().sortBy(_.toString)
    a shouldBe b
  }
}
