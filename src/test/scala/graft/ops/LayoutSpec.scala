package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
    val z = df.select(Layout.zValue($"x", $"y", 4).as("z")).as[Long].collect().toList
    // morton(3=0b0011, 5=0b0101) = y3 x3 y2 x2 y1 x1 y0 x0 = 0 0 1 0 0 1 1 1 = 0x27
    z shouldBe List(0L, 1L, 2L, 3L, 0x27L)
  }

  test("rangeBucket clamps outliers and is monotone") {
    val df = Seq(-5.0, 0.0, 24.9, 25.0, 99.9, 150.0).toDF("v")
    val b = df.select(Layout.rangeBucket($"v", 0, 100, 2).as("b")).as[Long].collect().toList
    b shouldBe List(0L, 0L, 0L, 1L, 3L, 3L)
  }

  test("z-order layout narrows per-partition ranges in BOTH dimensions") {
    val li = graft.core.Tables.table(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val laid = Layout.zOrderByRange(li,
      "l_partkey", (0.0, 2000.0), "l_suppkey", (0.0, 100.0), 8, 16)
    val ranges = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max($"l_partkey") - min($"l_partkey")).as("xr"),
        (max($"l_suppkey") - min($"l_suppkey")).as("yr"))
      .agg(avg($"xr").as("ax"), avg($"yr").as("ay"))
      .as[(Double, Double)].head()
    // global ranges are ~2000 and ~100; z-order must shrink the AVERAGE
    // per-partition extent of both dims (a single-col sort only shrinks one)
    ranges._1 should be < 1200.0
    ranges._2 should be < 60.0
  }

  test("zval is a pure function of the bucketed dims (repartition-stable)") {
    val li = graft.core.Tables.table(spark, sf0001, "lineitem")
    def zs(df: org.apache.spark.sql.DataFrame) = df
      .select($"l_orderkey", $"l_linenumber",
        Layout.zValue(Layout.rangeBucket($"l_partkey", 0, 2000, 8),
          Layout.rangeBucket($"l_suppkey", 0, 100, 8), 8).as("z"))
      .as[(Long, Long, Long)].collect().toSet
    zs(li) shouldBe zs(li.repartition(13))
  }

  test("globalRank equals the single-partition window rank on randomized data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // duplicate scores force the tie-break; ids unique
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(40)))
    val df = rows.toDF("id", "score")
    val got = graft.core.CacheRegistry.scoped {
      Layout.globalRank(df, "score", "id", "rank", numRanges = 7)
        .select($"id", $"rank").as[(Long, Long)].collect().toMap
    }
    val naive = df.withColumn("rank",
        row_number().over(Window.orderBy($"score", $"id")).cast("long"))
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    got shouldBe naive
    // ranks are a permutation of 1..N, not just order-consistent
    got.values.toSeq.sorted shouldBe (1L to 500L)
  }

  test("globalRank plans no single-partition exchange and rejects a name clash") {
    val df = (1 to 100).map(i => (i.toLong, i % 10)).toDF("id", "score")
    graft.core.CacheRegistry.scoped {
      val ranked = Layout.globalRank(df, "score", "id", "rank", numRanges = 5)
      ranked.count()
      val plan = ranked.queryExecution.executedPlan.toString
      // the whole point: the window runs per range partition, never on ONE
      plan should not include "Exchange SinglePartition"
    }
    intercept[IllegalArgumentException] {
      Layout.globalRank(df, "score", "id", rankCol = "score")
    }
  }

  test("topKPerGroup: desc/asc cuts, tie order, short groups keep all") {
    import spark.implicits._
    val d = Seq(
      (1L, "g1", 10L), (2L, "g1", 30L), (3L, "g1", 30L), (4L, "g1", 5L),
      (5L, "g2", 7L)
    ).toDF("id", "grp", "score")
    val top2 = Layout.topKPerGroup(d, "grp", "score", "id", 2)
      .select("id", "grp_rank").as[(Long, Long)].collect().toMap
    // g1: 30 (id 2) then 30 (id 3) — tie breaks on id asc; g2 keeps its 1 row
    top2 shouldBe Map(2L -> 1L, 3L -> 2L, 5L -> 1L)
    val bottom2 = Layout.topKPerGroup(d, "grp", "score", "id", 2, desc = false)
      .select("id", "grp_rank").as[(Long, Long)].collect().toMap
    bottom2 shouldBe Map(4L -> 1L, 1L -> 2L, 5L -> 1L)
    an[IllegalArgumentException] should be thrownBy
      Layout.topKPerGroup(d, "grp", "score", "id", 0)
  }

  test("writePlan: exact ceil file math, byte shares sum to 1, guards") {
    import spark.implicits._
    // key a: 250 bytes over 3 rows → 3 files of 100B target (ceil 250/100),
    // rows_per_file = ceil(3/3) = 1; key b: 90 bytes, 1 row → the 1-file floor
    val d = Seq(("a", 100L), ("a", 100L), ("a", 50L), ("b", 90L))
      .toDF("k", "bytes")
    val r = Layout.writePlan(d, Seq("k"), "bytes", 100L)
      .select("k", "n_rows", "est_bytes", "n_files", "rows_per_file", "bytes_share")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    r("a") shouldBe (("a", 3L, 250L, 3L, 1L, 0.735294))
    r("b") shouldBe (("b", 1L, 90L, 1L, 1L, 0.264706))
    an[IllegalArgumentException] should be thrownBy
      Layout.writePlan(d, Seq.empty, "bytes", 100L)
    an[IllegalArgumentException] should be thrownBy
      Layout.writePlan(d, Seq("k"), "bytes", 0L)
  }

  test("zoneMapAudit: sorted layout skips 9/10 files for a 10% range, " +
    "the scattered natural layout only 2/10") {
    // v = ((id·37) mod 100) + 1 is a permutation of 1..100 that scatters
    // consecutive ids across the value range; the 10 smallest v land in 8
    // distinct natural files (hand-traced via 37⁻¹ ≡ 73 mod 100)
    val df = (1L to 100L).map(i => (i, ((i * 37) % 100) + 1))
      .toDF("id", "v")
    val r = graft.core.CacheRegistry.scoped {
      Layout.zoneMapAudit(df, "id", "v", 10, Seq((1.0, 10.0)))
        .collect().map(x => x.getString(0) ->
          ((x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    }
    r("sorted") shouldBe ((10L, 9L, 0.9))
    r("natural") shouldBe ((10L, 2L, 0.2))
    an[IllegalArgumentException] should be thrownBy
      Layout.zoneMapAudit(df, "id", "v", 1, Seq((1.0, 10.0)))
    an[IllegalArgumentException] should be thrownBy
      Layout.zoneMapAudit(df, "id", "v", 10, Seq.empty)
    graft.core.CacheRegistry.drain()
  }

  test("z-order layout prices BOTH dimensions where a single-column " +
    "sort prices one (the q260 composition)") {
    val df = (0L until 256L).map(i => (i, i.toDouble, ((i * 37) % 256).toDouble))
      .toDF("id", "x", "y")
      .withColumn("zv", Layout.zValue(
        Layout.rangeBucket($"x", 0, 256, 8),
        Layout.rangeBucket($"y", 0, 256, 8), 8))
    val r = graft.core.CacheRegistry.scoped {
      Layout.sortKeyAdvisor(df, "id", Seq("x", "zv"),
        Seq(("x", 10.0, 40.0), ("y", 10.0, 40.0)), 16)
        .collect()
        .map(o => (o.getString(0), o.getString(1)) -> o.getDouble(6)).toMap
    }
    r(("x", "x")) should be >= 0.8  // own column: near-full pruning
    r(("x", "y")) should be <= 0.1  // scattered cross column: nothing
    r(("zv", "x")) should be >= 0.2 // morton: PARTIAL pruning on both
    r(("zv", "y")) should be >= 0.2
    graft.core.CacheRegistry.drain()
  }

  test("pointSkipAudit: sorted localizes a key to one file, scattered " +
    "keys touch many; absent probes skip everything") {
    // key = id div 10: values 0..9, ten copies each, CONSECUTIVE in id
    // order - sorted and natural layouts coincide, each key in 1 file.
    // key2 = id mod 10 scatters every value across all ten files.
    val df = (0L until 100L).map(i => (i, i / 10, i % 10))
      .toDF("id", "k1", "k2")
    val r1 = graft.core.CacheRegistry.scoped {
      Layout.pointSkipAudit(df.select($"id", $"k1"), "id", "k1", 10,
        Seq(3L, 42L)).collect()
        .map(x => (x.getString(0), x.getLong(1)) ->
          ((x.getLong(3), x.getDouble(4)))).toMap
    }
    r1(("sorted", 3L)) shouldBe ((1L, 0.9))
    r1(("natural", 3L)) shouldBe ((1L, 0.9)) // already clustered
    r1(("sorted", 42L)) shouldBe ((0L, 1.0)) // absent: skip all
    val r2 = graft.core.CacheRegistry.scoped {
      Layout.pointSkipAudit(df.select($"id", $"k2"), "id", "k2", 10,
        Seq(3L)).collect()
        .map(x => x.getString(0) -> ((x.getLong(3), x.getDouble(4)))).toMap
    }
    r2("sorted") shouldBe ((1L, 0.9))   // re-sorting clusters the key
    r2("natural") shouldBe ((10L, 0.0)) // scattered: index skips nothing
    an[IllegalArgumentException] should be thrownBy
      Layout.pointSkipAudit(df, "id", "k1", 1, Seq(1L))
    graft.core.CacheRegistry.drain()
  }

  test("sortKeyAdvisor: each layout prunes its own column exactly, " +
    "scattered cross-column probes prune (almost) nothing") {
    // a = 1..100 in id order; b = (id·37 mod 100) is a scattering
    // permutation of 0..99 (37 coprime to 100)
    val df = (1L to 100L).map(i => (i, i.toDouble, ((i * 37) % 100).toDouble))
      .toDF("id", "a", "b")
    val r = graft.core.CacheRegistry.scoped {
      Layout.sortKeyAdvisor(df, "id", Seq("a", "b"),
        Seq(("a", 1.0, 10.0), ("b", 1.0, 10.0)), 10)
        .collect()
        .map(x => (x.getString(0), x.getString(1)) ->
          ((x.getLong(4), x.getLong(5), x.getDouble(6)))).toMap
    }
    r.keySet should have size 4
    // sorted by a: files hold a = [1,10], [11,20], ... -> 9/10 skipped
    r(("a", "a")) shouldBe ((10L, 9L, 0.9))
    // sorted by b: files hold b = [0,9], [10,19], ...; [1,10] touches two
    r(("b", "b")) shouldBe ((10L, 8L, 0.8))
    // the scattered cross-column zones span nearly the full range
    r(("a", "b"))._3 should be < 0.3
    r(("b", "a"))._3 should be < 0.3
    an[IllegalArgumentException] should be thrownBy
      Layout.sortKeyAdvisor(df, "id", Seq("a"), Seq(("a", 1.0, 2.0)), 1)
    an[IllegalArgumentException] should be thrownBy
      Layout.sortKeyAdvisor(df, "id", Seq("missing"), Seq(("a", 1.0, 2.0)), 10)
    graft.core.CacheRegistry.drain()
  }
}
