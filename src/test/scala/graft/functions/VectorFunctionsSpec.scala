package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotF matches the higher-order-function fold bit-for-bit") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.75f)),
      (Seq(0f, 0f), Seq(0f, 0f))
    ).toDF("a", "b")
    val hof = aggregate(
      zip_with(transform($"a", _.cast("double")), transform($"b", _.cast("double")),
        (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorFunctions.dotF($"a", $"b").as("fast"), hof.as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) => fast shouldBe ref }
  }

  test("dotF propagates nulls") {
    val df = Seq((Some(Seq(1f)), None: Option[Seq[Float]])).toDF("a", "b")
    df.select(VectorFunctions.dotF($"a", $"b")).as[Option[Double]]
      .head() shouldBe None
  }

  test("dotF participates in whole-stage codegen over a parquet scan") {
    // a local Seq constant-folds into LocalTableScan; use a real scan
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = emb.select(VectorFunctions.dotF($"embedding", $"embedding"))
      .queryExecution.executedPlan
    plan.collect { case w: WholeStageCodegenExec => w } should not be empty
  }

  test("vectorSumF matches the posexplode/groupBy formulation") {
    val df = Seq(
      (1, Some(Seq(1.5f, -2.25f, 3.125f))),
      (1, Some(Seq(0.5f, 4.0f, -1.75f))),
      (1, None), // ignored
      (2, Some(Seq(2f, 2f))) // different group, shorter vectors
    ).toDF("g", "v")
    val fast = df.groupBy($"g")
      .agg(VectorFunctions.vectorSumF($"v").as("sums"))
      .select($"g", posexplode($"sums").as(Seq("pos", "s")))
      .as[(Int, Int, Double)].collect().toSet
    val ref = df.where($"v".isNotNull)
      .select($"g", posexplode($"v").as(Seq("pos", "x")))
      .groupBy($"g", $"pos").agg(sum($"x".cast("double")).as("s"))
      .as[(Int, Int, Double)].collect().toSet
    fast shouldBe ref
  }

  test("vectorWeightedSumF matches the posexplode/groupBy weighted formulation") {
    val df = Seq(
      (1, Some(Seq(1.5f, -2.25f, 3.125f)), Some(2.0)),
      (1, Some(Seq(0.5f, 4.0f, -1.75f)), Some(-0.5)),
      (1, None, Some(3.0)),                     // null vector ignored
      (1, Some(Seq(9f, 9f, 9f)), None),         // null weight ignored
      (2, Some(Seq(2f, 2f)), Some(0.25))
    ).toDF("g", "v", "w")
    val fast = df.groupBy($"g")
      .agg(VectorFunctions.vectorWeightedSumF($"v", $"w").as("sums"))
      .select($"g", posexplode($"sums").as(Seq("pos", "s")))
      .as[(Int, Int, Double)].collect().toSet
    val ref = df.where($"v".isNotNull && $"w".isNotNull)
      .select($"g", $"w", posexplode($"v").as(Seq("pos", "x")))
      .groupBy($"g", $"pos").agg(sum($"x".cast("double") * $"w").as("s"))
      .as[(Int, Int, Double)].collect().toSet
    fast shouldBe ref
  }

  test("float_vector_weighted_sum is callable from SQL after registration") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Seq((Seq(1f, 2f), 3.0)).toDF("v", "w").createOrReplaceTempView("vw_in")
    spark.sql("SELECT float_vector_weighted_sum(v, w) AS s FROM vw_in")
      .as[Seq[Double]].head() shouldBe Seq(3.0, 6.0)
  }

  test("vectorSumF: all-null group is NULL; ragged lengths zero-extend") {
    val allNull = Seq((1, None: Option[Seq[Float]])).toDF("g", "v")
      .groupBy($"g").agg(VectorFunctions.vectorSumF($"v").as("s"))
      .select($"s").as[Option[Seq[Double]]].head()
    allNull shouldBe None
    // ragged: [1,2,3] + [10] = [11, 2, 3] (missing trailing elements = 0)
    val ragged = Seq((1, Seq(1f, 2f, 3f)), (1, Seq(10f))).toDF("g", "v")
      .groupBy($"g").agg(VectorFunctions.vectorSumF($"v").as("s"))
      .select($"s").as[Seq[Double]].head()
    ragged shouldBe Seq(11.0, 2.0, 3.0)
  }

  test("vectorSumF plans map-side partial aggregation over a parquet scan") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val agg = emb.groupBy($"label").agg(VectorFunctions.vectorSumF($"embedding"))
    agg.collect()
    val aggs = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // typed-imperative aggregates run in ObjectHashAggregate; two instances
    // (partial below the exchange, final above) = map-side combining
    val n = "ObjectHashAggregate".r.findAllIn(aggs).length
    n shouldBe 2
  }

  test("float_vector_sum is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_vector_sum(v) AS s FROM VALUES " +
        "(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))), " +
        "(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS t(v)")
      .as[Seq[Double]].head()
    r shouldBe Seq(4.0, 6.0)
  }

  test("float_vector_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    r shouldBe 11.0
  }
}
