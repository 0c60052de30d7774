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

  test("float_vector_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    r shouldBe 11.0
  }
}
