package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the benchmark star schema (TPC-H-ish parquet tables).
  *
  * All reads go through `spark.read.parquet` so Catalyst predicate pushdown /
  * column pruning reach the scan — callers should filter/select on the result
  * and let the optimizer prune (verified via `.explain`: PushedFilters +
  * ReadSchema shrink accordingly).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
      // rejects; read it as a nanos-since-epoch long and truncate to micros
      // (the generator emits no sub-microsecond precision, so this is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(path)
  }
}
