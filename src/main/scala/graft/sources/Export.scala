package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus export: the hand-off from this engine to a trainer's
  * data loader, which consumes JSONL shards (the lingua franca of LLM
  * data tooling), not Parquet manifests.
  *
  * Shard assignment is CONTENT-DERIVED (md5 of the id column), not
  * `repartition(n)`'s round-robin: a re-run, a retry, or a differently
  * partitioned upstream produces byte-identical shard MEMBERSHIP, so
  * downstream sampling/resume logic keyed on shard stays valid. Within a
  * shard, files sort by the id at write time, so each shard's row order
  * is reproducible too.
  *
  * Scale shape: one hash-partition exchange on the shard key (exactly
  * what any sharded write pays), in-partition sort (no global sort), one
  * output file per shard via the partition-keyed write. The summary is
  * one scan of the written data — counts per shard for the loader's
  * sampling weights.
  */
object Export {

  /** Write `df` as `shards` JSONL files under `dir/shard=K/` and return
    * the per-shard manifest (shard, n_rows, min/max id) read back from
    * the written files — the count the loader trusts is the one on disk,
    * not the one the writer intended. */
  def jsonlShards(spark: SparkSession, df: DataFrame, idCol: String,
                  dir: String, shards: Int): DataFrame = {
    require(shards > 0, s"jsonlShards: need shards > 0, got $shards")
    // sort key leads with the partition column: the dynamic-partition
    // writer REQUIRES its ordering to start with "shard" and would insert
    // its own (stability-uncontracted) sort above an id-only ordering,
    // breaking byte-reproducible shard files
    df.withColumn("shard", graft.ops.Sampling.md5Mod(col(idCol), shards.toLong))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite")
      .partitionBy("shard")
      .json(dir)
    // explicit one-field schema: a schema-less read would run a full
    // inference pass and then JSON-parse every column of every row just
    // to count rows and min/max one id
    val idField = df.schema(idCol)
    spark.read
      .schema(new org.apache.spark.sql.types.StructType().add(idField))
      .json(dir)
      // the hive-partition column comes back int-typed; pin it to long
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
  }
}
