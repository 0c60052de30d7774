package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** pk-bucketed merge-target layout — the 100 TB companion to [[TableStore]]
  * for tables that are repeatedly DIFFED on their primary key (the SCD2
  * full-outer join in [[graft.etl.Scd2.stage]]).
  *
  * Why a separate store: bucketing only helps if Catalyst KNOWS about it,
  * and Spark carries bucket metadata exclusively through the catalog
  * (`bucketBy(...).saveAsTable`); a path-based parquet layout — however the
  * files were arranged — always reads back with unknown partitioning and
  * re-shuffles. So the versioned path-based [[TableStore]] keeps serving
  * the general append/overwrite/evolve surface, and this catalog-backed
  * store serves merge targets where the diff-side shuffle dominates.
  *
  * Effect on the SCD2 diff: `stage()` full-outer-joins source and target on
  * the pk — both sides normally hash-shuffle. A target bucketed on pk scans
  * already hash-partitioned (`HashPartitioning(pk, nBuckets)`), so only the
  * (incremental, much smaller) source batch shuffles — into `nBuckets`
  * partitions to co-locate with the existing layout. At 100 TB that is the
  * difference between re-shuffling the full dimension table every run and
  * shuffling just the day's batch. `sortBy(pk)` additionally lets the
  * sort-merge join skip the target-side sort when each bucket holds one
  * file.
  *
  * Pick `nBuckets` compatible with the merge job's shuffle parallelism
  * (equal, or a divisor at scale): Spark co-partitions the probe side to
  * the bucket count, so a bucket count wildly below the cluster's
  * parallelism caps the join's concurrency.
  */
class BucketedTableStore(spark: SparkSession, database: String, nBuckets: Int) {
  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")

  private def qualified(table: String) = s"$database.$table"

  def exists(table: String): Boolean =
    spark.catalog.databaseExists(database) &&
      spark.catalog.tableExists(qualified(table))

  /** Overwrite the table, bucketed and sorted on `pk`. The commit is a
    * catalog swap (`mode("overwrite").saveAsTable`), matching TableStore's
    * replace-the-whole-state merge contract. */
  def overwrite(table: String, df: DataFrame, pk: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, pk)
      .sortBy(pk)
      .saveAsTable(qualified(table))
  }

  /** Read the current snapshot WITH bucket metadata — joins/aggregations on
    * the bucket key skip their shuffle on this side. */
  def read(table: String): DataFrame = spark.table(qualified(table))
}
