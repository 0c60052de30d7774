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

  /** Versioned tables (`<table>__v<n>`) present in the catalog, with their
    * version numbers. Identifiers come back lowercased from the catalog —
    * matched case-insensitively or a mixed-case name would re-target v1
    * forever. */
  private def versionsOf(table: String): Array[(String, Int)] = {
    val prefix = s"${table.toLowerCase}__v"
    spark.sql(s"SHOW TABLES IN $database")
      .select("tableName").collect().map(_.getString(0))
      .flatMap { v =>
        val lv = v.toLowerCase
        if (lv.startsWith(prefix)) lv.stripPrefix(prefix).toIntOption.map(n => (v, n))
        else None
      }
  }

  /** Overwrite the table, bucketed and sorted on `pk`.
    *
    * The commit is a POINTER SWAP, not an in-place `saveAsTable` overwrite:
    * the new state lands in a fresh versioned table (`<table>__v<n>`), then
    * a view named `table` is re-pointed at it — the catalog twin of
    * [[TableStore]]'s manifest swap. The indirection is what makes the SCD2
    * merge contract work at all: the merged state is DERIVED from the
    * current snapshot, and Spark (rightly) refuses to overwrite a table
    * that the writing plan is also reading. Bucket metadata flows through
    * the pass-through view, so pk-joins against [[read]] still skip the
    * target-side exchange (BucketedTableStoreSpec pins the plan).
    *
    * Prior versions are KEPT — retention is an explicit [[vacuum]], exactly
    * like [[TableStore]]. Dropping the old version here would also be a
    * correctness hazard mid-run: DROP TABLE uncaches every plan that
    * references it, so a caller still holding a persisted DataFrame derived
    * from the previous snapshot (the SCD2 stage does) would silently
    * recompute it against deleted files. */
  def overwrite(table: String, df: DataFrame, pk: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    val next = s"${table}__v${versionsOf(table).map(_._2).maxOption.getOrElse(0) + 1}"
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, pk)
      .sortBy(pk)
      .saveAsTable(qualified(next))
    spark.sql(
      s"CREATE OR REPLACE VIEW ${qualified(table)} AS SELECT * FROM ${qualified(next)}")
  }

  /** Drop every version except the one the view currently points at — run
    * between pipeline runs (never concurrently with readers of the old
    * snapshot; DROP TABLE uncaches dependent plans). */
  def vacuum(table: String): Unit = {
    val vs = versionsOf(table)
    vs.sortBy(_._2).dropRight(1).foreach { case (v, _) =>
      spark.sql(s"DROP TABLE IF EXISTS ${qualified(v)}")
    }
  }

  /** Read the current snapshot WITH bucket metadata — joins/aggregations on
    * the bucket key skip their shuffle on this side (the view is a pure
    * pass-through, so the underlying scan's hash-partitioning survives). */
  def read(table: String): DataFrame = spark.table(qualified(table))
}
