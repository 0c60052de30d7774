package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.TableStore

/** Silver → Gold stage (/root/reference/databricks_notebooks/
  * 3_Silver_to_Gold.py): current-version star join into the denormalized
  * fact, then the six marts, each atomically overwritten.
  *
  * Structure preserved from the reference:
  *  - dims are read with the `is_current = true` filter before joining
  *    (3_Silver_to_Gold.py:12-16) — at scale, partitioning Silver by
  *    `is_current` makes this partition pruning;
  *  - the fact is cached once and feeds all marts (3_Silver_to_Gold.py:44);
  *  - monthly/quarterly re-aggregate the daily result (3_Silver_to_Gold.py:
  *    64-71), including its sum-of-daily-distinct semantics;
  *  - segmentation reads the written daily mart BACK from storage
  *    (3_Silver_to_Gold.py:102-103) — load-bearing: it exercises the
  *    sink→source path and decouples from the cached lineage.
  */
object GoldBuild {

  final case class Report(marts: Map[String, Long])

  /** Read a Silver table's current slice (P2: 3_Silver_to_Gold.py:12-16). */
  def currentSlice(store: TableStore, silverRoot: String, table: String): DataFrame =
    store.read(s"$silverRoot/$table").where(col("is_current"))

  /** Build all marts from a prepared fact (however it was joined) and commit
    * each via atomic overwrite. Returns per-mart row counts. */
  def run(spark: SparkSession, store: TableStore, goldRoot: String,
          fact: DataFrame): Report = {
    val factCached = fact.persist(StorageLevel.MEMORY_AND_DISK)
    // per-mart row counts observed DURING each overwrite — previously the
    // report re-read and counted all seven marts from storage, a second
    // full pass over every mart that existed only for the log line
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def write(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
      rows(name) = graft.core.Observed.countDuring(df)(
        store.overwrite(s"$goldRoot/$name", _, partitionBy))
    try {
      // the stored fact is partitioned by order year — at 100 TB every
      // period-scoped mart query prunes to its years instead of scanning
      // the whole fact (the reference leaves this to Delta; README.MD:120)
      write("fact_order_details",
        factCached.withColumn("order_year", year(col("OrderDate"))),
        Seq("order_year"))

      val daily = GoldMarts.sellerPerformanceDaily(GoldMarts.withDateParts(factCached))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        write("seller_performance_daily", daily, Seq("year"))
        write("seller_performance_monthly", GoldMarts.sellerPerformanceMonthly(daily))
        write("seller_performance_quarterly", GoldMarts.sellerPerformanceQuarterly(daily))

        val rates = GoldMarts.orderRates(factCached)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          write("order_rates", rates)
          // segmentation reads the written daily mart back (A6 semantics)
          val dailyFromStore = store.read(s"$goldRoot/seller_performance_daily")
          write("seller_segmentation",
            GoldMarts.sellerSegmentation(dailyFromStore, rates))
        } finally rates.unpersist()

        write("customer_analytics", GoldMarts.customerAnalytics(factCached))
      } finally daily.unpersist()

      Report(rows.toMap)
    } finally factCached.unpersist()
  }
}
