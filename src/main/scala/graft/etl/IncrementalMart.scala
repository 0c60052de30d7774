package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (partial-aggregate) maintenance of a daily revenue mart.
  *
  * The reference pipeline rebuilds its Gold marts from the full Silver
  * history every run (`3_Silver_to_Gold.py` re-aggregates all facts); at
  * 100 TB that rescan IS the job. The scalable form is algebraic partial
  * aggregation: keep the mart as mergeable per-day PARTIALS (count / cents
  * sum / min / max / an HLL customer sketch), aggregate ONLY the new
  * partitions of the fact into delta partials, and merge — one hash-agg
  * over the delta plus one small shuffle on the mart key, independent of
  * history size. Every metric here is chosen to be merge-exact:
  *
  *   - counts and integer-cent sums are associative/commutative (the
  *     money column is snapped to exact micro-integers first, so the
  *     double-sum order difference between the incremental and one-pass
  *     plans cannot show up in the result);
  *   - min/max are idempotent semilattice merges;
  *   - distinct customers is NOT algebraic, so the mart carries a
  *     Datasketches HLL sketch — `hll_union_agg` over per-slice sketches
  *     yields byte-identical registers to a one-pass `hll_sketch_agg`,
  *     making the estimate itself replay-stable.
  *
  * [[finalizeMart]] derives the serving row; the q240 entry closes the
  * loop as a CONTRACT: split-history partials, merged and finalized, must
  * equal the oracle's full recompute on every exact metric, and the HLL
  * estimate must sit within its analytic band of the true per-day
  * distinct (emitted as a driver-checkable boolean).
  */
object IncrementalMart {

  /** Per-day mergeable partials over any slice of `orders`. One hash-agg
    * with map-side combine; the sketch is a few KB per day. */
  def dailyPartials(orders: DataFrame, lgK: Int = 12): DataFrame =
    orders
      .where(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("cents"),
        min(col("o_totalprice")).as("min_order"),
        max(col("o_totalprice")).as("max_order"),
        hll_sketch_agg(col("o_custkey"), lit(lgK)).as("cust_sketch"))

  /** Merge stored partials with a delta batch's partials: one shuffle on
    * the mart key over |days| rows — never a fact rescan. Associative, so
    * any split of history (daily batches, backfills, late data) folds to
    * the same mart. */
  def mergePartials(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(delta)
      .groupBy("day")
      .agg(
        sum("n_orders").as("n_orders"),
        sum("cents").as("cents"),
        min("min_order").as("min_order"),
        max("max_order").as("max_order"),
        hll_union_agg(col("cust_sketch")).as("cust_sketch"))

  /** Derive the serving mart from partials: exact revenue from integer
    * cents, a micro-integer average (truncated at 1e-6 — integer `div`,
    * so no engine's double-rounding tie-break can leak), and the
    * sketch's distinct estimate. */
  def finalizeMart(partials: DataFrame): DataFrame =
    partials.select(
      col("day"),
      col("n_orders"),
      (col("cents").cast("double") / 100.0).as("revenue"),
      col("min_order"),
      col("max_order"),
      (expr("(cents * 10000) div n_orders").cast("double") / 1000000.0)
        .as("avg_order"),
      hll_sketch_estimate(col("cust_sketch")).as("est_customers"))

  /** INVERTIBLE per-day partials — the abelian-group subset of
    * [[dailyPartials]] (counts and integer-cent sums support
    * subtraction; min/max lattices and HLL sketches do NOT — a deletion
    * there forces a rebuild, which is exactly why this mart carries only
    * the invertible metrics). `sign = -1` negates a slice for
    * retraction. */
  def invertibleDailyPartials(orders: DataFrame, sign: Int = 1): DataFrame = {
    require(sign == 1 || sign == -1,
      s"invertibleDailyPartials: sign must be +-1, got $sign")
    orders
      .where(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        (count(lit(1)) * sign).as("n_orders"),
        (sum(round(col("o_totalprice") * 100.0, 0).cast("long")) * sign)
          .as("cents"))
  }

  /** Incremental VIEW MAINTENANCE: apply a [[graft.sources.TableStore
    * .changeFeed]] delta to the stored invertible mart — deletions and
    * update pre-images RETRACT (sign −1), insertions and post-images
    * ADD (sign +1), and the merged mart must equal a full recompute of
    * the new version (the q259 contract). This is the third freshness
    * strategy next to merge-only partials (q240) and streaming merges
    * (q245): when upstream can DELETE or UPDATE, a mart fed by a keyed
    * change feed stays exact without ever rescanning history. Days whose
    * count reaches zero drop out (fully retracted).
    *
    * Scale shape: two delta hash-aggs over the FEED (not the fact) plus
    * one |days|-row merge. */
  def applyChangeFeed(stored: DataFrame, feed: DataFrame,
                      changeCol: String = "change"): DataFrame = {
    val add = feed.where(col(changeCol).isin("insert", "update_postimage"))
    val retract = feed.where(col(changeCol).isin("delete", "update_preimage"))
    stored
      .unionByName(invertibleDailyPartials(add, 1))
      .unionByName(invertibleDailyPartials(retract, -1))
      .groupBy("day")
      .agg(sum("n_orders").as("n_orders"), sum("cents").as("cents"))
      .where(col("n_orders") > 0)
  }

  /** Serving view of the invertible mart: exact revenue and the
    * micro-integer average (the [[finalizeMart]] `div` rule). */
  def finalizeInvertible(partials: DataFrame): DataFrame =
    partials.select(
      col("day"), col("n_orders"),
      (col("cents").cast("double") / 100.0).as("revenue"),
      (expr("(cents * 10000) div n_orders").cast("double") / 1000000.0)
        .as("avg_order"))

  /** The q240 contract: orders split by `splitPred` into two slices, each
    * reduced to partials, merged, finalized — and the HLL estimate judged
    * against the exact per-day distinct within `sigmas` HLL relative
    * standard errors. A key-parity split (rather than a date cut) makes
    * EVERY day's row the result of a real two-partial merge, so merge
    * associativity — counts, cent sums, min/max lattices, and sketch
    * unions alike — is what the oracle's full recompute actually pins.
    * The estimate collapses to the `est_ok` boolean the oracle can assert
    * without reproducing sketch registers. */
  def incrementalMartContract(orders: DataFrame, splitPred: Column,
                              lgK: Int = 12, sigmas: Double = 3.0): DataFrame = {
    val old = orders.where(coalesce(splitPred, lit(false)))
    val fresh = orders.where(!coalesce(splitPred, lit(false)))
    val partials =
      mergePartials(dailyPartials(old, lgK), dailyPartials(fresh, lgK))
    martWithContract(partials, orders, lgK, sigmas)
  }

  /** Finalize arbitrary `partials` (batch-merged or stream-maintained)
    * and judge the sketch estimate against the exact per-day distinct
    * recomputed from `orders` — the shared tail of the q240/q245
    * contracts. */
  def martWithContract(partials: DataFrame, orders: DataFrame,
                       lgK: Int = 12, sigmas: Double = 3.0): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"martWithContract: bad lgK $lgK")
    require(sigmas > 0, s"martWithContract: need sigmas > 0")
    val rsd = 1.04 / math.sqrt(math.pow(2.0, lgK))
    val exact = orders
      .where(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(countDistinct(col("o_custkey")).as("__exact"))
    finalizeMart(partials).join(exact, Seq("day"))
      .select(col("day"), col("n_orders"), col("revenue"),
        col("min_order"), col("max_order"), col("avg_order"),
        (abs(col("est_customers").cast("double") - col("__exact").cast("double"))
          <= lit(sigmas * rsd) * col("__exact").cast("double")).as("est_ok"))
  }
}
