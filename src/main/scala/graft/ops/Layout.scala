package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * range-bucketed dimensions so that rows close in EITHER dimension land
  * close in the sort order — the multi-dimensional clustering trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. Files written in z order carry
  * narrow min/max ranges for BOTH columns, so parquet row-group and file
  * pruning works for predicates on either one (a plain sort only prunes
  * its leading column).
  *
  * Scale shape: the z-value is a per-row bit-fold in the scan stage;
  * `zOrderByRange` adds ONE range repartition (sampled range boundaries —
  * Spark's standard global-sort machinery) and an in-partition sort.
  * That is the same cost as sorting by a single column; no extra passes.
  */
object Layout {

  /** Linear range bucket of `c` into 0 .. 2^bits-1, clamped at both ends
    * (outliers saturate into the edge buckets). Pure IEEE double
    * arithmetic — reproducible on any engine. */
  def rangeBucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"rangeBucket: need 0 < bits <= 16, got $bits")
    require(hi > lo, s"rangeBucket: need hi > lo, got [$lo, $hi]")
    val n = 1L << bits
    val width = (hi - lo) / n
    val raw = floor((c.cast("double") - lo) / width).cast("long")
    greatest(lit(0L), least(lit(n - 1), raw))
  }

  /** Morton interleave of two `bits`-bit bucket columns: bit i of `xb`
    * lands at position 2i, bit i of `yb` at 2i+1. Expanded to a flat
    * bitwise expression (2·bits terms) — whole-stage-codegen folds it into
    * straight-line long arithmetic. */
  def zValue(xb: Column, yb: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"zValue: need 0 < bits <= 16, got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(xb.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(yb.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Exact global total-order rank (1-based, dense in the row_number
    * sense) WITHOUT a single-partition window — the curriculum-ordering
    * primitive (sort the corpus by a difficulty score and rank it).
    *
    * `Window.orderBy` with no partitionBy moves the ENTIRE dataset into
    * one partition — the canonical Spark scale killer: at 100 TB that one
    * task spills forever or OOMs. This operator gets the identical answer
    * with Spark's global-sort machinery instead: range-repartition on
    * (order, tie) — one shuffle with sampled boundaries, the same cost
    * `orderBy` pays — rank within each range partition, then add each
    * partition's cumulative row-count offset (range id N holds keys
    * strictly ordered after range N-1, so within-rank + offset = global
    * rank). The per-range counts are `numRanges` longs on the driver —
    * bounded, like the k-means centroid pull-down.
    *
    * The ranged frame is persisted (and registered with
    * [[graft.core.CacheRegistry]]) because the counts action and the
    * result plan must see the SAME sampled range boundaries — consume the
    * result inside `CacheRegistry.scoped { ... }` like every multi-action
    * operator here.
    *
    * `(orderCol, tieBreak)` must be a total order (unique pairs) for the
    * rank to be deterministic; NULL ordering follows Spark (nulls first
    * ascending). */
  def globalRank(df: DataFrame, orderCol: String, tieBreak: String,
                 rankCol: String = "rank", numRanges: Int = 32): DataFrame =
    globalRankWithCount(df, orderCol, tieBreak, rankCol, numRanges)._1

  /** [[globalRank]] plus the input's EXACT row count — the sum of the
    * per-range counts the rank already collects, so callers that also
    * need N (the zone/point audits' `div __n` file rule) get it for free
    * instead of paying a separate count scan per layout/candidate
    * (round 12, guide §2.4: q241 ran one extra serial count job; the
    * zone audits re-scanned the input through a crossJoined single-row
    * count subquery per layout). */
  private[graft] def globalRankWithCount(df: DataFrame, orderCol: String,
      tieBreak: String, rankCol: String = "rank",
      numRanges: Int = 32): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    require(numRanges > 0, s"globalRank: need numRanges > 0, got $numRanges")
    require(!df.columns.contains(rankCol),
      s"globalRank: rank column '$rankCol' already exists - pick another name")
    val ranged = graft.core.CacheRegistry.persist(
      df.repartitionByRange(numRanges, col(orderCol).asc, col(tieBreak).asc)
        .withColumn("__range", spark_partition_id()))
    val counts = ranged.groupBy(col("__range"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = pid -> acc; acc += n; o
    }
    // ≤ numRanges terms: folds into straight-line codegen'd comparisons
    val offExpr = offsets.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__range") === pid, lit(off)).otherwise(e)
    }
    val w = Window.partitionBy(col("__range"))
      .orderBy(col(orderCol).asc, col(tieBreak).asc)
    (ranged.withColumn(rankCol, row_number().over(w).cast("long") + offExpr)
      .drop("__range"), acc)
  }

  /** Top `k` rows per group by `orderCol` (descending by default, ties on
    * `tieBreak` ascending), with the 1-based position as `grp_rank` —
    * best-k-docs-per-source, top-k-features-per-label, any bounded
    * per-group cut. Spark's WindowGroupLimit rewrite keeps per-group
    * k-heaps on the MAP side, so the group exchange carries ≤ k·|groups|
    * rows per task — never a full per-group sort. */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieBreak: String, k: Int, desc: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"topKPerGroup: need k > 0, got $k")
    val ord = if (desc) col(orderCol).desc else col(orderCol).asc
    val w = Window.partitionBy(col(groupCol)).orderBy(ord, col(tieBreak).asc)
    df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .where(col("grp_rank") <= k)
  }

  /** Output-layout planner for a partitioned write: per partition key,
    * row count, estimated bytes (Σ `sizeCol`), the file count that hits
    * `targetBytes` per file, rows per file, and each key's share of total
    * bytes — the table that says "this write produces 40k tiny files in
    * `src17` and three 2 TB monsters in `src0`" BEFORE the job runs, so
    * the writer can repartition per key instead of discovering skew from
    * a dead executor. All file math is exact integer ceil-division
    * (`(a + b - 1) / b`), no float rounding to disagree across engines.
    *
    * Scale shape: ONE partition-keyed hash-agg with map-side partials
    * over (count, sum); the grand total is an agg OF the agg (≤ |keys|
    * rows) broadcast back — no single-partition window, corpus never
    * shuffles. */
  def writePlan(df: DataFrame, partitionCols: Seq[String], sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(partitionCols.nonEmpty, "writePlan: need at least one partition column")
    require(targetBytes > 0, s"writePlan: need targetBytes > 0, got $targetBytes")
    // persisted: the grand total and the final projection both consume
    // the per-key agg — uncached, the corpus scan + agg would run twice
    val per = graft.core.CacheRegistry.persist(
      df.groupBy(partitionCols.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          sum(col(sizeCol).cast("long")).as("est_bytes")))
    val tot = per.agg(sum("est_bytes").as("__total_bytes"))
    // `div`, not `/`: Column./ is DOUBLE division, which rounds above 2^53
    // — exactly the byte counts a 100 TB write produces
    val nFiles = greatest(lit(1L),
      expr(s"(est_bytes + ${targetBytes - 1}L) div ${targetBytes}L"))
    per.crossJoin(broadcast(tot))
      .withColumn("n_files", nFiles)
      .withColumn("rows_per_file", expr("(n_rows + n_files - 1) div n_files"))
      .withColumn("bytes_share",
        round(col("est_bytes").cast("double") / col("__total_bytes"), 6))
      .drop("__total_bytes")
  }

  /** Zone-map (file min/max statistics) skip-ratio audit: BEFORE paying
    * for a re-sort of 100 TB, measure what it buys. Rows are assigned to
    * `nFiles` consecutive files under two layouts — `sorted` (by
    * `sortCol`, ties on `idCol`) and `natural` (by `idCol`) — file i gets
    * the rows with `(rank−1)·nFiles div N = i` (exact integer math, the
    * [[writePlan]] `div` rule). Per file the min/max zone of `sortCol` is
    * computed, and for every `[lo, hi]` predicate the output reports how
    * many files a min/max-pruning scan would SKIP (`max < lo or min >
    * hi` — the parquet row-group / Delta file-stats rule). The
    * sorted-vs-natural skip_ratio gap is the direct value of the layout:
    * ~(1 − selectivity) of files skipped when sorted, ~0 when the column
    * is scattered. Output: (layout, pred_lo, pred_hi, n_files, n_skipped,
    * skip_ratio — an exact integer quotient, unrounded).
    *
    * Scale shape: ranks come from [[globalRank]] (range-exchange + per-
    * range windows — no single-partition sort); zones are ONE file-keyed
    * hash-agg of nFiles rows; the predicate grid joins against the tiny
    * zones table. The corpus is scanned once per layout. */
  def zoneMapAudit(df: DataFrame, idCol: String, sortCol: String,
                   nFiles: Int, predicates: Seq[(Double, Double)]): DataFrame = {
    require(nFiles >= 2, s"zoneMapAudit: need nFiles >= 2, got $nFiles")
    require(predicates.nonEmpty, "zoneMapAudit: need at least one predicate")
    val spark = df.sparkSession
    import spark.implicits._
    val preds = broadcast(predicates.toDF("pred_lo", "pred_hi"))
    def audit(layout: String, orderCol: String): DataFrame = {
      // the row count N comes from the rank's own per-range counts — a
      // crossJoined count subquery here re-scanned the input per layout
      val (ranked, nTotal) = globalRankWithCount(
        df.select(col(idCol), col(sortCol)), orderCol, idCol, "__rank")
      val zones = ranked
        .withColumn("__file", expr(s"((__rank - 1) * $nFiles) div ${nTotal}L"))
        .groupBy(col("__file"))
        .agg(min(col(sortCol)).as("__mn"), max(col(sortCol)).as("__mx"))
      zones.crossJoin(preds)
        .groupBy(col("pred_lo"), col("pred_hi"))
        .agg(count(lit(1)).as("n_files"),
          sum((col("__mx") < col("pred_lo") || col("__mn") > col("pred_hi"))
            .cast("long")).as("n_skipped"))
        .select(lit(layout).as("layout"), col("pred_lo"), col("pred_hi"),
          col("n_files"),
          col("n_skipped"),
          (col("n_skipped").cast("double") / col("n_files").cast("double"))
            .as("skip_ratio"))
    }
    audit("sorted", sortCol).unionAll(audit("natural", idCol))
  }

  /** Add a `zval` column from two range-bucketed dimensions and lay the
    * data out in z order: range-repartition on `zval` (one shuffle with
    * sampled boundaries) then sort each partition. Writing the result
    * yields files whose min/max stats are narrow in BOTH dimensions. */
  def zOrderByRange(df: DataFrame,
                    xCol: String, xRange: (Double, Double),
                    yCol: String, yRange: (Double, Double),
                    bits: Int, numPartitions: Int): DataFrame = {
    val z = zValue(
      rangeBucket(col(xCol), xRange._1, xRange._2, bits),
      rangeBucket(col(yCol), yRange._1, yRange._2, bits), bits)
    df.withColumn("zval", z)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions("zval")
  }

  /** Point-lookup skip audit — the MEMBERSHIP-index counterpart of
    * [[zoneMapAudit]]'s range zones: for `key = v` probes, a per-file
    * membership structure (a bloom filter, at its no-false-positive upper
    * bound measured here EXACTLY) skips every file that does not contain
    * `v` — which pays on the NATURAL layout too, where min/max zones skip
    * nothing. The sorted-vs-natural gap for point probes is therefore the
    * value of SORTING; the natural-layout skip ratio is the value of a
    * membership index WITHOUT re-sorting — the two numbers a storage-
    * layout decision actually needs. Output: (layout, probe, n_files,
    * n_containing, skip_ratio) — exact integer quotients; probes absent
    * from the data skip everything.
    *
    * Scale shape: rows filter to the broadcast probe list BEFORE any
    * shuffle (a |probes|-row broadcast join in the scan stage), so only
    * matching rows reach the (probe, file) distinct; file assignment is
    * [[globalRank]]'s exact `div` rule per layout. */
  def pointSkipAudit(df: DataFrame, idCol: String, keyCol: String,
                     nFiles: Int, probes: Seq[Long]): DataFrame = {
    require(nFiles >= 2, s"pointSkipAudit: need nFiles >= 2, got $nFiles")
    require(probes.nonEmpty, "pointSkipAudit: need at least one probe")
    val spark = df.sparkSession
    import spark.implicits._
    val probeDf = broadcast(probes.toDF("probe"))
    val base = df.select(col(idCol), col(keyCol).cast("long").as("__key"))
    def audit(layout: String, orderCol: String): DataFrame = {
      val (ranked, nTotal) = globalRankWithCount(base, orderCol, idCol, "__rank")
      val counts = ranked
        .withColumn("__file", expr(s"((__rank - 1) * $nFiles) div ${nTotal}L"))
        .join(probeDf, col("__key") === col("probe"))
        .select("probe", "__file").distinct()
        .groupBy("probe").agg(count(lit(1)).as("n_containing"))
      probeDf.join(counts, Seq("probe"), "left")
        .select(lit(layout).as("layout"), col("probe"),
          lit(nFiles).cast("long").as("n_files"),
          coalesce(col("n_containing"), lit(0L)).as("n_containing"),
          ((lit(nFiles) - coalesce(col("n_containing"), lit(0L)))
            .cast("double") / lit(nFiles).cast("double")).as("skip_ratio"))
    }
    audit("sorted", "__key").unionAll(audit("natural", idCol))
  }

  /** Price EVERY candidate sort key against a probe workload before
    * paying for any re-sort: for each candidate layout (rows laid into
    * `nFiles` equal files in `(candidate, idCol)` order — [[zoneMapAudit]]'s
    * exact integer file rule), compute per-file min/max zones for ALL probe
    * columns at once and report, per `(candidate, probe_col, [lo, hi])`,
    * how many files a min/max-pruning scan would skip. This is the cross-
    * column question [[zoneMapAudit]] cannot answer — sorting by A prunes
    * predicates on correlated B but scatters uncorrelated C, and the
    * advisor makes that trade-off an exact number per candidate.
    *
    * Output: (sort_key, probe_col, pred_lo, pred_hi, n_files, n_skipped,
    * skip_ratio) — skip_ratio an exact integer quotient, unrounded.
    *
    * Scale shape: one corpus scan per candidate ([[globalRank]]'s range
    * exchange — no single-partition sort), ONE file-keyed hash-agg
    * carrying all probe columns' min/max, then the tiny zones table joins
    * a broadcast predicate grid. Probe columns are cast to double up
    * front so zone/predicate comparisons are type-stable. */
  def sortKeyAdvisor(df: DataFrame, idCol: String, candidates: Seq[String],
                     probes: Seq[(String, Double, Double)],
                     nFiles: Int): DataFrame = {
    require(nFiles >= 2, s"sortKeyAdvisor: need nFiles >= 2, got $nFiles")
    require(candidates.nonEmpty, "sortKeyAdvisor: need at least one candidate")
    require(probes.nonEmpty, "sortKeyAdvisor: need at least one probe")
    val spark = df.sparkSession
    import spark.implicits._
    val probeCols = probes.map(_._1).distinct
    require((candidates ++ probeCols).forall(df.columns.contains),
      "sortKeyAdvisor: candidate/probe column missing from input")
    val predDf = broadcast(probes.toDF("probe_col", "pred_lo", "pred_hi"))
    val keep = (candidates ++ probeCols).distinct
    val base = df.select(col(idCol) +:
      keep.map(c => col(c).cast("double").as(c)): _*)
    // the total is candidate-independent; as a crossJoined single-row
    // frame it was re-executed inside EVERY candidate's plan (a full input
    // scan each at scale). Round 12: the literal comes from the FIRST
    // candidate's own range counts (globalRankWithCount) — no separate
    // serial count job at all (the round-11 eager base.count() added one)
    candidates.map { cand =>
      val (ranked, nTotal) = globalRankWithCount(base, cand, idCol, "__rank")
      val aggs = probeCols.flatMap(p => Seq(
        min(col(p)).as(s"__mn_$p"), max(col(p)).as(s"__mx_$p")))
      val zones = ranked
        .withColumn("__file", expr(s"((__rank - 1) * $nFiles) div ${nTotal}L"))
        .groupBy(col("__file"))
        .agg(aggs.head, aggs.tail: _*)
      val zonesLong = probeCols.map { p =>
        zones.select(col("__file"), lit(p).as("probe_col"),
          col(s"__mn_$p").as("__mn"), col(s"__mx_$p").as("__mx"))
      }.reduce(_ unionAll _)
      zonesLong.join(predDf, Seq("probe_col"))
        .groupBy(col("probe_col"), col("pred_lo"), col("pred_hi"))
        .agg(count(lit(1)).as("n_files"),
          sum((col("__mx") < col("pred_lo") || col("__mn") > col("pred_hi"))
            .cast("long")).as("n_skipped"))
        .select(lit(cand).as("sort_key"), col("probe_col"),
          col("pred_lo"), col("pred_hi"), col("n_files"), col("n_skipped"),
          (col("n_skipped").cast("double") / col("n_files").cast("double"))
            .as("skip_ratio"))
    }.reduce(_ unionAll _)
  }
}
