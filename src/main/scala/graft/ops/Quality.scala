package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the engine-side counterpart of
  * the source schema's CHECK constraints (the reference declares
  * `CHECK (ReasonType IN ('Cancellation','Return'))` in SQL Server,
  * /root/reference/setup_database.sql:87, and SURVEY §1.2 notes the engine
  * had no equivalent). A `Rule` is a named boolean predicate a row must
  * satisfy; NULL predicate results count as VIOLATIONS (unlike SQL CHECK,
  * which lets NULL pass — a DQ gate that silently passes nulls hides the
  * most common data fault; write `c.isNull || pred` to opt into SQL
  * semantics).
  *
  * Scale notes: [[auditCounts]] is ONE scan ending in a single-row global
  * aggregate (map-side partial counts, one tiny shuffle); [[split]] tags
  * each row in the scan stage — no shuffle at all. Rules are plain Column
  * predicates, so they ride whole-stage codegen.
  */
object Quality {

  final case class Rule(name: String, predicate: Column)

  private def violated(r: Rule): Column = !coalesce(r.predicate, lit(false))

  /** One row: total row count + one violation count per rule, in a single
    * pass. The audit a pipeline logs (and alerts on) per batch. */
  def auditCounts(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "auditCounts: provide at least one rule")
    df.agg(
      count(lit(1)).as("total_rows"),
      rules.map(r => count(when(violated(r), lit(1))).as(s"viol_${r.name}")): _*)
  }

  /** Tag every row with the names of the rules it violates (`failed_rules`,
    * empty array = clean). Feed `.where(size($"failed_rules") === 0)` to
    * enforce, or the complement to quarantine — one scan serves both. */
  def withViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "withViolations: provide at least one rule")
    df.withColumn("failed_rules",
      filter(
        array(rules.map(r => when(violated(r), lit(r.name))): _*),
        c => c.isNotNull))
  }

  /** (clean rows, quarantined rows with `failed_rules`) — both lazy views
    * over the same tagged scan. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = withViolations(df, rules)
    (tagged.where(size(col("failed_rules")) === 0).drop("failed_rules"),
      tagged.where(size(col("failed_rules")) > 0))
  }

  /** Referential-integrity audit: how many `child` rows have no matching
    * key in `parent` — the FK CHECK a lakehouse can't declare, as a
    * one-row summary (total, orphan count, orphan share). The parent side
    * is reduced to distinct keys before the join (broadcast when small,
    * AQE decides); exact-integer division makes the share engine-exact. */
  def referentialAudit(child: DataFrame, parent: DataFrame,
                       childKey: String, parentKey: String): DataFrame = {
    val parents = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(parents, col(childKey) === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .withColumn("orphan_share",
        col("n_orphans").cast("double") / col("n_child").cast("double"))
  }

  /** k-anonymity audit over quasi-identifier columns: one row per
    * observed quasi-identifier combination with its `group_size` and
    * `at_risk = group_size < k` — a combination shared by fewer than `k`
    * rows re-identifies its members, the privacy CHECK a training-data
    * pipeline runs before releasing user-derived tables. NULL counts as
    * a quasi-identifier value (a NULL nationality is still a cohort).
    *
    * Scale shape: ONE hash-aggregate shuffle on the quasi-identifier
    * key with map-side partials — the same cost as any distinct count;
    * output cardinality is the number of distinct combinations, not the
    * row count. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: need quasi-identifier columns")
    require(k >= 2, s"kAnonymityAudit: k < 2 flags nothing, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    * attack [[kAnonymityAudit]] misses: a cohort can be large yet leak
    * its members' SENSITIVE attribute when every row in it shares one
    * value (homogeneity attack). Per quasi-identifier cohort: row count,
    * distinct sensitive values (exact), the dominant sensitive value's
    * share (6 dp; ties break to the lowest value — the deterministic
    * rule), and `at_risk` = fewer than `l` distinct sensitive values.
    * NULL sensitive values count as one distinct value of their own (a
    * null is still a disclosure). Release gates should require BOTH
    * audits green: k-anonymous AND l-diverse.
    *
    * Scale shape: one (quasi × sensitive) hash-agg with map-side
    * partials, then a cohort-keyed window argmax over the REDUCED
    * (cohort, value) table — never the raw rows twice. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiCols.nonEmpty, "lDiversityAudit: need quasi-identifier columns")
    require(l >= 2, s"lDiversityAudit: l < 2 flags nothing, got $l")
    val cells = df.groupBy(
        (quasiCols.map(col) :+ col(sensitiveCol).as("__sv")): _*)
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__n").desc, col("__sv").asc_nulls_last)
    cells.withColumn("__r", row_number().over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__n").as("group_size"),
        count(lit(1)).as("distinct_sensitive"),
        max(when(col("__r") === 1, col("__n"))).as("__top"))
      .select((quasiCols.map(col) ++ Seq(
        col("group_size"), col("distinct_sensitive"),
        round(col("__top").cast("double") / col("group_size").cast("double"),
          6).as("dominant_share"),
        (col("distinct_sensitive") < l).as("at_risk"))): _*)
  }

  /** Fixed-width histogram of a numeric column over [lo, hi): bucket
    * index, row count, and observed min/max per bucket. Out-of-range
    * values saturate into the edge buckets (so the histogram always
    * accounts for every non-null row); nulls are excluded. The profiling
    * scan a pipeline runs to pick filter thresholds — one pass, map-side
    * partial aggregation, `nBuckets` output rows. Bucket arithmetic is
    * plain IEEE double floor-division, reproducible on any engine. */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo,
      s"histogram: need nBuckets > 0 and hi > lo, got n=$nBuckets [$lo, $hi]")
    val width = (hi - lo) / nBuckets
    val v = col(valueCol).cast("double")
    val raw = floor((v - lo) / width).cast("long")
    val bucket = greatest(lit(0L), least(lit(nBuckets - 1L), raw))
    df.where(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(v).as("min_val"), max(v).as("max_val"))
  }

  /** Equi-DEPTH histogram: `nBuckets` buckets holding (near-)equal row
    * counts, each with its observed [min, max] and count — the
    * value-distribution summary [[histogram]]'s fixed-width buckets
    * cannot give when the data is skewed (one hot bucket, the rest
    * empty). Bucket assignment is `ntile` semantics over the value order
    * (ties may straddle buckets — ntile splits equal values to keep
    * depths equal; use [[graft.ops.Sampling.keepTopQuantile]] when ties
    * must stick together). NULLs are excluded.
    *
    * Scale shape (round 12, guide §2.4): no single-partition sort — the
    * old `ntile` over raw rows was the suite's one data-proportional
    * `Window.orderBy`. Rows get exact global ranks from
    * [[graft.ops.Layout.globalRankWithCount]] (range exchange +
    * per-range windows + driver offsets), and the bucket is LITERAL
    * integer arithmetic on the rank: ntile's spans are fixed by (N,
    * nBuckets) alone — bucket k (0-based) holds ranks (k·q + min(k,rem),
    * k·q + min(k,rem) + size], size = q + (k < rem). The per-bucket
    * value multiset is tie-permutation-invariant (equal values straddle
    * a boundary identically however ranked), so the result is
    * bit-identical to engine ntile. Multi-action (the rank offsets):
    * consume inside `CacheRegistry.scoped { ... }`. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"equiDepthHistogram: need nBuckets > 0, got $nBuckets")
    val v = col(valueCol).cast("double")
    val (ranked, total) = graft.ops.Layout.globalRankWithCount(
      df.where(v.isNotNull).select(v.as("__v")), "__v", "__v", "__rk")
    val q = total / nBuckets
    val rem = total % nBuckets
    // first `rem` buckets take q+1 rows, the rest q (ntile's remainder
    // rule); qS guards the never-taken ELSE branch when q == 0 (then
    // every rank is <= rem·(q+1) = N) against ANSI div-by-zero
    val qS = math.max(q, 1L)
    val bucket = expr(
      s"CASE WHEN __rk <= ${rem * (q + 1)}L THEN (__rk - 1) div ${q + 1}L " +
        s"ELSE ${rem}L + (__rk - 1 - ${rem * (q + 1)}L) div ${qS}L END")
    ranked.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("min_val"),
        max(col("__v")).as("max_val"))
  }

  /** Robust outlier detection: flag rows whose value deviates from the
    * MEDIAN by more than `k` times the MAD (median absolute deviation) —
    * the standard heavy-tail-safe filter (mean/stddev break under the
    * very outliers being hunted). Two exact median passes (median, then
    * MAD) + a broadcast of the two scalars back over the scan. At 100 TB
    * swap `percentile` for `percentile_approx` — same plan shape, sketch
    * merge instead of exact sort. NULL values are never flagged. */
  def madOutliers(df: DataFrame, valueCol: String, k: Double): DataFrame = {
    val v = col(valueCol).cast("double")
    // thresholds rounded to 6 dp: percentile interpolation can differ by an
    // ulp across engines, and an unrounded threshold would flip boundary rows
    val med = df.agg(round(percentile(v, lit(0.5)), 6).as("med"))
    val mad = df.crossJoin(broadcast(med))
      .agg(round(percentile(abs(v - col("med")), lit(0.5)), 6).as("mad"),
        first("med").as("med"))
    df.crossJoin(broadcast(mad))
      .withColumn("is_outlier",
        when(v.isNull, lit(false)).otherwise(abs(v - col("med")) > col("mad") * k))
  }

  /** Percentile winsorization: clip `valueCol` into its own exact
    * [pLo, pHi] quantile range — the heavy-tail taming step before
    * means/regressions that [[madOutliers]] FLAGS but doesn't repair.
    * Null values are excluded (winsorization over observed values).
    * Both bounds are rounded to 6 dp before comparing ([[madOutliers]]'
    * boundary-stability device), and the clipped value to 6 dp after.
    * Output: (id, value, value_w, clipped_low, clipped_high).
    *
    * Scale shape: one aggregation pass for the two exact quantiles, the
    * two scalars broadcast back over a second scan-stage pass — same
    * shape as [[madOutliers]]; swap `percentile` for `percentile_approx`
    * at unbounded scale. */
  def winsorize(df: DataFrame, idCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val v = col(valueCol).cast("double")
    val obs = df.where(v.isNotNull)
    val bounds = obs.agg(
      round(percentile(v, lit(pLo)), 6).as("__lo"),
      round(percentile(v, lit(pHi)), 6).as("__hi"))
    obs.crossJoin(broadcast(bounds))
      .select(col(idCol), v.as("value"),
        round(greatest(col("__lo"), least(col("__hi"), v)), 6).as("value_w"),
        (v < col("__lo")).as("clipped_low"),
        (v > col("__hi")).as("clipped_high"))
  }

  /** Dataset-card column profiler: one row per requested column with row
    * count, null count, EXACT distinct count, and (for numeric columns)
    * min/max as doubles — the table-level "what is in this dataset"
    * summary a curation run materializes alongside the data.
    *
    * Deliberately C separate single-column aggregations unioned, not one
    * Expand-based multi-distinct pass: each aggregation's scan prunes to
    * exactly ONE column of the columnar file (asserted in PlanSpec), the
    * per-column distinct stays a plain two-phase aggregate, and the C
    * passes parallelize independently — whereas a single-pass
    * multi-`countDistinct` Expand multiplies every row C× through one
    * shuffle. At unbounded cardinalities swap `countDistinct` for
    * `approx_count_distinct` (HLL merge, same plan shape — see
    * [[Sketches]]). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: need at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"columnProfile: no such column(s): ${bad.mkString(", ")}")
    cols.map { c =>
      val isNum = df.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      def ext(f: Column => Column): Column =
        if (isNum) round(f(col(c)).cast("double"), 6) else lit(null).cast("double")
      df.select(col(c))
        .agg(count(lit(1)).as("n_rows"), count(col(c)).as("n_present"),
          countDistinct(col(c)).as("n_distinct"),
          ext(min).as("min_val"), ext(max).as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("n_present")).as("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Column-profile drift between two table snapshots (yesterday's load
    * vs today's, corpus v1 vs v2): per column, both sides' row counts,
    * null rates (6 dp), exact distinct counts, and numeric min/max, plus
    * the null-rate delta — the ingest-regression check that catches a
    * feed suddenly nulling a field or a cardinality explosion before the
    * data ships. Empty snapshots report null rates as null, not NaN.
    *
    * Scale shape: inherits [[columnProfile]]'s per-column single-column
    * pruned scans on each side; the drift join is over 2·C profile rows
    * (broadcast, never a data shuffle). */
  def profileDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, sfx: String): DataFrame =
      columnProfile(df, cols).select(col("col_name"),
        col("n_rows").as(s"n_rows_$sfx"), col("n_null").as(s"__null_$sfx"),
        col("n_distinct").as(s"n_distinct_$sfx"),
        col("min_val").as(s"min_$sfx"), col("max_val").as(s"max_$sfx"))
    def rate(sfx: String): Column =
      when(col(s"n_rows_$sfx") === 0, lit(null).cast("double"))
        .otherwise(round(col(s"__null_$sfx").cast("double") /
          col(s"n_rows_$sfx"), 6))
    side(a, "a").join(side(b, "b"), "col_name")
      .select(col("col_name"), col("n_rows_a"), col("n_rows_b"),
        rate("a").as("null_rate_a"), rate("b").as("null_rate_b"),
        round(rate("b") - rate("a"), 6).as("null_rate_delta"),
        col("n_distinct_a"), col("n_distinct_b"),
        col("min_a"), col("min_b"), col("max_a"), col("max_b"))
  }

  /** Population stability index between two snapshots of a value column —
    * the standard "did this feature's distribution move" scalar
    * (PSI = Σ_bins (p_b − p_a)·ln(p_b/p_a)), complementing
    * [[profileDrift]]'s per-column stats with a distribution-shape test.
    * Fixed-width bins over [lo, hi) with under/overflow clamped into the
    * edge bins ([[histogram]]'s rule), EMPTY bins kept via a bin spine,
    * and add-one smoothing on the shares ((n+1)/(N+B), the
    * [[graft.ops.Corpus.sourceDivergence]] device) so an empty bin
    * contributes a finite term instead of ±∞. Rule of thumb: PSI < 0.1
    * stable, > 0.25 shifted. Output: one row per bin with both sides'
    * counts, smoothed shares (6 dp), the bin's contribution, and the
    * total `psi` repeated on every row.
    *
    * Scale shape: one clamped-bin hash-agg per side (map-side partials),
    * then pure arithmetic over B spine rows with the two totals
    * broadcast — the corpus is scanned once per side and never
    * shuffled. */
  def psiDrift(a: DataFrame, b: DataFrame, valueCol: String,
               lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo,
      s"psiDrift: need nBins > 0 and hi > lo, got n=$nBins [$lo, $hi]")
    val width = (hi - lo) / nBins
    def counts(df: DataFrame, n: String): DataFrame = {
      val v = col(valueCol).cast("double")
      df.where(v.isNotNull)
        .groupBy(greatest(lit(0L), least(lit(nBins - 1L),
          floor((v - lo) / width).cast("long"))).as("bin"))
        .agg(count(lit(1)).as(n))
    }
    val spine = a.sparkSession.range(nBins).select(col("id").as("bin"))
    val g = spine
      .join(counts(a, "__na"), Seq("bin"), "left")
      .join(counts(b, "__nb"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"))
    val tot = g.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    val pa = (col("n_a") + 1).cast("double") /
      (col("__ta") + lit(nBins)).cast("double")
    val pb = (col("n_b") + 1).cast("double") /
      (col("__tb") + lit(nBins)).cast("double")
    val perBin = g.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round((pb - pa) * log(pb / pa), 6).as("contrib"))
    perBin.crossJoin(broadcast(
      perBin.agg(round(sum("contrib"), 6).as("psi"))))
  }

  /** Reliability-diagram bins + expected calibration error for a [0, 1]
    * score against a boolean outcome — the model-QA mart that says
    * whether "0.9" means 90 %: per equal-width score bin, count, mean
    * score, observed outcome rate, their |gap|, and the dataset-level
    * `ECE = Σ (n_bin/N)·gap` repeated on every row. Empty bins are kept
    * (null rates, 0 contribution) via a bin spine; null scores are
    * excluded, null outcomes count as false (a non-conversion, the
    * warehouse convention). Bins clamp out-of-range scores into the edge
    * bins ([[histogram]]'s rule). 6 dp rounds on every derived double.
    *
    * Scale shape: ONE clamped-bin hash-agg with map-side partials, then
    * arithmetic over B spine rows with the total broadcast — never a
    * window, never a sort. */
  def calibrationBins(df: DataFrame, scoreCol: String, outcomeCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"calibrationBins: need nBins > 0, got $nBins")
    val s = col(scoreCol).cast("double")
    val bin = greatest(lit(0L), least(lit(nBins - 1L),
      floor(s * nBins).cast("long")))
    val counts = df.where(s.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(s), 6).as("mean_score"),
        round(avg(coalesce(col(outcomeCol), lit(false)).cast("double")), 6)
          .as("outcome_rate"))
    val spine = df.sparkSession.range(nBins).select(col("id").as("bin"))
    val g = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        col("mean_score"), col("outcome_rate"),
        round(abs(col("mean_score") - col("outcome_rate")), 6).as("gap"))
    val tot = g.agg(sum("n").as("__tot"))
    val withE = g.crossJoin(broadcast(tot))
      .withColumn("__contrib",
        coalesce(col("n").cast("double") / col("__tot") * col("gap"),
          lit(0.0)))
    withE.crossJoin(broadcast(
        withE.agg(round(sum("__contrib"), 6).as("ece"))))
      .select(col("bin"), col("n"), col("mean_score"), col("outcome_rate"),
        col("gap"), col("ece"))
  }

  /** Isotonic (monotone non-decreasing) calibration over equal-width
    * score bins — the non-parametric recalibration map
    * [[calibrationBins]] only diagnoses: PAV's fit without PAV's
    * sequential pooling, via the closed-form MINIMAX identity
    * `iso(i) = max_{j≤i} min_{k≥i} mean(outcome over bins j..k)`
    * (Ayer et al. 1955; block means of the isotonic regression). Binning
    * first makes the fit replay-exact: per-bin positives and counts are
    * exact LONGs, every block mean is ONE division of those integer
    * prefix-sum differences (bit-identical IEEE doubles on any engine),
    * and the min/max fold runs over ≤ B³ bounded triples. Output per
    * OBSERVED bin (empty bins have no mass and no fit value — callers
    * interpolate): (bin, n, mean_score, outcome_rate, iso_rate,
    * monotone_ok) — `monotone_ok` pins the defining invariant
    * iso(i) ≥ iso(i−1) as a driver-checked TRUE. 6 dp rounds.
    *
    * Scale shape: ONE clamped-bin hash-agg reduces the corpus to ≤ B
    * rows (map-side partials); everything after — prefix windows, the
    * j≤i≤k broadcast fan-out, two hash-aggs — runs over the bounded bin
    * table (documented exact-by-contract, the [[graft.ops.Sketches]]
    * family rule). Never row×row on the raw data. */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
                          outcomeCol: String, nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins > 0, s"isotonicCalibration: need nBins > 0, got $nBins")
    val s = col(scoreCol).cast("double")
    val bin = greatest(lit(0L), least(lit(nBins - 1L),
      floor(s * nBins).cast("long")))
    val bins = graft.core.CacheRegistry.persist(df.where(s.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col(outcomeCol), lit(false)).cast("long")).as("__pos"),
        round(avg(s), 6).as("mean_score")))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.select(col("bin"), col("n"), col("__pos"),
      col("mean_score"),
      sum("n").over(w).as("__cn"), sum("__pos").over(w).as("__cp"))
    // block mean over bins [j..k] = one division of exact integer
    // prefix-sum differences — identical IEEE doubles on both engines
    val js = cum.select(col("bin").as("__jb"),
      (col("__cn") - col("n")).as("__cnj"),
      (col("__cp") - col("__pos")).as("__cpj"))
    val ks = cum.select(col("bin").as("__kb"),
      col("__cn").as("__cnk"), col("__cp").as("__cpk"))
    val pairMeans = js.join(broadcast(ks), col("__jb") <= col("__kb"))
      .select(col("__jb"), col("__kb"),
        ((col("__cpk") - col("__cpj")).cast("double")
          / (col("__cnk") - col("__cnj")).cast("double")).as("__m"))
    val inner = cum.select(col("bin").as("__ib"))
      .join(broadcast(pairMeans),
        col("__jb") <= col("__ib") && col("__kb") >= col("__ib"))
      .groupBy("__ib", "__jb").agg(min("__m").as("__minm"))
    val iso = inner.groupBy(col("__ib").as("__fb"))
      .agg(round(max("__minm"), 6).as("iso_rate"))
    val wl = Window.orderBy("bin")
    bins.join(broadcast(iso), col("bin") === col("__fb"))
      .withColumn("__prev", lag(col("iso_rate"), 1).over(wl))
      .select(col("bin"), col("n"), col("mean_score"),
        round(col("__pos").cast("double") / col("n").cast("double"), 6)
          .as("outcome_rate"),
        col("iso_rate"),
        coalesce(col("iso_rate") >= col("__prev"), lit(true))
          .as("monotone_ok"))
  }

  /** Exact grouped ROC-AUC with tie correction — the threshold-free
    * "does this score rank positives above negatives" number for every
    * score a curation pipeline produces (quality scores vs human
    * labels, contamination probes vs known leaks), per group so a score
    * can't hide behind Simpson's paradox. Uses the rank-sum identity on
    * the per-(group, score) REDUCED table:
    * `AUC = Σ_s n_pos(s)·(cum_neg_below(s) + n_neg(s)/2) / (P·N)` —
    * ties contribute the standard half credit. Null scores are
    * excluded; null labels count as negatives (the calibrationBins
    * rule); a group with no positives or no negatives gets null AUC,
    * not NaN. 6 dp round. Output: (group, n_pos, n_neg, auc).
    *
    * Scale shape: ONE (group, score) hash-agg reduces the corpus, the
    * cumulative window and final agg run over distinct scores per group
    * and share the group exchange — never a per-row global sort. */
  def rocAuc(df: DataFrame, groupCol: String, scoreCol: String,
             labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isPos = coalesce(col(labelCol), lit(false))
    val red = df.where(col(scoreCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).cast("double").as("__s"))
      .agg(sum(when(isPos, 1L).otherwise(0L)).as("__np"),
        sum(when(isPos, 0L).otherwise(1L)).as("__nn"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumNegLt = coalesce(sum("__nn").over(w), lit(0L))
    red
      .withColumn("__c", col("__np").cast("double") *
        (cumNegLt + col("__nn").cast("double") / 2.0))
      .groupBy(col(groupCol))
      .agg(sum("__np").as("n_pos"), sum("__nn").as("n_neg"),
        sum("__c").as("__sc"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("__sc") / (col("n_pos") * col("n_neg")), 6))
          .as("auc"))
  }

  /** Per-class classification report (the sklearn mart): from a
    * (label, prediction) pair column set, the confusion-reduced
    * per-class `n_true`, `n_pred`, `tp`, precision, recall, and F1 —
    * the eval table for any classifier the pipeline hosts (language ID
    * vs gold labels, quality-filter decisions vs human audit). Classes
    * are the UNION of observed labels and predictions (a class the
    * model never predicts still reports recall); zero-denominator
    * cells are null, not NaN (no-support precision/recall), F1 is null
    * unless both parts exist and sum > 0. NULL labels/predictions form
    * their own class (the [[kAnonymityAudit]] rule). 6 dp rounds.
    *
    * Scale shape: ONE (label, pred) hash-agg reduces the corpus to the
    * ≤ C² confusion matrix; everything after is arithmetic over C
    * rows. */
  def classificationReport(df: DataFrame, labelCol: String,
                           predCol: String): DataFrame = {
    val m = graft.core.CacheRegistry.persist(
      df.groupBy(col(labelCol).as("__l"), col(predCol).as("__p"))
        .agg(count(lit(1)).as("__n")))
    val byTrue = m.groupBy(col("__l").as("clazz")).agg(sum("__n").as("n_true"))
    val byPred = m.groupBy(col("__p").as("clazz")).agg(sum("__n").as("n_pred"))
    val tp = m.where(col("__l") <=> col("__p"))
      .select(col("__l").as("clazz"), col("__n").as("__tp"))
    val prec = when(col("n_pred").isNull || col("n_pred") === 0,
      lit(null).cast("double"))
      .otherwise(round(col("tp").cast("double") / col("n_pred"), 6))
    val rec = when(col("n_true").isNull || col("n_true") === 0,
      lit(null).cast("double"))
      .otherwise(round(col("tp").cast("double") / col("n_true"), 6))
    // null-SAFE join keys: the null class is one class, and plain join
    // keys would split it into an unmatched row per side
    byTrue.as("t")
      .join(byPred.as("p"), col("t.clazz") <=> col("p.clazz"), "full_outer")
      .select(coalesce(col("t.clazz"), col("p.clazz")).as("clazz"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .as("j")
      .join(tp.as("x"), col("j.clazz") <=> col("x.clazz"), "left")
      .select(col("j.clazz").as("clazz"), col("n_true"), col("n_pred"),
        coalesce(col("__tp"), lit(0L)).as("tp"))
      .select(col("clazz"), col("n_true"), col("n_pred"), col("tp"),
        prec.as("precision"), rec.as("recall"),
        when(prec.isNull || rec.isNull || (prec + rec) === 0.0,
          lit(null).cast("double"))
          .otherwise(round(lit(2.0) * prec * rec / (prec + rec), 6)).as("f1"))
  }

  /** Daily PSI timeline: each day's value distribution scored against
    * the FIRST day's (the baseline) with [[psiDrift]]'s clamped bins
    * and add-one smoothing — drift observability over time instead of
    * one two-snapshot comparison: a slow upward creep shows as a
    * rising curve, an ingest incident as a one-day spike. Output: one
    * row per day (day, n_rows, psi), baseline day included (its PSI is
    * 0 by construction).
    *
    * Scale shape: ONE (day, bin) hash-agg reduces the corpus; the
    * day × bin spine, totals, and baseline shares are arithmetic over
    * ≤ \|days\|·B rows with the baseline broadcast. */
  def psiTimeline(df: DataFrame, tsCol: String, valueCol: String,
                  lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo,
      s"psiTimeline: need nBins > 0 and hi > lo, got n=$nBins [$lo, $hi]")
    val width = (hi - lo) / nBins
    val v = col(valueCol).cast("double")
    val counts = graft.core.CacheRegistry.persist(
      df.where(v.isNotNull)
        .groupBy(to_date(col(tsCol)).as("day"),
          greatest(lit(0L), least(lit(nBins - 1L),
            floor((v - lo) / width).cast("long"))).as("bin"))
        .agg(count(lit(1)).as("__n")))
    val spine = counts.select("day").distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(nBins).select(col("id").as("bin"))))
    val g = spine.join(counts, Seq("day", "bin"), "left")
      .select(col("day"), col("bin"), coalesce(col("__n"), lit(0L)).as("n"))
    val tot = g.groupBy("day").agg(sum("n").as("__t"))
    val base = g.join(broadcast(tot.agg(min("day").as("day"))), "day")
      .join(tot, "day")
      .select(col("bin"),
        ((col("n") + 1).cast("double") /
          (col("__t") + lit(nBins)).cast("double")).as("__pb"))
    val pd = (col("n") + 1).cast("double") /
      (col("__t") + lit(nBins)).cast("double")
    g.join(tot, "day").join(broadcast(base), "bin")
      .select(col("day"), col("__t"),
        (pd - col("__pb")) * log(pd / col("__pb")) as "__c")
      .groupBy("day")
      .agg(max("__t").as("n_rows"), round(sum("__c"), 6).as("psi"))
  }

  /** Higher-moment distribution profile per group: n, mean, population
    * variance, skewness (g1) and excess kurtosis (g2) of `valueCol` —
    * the drift fingerprint that catches a shifted or fattened value
    * distribution when mean/stddev alone look unchanged.
    *
    * Computed from raw power sums Σx..Σx⁴ in ONE hash-agg with map-side
    * partials (the mergeable formulation — partial profiles from two
    * corpus halves combine by adding sums), then fixed-order IEEE
    * arithmetic over the five scalars:
    * `m_k = Σxᵏ/n − …` central-moment expansion, `g1 = m3/m2^1.5`,
    * `g2 = m4/m2² − 3`. Results are 6 dp-rounded: the sums' float
    * accumulation order varies with partitioning, but the relative error
    * is O(n·ε) ≈ 1e-11 at any realistic group size — far below the
    * rounding quantum. Groups with zero variance get null g1/g2 (not
    * NaN), single-row groups a 0 variance. */
  def momentProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    finishMoments(rawPowerSums(df, groupCol, valueCol), groupCol)

  /** Per-(group, partition) raw power sums Σx..Σx⁴ — the MERGEABLE form
    * of [[momentProfile]]: partials from disjoint slices (a day, an
    * ingest batch, a corpus shard) combine by ADDITION, so a 100 TB
    * pipeline maintains daily partial rows and re-derives the exact
    * global profile from ≤ |groups|·|days| tiny rows without ever
    * re-scanning history. Finish with [[mergeMoments]]. */
  def momentPartials(df: DataFrame, groupCol: String, partCol: Column,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.where(v.isNotNull)
      .groupBy(col(groupCol), partCol.as("part"))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
  }

  /** Merge [[momentPartials]] rows (any subset of partitions, any order)
    * into the finished per-group profile. `mergeMoments(momentPartials
    * (df, g, p, v))` equals `momentProfile(df, g, v)` EXACTLY up to the
    * 6 dp rounding both paths share — pinned by spec and by q149's
    * oracle being q94's. One hash-agg over the partial rows; the raw
    * data never reappears. */
  def mergeMoments(partials: DataFrame, groupCol: String): DataFrame =
    finishMoments(
      partials.groupBy(col(groupCol))
        .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
          sum("s3").as("s3"), sum("s4").as("s4")),
      groupCol)

  private def rawPowerSums(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.where(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
  }

  private def finishMoments(agg: DataFrame, groupCol: String): DataFrame = {
    val n = col("n").cast("double")
    val mean = col("s1") / n
    val m2 = col("s2") / n - mean * mean
    val m3 = col("s3") / n - lit(3.0) * mean * (col("s2") / n) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4") / n - lit(4.0) * mean * (col("s3") / n) +
      lit(6.0) * mean * mean * (col("s2") / n) -
      lit(3.0) * mean * mean * mean * mean
    agg.select(col(groupCol), col("n"),
      round(mean, 6).as("mean"),
      round(m2, 6).as("variance"),
      round(when(m2 > 0, m3 / pow(m2, 1.5)), 6).as("skewness"),
      round(when(m2 > 0, m4 / (m2 * m2) - lit(3.0)), 6).as("kurtosis"))
  }

  /** Per-document curation scorecard: every quality signal this library
    * computes, side by side, with the final keep/drop verdict — the
    * decision table a curation run materializes so that "why was this
    * document dropped" is a lookup, not a re-computation. Columns:
    * [[graft.ops.TextStats.qualityFeatures]] (token/punct/stopword stats
    * + tier), the 3-gram repetition ratio, and
    * [[graft.ops.Corpus.familiarity]] (corpus-frequency score + OOV
    * rate). `keep` = tier above low AND repetition ratio ≥
    * `minNgramRatio` AND OOV rate ≤ `maxOovRate`.
    *
    * Scale shape: features and repetition are computed in ONE scan (the
    * text column rides through [[graft.ops.TextStats.qualityFeatures]]'s
    * carry mechanism — no second scan, no self-join); familiarity adds
    * its stats join; the final assembly is one equi-join on the doc id.
    */
  def curationScorecard(df: DataFrame, idCol: String, textCol: String,
                        vocabK: Int, minNgramRatio: Double,
                        maxOovRate: Double): DataFrame = {
    val withRep = TextStats
      .qualityFeatures(df, idCol, textCol, carryCols = Seq(textCol))
      .withColumn("distinct_ngram_ratio",
        TextStats.distinctNgramRatio(col(textCol), 3))
      .drop(textCol, "n_chars")
    val fam = Corpus.familiarity(df, idCol, textCol, vocabK)
      .select(col(idCol), col("familiarity"), col("oov_rate"))
    withRep.join(fam, Seq(idCol))
      .withColumn("keep",
        col("quality") =!= "low"
          && col("distinct_ngram_ratio") >= minNgramRatio
          && col("oov_rate") <= maxOovRate)
  }

  /** Corpus card: the mixture-design mart — document and token counts at
    * every (dim1, dim2) drill-down grain (both dims, each alone, grand
    * total — `lvl` = `grouping_id`), with each row's share of the grand
    * total's tokens. The one table a mixture designer reads before
    * setting [[graft.ops.Sampling.temperatureMixture]] /
    * `tokenBudgetPlan` rates: "how much English web vs German code do we
    * actually have".
    *
    * Scale shape: the q48 rollup device — pre-reduce the corpus to plain
    * (dim1, dim2) totals FIRST (one map-side-combined hash-agg; sums are
    * distributive), so the cube's ×4 Expand multiplies ~|dim1×dim2| tiny
    * rows, never the corpus; the grand-total share divides by a broadcast
    * 1-row scalar. */
  def corpusCard(df: DataFrame, dim1: String, dim2: String,
                 tokens: Column): DataFrame = {
    val pre = graft.core.CacheRegistry.persist(
      df.groupBy(col(dim1), col(dim2))
        .agg(count(lit(1)).as("__nd"), sum(tokens).cast("long").as("__nt")))
    val tot = pre.agg(sum("__nt").cast("double").as("__tot"))
    pre.cube(col(dim1), col(dim2))
      .agg(sum("__nd").as("n_docs"), sum("__nt").as("n_tokens"),
        grouping_id().cast("int").as("lvl"))
      .crossJoin(broadcast(tot))
      .select(col(dim1), col(dim2), col("lvl"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("__tot"), 6).as("token_share"))
  }

  /** Poisson(1) inverse-CDF thresholds c_k = e⁻¹·Σ_{i≤k} 1/i! — the draw
    * is `#{k : u ≥ c_k}` for a uniform u, capped at the ladder length
    * (P(X > 8) ≈ 1e-6). Shared by the operator and (interpolated) by its
    * oracle so the ladder is literal-identical on both engines. */
  val poissonLadder: Seq[Double] = {
    def fact(k: Int): Double = (1 to k).foldLeft(1.0)(_ * _)
    (0 to 8).scanLeft(0.0)((acc, k) => acc + math.exp(-1.0) / fact(k)).tail
  }

  /** Poisson-bootstrap confidence interval for a per-group mean (the
    * DISTRIBUTED bootstrap: classic resampling needs the whole sample on
    * one machine; giving every row an independent Poisson(1) weight per
    * replicate approximates multinomial resampling and aggregates
    * map-side — the standard large-data formulation). Per group:
    * `b` replicate means Σwx/Σw with w drawn from md5(seed|replicate|id)
    * via the shared inverse-CDF ladder (engine-replayable determinism),
    * then the empirical `alpha/2` / `1−alpha/2` percentiles of the
    * replicate means as the CI. Replicates whose total weight is 0
    * (possible only for tiny groups) drop out of the percentile.
    * Output: (group, n_rows, mean 6 dp, ci_lo 6 dp, ci_hi 6 dp).
    *
    * Scale shape: the b-fold fan-out (`explode(sequence)`) multiplies the
    * scan, not a shuffle — (group, replicate) partials combine map-side,
    * so the exchange carries groups × b rows; the percentile runs over b
    * values per group (pre-reduced, never the corpus). 6 dp rounds on the
    * replicate means make the percentile input identical across engines
    * before the interpolation arithmetic. */
  def bootstrapMeanCi(df: DataFrame, groupCol: String, idCol: String,
                      valCol: String, b: Int, alpha: Double,
                      seed: String = "boot"): DataFrame = {
    require(b >= 2, s"bootstrapMeanCi: need b >= 2 replicates, got $b")
    require(alpha > 0 && alpha < 1, s"bootstrapMeanCi: need 0 < alpha < 1")
    val base = graft.core.CacheRegistry.persist(
      df.select(col(groupCol).as("g"), col(idCol).as("id"),
        col(valCol).cast("double").as("v")).where(col("v").isNotNull))
    val stats = base.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), round(avg("v"), 6).as("mean"))
    // one md5 per FOUR replicates: the digest's 32 hex chars are four
    // independent 8-hex uniforms, and the md5 kernel dominates the whole
    // operator's cost (b·N digests was the round-5 bench's worst line at
    // 23 s; b/4·N runs in ~a quarter). The digest is materialized on the
    // block-exploded rows BEFORE the slot explode so it is computed once
    // per block, not once per replicate.
    val u = conv(expr("substring(__h, 1 + 8 * __slot, 8)"), 16, 10)
      .cast("double") / lit(4294967296.0)
    val w = poissonLadder.foldLeft(lit(0)) { (acc, c) =>
      acc + when(u >= c, 1).otherwise(0)
    }
    val reps = base
      .withColumn("__blk", explode(sequence(lit(0), lit((b + 3) / 4 - 1))))
      .withColumn("__h", md5(concat(lit(s"$seed|"), col("__blk").cast("string"),
        lit("|"), col("id").cast("string"))))
      .withColumn("__slot", explode(sequence(lit(0), lit(3))))
      .withColumn("j", col("__blk") * 4 + col("__slot"))
      .where(col("j") < b)
      .withColumn("__w", w)
      .groupBy("g", "j")
      // explicit zero-weight guard: 0.0/0 is NaN in Spark (not null), and
      // NaN would poison the percentile instead of dropping the replicate
      .agg(when(sum("__w") > 0,
        sum(col("__w") * col("v")) / sum("__w")).as("__m"))
      .where(col("__m").isNotNull)
      .select(col("g"), round(col("__m"), 6).as("__m"))
    val ci = reps.groupBy("g").agg(
      round(expr(s"percentile(__m, ${alpha / 2})"), 6).as("ci_lo"),
      round(expr(s"percentile(__m, ${1.0 - alpha / 2})"), 6).as("ci_hi"))
    stats.join(ci, Seq("g"))
      .select(col("g").as(groupCol), col("n_rows"), col("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Welch two-sample A/B mart: per group, the difference in means
    * between variants `a` and `b` of `variantCol` with the Welch
    * unpooled-variance z-interval and a significance flag — the
    * experiment-readout table (value deltas between an md5-split
    * control/treatment, a model rollout's metric shift). Degrees of
    * freedom are large at any practical scale, so the interval uses the
    * normal critical value (interpolated as a literal so engines agree
    * bit-for-bit); sample variances are the exact n−1 form from one
    * moment pass. Groups missing either variant (or with n < 2 on a
    * side) report null CI bounds and `significant = false`.
    * Output: (group, n_a, n_b, mean_a, mean_b, diff, ci_lo, ci_hi,
    * significant), 6 dp.
    *
    * Scale shape: ONE (group, variant) hash-agg of count/Σ/Σx² partials
    * (map-side combine); everything after is arithmetic over two rows
    * per group pivoted by a conditional re-aggregation — no window, no
    * second scan. */
  def welchAbTest(df: DataFrame, groupCol: String, variantCol: String,
                  valCol: String, a: String, bVariant: String,
                  z: Double = 1.959963984540054): DataFrame = {
    val v = col(valCol).cast("double")
    val red = df.where(v.isNotNull &&
        col(variantCol).isin(a, bVariant))
      .groupBy(col(groupCol), col(variantCol).as("__var"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__s2"))
    def side(tag: String, c: Column): Column = max(when(col("__var") === tag, c))
    val piv = red.groupBy(col(groupCol)).agg(
      coalesce(side(a, col("__n")), lit(0L)).as("n_a"),
      coalesce(side(bVariant, col("__n")), lit(0L)).as("n_b"),
      side(a, col("__s")).as("__sa"), side(bVariant, col("__s")).as("__sb"),
      side(a, col("__s2")).as("__sa2"), side(bVariant, col("__s2")).as("__sb2"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("__sa") / na
    val mb = col("__sb") / nb
    // exact n−1 sample variance from the moment pass
    val va = (col("__sa2") - col("__sa") * col("__sa") / na) / (na - 1.0)
    val vb = (col("__sb2") - col("__sb") * col("__sb") / nb) / (nb - 1.0)
    val se = sqrt(va / na + vb / nb)
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val diff = mb - ma
    piv.select(col(groupCol), col("n_a"), col("n_b"),
      when(col("n_a") > 0, round(ma, 6)).as("mean_a"),
      when(col("n_b") > 0, round(mb, 6)).as("mean_b"),
      when(col("n_a") > 0 && col("n_b") > 0, round(diff, 6)).as("diff"),
      when(ok, round(diff - lit(z) * se, 6)).as("ci_lo"),
      when(ok, round(diff + lit(z) * se, 6)).as("ci_hi"),
      coalesce(when(ok, diff - lit(z) * se > 0.0 || diff + lit(z) * se < 0.0),
        lit(false)).as("significant"))
  }

  /** Approximate randomization (permutation) test for the difference in
    * means — the assumption-free twin of [[welchAbTest]]: instead of a
    * normal approximation, the null distribution is built by RE-ASSIGNING
    * every row to a pseudo-cohort `reps` times and asking how often the
    * shuffled |difference| reaches the observed one. Assignment is
    * md5-deterministic (the [[graft.ops.Sampling]] replay contract): for
    * replicate j, row id draws the 32-bit uniform `u = md5(seed|j|id)[1:8]`
    * and lands in pseudo-A iff `u·N < n_a·2³²` — the cross-multiplied
    * integer compare keeps the A-share exactly `n_a/N` with no float
    * boundary, so any engine reproduces the identical assignment
    * (Bernoulli(n_a/N) re-randomization — the standard approximate
    * variant; exact label-permutation would need a global shuffle per
    * replicate). Each diff snaps to a micro-LONG before comparison, and
    * the p-value uses the add-one estimator `(1 + #{|d_j| ≥ |d_obs|}) /
    * (reps + 1)` (Phipson–Smyth; never exactly zero). Output: ONE row —
    * (n_a, n_b, diff, reps, p_value, significant at 5%).
    *
    * Scale shape: one cached scan, a bounded ×(reps/4) block explode
    * (one md5 digest per FOUR replicates — the [[bootstrapMeanCi]]
    * kernel-sharing device), a (replicate)-keyed hash-agg with map-side
    * combine, and a `reps`-row reduce. Never row×row; replicate count is
    * the only fan-out. */
  def permutationTest(df: DataFrame, idCol: String, variantCol: String,
                      valCol: String, a: String, b: String, reps: Int,
                      seed: String = "perm"): DataFrame = {
    require(reps >= 4, s"permutationTest: need reps >= 4, got $reps")
    // idCol drives the md5 draw: a NULL id would make the digest NULL and
    // silently route the row to pseudo-B via the n−pna algebra while an
    // external replay (count CASE WHEN NOT is_a) skips it — filter NULL
    // ids out of BOTH cohorts so every engine sees the same population
    val base = graft.core.CacheRegistry.persist(
      df.where(col(idCol).isNotNull && col(valCol).isNotNull &&
          col(variantCol).isin(a, b))
        .select(col(idCol).cast("string").as("__id"),
          col(variantCol).as("__var"),
          round(col(valCol).cast("double") * lit(1000000.0)).cast("long")
            .as("__vm")))
    val obs = base.agg(
      count(when(col("__var") === a, 1)).as("n_a"),
      count(when(col("__var") === b, 1)).as("n_b"),
      sum(when(col("__var") === a, col("__vm"))).as("__sa"),
      sum(when(col("__var") === b, col("__vm"))).as("__sb"))
    // u·N < n_a·2³² ⟺ u < ceil(n_a·2³²/N) for integers; the boundary is
    // ONE bounded driver-side number (exact BigInt ceil over the cohort
    // counts — the kmeans-centroid precedent), inlined as a LITERAL so
    // the hot stage stays a single whole-stage-codegen span. Joining the
    // single-row obs frame in instead planted a BroadcastNestedLoopJoin
    // BEFORE the explode and de-codegen'd the entire 30M-row stage
    // (13 s → ~1 s at sf0.1).
    val Array(naL, nbL) = obs.select(col("n_a"), col("n_b")).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val nTot = naL + nbL
    val cutLit = if (nTot == 0L) 0L
      else ((BigInt(naL) * BigInt(4294967296L) + BigInt(nTot) - 1)
        / BigInt(nTot)).toLong
    // the 4 slots pivot into COLUMNS of one (row × block) hash-agg —
    // exploding them to rows first quadrupled the materialized volume
    // (120M rows at sf0.1) for the same arithmetic. The slot test is a
    // fixed-width HEX STRING comparison: for lowercase 8-char hex,
    // lexicographic order IS numeric order, so `u < cut` needs no
    // conv() at all — the 4-per-row conv parses (plus their
    // re-evaluation inside every agg expression before the bits were
    // projected out) were ~7 of the 13 s this query used to cost.
    val cutHex = f"$cutLit%08x"
    val slotBits = (0 until 4).map { s =>
      (if (cutLit >= 4294967296L) lit(true)
       else if (cutLit <= 0L) lit(false)
       else substring(col("__h"), 1 + 8 * s, 8) < lit(cutHex)).as(s"__a$s")
    }
    val withBits = base
      .withColumn("__blk", explode(sequence(lit(0), lit((reps + 3) / 4 - 1))))
      .withColumn("__h", md5(concat(lit(s"$seed|"), col("__blk").cast("string"),
        lit("|"), col("__id"))))
      .select((Seq(col("__vm"), col("__blk")) ++ slotBits): _*)
    // per slot only the A-side pair aggregates: the B side is algebra —
    // pnb = n − pna, psb = Σvm − psa (totals are replicate-invariant),
    // which halves the per-row aggregate-buffer updates
    val slotAggs = (0 until 4).flatMap { s =>
      val isA = col(s"__a$s")
      Seq(count(when(isA, 1)).as(s"__pna$s"),
        sum(when(isA, col("__vm"))).as(s"__psa$s"))
    }
    val allAggs = Seq(count(lit(1)).as("__n"),
      sum(col("__vm")).as("__s")) ++ slotAggs
    val byBlk = withBits
      .groupBy("__blk")
      .agg(allAggs.head, allAggs.tail: _*)
    val reassigned = byBlk
      .select(explode(array((0 until 4).map(s => struct(
        (col("__blk") * 4 + s).as("j"),
        col(s"__pna$s").as("__pna"),
        coalesce(col(s"__psa$s"), lit(0L)).as("__psa"),
        (col("__n") - col(s"__pna$s")).as("__pnb"),
        (col("__s") - coalesce(col(s"__psa$s"), lit(0L))).as("__psb"))): _*))
        .as("__e"))
      .select(col("__e.j").as("j"), col("__e.__pna").as("__pna"),
        col("__e.__psa").as("__psa"), col("__e.__pnb").as("__pnb"),
        col("__e.__psb").as("__psb"))
      .where(col("j") < reps)
    def dMicro(sa: Column, na: Column, sb: Column, nb: Column): Column =
      round(sa.cast("double") / na.cast("double")
        - sb.cast("double") / nb.cast("double")).cast("long")
    val nullDist = reassigned
      .where(col("__pna") > 0 && col("__pnb") > 0)
      .select(abs(dMicro(col("__psa"), col("__pna"),
        col("__psb"), col("__pnb"))).as("__ad"))
    val obsRow = obs.select(col("n_a"), col("n_b"),
      abs(dMicro(col("__sa"), col("n_a"), col("__sb"), col("n_b")))
        .as("__adObs"),
      (dMicro(col("__sa"), col("n_a"), col("__sb"), col("n_b"))
        .cast("double") / lit(1000000.0)).as("diff"))
    nullDist.crossJoin(broadcast(obsRow))
      .groupBy(col("n_a"), col("n_b"), col("diff"))
      .agg(count(lit(1)).as("reps"),
        round((count(when(col("__ad") >= col("__adObs"), 1)) + 1)
          .cast("double") / (count(lit(1)) + 1).cast("double"), 6)
          .as("p_value"))
      .select(col("n_a"), col("n_b"), round(col("diff"), 6).as("diff"),
        col("reps"),
        col("p_value"), (col("p_value") <= 0.05).as("significant"))
  }

  /** Always-valid sequential A/B readout — the mixture sequential
    * probability ratio test (mSPRT, Johari et al. 2017): the p-value you
    * may PEEK at every day without inflating false positives, where
    * [[welchAbTest]]'s fixed-horizon interval is only valid once. Per
    * day-ordered prefix n: cohort counts/means from cumulative exact
    * micro-LONG partials, pooled variance from cumulative square sums,
    * `V_n = σ̂²(1/n_a + 1/n_b)`, and the normal-mixture likelihood ratio
    * `Λ_n = √(V_n/(V_n+τ²)) · exp(δ̂²τ²/(2·V_n·(V_n+τ²)))`. `ln Λ` snaps
    * to a micro-LONG (the [[graft.ops.Learn.naiveBayesEval]] log-space
    * device), the always-valid p is `min(1, exp(−max_{k≤n} lnΛ_k))`, and
    * significance at level α is `p ≤ α` — monotone by construction, so a
    * decision never un-happens on a later day. Days before both cohorts
    * have ≥ 2 rows report null test columns. Output: one row per day —
    * (day, n_a, n_b, diff, ln_lambda, p_always_valid, significant), 6 dp.
    *
    * Scale shape: ONE (day, variant) hash-agg pre-reduces the log
    * (map-side combine); every window after runs over the
    * day-calendar-bounded daily table (hundreds of rows, documented
    * exact-by-contract like [[graft.ops.EventAnalytics]]'s EWMA), never
    * the raw events. */
  def msprtSequential(df: DataFrame, dayCol: Column, variantCol: String,
                      valCol: String, a: String, b: String,
                      tau: Double, alpha: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tau > 0, s"msprtSequential: need tau > 0, got $tau")
    val vm = round(col(valCol).cast("double") * lit(1000000.0)).cast("long")
    val daily = df.where(col(valCol).isNotNull && col(variantCol).isin(a, b))
      .groupBy(dayCol.as("day"), col(variantCol).as("__var"))
      .agg(count(lit(1)).as("__n"), sum(vm).as("__s"),
        sum(vm.cast("decimal(38,0)") * vm).as("__s2"))
    def side(tag: String, c: Column): Column = max(when(col("__var") === tag, c))
    val byDay = daily.groupBy("day").agg(
      coalesce(side(a, col("__n")), lit(0L)).as("__dna"),
      coalesce(side(b, col("__n")), lit(0L)).as("__dnb"),
      coalesce(side(a, col("__s")), lit(0L)).as("__dsa"),
      coalesce(side(b, col("__s")), lit(0L)).as("__dsb"),
      coalesce(side(a, col("__s2")), lit(0).cast("decimal(38,0)")).as("__dqa"),
      coalesce(side(b, col("__s2")), lit(0).cast("decimal(38,0)")).as("__dqb"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byDay.select(col("day"),
      sum("__dna").over(w).as("n_a"), sum("__dnb").over(w).as("n_b"),
      sum("__dsa").over(w).as("__sa"), sum("__dsb").over(w).as("__sb"),
      sum("__dqa").over(w).as("__qa"), sum("__dqb").over(w).as("__qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    // micro-LONG sums → value-unit doubles; σ̂² pools the two exact
    // (n−1)-form cohort square sums
    val ma = col("__sa").cast("double") / (na * 1e6)
    val mb = col("__sb").cast("double") / (nb * 1e6)
    val ssa = col("__qa").cast("double") / 1e12 - na * ma * ma
    val ssb = col("__qb").cast("double") / 1e12 - nb * mb * mb
    val sig2 = (ssa + ssb) / (na + nb - 2.0)
    val vn = sig2 * (lit(1.0) / na + lit(1.0) / nb)
    val dHat = ma - mb
    val t2 = lit(tau * tau)
    val lnLambda = lit(0.5) * log(vn / (vn + t2)) +
      dHat * dHat * t2 / (lit(2.0) * vn * (vn + t2))
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && sig2 > 0
    val lnm = when(ok, round(lnLambda * lit(1000000.0)).cast("long"))
    val runMax = max(col("__lnm")).over(w)
    cum.withColumn("__lnm", lnm)
      .withColumn("__mx", runMax)
      .select(col("day"), col("n_a"), col("n_b"),
        when(ok, round(dHat, 6)).as("diff"),
        (col("__lnm").cast("double") / lit(1000000.0)).as("ln_lambda"),
        when(col("__mx").isNotNull,
          round(least(lit(1.0), exp(-col("__mx").cast("double") / lit(1e6))), 6))
          .as("p_always_valid"),
        coalesce(when(col("__mx").isNotNull,
          round(least(lit(1.0), exp(-col("__mx").cast("double") / lit(1e6))), 6)
            <= alpha), lit(false)).as("significant"))
  }

  /** Hill tail-index estimate per group — "how heavy is this value
    * column's tail", the number that decides whether mean-based
    * statistics are even meaningful (α ≤ 2 ⇒ infinite variance: spend
    * estimates, token-count planning, and Σ-based marts all need the
    * robust path). Over the k largest POSITIVE values x₍₁₎ ≥ … ≥ x₍ₖ₎
    * and the (k+1)-th order statistic:
    * `α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎)` (Hill 1975). Duplicated boundary
    * values make the chosen multiset — and therefore the estimate —
    * tie-order-invariant. Groups with fewer than k+1 positive rows
    * report NULL α (not enough tail to estimate), as do degenerate
    * groups whose top k+1 values are all EQUAL (Σln = 0 — a constant
    * "tail" has no index, and +∞ would read as heavy_tail=false).
    * Output: (group,
    * n_pos, x_kplus1, alpha, heavy_tail = α̂ < 2). 6 dp.
    *
    * Scale shape: the rank filter is a per-group TOP-(k+1) — Spark
    * plans `row_number ≤ k+1` as a WindowGroupLimit heap (no global
    * sort), then one group hash-agg over ≤ k+1 rows per group. */
  def hillTailIndex(df: DataFrame, groupCol: String, valCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"hillTailIndex: need k >= 2, got $k")
    val v = col(valCol).cast("double")
    val base = df.where(v.isNotNull && v > 0)
      .select(col(groupCol).as("g"), v.as("__v"))
    val w = Window.partitionBy("g").orderBy(col("__v").desc)
    val top = base.withColumn("__r", row_number().over(w))
      .where(col("__r") <= k + 1)
    val counts = base.groupBy("g").agg(count(lit(1)).as("n_pos"))
    val fit = top.groupBy("g").agg(
      max(when(col("__r") === k + 1, col("__v"))).as("__xk1"),
      sum(when(col("__r") <= k, log(col("__v")))).as("__lnsum"))
    // Σln(x_i/x_{k+1}) is exactly 0 when all top k+1 values are equal —
    // an unguarded division would report alpha = +Infinity and heavy_tail
    // = false, silently masking the degenerate group; report NULL alpha
    // instead (no tail to estimate)
    val denom = col("__lnsum") - lit(k.toDouble) * log(col("__xk1"))
    val alpha = when(denom > 0, round(lit(k.toDouble) / denom, 6))
    counts.join(fit, Seq("g"))
      .select(col("g").as(groupCol), col("n_pos"),
        round(col("__xk1"), 6).as("x_kplus1"),
        alpha.as("alpha"),
        coalesce(alpha < 2.0, lit(false)).as("heavy_tail"))
  }

  /** Leave-one-out smoothed target encoding: replace a categorical key
    * with the mean of `valCol` over the OTHER rows sharing the key,
    * shrunk toward the global prior — `te = (Σ_g − v + m·prior) /
    * (n_g − 1 + m)`. The leave-one-out subtraction is what keeps the
    * encoding honest as a training feature: a row never sees its own
    * label, so the encoder can't leak the target it is predicting
    * (the classic target-leakage bug in categorical encoding), and the
    * `m`-row pseudo-count stops rare keys from memorizing their few
    * labels. Null targets are excluded from both the group and global
    * statistics; with `m = 0` a key's only row gets a null encoding
    * (0/0 guarded) instead of NaN. Output: (id, key, value, te 6 dp).
    *
    * Scale shape: ONE (key) hash-agg of count/Σ partials plus a 1-row
    * global aggregate; both broadcast back over the scan (the key table
    * is |keys| rows), so the corpus is read once and never shuffled —
    * the encode itself is a codegen'd scan-stage expression. The 6 dp
    * round covers cross-engine sum-order ulps (~1e-14 on the quotient,
    * far below the quantum). */
  def targetEncoding(df: DataFrame, keyCol: String, idCol: String,
                     valCol: String, smoothing: Double): DataFrame = {
    require(smoothing >= 0, s"targetEncoding: need smoothing >= 0, got $smoothing")
    val v = col(valCol).cast("double")
    val base = df.where(v.isNotNull)
      .select(col(idCol), col(keyCol), v.as("__v"))
    val grp = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum("__v").as("__s"))
    val prior = base.agg((sum("__v") / count(lit(1))).as("__prior"))
    val denom = col("__n") - 1.0 + lit(smoothing)
    base
      .join(broadcast(grp), Seq(keyCol))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col(keyCol), col("__v").as(valCol),
        when(denom > 0, round(
          (col("__s") - col("__v") + lit(smoothing) * col("__prior")) / denom,
          6)).as("te"))
  }

  /** Pairwise Pearson correlation matrix over a set of numeric columns —
    * the feature-redundancy audit before training (near-±1 pairs are
    * duplicate signals; near-0 pairs with the target are dead features).
    * Rows with ANY null among the columns are dropped first (listwise
    * completion), so every pair is computed over the same row set and
    * the matrix stays positive-semidefinite. Degenerate pairs (a
    * zero-variance column, or n < 2) report null. Output: one row per
    * unordered pair (col_a, col_b, n_rows, corr 6 dp), pairs in the
    * given column order.
    *
    * Scale shape: ONE scan ending in a single-row global aggregate — all
    * k·(k−1)/2 `corr` co-moment aggregates (numerically stable merges,
    * so partitioning cannot move the 6 dp digits) plus the count share
    * one map-side partial pass; the row-explosion to pairs is a `stack`
    * over that one row. Nothing scales with n but the scan. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"correlationMatrix: need >= 2 columns, got ${cols.size}")
    val complete = df.where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    // covar/stddev co-moments instead of corr(): ANSI mode makes corr()
    // raise DIVIDE_BY_ZERO on a zero-variance column; the guarded ratio
    // reports null there instead
    val aggs = (count(lit(1)).as("__n") +:
      cols.map(c => stddev_samp(col(c)).as(s"__sd_$c"))) ++
      pairs.map { case (a, b) => covar_samp(col(a), col(b)).as(s"__cv_${a}_$b") }
    val one = complete.agg(aggs.head, aggs.tail: _*)
      .select(col("__n") +: pairs.map { case (a, b) =>
        when(col("__n") > 1 && col(s"__sd_$a") > 0 && col(s"__sd_$b") > 0,
          col(s"__cv_${a}_$b") / (col(s"__sd_$a") * col(s"__sd_$b")))
          .as(s"__c_${a}_$b")
      }: _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', __c_${a}_$b"
    }.mkString(", ")
    one.selectExpr("__n", s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, __c)")
      .select(col("col_a"), col("col_b"),
        col("__n").cast("long").as("n_rows"),
        // −0.0 + 0.0 = +0.0 (IEEE), so a tiny-negative corr rounded to
        // zero can't hash-mismatch an engine that rounded to +0.0
        (round(col("__c"), 6) + lit(0.0)).as("corr"))
  }

  /** ε-differentially-private group counts with DETERMINISTIC Laplace
    * noise: each group's count gets `−(1/ε)·sign(u)·ln(1 − 2|u|)` where
    * `u ∈ (−0.5, 0.5)` is the inverse-CDF uniform derived from the md5
    * of the group key — the release a privacy review signs off next to
    * [[kAnonymityAudit]] (counting queries have sensitivity 1, so
    * Laplace(1/ε) noise gives ε-DP). Deriving the noise from the key
    * instead of an RNG makes the release REPLAY-STABLE: re-running the
    * query cannot leak a fresh noise sample per run (averaging
    * re-releases is the classic attack on naively re-randomized DP), and
    * any engine reproduces the identical mart. Null group values form
    * their own group (keyed by a sentinel). The exact count rides along
    * for the curation-side view; the DP release is (group, n_noisy, ε)
    * only. Output: (groupCols…, n, n_noisy 6 dp, epsilon).
    *
    * Scale shape: ONE group-keyed hash-agg (map-side partials); the noise
    * is a scan-stage expression over the reduced group rows. */
  def dpNoisedCounts(df: DataFrame, groupCols: Seq[String],
                     epsilon: Double): DataFrame = {
    require(groupCols.nonEmpty, "dpNoisedCounts: need at least one group column")
    require(epsilon > 0, s"dpNoisedCounts: need epsilon > 0, got $epsilon")
    val key = concat_ws("|",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    // (v + 0.5)/2³² − 0.5 ∈ (−0.5, 0.5): the ±0.5 endpoints (ln 0) are
    // unreachable by construction, no clamp needed
    val u = (conv(substring(md5(key), 1, 8), 16, 10).cast("long")
      .cast("double") + lit(0.5)) / lit(4294967296.0) - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(u) *
      log(lit(1.0) - lit(2.0) * abs(u))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("n_noisy", round(col("n") + noise, 6))
      .withColumn("epsilon", lit(epsilon))
  }

  /** Weight-of-evidence encoding + information value (the credit-scoring
    * categorical screen): per category `c` of `catCol`,
    * `WOE_c = ln(share_pos(c) / share_neg(c))` over add-half smoothed
    * shares (`(n + 0.5) / (tot + 0.5·C)`, so empty cells can't produce
    * ±∞), and `IV = Σ_c (share_pos − share_neg)·WOE_c` — the one-number
    * "does this feature separate the classes" screen (rule of thumb:
    * IV < 0.02 useless, > 0.5 suspiciously strong). Rows with a null
    * label are excluded; a null CATEGORY is its own row. All shares are
    * exact integer ratios; only the `ln` is transcendental, pinned at
    * 6 dp. Output: (category, n, n_pos, n_neg, woe, iv_contrib,
    * iv_total — repeated, the feature-level scalar).
    *
    * Scale shape: ONE category-keyed hash-agg reduces the scan; totals,
    * the category count, and the IV sum are broadcast-sized aggregates
    * over the reduced table. */
  def woeIv(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("int")
    val cats = graft.core.CacheRegistry.persist(
      df.where(y.isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as("n"), sum(y).cast("long").as("n_pos"))
        .withColumn("n_neg", col("n") - col("n_pos")))
    val tot = cats.agg(sum("n_pos").as("__pt"), sum("n_neg").as("__nt"),
      count(lit(1)).cast("double").as("__c"))
    val sp = (col("n_pos") + lit(0.5)) / (col("__pt") + lit(0.5) * col("__c"))
    val sn = (col("n_neg") + lit(0.5)) / (col("__nt") + lit(0.5) * col("__c"))
    val scored = cats.crossJoin(broadcast(tot))
      .withColumn("woe", round(log(sp / sn), 6))
      .withColumn("iv_contrib", round((sp - sn) * log(sp / sn), 6))
    val iv = scored.agg(round(sum("iv_contrib"), 6).as("__iv"))
    scored.crossJoin(broadcast(iv))
      .select(col("category"), col("n"), col("n_pos"), col("n_neg"),
        col("woe"), col("iv_contrib"), col("__iv").as("iv_total"))
  }

  /** Cohen's κ inter-rater agreement — the labeling-QA gate for any
    * human- or model-annotated training set: observed agreement
    * discounted by the agreement two raters would reach by chance from
    * their own marginal label distributions,
    * `κ = (p_o − p_e)/(1 − p_e)`. Everything reduces to exact integers —
    * the agreement count and the Σ c₁(ℓ)·c₂(ℓ) chance product are LONG
    * sums, so p_o, p_e and κ are each ONE division of exact inputs (no
    * order-dependent double accumulation). Rows where either rater is
    * NULL are excluded (unlabeled ≠ a label). κ is NULL when p_e = 1
    * (both raters constant — agreement is vacuous). One summary row:
    * (n, po, pe, kappa), 6 dp.
    *
    * Scale shape: ONE (r1, r2)-keyed hash-agg reduces the scan to the
    * label grid (|labels|² rows); marginals, the agreement diagonal, and
    * the chance product are re-aggs over that grid. */
  def cohensKappa(df: DataFrame, rater1Col: String, rater2Col: String): DataFrame = {
    val grid = graft.core.CacheRegistry.persist(
      df.where(col(rater1Col).isNotNull && col(rater2Col).isNotNull)
        .groupBy(col(rater1Col).as("__r1"), col(rater2Col).as("__r2"))
        .agg(count(lit(1)).as("__c")))
    val n = grid.agg(coalesce(sum("__c"), lit(0L)).as("__n"))
    val agree = grid.where(col("__r1") === col("__r2"))
      .agg(coalesce(sum("__c"), lit(0L)).as("__agree"))
    val m1 = grid.groupBy("__r1").agg(sum("__c").as("__c1"))
    val m2 = grid.groupBy("__r2").agg(sum("__c").as("__c2"))
    val chance = m1.join(m2, col("__r1") === col("__r2"))
      .agg(coalesce(sum(col("__c1") * col("__c2")), lit(0L)).as("__chance"))
    val po = col("__agree").cast("double") / col("__n").cast("double")
    val pe = col("__chance").cast("double") /
      (col("__n") * col("__n")).cast("double")
    n.crossJoin(broadcast(agree)).crossJoin(broadcast(chance))
      .where(col("__n") > 0)
      .select(col("__n").as("n"), round(po, 6).as("po"), round(pe, 6).as("pe"),
        when(col("__chance") < col("__n") * col("__n"),
          round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Gains / lift table — the campaign-targeting readout next to
    * [[rocAuc]]: rows ranked by score descending (ties on `idCol`, a
    * total order), cut into `nBuckets` exact rank-`div` buckets (the
    * [[graft.ops.Layout.zoneMapAudit]] file rule), each reporting its
    * positive rate, the cumulative share of ALL positives captured so
    * far, and lift vs the base rate. Every ratio is ONE division of
    * exact LONG products (`lift = (pos_b·n)/(n_b·pos)`), so no engine's
    * accumulation order can leak. Output: (bucket, n, n_pos, resp_rate,
    * cum_capture, lift), 6 dp; lift NULL when the dataset has no
    * positives.
    *
    * Scale shape: ranks from [[graft.ops.Layout.globalRank]] (range
    * exchange, no single-partition sort); the bucket reduce is one
    * hash-agg; the cumulative window runs over the REDUCED nBuckets-row
    * frame — bounded by construction, like [[equiDepthHistogram]]'s
    * documented exact-by-contract tail. */
  def gainsTable(df: DataFrame, idCol: String, scoreCol: String,
                 labelCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"gainsTable: need nBuckets >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(scoreCol).isNotNull)
      .select(col(idCol),
        (-col(scoreCol).cast("double")).as("__neg"),
        col(labelCol).cast("boolean").as("__y"))
    val ranked = graft.ops.Layout.globalRank(base, "__neg", idCol, "__rank")
    val tot = base.agg(count(lit(1)).as("__n"),
      coalesce(sum(col("__y").cast("long")), lit(0L)).as("__pos"))
    val buckets = ranked.crossJoin(broadcast(tot))
      .withColumn("__b", expr(s"((__rank - 1) * $nBuckets) div __n"))
      .groupBy("__b")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__y").cast("long")), lit(0L)).as("n_pos"),
        max("__n").as("__n"), max("__pos").as("__pos"))
    val w = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets.withColumn("__cum", sum("n_pos").over(w))
      .select(col("__b").as("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("resp_rate"),
        when(col("__pos") > 0,
          round(col("__cum").cast("double") / col("__pos").cast("double"), 6))
          .as("cum_capture"),
        when(col("__pos") > 0,
          round((col("n_pos") * col("__n")).cast("double") /
            (col("n") * col("__pos")).cast("double"), 6)).as("lift"))
  }

  /** Mutual information and Theil's uncertainty coefficient between two
    * CATEGORICAL columns — the dependence diagnostic [[psiDrift]] (same
    * column over time) and q205's Pearson matrix (linear, numeric) don't
    * cover: does knowing A reduce uncertainty about B at all, linearly or
    * not? From the exact integer contingency grid:
    * `MI = Σᵢⱼ (nᵢⱼ/n)·ln(n·nᵢⱼ/(nᵢ·nⱼ))`, `H(A) = −Σᵢ (nᵢ/n)·ln(nᵢ/n)`,
    * `U(A|B) = MI/H(A)` — every per-cell term is snapped to a micro-LONG
    * before summation (the defined contract: cell terms are ratios of
    * exact integers, so each micro value is engine-identical, and integer
    * sums carry no accumulation order). Null categories form their own
    * cohort (the [[kAnonymityAudit]] rule). One summary row:
    * (n, n_a, n_b, h_a, h_b, mi, u_a_given_b, u_b_given_a), 6 dp.
    *
    * Scale shape: ONE (a, b) hash-agg reduces the scan to the grid;
    * marginals and the three micro-sums are re-aggs over |A|·|B| rows
    * with the total broadcast. */
  def categoricalMI(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val grid = graft.core.CacheRegistry.persist(
      df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
        .agg(count(lit(1)).as("__nij")))
    val ma = grid.groupBy("__a").agg(sum("__nij").as("__ni"))
    val mb = grid.groupBy("__b").agg(sum("__nij").as("__nj"))
    val tot = grid.agg(sum("__nij").as("__n"))
    def micro(term: Column): Column = round(term * 1000000.0, 0).cast("long")
    val nD = col("__n").cast("double")
    val miCell = micro((col("__nij").cast("double") / nD) *
      log(nD * col("__nij").cast("double") /
        (col("__ni").cast("double") * col("__nj").cast("double"))))
    val mi = grid
      .join(ma, grid("__a") <=> ma("__a")).drop(ma("__a"))
      .join(mb, grid("__b") <=> mb("__b")).drop(mb("__b"))
      .crossJoin(broadcast(tot))
      .agg(sum(miCell).as("__mi"), max("__n").as("__n"))
      .crossJoin(broadcast(ma.agg(count(lit(1)).as("n_a"))))
      .crossJoin(broadcast(mb.agg(count(lit(1)).as("n_b"))))
    def entropy(m: DataFrame, cnt: String): DataFrame =
      m.crossJoin(broadcast(tot))
        .agg(sum(micro(-(col(cnt).cast("double") / nD) *
          log(col(cnt).cast("double") / nD))).as("__h"))
    val ha = entropy(ma, "__ni")
    val hb = entropy(mb, "__nj")
    mi.crossJoin(broadcast(ha.select(col("__h").as("__ha"))))
      .crossJoin(broadcast(hb.select(col("__h").as("__hb"))))
      .select(col("__n").as("n"), col("n_a"), col("n_b"),
        (col("__ha").cast("double") / 1000000.0).as("h_a"),
        (col("__hb").cast("double") / 1000000.0).as("h_b"),
        (col("__mi").cast("double") / 1000000.0).as("mi"),
        when(col("__ha") > 0, round(col("__mi").cast("double") /
          col("__ha").cast("double"), 6)).as("u_a_given_b"),
        when(col("__hb") > 0, round(col("__mi").cast("double") /
          col("__hb").cast("double"), 6)).as("u_b_given_a"))
  }

  /** Benford first-digit audit over a positive numeric column — the
    * classic fabricated-data / broken-upstream detector: organically
    * grown magnitudes follow `P(d) = log10(1 + 1/d)`, while synthetic,
    * truncated, or unit-mangled feeds pile onto a few digits. The leading
    * SIGNIFICANT digit is the first `[1-9]` character of the value's
    * decimal string (not `log10` bucketing — exact and engine-portable,
    * and correct for sub-unit values like 0.5 where the first CHARACTER
    * would be the meaningless '0'); only the shares are rounded (6 dp).
    * Output: (digit, n, share, benford_share, abs_gap) — one row per
    * observed leading digit.
    *
    * Scale shape: ONE 9-bucket hash-agg with map-side combine over the
    * scan; the total rides in as a broadcast scalar. Nothing here grows
    * with N. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val pos = df.where(v.isNotNull && v > 0)
      .select(regexp_extract(v.cast("string"), "[1-9]", 0).as("digit"))
      .where(col("digit") =!= "") // 0-and-epsilon strings carry no digit
    val counts = pos.groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").cast("double").as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__tot"), 6).as("share"),
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)), 6).as("benford_share"))
      .withColumn("abs_gap",
        round(abs(col("share") - col("benford_share")), 6))
  }

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", eq. 1): per task with `n` attempts and
    * `c` successes, `1 − C(n−c, k)/C(n, k)` — the probability that a
    * uniformly drawn k-subset of the attempts contains a success. The
    * naive "fraction of first-k that passed" is biased when n > k; the
    * combinatorial form is exact for any n. Computed as the unrolled
    * product `Π_{i<k} (n−c−i)/(n−i)` in a FIXED left-to-right order
    * (when n−c < k a zero factor lands inside the product, so pass@k
    * is exactly 1 — no branch needed), so the per-task value replays
    * bit-identically in any engine. Tasks with fewer than k attempts
    * are excluded from that k's mean (the standard protocol: the
    * estimator is undefined for n < k). One output row per k:
    * (k, n_tasks, mean_pass_at_k), 6 dp.
    *
    * Scale shape: ONE task-keyed hash-agg with map-side combine
    * reduces the attempt log to (n, c) per task; each k then pays only
    * a partial-agg reduce over the ≤ |tasks| rows (the per-task frame
    * is persisted across the ks). Nothing joins, nothing is global. */
  def passAtK(df: DataFrame, taskCol: String, successCol: String,
              ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"passAtK: need ks >= 1, got $ks")
    val per = graft.core.CacheRegistry.persist(
      df.groupBy(col(taskCol))
        .agg(count(lit(1)).as("n"),
          sum(when(col(successCol), 1L).otherwise(0L)).as("c")))
    ks.distinct.sorted.map { k =>
      val prod = (0 until k).foldLeft(lit(1.0)) { (e, i) =>
        e * ((col("n") - col("c") - lit(i)).cast("double") /
          (col("n") - lit(i)).cast("double"))
      }
      per.where(col("n") >= k)
        .agg(count(lit(1)).as("n_tasks"),
          round(avg(lit(1.0) - prod), 6).as("mean_pass_at_k"))
        .select(lit(k).as("k"), col("n_tasks"), col("mean_pass_at_k"))
    }.reduce(_ unionByName _)
  }

  /** Fleiss' κ — [[cohensKappa]]'s multi-rater generalization, the
    * labeling-QA gate when each item is judged by a PANEL of `n` raters
    * (human annotation rounds, LLM-jury scoring): observed per-item
    * agreement `P_i = (Σ_j c_ij² − n) / (n(n−1))` averaged over items,
    * discounted by the chance agreement of the pooled category marginals
    * `P_e = Σ_j p_j²`. Both reduce to EXACT integer sums —
    * `P̄ = (Σ_i Σ_j c_ij² − N·n) / (N·n·(n−1))` and
    * `P_e = Σ_j C_j² / (N·n)²` where C_j is the pooled category count —
    * so each is ONE division, no order-dependent double accumulation
    * (the C_j² sum rides in decimal(38,0): at 100 TB, C_j ≤ N·n makes
    * the square overflow a LONG). Null categories are excluded (an
    * unrated slot is not a rating); items without exactly `n` remaining
    * ratings are dropped — the estimator is defined for a fixed panel
    * size. κ is NULL when P_e = 1 (every rating one category). One
    * summary row: (n_items, n_raters, p_bar, p_e, kappa), 6 dp.
    *
    * Scale shape: ONE (item, category)-keyed hash-agg with map-side
    * combine reduces the rating log to the c_ij grid; the item-size
    * filter is an item-partitioned window over that grid (≤ |labels|
    * rows per item), and the Σc² and category marginals are re-aggs.
    * Nothing re-scans the ratings, nothing is global. */
  def fleissKappa(df: DataFrame, itemCol: String, categoryCol: String,
                  nRaters: Int): DataFrame = {
    require(nRaters >= 2, s"fleissKappa: need nRaters >= 2, got $nRaters")
    val grid = graft.core.CacheRegistry.persist(
      df.where(col(categoryCol).isNotNull)
        .groupBy(col(itemCol).as("__item"), col(categoryCol).as("__cat"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__tot",
          sum("__c").over(org.apache.spark.sql.expressions.Window
            .partitionBy("__item")))
        .where(col("__tot") === nRaters))
    val items = grid.agg(
      countDistinct("__item").as("__n_items"),
      coalesce(sum(col("__c") * col("__c")), lit(0L)).as("__sumsq"))
    val marg = grid.groupBy("__cat")
      .agg(sum("__c").cast("decimal(38,0)").as("__cj"))
      .agg(coalesce(sum(col("__cj") * col("__cj")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__sumcj2"))
    val nn = col("__n_items") * lit(nRaters.toLong)
    val pBar = (col("__sumsq") - nn).cast("double") /
      (nn * lit(nRaters.toLong - 1L)).cast("double")
    val pE = col("__sumcj2").cast("double") /
      (nn.cast("decimal(38,0)") * nn.cast("decimal(38,0)")).cast("double")
    items.crossJoin(broadcast(marg))
      .where(col("__n_items") > 0)
      .select(col("__n_items").as("n_items"),
        lit(nRaters).as("n_raters"),
        round(pBar, 6).as("p_bar"), round(pE, 6).as("p_e"),
        when(col("__sumcj2").cast("double") <
            (nn.cast("decimal(38,0)") * nn.cast("decimal(38,0)")).cast("double"),
          round((pBar - pE) / (lit(1.0) - pE), 6)).as("kappa"))
  }

  /** Krippendorff's α (nominal metric) — the agreement coefficient for
    * MISSING data, where [[fleissKappa]]'s fixed-panel contract breaks:
    * raters judge overlapping-but-different item subsets (the normal
    * shape of a crowdsourced labeling run). Coincidence-matrix form:
    * each item with m ≥ 2 ratings contributes its pairable disagreement
    * `(m² − Σ_c c_c²)/(m − 1)`; the observed disagreement is the item
    * sum over n total pairable ratings, the expected disagreement comes
    * from the pooled category totals, and
    * `α = 1 − (O/10⁶)·(n−1)/(n² − Σ_c n_c²)`. Determinism device: the
    * only order-sensitive accumulation — the per-item rational O — is
    * snapped to micro-integers before the LONG sum (the
    * [[graft.ops.Learn.bradleyTerry]] contract); n, n_c, and the squares
    * are exact (squares in decimal(38,0): n_c ≤ n overflows a LONG
    * squared at 100 TB). Null categories are excluded; single-rating
    * items are unpairable and drop (per the definition). α is NULL when
    * every pairable rating is one category (expected disagreement 0).
    * One row: (n_items, n_ratings, d_o, d_e, alpha), 6 dp.
    *
    * Scale shape: ONE (item, category)-keyed hash-agg, an item-keyed
    * re-agg for the per-item disagreement, and two scalar reduces —
    * nothing joins, nothing re-scans the ratings. */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        categoryCol: String): DataFrame = {
    val grid = graft.core.CacheRegistry.persist(
      df.where(col(categoryCol).isNotNull)
        .groupBy(col(itemCol).as("__item"), col(categoryCol).as("__cat"))
        .agg(count(lit(1)).as("__c")))
    val items = grid.groupBy("__item")
      .agg(sum("__c").as("__m"), sum(col("__c") * col("__c")).as("__sq"))
      .where(col("__m") >= 2)
    val obs = items.agg(
      count(lit(1)).as("__n_items"),
      coalesce(sum("__m"), lit(0L)).as("__n"),
      coalesce(sum(round((col("__m") * col("__m") - col("__sq"))
          .cast("double") * lit(1e6) / (col("__m") - lit(1L)).cast("double"))
        .cast("long")), lit(0L)).as("__o"))
    // pooled category totals over the SAME pairable items
    val marg = grid
      .join(items.select(col("__item")), Seq("__item"), "left_semi")
      .groupBy("__cat").agg(sum("__c").cast("decimal(38,0)").as("__nc"))
      .agg(coalesce(sum(col("__nc") * col("__nc")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__sumnc2"))
    val nDec = col("__n").cast("decimal(38,0)")
    val den = (nDec * nDec - col("__sumnc2")).cast("double")
    val dO = col("__o").cast("double") / lit(1e6) / col("__n").cast("double")
    val dE = den / (nDec * (nDec - lit(1).cast("decimal(38,0)"))).cast("double")
    obs.crossJoin(broadcast(marg))
      .where(col("__n") > 0)
      .select(col("__n_items").as("n_items"), col("__n").as("n_ratings"),
        round(dO, 6).as("d_o"), round(dE, 6).as("d_e"),
        when(den > lit(0.0),
          round(lit(1.0) - col("__o").cast("double") / lit(1e6) *
            (col("__n") - lit(1L)).cast("double") / den, 6)).as("alpha"))
  }

  /** t-closeness audit (Li et al. 2007) — the third leg of the privacy
    * triad after [[kAnonymityAudit]] and [[lDiversityAudit]]: a cohort
    * can be k-anonymous AND l-diverse yet still leak when its sensitive
    * DISTRIBUTION sits far from the table's (e.g. one cohort holds only
    * the top balance bands). Distance is the canonical ordered-distance
    * EMD on the RANK grid of the global distinct values: per grid step,
    * `|F_cohort·n − F·n_c|` accumulates exactly (integer
    * cross-multiplication, the [[wasserstein1]] device with Δx = one
    * rank step), normalized by `n_c·n·(m−1)` into [0, 1]. `at_risk` =
    * t_value > t. A single-distinct-value table (m = 1) reports NULL
    * t_value (no ordering to be far along) and is never at risk.
    * Output: (cohort, n_cohort, m_values, t_value, at_risk). 6 dp.
    *
    * Scale shape: identical to [[wasserstein1]] — one (cohort, value)
    * hash-agg, the bounded grid×cohorts panel, cohort-partitioned
    * cumsums; no window over ungrouped data. */
  def tCloseness(df: DataFrame, cohortCol: String, sensitiveCol: String,
                 t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(t > 0 && t < 1, s"tCloseness: need 0 < t < 1, got $t")
    val vm = round(col(sensitiveCol).cast("double") * lit(1e6)).cast("long")
    val cells = graft.core.CacheRegistry.persist(
      df.where(col(sensitiveCol).isNotNull)
        .groupBy(col(cohortCol).as("__g"), vm.as("__vm"))
        .agg(count(lit(1)).as("__c")))
    val grid = cells.groupBy("__vm").agg(sum("__c").as("__cg"))
    val groups = cells.groupBy("__g").agg(sum("__c").as("__ng"))
    val cellsR = cells.select(col("__g").as("__gc"), col("__vm").as("__vmc"),
      col("__c"))
    val panel = grid.crossJoin(broadcast(groups))
      .join(cellsR,
        col("__g") <=> col("__gc") && col("__vm") === col("__vmc"), "left")
      .select(col("__g"), col("__vm"), col("__ng"), col("__cg"),
        coalesce(col("__c"), lit(0L)).as("__cgrp"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__vm"))
    val staged = panel.select(col("__g"), col("__ng"),
      sum("__cgrp").over(wg).cast("decimal(38,0)").as("__Fg"),
      sum("__cg").over(wg).cast("decimal(38,0)").as("__F"),
      lead(col("__vm"), 1).over(wg).as("__nxt"),
      sum("__cg").over(Window.partitionBy(col("__g"))).as("__n"),
      count(lit(1)).over(Window.partitionBy(col("__g"))).as("__m"))
    val nDec = col("__n").cast("decimal(38,0)")
    val ngDec = col("__ng").cast("decimal(38,0)")
    val tv = round(col("__w").cast("double")
      / (col("n_cohort").cast("double") * col("__nt").cast("double")
        * (col("m_values") - lit(1L)).cast("double")), 6)
    // a conditional sum (not a filter): an m = 1 cohort has ONLY the
    // last grid row and must still reach the output with a NULL t
    staged
      .groupBy(col("__g"))
      .agg(max("__ng").as("n_cohort"), max("__n").as("__nt"),
        max("__m").as("m_values"),
        coalesce(sum(when(col("__nxt").isNotNull,
          abs(col("__Fg") * nDec - col("__F") * ngDec))),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__w"))
      .select(col("__g").as(cohortCol), col("n_cohort"), col("m_values"),
        when(col("m_values") > 1, tv).as("t_value"),
        coalesce(when(col("m_values") > 1, tv > t), lit(false))
          .as("at_risk"))
  }

  /** Exact 1-D Wasserstein-1 (earth-mover) distance of each group's
    * value distribution from the pooled corpus — the binning-free twin
    * of [[psiDrift]]: PSI depends on a bin grid and explodes on empty
    * bins, while `W₁ = ∫|F_g − F|dx` is the actual metric distance in
    * VALUE UNITS ("this source's length distribution sits 340 chars
    * away from the corpus"). Both ECDFs ride the shared distinct-value
    * grid: per grid step, `|cumᵍ·n − cum·nᵍ|·Δx` accumulates as an
    * EXACT decimal (integer cross-multiplication instead of two
    * divisions), and the single division by `nᵍ·n` happens once at the
    * end — engine-identical to the 6 dp round. Null values drop; a null
    * group is its own cohort. Output: (group, n_group, n_total, w1),
    * value units, 6 dp.
    *
    * Scale shape: one (group, value) hash-agg, one (value) hash-agg,
    * then each group's panel is the FULL value grid (|grid|·|groups|
    * rows — bounded by the quantization grid times the group
    * vocabulary) with group-partitioned cumsum windows; no window ever
    * sees ungrouped data. */
  def wasserstein1(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val cells = graft.core.CacheRegistry.persist(
      df.where(col(valCol).isNotNull)
        .groupBy(col(groupCol).as("__g"), vm.as("__vm"))
        .agg(count(lit(1)).as("__c")))
    val grid = cells.groupBy("__vm").agg(sum("__c").as("__cg"))
    val groups = cells.groupBy("__g").agg(sum("__c").as("__ng"))
    // every group × every grid value (counts 0 where absent): the panel
    // each group's ECDF needs; group count is small, the grid bounded
    // null-safe group key: a null group is its own cohort and must
    // attach its own counts (the termLabelMI rule)
    val cellsR = cells.select(col("__g").as("__gc"), col("__vm").as("__vmc"),
      col("__c"))
    val panel = grid.crossJoin(broadcast(groups))
      .join(cellsR,
        col("__g") <=> col("__gc") && col("__vm") === col("__vmc"), "left")
      .select(col("__g"), col("__vm"), col("__ng"), col("__cg"),
        coalesce(col("__c"), lit(0L)).as("__cgrp"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__vm"))
    val staged = panel.select(col("__g"), col("__ng"),
      sum("__cgrp").over(wg).cast("decimal(38,0)").as("__Fg"),
      sum("__cg").over(wg).cast("decimal(38,0)").as("__F"),
      (lead(col("__vm"), 1).over(wg) - col("__vm")).as("__dx"),
      sum("__cg").over(Window.partitionBy(col("__g"))).as("__n"))
    val nDec = col("__n").cast("decimal(38,0)")
    val ngDec = col("__ng").cast("decimal(38,0)")
    val term = abs(col("__Fg") * nDec - col("__F") * ngDec) *
      col("__dx").cast("decimal(38,0)")
    staged.where(col("__dx").isNotNull)
      .groupBy(col("__g"))
      .agg(max("__ng").as("n_group"), max("__n").as("n_total"),
        coalesce(sum(term),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__w"))
      .select(col("__g").as(groupCol), col("n_group"), col("n_total"),
        round(col("__w").cast("double") /
          (col("n_group").cast("double") * col("n_total").cast("double")) /
          lit(1e6), 6).as("w1"))
  }

  /** Quantile-mapping normalization table — the REMEDIATION twin of
    * [[wasserstein1]]: once a source is known to sit elsewhere in value
    * space, this emits the per-quantile correspondence (source's exact
    * q-th order statistic ↔ the pooled corpus's) that a normalizing
    * transform interpolates — classic quantile mapping / CDF matching.
    * Order statistics are exact lower quantiles off the 6 dp-quantized
    * histograms (`min v with cum·nQ ≥ q·n`, all-integer comparisons —
    * no interpolation, engine-identical). Null values drop; a null
    * group is its own cohort. Output: (group, q, n_group, src_value,
    * corpus_value, shift), one row per group × quantile 1..nQ−1, 6 dp.
    *
    * Scale shape: one (group, value) hash-agg; each group's cumulative
    * histogram fans out ×(nQ−1) against a broadcast literal grid and
    * reduces in a (group, q) hash-agg — bounded by the quantization
    * grid times nQ. */
  def quantileMapping(df: DataFrame, groupCol: String, valCol: String,
                      nQ: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nQ >= 2, s"quantileMapping: need nQ >= 2, got $nQ")
    val spark = df.sparkSession
    import spark.implicits._
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val cells = graft.core.CacheRegistry.persist(
      df.where(col(valCol).isNotNull)
        .groupBy(col(groupCol).as("__g"), vm.as("__vm"))
        .agg(count(lit(1)).as("__c")))
    val qs = broadcast((1 until nQ).map(_.toLong).toDF("q"))
    def quantiles(hist: DataFrame, keyCols: Seq[Column],
                  outVal: String): DataFrame = {
      val w = Window.partitionBy(keyCols: _*).orderBy(col("__vm"))
      val all = Window.partitionBy(keyCols: _*)
      hist.select((keyCols :+ col("__vm") :+
          sum("__c").over(w).as("__cum") :+
          sum("__c").over(all).as("__n")): _*)
        .crossJoin(qs)
        .where(col("__cum") * nQ >= col("q") * col("__n"))
        .groupBy((keyCols :+ col("q")): _*)
        .agg(max("__n").as(s"${outVal}_n"), min("__vm").as(outVal))
    }
    val src = quantiles(cells, Seq(col("__g")), "__sv")
    val corp = quantiles(cells.groupBy("__vm")
      .agg(sum("__c").as("__c")), Seq(), "__cv")
    src.join(broadcast(corp), Seq("q"))
      .select(col("__g").as(groupCol), col("q"),
        col("__sv_n").as("n_group"),
        round(col("__sv").cast("double") / lit(1e6), 6).as("src_value"),
        round(col("__cv").cast("double") / lit(1e6), 6).as("corpus_value"),
        round((col("__sv") - col("__cv")).cast("double") / lit(1e6), 6)
          .as("shift"))
  }

  /** Krippendorff's alpha for INTERVAL (score-valued) ratings — the
    * [[krippendorffAlpha]] twin when annotators assign NUMBERS (quality
    * scores, Likert grades) rather than categories, so disagreement is
    * the squared difference `δ² = (v_i − v_j)²` instead of 0/1. The
    * pair sums collapse to exact integer identities — within a unit
    * `Σ_{i≠j}δ² = 2(m·Σv² − (Σv)²)`, globally the same with N — over
    * 6 dp micro-integer values riding decimal(38,0), so D_o and D_e are
    * exact up to one per-unit division (micro-snapped before the unit
    * sum, the [[krippendorffAlpha]] device) and one final expression.
    * Items with one rating are unpairable and excluded from BOTH D_o
    * and D_e (the pooled marginals use pairable units only); an
    * all-equal panel has D_e = 0 → null alpha. Output: one row —
    * (n_items, n_ratings, d_o, d_e, alpha), distances in value² units,
    * 6 dp.
    *
    * Scale shape: one (item) hash-agg of count/Σ/Σ² partials, then a
    * single-row reduce — no pair generation, no window, two scans of
    * nothing bigger than the item table. */
  def krippendorffAlphaInterval(df: DataFrame, itemCol: String,
                                valueCol: String): DataFrame = {
    val vm = round(col(valueCol).cast("double") * lit(1e6))
      .cast("decimal(38,0)")
    val items = df.where(col(valueCol).isNotNull)
      .select(col(itemCol).as("__item"), vm.as("__vm"))
      .groupBy("__item")
      .agg(count(lit(1)).as("__m"), sum(col("__vm")).as("__s"),
        sum(col("__vm") * col("__vm")).as("__q"))
      .where(col("__m") >= 2)
    val mD = col("__m").cast("decimal(38,0)")
    // ordered-pair δ² sum within the unit, back in value² units, with
    // the per-unit (m−1) division micro-snapped before the global sum
    val tU = (mD * col("__q") - col("__s") * col("__s")).cast("double") *
      lit(2.0) / lit(1e12) / (col("__m") - lit(1L)).cast("double")
    val obs = items.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum("__m"), lit(0L)).as("__n"),
      coalesce(sum(round(tU * lit(1e6)).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__o"),
      sum(col("__s")).as("__sg"), sum(col("__q")).as("__qg"))
    val nDec = col("__n").cast("decimal(38,0)")
    val dO = col("__o").cast("double") / lit(1e6) / col("__n").cast("double")
    val deNum = (nDec * col("__qg") - col("__sg") * col("__sg"))
      .cast("double") * lit(2.0) / lit(1e12)
    val dE = deNum /
      (col("__n").cast("double") * (col("__n") - lit(1L)).cast("double"))
    obs.where(col("__n") > 0)
      .select(col("n_items"), col("__n").as("n_ratings"),
        round(dO, 6).as("d_o"), round(dE, 6).as("d_e"),
        when(deNum > 0, round(lit(1.0) - dO / dE, 6)).as("alpha"))
  }

  /** Murphy decomposition of the Brier score — [[calibrationBins]]'
    * one-row verdict: `brier ≈ reliability − resolution + uncertainty`,
    * where reliability is the calibration error you can fix by
    * remapping scores, resolution is the discrimination you cannot add
    * post-hoc, and uncertainty is the label base rate's entropy term.
    * The identity is exact only for bin-constant forecasts; the residual
    * `within_bin_var` (the forecast variance inside bins that binning
    * hides) is emitted explicitly rather than silently folded in.
    *
    * Determinism: scores snap to 6 dp on entry, so the per-row
    * `(f − y)²` has ≤ 12 decimal places and rides EXACTLY as a
    * picto-integer decimal sum; per-bin reliability/resolution terms
    * reduce to rationals of the bin's exact integer sums
    * `(F_k/10⁶ − O_k)²/n_k`, micro-snapped before the LONG sum (the
    * [[graft.ops.Learn.bradleyTerry]] device). Rows with a null score
    * or label are excluded. One row: (n, brier, reliability,
    * resolution, uncertainty, within_bin_var), 6 dp.
    *
    * Scale shape: ONE row scan → the nBins-row bin table (hash-agg,
    * map-side combine); every output term is a re-agg over those ≤nBins
    * rows. */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         nBins: Int): DataFrame = {
    require(nBins >= 2, s"brierDecomposition: need nBins >= 2, got $nBins")
    val f6 = round(col(scoreCol).cast("double"), 6)
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val bin = greatest(lit(0L),
      least(floor(f6 * nBins).cast("long"), lit(nBins.toLong - 1L)))
    val e12 = round((f6 - y.cast("double")) * (f6 - y.cast("double")) *
      lit(1e12)).cast("decimal(38,0)")
    val bins = graft.core.CacheRegistry.persist(
      df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
        .select(bin.as("__b"), y.as("__y"),
          round(f6 * lit(1e6)).cast("long").as("__fm"), e12.as("__e"))
        .groupBy("__b")
        .agg(count(lit(1)).as("__nk"), sum("__y").as("__ok"),
          sum("__fm").as("__fmk"), sum("__e").as("__ek")))
    val tot = bins.agg(
      coalesce(sum("__nk"), lit(0L)).as("__n"),
      coalesce(sum("__ok"), lit(0L)).as("__o"),
      coalesce(sum("__ek"), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")).as("__e"))
    val dvf = col("__fmk").cast("double") / lit(1e6) - col("__ok").cast("double")
    val dvr = col("__ok").cast("double") -
      col("__nk").cast("double") * col("__o").cast("double") /
        col("__n").cast("double")
    val terms = bins.crossJoin(broadcast(tot)).agg(
      coalesce(sum(round(dvf * dvf * lit(1e6) / col("__nk").cast("double"))
        .cast("long")), lit(0L)).as("__rel"),
      coalesce(sum(round(dvr * dvr * lit(1e6) / col("__nk").cast("double"))
        .cast("long")), lit(0L)).as("__res"))
    val oBar = col("__o").cast("double") / col("__n").cast("double")
    val brier = col("__e").cast("double") / lit(1e12) / col("__n").cast("double")
    val rel = col("__rel").cast("double") / lit(1e6) / col("__n").cast("double")
    val res = col("__res").cast("double") / lit(1e6) / col("__n").cast("double")
    val unc = oBar * (lit(1.0) - oBar)
    tot.crossJoin(broadcast(terms))
      .where(col("__n") > 0)
      .select(col("__n").as("n"), round(brier, 6).as("brier"),
        round(rel, 6).as("reliability"), round(res, 6).as("resolution"),
        round(unc, 6).as("uncertainty"),
        // + 0.0 folds IEEE −0.0 (snapping can leave the residual a hair
        // under zero) so both engines emit +0.0
        (round(brier - (rel - res + unc), 6) + lit(0.0)).as("within_bin_var"))
  }

  /** Per-group Mann–Whitney U test — the rank-based two-sample test for
    * "did cohort b's distribution shift vs cohort a" when [[welchAbTest]]'s
    * mean-difference frame is wrong (heavy tails, outliers, ordinal
    * scores: the normal shape of quality-score and latency comparisons).
    * Tie-aware: tied values take the average rank, and the normal
    * approximation uses the tie-corrected variance
    * `σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))`. Cliff's δ =
    * 2U/(n_a·n_b) − 1 rides along as the distribution-free effect size.
    *
    * Determinism device: values snap to 6 dp on entry (micro-integers),
    * so the rank sum accumulates EXACTLY — per distinct value,
    * `2·R_a += cnt_a·(2·cum_before + t + 1)` in decimal(38,0) (2R ≤ N²
    * overflows a LONG at corpus scale), and U, δ, z are single divisions
    * of exact integers. All-tied groups yield a null z (σ = 0), not NaN;
    * a group missing either cohort yields null test columns. Null values
    * and variants outside {a, b} are excluded. Output: (group, n_a, n_b,
    * u_a [exact half-integers], z, cliffs_delta, significant at 95%),
    * 6 dp.
    *
    * Scale shape: ONE (group, value) hash-agg (map-side combine), then
    * windows over each group's distinct-VALUE histogram — bounded by the
    * 6 dp quantization, not the row count — and a final group hash-agg.
    * The raw table is scanned once and shuffled once. */
  def mannWhitneyU(df: DataFrame, groupCol: String, variantCol: String,
                   valCol: String, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df
      .where(col(valCol).isNotNull && col(variantCol).isin(a, b))
      .groupBy(col(groupCol), vm.as("__vm"))
      .agg(count(when(col(variantCol) === a, 1)).as("__ca"),
        count(when(col(variantCol) === b, 1)).as("__cb"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__vm"))
    val t = (col("__ca") + col("__cb")).cast("decimal(38,0)")
    val cumBefore = coalesce(
      sum(col("__ca") + col("__cb"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      .cast("decimal(38,0)")
    val red = grid
      .select(col(groupCol), col("__ca"), col("__cb"), t.as("__t"),
        cumBefore.as("__cum"))
      .groupBy(col(groupCol))
      .agg(
        sum("__ca").as("n_a"), sum("__cb").as("n_b"),
        sum(col("__ca").cast("decimal(38,0)") *
          (col("__cum") * 2 + col("__t") + 1)).as("__r2"),
        sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__ties"))
    val na = col("n_a").cast("decimal(38,0)")
    val nb = col("n_b").cast("decimal(38,0)")
    val bigN = na + nb
    // 2U_a = 2R_a − n_a(n_a+1); every term exact
    val u2 = col("__r2") - na * (na + 1)
    val nm = (na * nb).cast("double")
    val sigma2 = nm / 12.0 *
      ((bigN + 1).cast("double") -
        col("__ties").cast("double") / (bigN * (bigN - 1)).cast("double"))
    val z = (u2.cast("double") - nm) / (lit(2.0) * sqrt(sigma2))
    val ok = col("n_a") >= 1 && col("n_b") >= 1
    red.select(col(groupCol), col("n_a"), col("n_b"),
      when(ok, u2.cast("double") / 2.0).as("u_a"),
      when(ok && sigma2 > 0, round(z, 6)).as("z"),
      when(ok, round(u2.cast("double") / nm - 1.0, 6)).as("cliffs_delta"),
      coalesce(when(ok && sigma2 > 0, abs(z) > 1.959964), lit(false))
        .as("significant"))
  }

  /** Per-group ECDF distance between two cohorts — the two-sample
    * Kolmogorov–Smirnov D (worst-case vertical gap: detects ANY
    * distributional change, the drift test [[psiDrift]]'s fixed bins can
    * miss) and the 1-Wasserstein distance (area between the ECDFs: the
    * magnitude of the shift in value units, where D only says "how
    * separated"). Both from ONE distinct-value grid.
    *
    * Determinism device: values snap to 6 dp (micro-integers); the KS
    * numerator `max |cumA·n_b − cumB·n_a|` and the Wasserstein numerator
    * `Σ gap_micro·|cumA·n_b − cumB·n_a|` accumulate as exact
    * decimal(38,0) (cum·n ≤ N² overflows a LONG at corpus scale), so
    * both statistics are single divisions of exact integers. The 95%
    * rejection uses the asymptotic critical value 1.358102 on
    * `sqrt(n_a·n_b/N)·D`. A group missing either cohort yields null
    * stats; null values and foreign variants are excluded. Output:
    * (group, n_a, n_b, ks_d, ks_stat, reject_95, wasserstein1), 6 dp.
    *
    * Scale shape: the [[mannWhitneyU]] contract — one (group, value)
    * hash-agg, windows over each group's quantization-bounded
    * distinct-value histogram, one final group hash-agg; one scan, one
    * shuffle. */
  def ecdfDistance(df: DataFrame, groupCol: String, variantCol: String,
                   valCol: String, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df
      .where(col(valCol).isNotNull && col(variantCol).isin(a, b))
      .groupBy(col(groupCol), vm.as("__vm"))
      .agg(count(when(col(variantCol) === a, 1)).as("__ca"),
        count(when(col(variantCol) === b, 1)).as("__cb"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__vm"))
    val all = Window.partitionBy(col(groupCol))
    val cumA = sum("__ca").over(w).cast("decimal(38,0)")
    val cumB = sum("__cb").over(w).cast("decimal(38,0)")
    val na = sum("__ca").over(all).cast("decimal(38,0)")
    val nb = sum("__cb").over(all).cast("decimal(38,0)")
    // |F_a − F_b| at this value, scaled by the exact n_a·n_b denominator
    val dnum = abs(cumA * nb - cumB * na)
    val gap = (lead(col("__vm"), 1).over(w) - col("__vm"))
      .cast("decimal(38,0)")
    val red = grid
      .select(col(groupCol), col("__ca"), col("__cb"), dnum.as("__d"),
        (coalesce(gap, lit(0L).cast("decimal(38,0)")) * dnum).as("__w1"))
      .groupBy(col(groupCol))
      .agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"),
        max("__d").as("__dmax"), sum("__w1").as("__w1n"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nm = naD * nbD
    val ksD = col("__dmax").cast("double") / nm
    val ksStat = sqrt(nm / (naD + nbD)) * ksD
    val ok = col("n_a") >= 1 && col("n_b") >= 1
    red.select(col(groupCol), col("n_a"), col("n_b"),
      when(ok, round(ksD, 6)).as("ks_d"),
      when(ok, round(ksStat, 6)).as("ks_stat"),
      coalesce(when(ok, round(ksStat, 6) > 1.358102), lit(false))
        .as("reject_95"),
      when(ok, round(col("__w1n").cast("double") / lit(1e6) / nm, 6))
        .as("wasserstein1"))
  }

  /** Threshold-free average precision of a scalar score against a binary
    * label — the PR-curve summary (sklearn's `average_precision_score`
    * step integral), the right headline number for rare-positive
    * classifiers where [[rocAuc]]'s negatives-dominated denominator
    * flatters everything: `AP = Σ_thresholds (ΔTP/n_pos)·(TP/N at the
    * threshold)`, one term per distinct score, descending. Tie-exact by
    * construction: thresholds ARE the distinct scores, so tied rows
    * enter together and no within-tie order exists to disagree on.
    *
    * Determinism device: scores snap to 6 dp; each threshold's term
    * `round(np·cumP·10⁶/(n_pos·cumN))` is micro-snapped before the LONG
    * sum (the [[graft.ops.Learn.bradleyTerry]] device), so AP is an
    * exact integer sum divided once. No positives → null AP. Null
    * scores/labels excluded. One row: (n, n_pos, base_rate,
    * average_precision), 6 dp.
    *
    * Scale shape: one score hash-agg to the distinct-score histogram
    * (quantization-bounded), one descending cumsum window over it, one
    * scalar reduce. */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sm = round(col(scoreCol).cast("double") * lit(1e6)).cast("long")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val grid = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(sm.as("__sm"))
      .agg(count(lit(1)).as("__n"), sum(y).as("__np"))
    val w = Window.orderBy(col("__sm").desc)
    val cumN = sum("__n").over(w)
    val cumP = sum("__np").over(w)
    val tot = Window.partitionBy(lit(1))
    val nPos = sum("__np").over(tot)
    val term = round(col("__np").cast("double") * col("__cp").cast("double") *
      lit(1e6) / (col("__npos").cast("double") * col("__cn").cast("double")))
      .cast("long")
    grid
      .select(col("__n"), col("__np"), cumN.as("__cn"), cumP.as("__cp"),
        nPos.as("__npos"))
      .select(col("__n"), col("__np"), col("__npos"),
        when(col("__npos") > 0 && col("__np") > 0, term).otherwise(lit(0L))
          .as("__term"))
      .agg(coalesce(sum("__n"), lit(0L)).as("n"),
        coalesce(max("__npos"), lit(0L)).as("n_pos"),
        coalesce(sum("__term"), lit(0L)).as("__ap"))
      .where(col("n") > 0)
      .select(col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("base_rate"),
        when(col("n_pos") > 0,
          round(col("__ap").cast("double") / lit(1e6), 6))
          .as("average_precision"))
  }

  /** Per-group Gini concentration index over a non-negative value — the
    * inequality gauge for corpus composition: how concentrated token
    * mass is across a source's documents (G → 0: uniform lengths;
    * G → 1: a few giants carry the source — the long-doc skew that
    * breaks naive packing), or revenue across customers. Rank form over
    * the distinct-value histogram: a block of t copies of value v at
    * cumulative offset c contributes `v·(2·t·c + t(t+1))` to
    * `2·Σ i·x₍ᵢ₎`, and `G = 2Σi·x/(n·Σx) − (n+1)/n`.
    *
    * Determinism device: values snap to 6 dp micro-integers; both sums
    * accumulate as exact decimal(38,0) (the rank-weighted sum reaches
    * N²·v_micro — far past LONG at corpus scale), so G is arithmetic on
    * exact integers. Groups with any negative value yield a null gini
    * (the index is undefined); an all-zero group yields null (0/0);
    * null values are excluded. Output: (group, n, total [6 dp], gini
    * [6 dp]).
    *
    * Scale shape: the [[mannWhitneyU]] contract — one (group, value)
    * hash-agg, one cumsum window per group over the quantization-bounded
    * histogram, one final group hash-agg. */
  def giniIndex(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), vm.as("__vm"))
      .agg(count(lit(1)).as("__t"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__vm"))
    val cumBefore = coalesce(
      sum("__t").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      .cast("decimal(38,0)")
    val t = col("__t").cast("decimal(38,0)")
    val v = col("__vm").cast("decimal(38,0)")
    val red = grid
      .select(col(groupCol), col("__t"), col("__vm"),
        (v * (t * cumBefore * 2 + t * (t + 1))).as("__ranked"),
        (v * t).as("__s"))
      .groupBy(col(groupCol))
      .agg(sum("__t").as("n"), min("__vm").as("__min"),
        sum("__ranked").as("__r"), sum("__s").as("__sum"))
    val nD = col("n").cast("double")
    val gini = col("__r").cast("double") /
      (nD * col("__sum").cast("double")) - (nD + 1.0) / nD
    red.select(col(groupCol), col("n"),
      round(col("__sum").cast("double") / lit(1e6), 6).as("total"),
      when(col("__min") >= 0 && col("__sum") > 0, round(gini, 6))
        .as("gini"))
  }

  /** McNemar's test on PAIRED classifier predictions — the right test
    * for "is model B actually better than model A on the same rows",
    * where two separate accuracy CIs ([[bootstrapMeanCi]]) waste the
    * pairing: only the discordant counts carry signal.
    * `χ² = max(0, |b−c|−1)² / (b+c)` (continuity-corrected; the max(0,·)
    * keeps the b = c case at 0 instead of 1/(b+c)), 1 df, 95% critical
    * value 3.841459. All counts exact LONGs from one scan; χ² is one
    * division of exact integers. No discordant pairs → null χ², not
    * significant. Rows with a null label or prediction are excluded.
    * One row: (n, both_correct, only_a, only_b, both_wrong, chi2_cc,
    * significant).
    *
    * Scale shape: ONE scan ending in a single-row conditional-count
    * aggregate (map-side partials) — no shuffle beyond the reduce. */
  def mcNemar(df: DataFrame, labelCol: String, predACol: String,
              predBCol: String): DataFrame = {
    val okA = col(predACol) === col(labelCol)
    val okB = col(predBCol) === col(labelCol)
    val red = df
      .where(col(labelCol).isNotNull && col(predACol).isNotNull &&
        col(predBCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        count(when(okA && okB, 1)).as("both_correct"),
        count(when(okA && !okB, 1)).as("only_a"),
        count(when(!okA && okB, 1)).as("only_b"),
        count(when(!okA && !okB, 1)).as("both_wrong"))
    val b = col("only_a").cast("double")
    val c = col("only_b").cast("double")
    val num = greatest(lit(0.0), abs(b - c) - 1.0)
    val chi2 = num * num / (b + c)
    red.where(col("n") > 0)
      .select(col("n"), col("both_correct"), col("only_a"), col("only_b"),
        col("both_wrong"),
        when(col("only_a") + col("only_b") > 0, round(chi2, 6))
          .as("chi2_cc"),
        coalesce(when(col("only_a") + col("only_b") > 0,
          chi2 > 3.841459), lit(false)).as("significant"))
  }

  /** ROC-AUC with the DeLong (1988) confidence interval — [[rocAuc]]'s
    * point estimate plus the variance the paper derives from the
    * two-sample U-statistic structure, so an AUC difference can be
    * judged against sampling noise instead of eyeballed. Placements:
    * each positive's `V10 = (#neg below + ½·#neg tied)/n_neg` (and
    * symmetrically V01 per negative); `Var(AUC) = var(V10)/n_pos +
    * var(V01)/n_neg`.
    *
    * Determinism device: scores snap to 6 dp; per distinct-score block
    * the INTEGER placement numerator `2·cum_other + ties` is exact, and
    * its weighted first/second moments accumulate as decimal(38,0)
    * (second moments reach N³), so AUC, SE, and the CI are arithmetic
    * on exact integers. Either cohort empty → null AUC; a cohort of
    * size 1 → null SE/CI (the n−1 variance). Null scores/labels
    * excluded. One row: (n_pos, n_neg, auc, se, ci_lo, ci_hi), 6 dp.
    *
    * Scale shape: the [[averagePrecision]] contract — one distinct-score
    * hash-agg, one cumsum window over the quantization-bounded
    * histogram, one scalar reduce. */
  def rocAucDelong(df: DataFrame, scoreCol: String, labelCol: String,
                   z: Double = 1.959964): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sm = round(col(scoreCol).cast("double") * lit(1e6)).cast("long")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val grid = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(sm.as("__sm"))
      .agg(sum(y).as("__np"), sum(lit(1L) - y).as("__nn"))
    val w = Window.orderBy(col("__sm"))
    val negBefore = coalesce(
      sum("__nn").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val posAfter = coalesce(
      sum("__np").over(w.rowsBetween(1, Window.unboundedFollowing)), lit(0L))
    // integer placement numerators, in 1/(2·n_other) units
    val v10 = (negBefore * 2 + col("__nn")).cast("decimal(38,0)")
    val v01 = (posAfter * 2 + col("__np")).cast("decimal(38,0)")
    val red = grid
      .select(col("__np").cast("decimal(38,0)").as("__npd"),
        col("__nn").cast("decimal(38,0)").as("__nnd"),
        v10.as("__v"), v01.as("__u"))
      .agg(coalesce(sum("__npd"), lit(0L).cast("decimal(38,0)")).as("__p"),
        coalesce(sum("__nnd"), lit(0L).cast("decimal(38,0)")).as("__m"),
        sum(col("__npd") * col("__v")).as("__s1"),
        sum(col("__npd") * col("__v") * col("__v")).as("__s2"),
        sum(col("__nnd") * col("__u")).as("__t1"),
        sum(col("__nnd") * col("__u") * col("__u")).as("__t2"))
    val np = col("__p").cast("double")
    val nn = col("__m").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val t1 = col("__t1").cast("double")
    val t2 = col("__t2").cast("double")
    val auc = s1 / (lit(2.0) * nn * np)
    val var10 = (s2 - s1 * s1 / np) / (np - 1.0)
    val var01 = (t2 - t1 * t1 / nn) / (nn - 1.0)
    val se = sqrt(var10 / (np * (lit(2.0) * nn) * (lit(2.0) * nn)) +
      var01 / (nn * (lit(2.0) * np) * (lit(2.0) * np)))
    val okAuc = col("__p") > 0 && col("__m") > 0
    val okSe = col("__p") >= 2 && col("__m") >= 2
    red.where(col("__p") + col("__m") > 0)
      .select(col("__p").cast("long").as("n_pos"),
        col("__m").cast("long").as("n_neg"),
        when(okAuc, round(auc, 6)).as("auc"),
        when(okSe, round(se, 6)).as("se"),
        when(okSe, round(auc - lit(z) * se, 6)).as("ci_lo"),
        when(okSe, round(auc + lit(z) * se, 6)).as("ci_hi"))
  }

  /** Per-group standardized effect size — Cohen's d with the Hedges
    * small-sample correction `J = 1 − 3/(4·df − 1)`: the
    * unit-free magnitude that makes effects COMPARABLE across metrics
    * and experiments, where [[welchAbTest]]'s raw diff and z only say
    * "nonzero" ("z = 8" on ten million rows can be a 0.01σ triviality).
    * Pooled SD from the exact n−1 moment pass; thresholds 0.2/0.5/0.8
    * label the conventional small/medium/large bands on the CORRECTED
    * magnitude. A cohort under 2 rows or a zero pooled variance → null.
    * Output: (group, n_a, n_b, diff, pooled_sd, cohens_d, hedges_g,
    * magnitude), 6 dp.
    *
    * Scale shape: the [[welchAbTest]] contract — one (group, variant)
    * hash-agg pivoted by a second tiny agg. */
  def effectSize(df: DataFrame, groupCol: String, variantCol: String,
                 valCol: String, a: String, bVariant: String): DataFrame = {
    val v = col(valCol).cast("double")
    val red = df.where(v.isNotNull && col(variantCol).isin(a, bVariant))
      .groupBy(col(groupCol), col(variantCol).as("__var"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__s2"))
    def side(tag: String, c: Column): Column = max(when(col("__var") === tag, c))
    val piv = red.groupBy(col(groupCol)).agg(
      coalesce(side(a, col("__n")), lit(0L)).as("n_a"),
      coalesce(side(bVariant, col("__n")), lit(0L)).as("n_b"),
      side(a, col("__s")).as("__sa"), side(bVariant, col("__s")).as("__sb"),
      side(a, col("__s2")).as("__sa2"), side(bVariant, col("__s2")).as("__sb2"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ssa = col("__sa2") - col("__sa") * col("__sa") / na
    val ssb = col("__sb2") - col("__sb") * col("__sb") / nb
    val dfree = na + nb - 2.0
    val sp = sqrt((ssa + ssb) / dfree)
    val diff = col("__sb") / nb - col("__sa") / na
    val d = diff / sp
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * dfree - 1.0)
    val g = j * d
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val okSp = ok && sp > 0
    piv.select(col(groupCol), col("n_a"), col("n_b"),
      when(col("n_a") >= 1 && col("n_b") >= 1, round(diff, 6)).as("diff"),
      when(ok, round(sp, 6)).as("pooled_sd"),
      when(okSp, round(d, 6)).as("cohens_d"),
      when(okSp, round(g, 6)).as("hedges_g"),
      when(okSp,
        when(abs(g) < 0.2, lit("negligible"))
          .when(abs(g) < 0.5, lit("small"))
          .when(abs(g) < 0.8, lit("medium"))
          .otherwise(lit("large"))).as("magnitude"))
  }

  /** Per-group minimum detectable effect at the CURRENT sample sizes —
    * the experiment-planning readout ([[welchAbTest]]'s prospective
    * twin): with these cohorts and variances, how big a true difference
    * would the test reliably see? `MDE = (z_{α/2}+z_β)·√(s_a²/n_a +
    * s_b²/n_b)` — defaults are 95% confidence (1.959964) and 80% power
    * (0.841621). Exact n−1 variances from one moment pass; the relative
    * MDE divides by cohort a's mean (null when that mean is 0). A cohort
    * under 2 rows → null MDEs. Output: (group, n_a, n_b, mean_a,
    * mde_abs, mde_rel), 6 dp.
    *
    * Scale shape: identical to [[welchAbTest]] — one (group, variant)
    * hash-agg of count/Σ/Σ² partials, pivoted by a second tiny agg. */
  def mdePower(df: DataFrame, groupCol: String, variantCol: String,
               valCol: String, a: String, bVariant: String,
               zAlpha: Double = 1.959963984540054,
               zBeta: Double = 0.8416212335729143): DataFrame = {
    val v = col(valCol).cast("double")
    val red = df.where(v.isNotNull && col(variantCol).isin(a, bVariant))
      .groupBy(col(groupCol), col(variantCol).as("__var"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__s2"))
    def side(tag: String, c: Column): Column = max(when(col("__var") === tag, c))
    val piv = red.groupBy(col(groupCol)).agg(
      coalesce(side(a, col("__n")), lit(0L)).as("n_a"),
      coalesce(side(bVariant, col("__n")), lit(0L)).as("n_b"),
      side(a, col("__s")).as("__sa"), side(bVariant, col("__s")).as("__sb"),
      side(a, col("__s2")).as("__sa2"), side(bVariant, col("__s2")).as("__sb2"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("__sa") / na
    val va = (col("__sa2") - col("__sa") * col("__sa") / na) / (na - 1.0)
    val vb = (col("__sb2") - col("__sb") * col("__sb") / nb) / (nb - 1.0)
    val mde = lit(zAlpha + zBeta) * sqrt(va / na + vb / nb)
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    piv.select(col(groupCol), col("n_a"), col("n_b"),
      when(col("n_a") > 0, round(ma, 6)).as("mean_a"),
      when(ok, round(mde, 6)).as("mde_abs"),
      when(ok && ma =!= 0.0, round(mde / ma, 6)).as("mde_rel"))
  }

  /** Per-key exact binomial sign test over paired differences — the
    * small-panel paired test (monthly before/after per entity, judge
    * A-vs-B per prompt) where normal approximations are indefensible:
    * `p = min(1, 2·P(X ≤ min(k⁺,k⁻)))`, X ~ Bin(n, ½) over the n
    * non-zero diffs. The binomial CDF unrolls the integer recurrence
    * `C(n,i) = C(n,i−1)·(n−i+1)/i` inside a higher-order fold — every
    * intermediate is an exact integer below 2⁵³, so the p-value is
    * bit-identical in any engine. n > 50 → null p (the recurrence's
    * exactness bound; use [[welchAbTest]]/[[mannWhitneyU]] there — the
    * sign test is FOR small panels); n = 0 → null p. Zero diffs drop
    * (the standard convention), null diffs are excluded. Output: (key,
    * n, n_pos, n_neg, p), 6 dp.
    *
    * Scale shape: one key hash-agg; the CDF fold is a scan-stage
    * expression over ≤ 25 iterations — no shuffle beyond the agg. */
  def signTest(df: DataFrame, keyCol: String, diffCol: String): DataFrame = {
    val d = col(diffCol).cast("double")
    val red = df.where(d.isNotNull && d =!= 0.0)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        count(when(d > 0, 1)).as("n_pos"),
        count(when(d < 0, 1)).as("n_neg"))
    val k = least(col("n_pos"), col("n_neg"))
    val nD = col("n").cast("double")
    // Σ_{i=0..k} C(n,i): the fold carries (C(n,i), partial sum); i = 0
    // seeds both at 1
    val cdfSum = when(k === 0, lit(1.0)).otherwise(
      aggregate(sequence(lit(1L), k.cast("long")),
        struct(lit(1.0).as("c"), lit(1.0).as("s")),
        (acc, i) => {
          val c2 = acc.getField("c") * (nD - i.cast("double") + 1.0) /
            i.cast("double")
          struct(c2.as("c"), (acc.getField("s") + c2).as("s"))
        }).getField("s"))
    val p = least(lit(1.0), lit(2.0) * (cdfSum / pow(lit(2.0), nD)))
    red.select(col(keyCol), col("n"), col("n_pos"), col("n_neg"),
      when(col("n") >= 1 && col("n") <= 50, round(p, 6)).as("p"))
  }

  /** Per-group two-proportion z-test with Wilson score intervals — the
    * conversion-rate A/B readout ([[welchAbTest]]'s binary-outcome twin):
    * pooled-variance z on the rate difference, and per-cohort Wilson
    * intervals (the small-n/extreme-p interval that never leaves [0,1],
    * unlike the Wald CI). All counts exact LONGs from one conditional
    * hash-agg; every statistic is closed-form double arithmetic on those
    * integers, 6 dp. A missing cohort → null test columns; a degenerate
    * pool (all success or all failure) → null z, not NaN. Null
    * outcomes/foreign variants excluded. Output: (group, n_a, x_a, n_b,
    * x_b, p_a, p_a_lo, p_a_hi, p_b, p_b_lo, p_b_hi, diff, z,
    * significant).
    *
    * Scale shape: one (group, variant) hash-agg pivoted by a second
    * tiny agg — the [[welchAbTest]] contract. */
  def twoProportionTest(df: DataFrame, groupCol: String, variantCol: String,
                        successCol: String, a: String, bVariant: String,
                        z: Double = 1.959964): DataFrame = {
    val y = when(col(successCol).cast("boolean"), 1L).otherwise(0L)
    val red = df
      .where(col(successCol).isNotNull && col(variantCol).isin(a, bVariant))
      .groupBy(col(groupCol), col(variantCol).as("__var"))
      .agg(count(lit(1)).as("__n"), sum(y).as("__x"))
    def side(tag: String, c: Column): Column = max(when(col("__var") === tag, c))
    val piv = red.groupBy(col(groupCol)).agg(
      coalesce(side(a, col("__n")), lit(0L)).as("n_a"),
      coalesce(side(a, col("__x")), lit(0L)).as("x_a"),
      coalesce(side(bVariant, col("__n")), lit(0L)).as("n_b"),
      coalesce(side(bVariant, col("__x")), lit(0L)).as("x_b"))
    val na = col("n_a").cast("double")
    val xa = col("x_a").cast("double")
    val nb = col("n_b").cast("double")
    val xb = col("x_b").cast("double")
    val z2 = z * z
    def wilsonLo(x: Column, n: Column): Column =
      ((x + lit(z2 / 2.0)) - lit(z) *
        sqrt(x * (n - x) / n + lit(z2 / 4.0))) / (n + lit(z2))
    def wilsonHi(x: Column, n: Column): Column =
      ((x + lit(z2 / 2.0)) + lit(z) *
        sqrt(x * (n - x) / n + lit(z2 / 4.0))) / (n + lit(z2))
    val pool = (xa + xb) / (na + nb)
    val se0 = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    val diff = xb / nb - xa / na
    val zStat = diff / se0
    val ok = col("n_a") >= 1 && col("n_b") >= 1
    val okZ = ok && (col("x_a") + col("x_b") > 0) &&
      (col("x_a") + col("x_b") < col("n_a") + col("n_b"))
    piv.select(col(groupCol), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      when(col("n_a") >= 1, round(xa / na, 6)).as("p_a"),
      when(col("n_a") >= 1, round(wilsonLo(xa, na), 6)).as("p_a_lo"),
      when(col("n_a") >= 1, round(wilsonHi(xa, na), 6)).as("p_a_hi"),
      when(col("n_b") >= 1, round(xb / nb, 6)).as("p_b"),
      when(col("n_b") >= 1, round(wilsonLo(xb, nb), 6)).as("p_b_lo"),
      when(col("n_b") >= 1, round(wilsonHi(xb, nb), 6)).as("p_b_hi"),
      when(ok, round(diff, 6)).as("diff"),
      when(okZ, round(zStat, 6)).as("z"),
      coalesce(when(okZ, abs(zStat) > z), lit(false)).as("significant"))
  }

  /** Quantile treatment effects — WHERE in the distribution an A/B
    * treatment moved outcomes, which the mean difference
    * ([[welchAbTest]]) collapses away (a tail-only regression and a
    * uniform shift can share a mean delta): for each requested quantile,
    * the exact per-cohort order statistic (rank `min(max(⌈p·n⌉,1),n)`,
    * the [[conformalCoverage]] rank convention) and their difference.
    * Values snap to 6 dp on entry; order statistics are exact reads off
    * the cumulative distinct-value histogram, so both quantiles and the
    * QTE replay bit-identically. A missing cohort → null columns.
    * Output per quantile: (quantile, n_a, n_b, q_a, q_b, qte), 6 dp.
    *
    * Scale shape: the [[mannWhitneyU]] contract — one (value) hash-agg,
    * one cumsum window over the quantization-bounded histogram, then a
    * broadcast theta-join against the ≤ \|quantiles\| grid and a
    * min-reduce per quantile. */
  def quantileTreatmentEffect(df: DataFrame, variantCol: String,
                              valCol: String, a: String, bVariant: String,
                              quantiles: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty && quantiles.forall(p => p > 0 && p <= 1),
      s"quantileTreatmentEffect: need 0 < p <= 1, got $quantiles")
    val qs = quantiles.distinct.sorted
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df
      .where(col(valCol).isNotNull && col(variantCol).isin(a, bVariant))
      .groupBy(vm.as("__vm"))
      .agg(count(when(col(variantCol) === a, 1)).as("__ca"),
        count(when(col(variantCol) === bVariant, 1)).as("__cb"))
    val w = Window.orderBy(col("__vm"))
    val all = Window.partitionBy(lit(1))
    val cum = grid.select(col("__vm"),
      sum("__ca").over(w).as("__cuma"), sum("__cb").over(w).as("__cumb"),
      sum("__ca").over(all).as("__na"), sum("__cb").over(all).as("__nb"))
    val qGrid = explode(array(qs.map(lit): _*)).as("quantile")
    def rank(p: Column, n: Column): Column =
      least(greatest(ceil(p * n.cast("double")).cast("long"), lit(1L)), n)
    val hits = cum.select(col("*"), qGrid)
      .groupBy(col("quantile"))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        min(when(col("__cuma") >= rank(col("quantile"), col("__na")),
          col("__vm"))).as("__qa"),
        min(when(col("__cumb") >= rank(col("quantile"), col("__nb")),
          col("__vm"))).as("__qb"))
    hits.select(col("quantile"), col("n_a"), col("n_b"),
      when(col("n_a") >= 1, round(col("__qa").cast("double") / lit(1e6), 6))
        .as("q_a"),
      when(col("n_b") >= 1, round(col("__qb").cast("double") / lit(1e6), 6))
        .as("q_b"),
      when(col("n_a") >= 1 && col("n_b") >= 1,
        round((col("__qb") - col("__qa")).cast("double") / lit(1e6), 6))
        .as("qte"))
  }

  /** Trimmed-mean difference — the robust A/B effect when
    * [[welchAbTest]]'s mean is hostage to a handful of outliers: each
    * cohort drops its lowest and highest ⌊trim·n⌋ values and means the
    * rest. Runs off the cumulative distinct-value histogram: a value
    * block spanning ranks (c_before, c] contributes
    * `max(0, min(c, n−t) − max(c_before, t))` kept copies — no per-row
    * rank, no sort of the raw data. Kept mass accumulates as exact
    * decimal(38,0) micro-sums, so both trimmed means are single
    * divisions of exact integers. A cohort left empty after trimming
    * (n ≤ 2t) → null columns. Output: one row (n_a, n_b, kept_a,
    * kept_b, tmean_a, tmean_b, diff), 6 dp.
    *
    * Scale shape: the [[mannWhitneyU]] contract — one value hash-agg,
    * one cumsum window over the quantization-bounded histogram, one
    * scalar reduce. */
  def trimmedMeanDiff(df: DataFrame, variantCol: String, valCol: String,
                      a: String, bVariant: String, trim: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trim >= 0 && trim < 0.5,
      s"trimmedMeanDiff: need 0 <= trim < 0.5, got $trim")
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df
      .where(col(valCol).isNotNull && col(variantCol).isin(a, bVariant))
      .groupBy(vm.as("__vm"))
      .agg(count(when(col(variantCol) === a, 1)).as("__ca"),
        count(when(col(variantCol) === bVariant, 1)).as("__cb"))
    val w = Window.orderBy(col("__vm"))
    val all = Window.partitionBy(lit(1))
    def kept(cum: Column, c: Column, n: Column, t: Column): Column =
      greatest(lit(0L), least(cum, n - t) - greatest(cum - c, t))
    val withCum = grid.select(col("__vm"), col("__ca"), col("__cb"),
      sum("__ca").over(w).as("__cuma"), sum("__cb").over(w).as("__cumb"),
      sum("__ca").over(all).as("__na"), sum("__cb").over(all).as("__nb"))
    val ta = floor(lit(trim) * col("__na").cast("double")).cast("long")
    val tb = floor(lit(trim) * col("__nb").cast("double")).cast("long")
    val red = withCum.select(
      col("__na"), col("__nb"),
      (kept(col("__cuma"), col("__ca"), col("__na"), ta)
        .cast("decimal(38,0)") * col("__vm").cast("decimal(38,0)"))
        .as("__wa"),
      kept(col("__cuma"), col("__ca"), col("__na"), ta).as("__ka"),
      (kept(col("__cumb"), col("__cb"), col("__nb"), tb)
        .cast("decimal(38,0)") * col("__vm").cast("decimal(38,0)"))
        .as("__wb"),
      kept(col("__cumb"), col("__cb"), col("__nb"), tb).as("__kb"))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        coalesce(sum("__ka"), lit(0L)).as("kept_a"),
        coalesce(sum("__kb"), lit(0L)).as("kept_b"),
        sum("__wa").as("__sa"), sum("__wb").as("__sb"))
    val ma = col("__sa").cast("double") /
      (lit(1e6) * col("kept_a").cast("double"))
    val mb = col("__sb").cast("double") /
      (lit(1e6) * col("kept_b").cast("double"))
    red.where(col("n_a") + col("n_b") > 0)
      .select(col("n_a"), col("n_b"), col("kept_a"), col("kept_b"),
        when(col("kept_a") > 0, round(ma, 6)).as("tmean_a"),
        when(col("kept_b") > 0, round(mb, 6)).as("tmean_b"),
        when(col("kept_a") > 0 && col("kept_b") > 0, round(mb - ma, 6))
          .as("diff"))
  }

  /** Kendall's W — concordance of RANKINGS across m raters (do the
    * annotators/judges/models order the items the same way), the
    * rank-based member of the agreement family beside [[fleissKappa]]'s
    * categorical panel and [[krippendorffAlpha]]'s missing-data form:
    * `W = (12S − 3m²n(n+1)²) / (m²n(n²−1))`, S = Σ_items (Σ ranks)².
    * Strict ranks by (score desc, item asc) — the deterministic
    * tie-break replaces midranks, so every quantity is an exact integer
    * and W is one division of exact decimals (midrank ties would need
    * the correction term and a replay-fragile average). Items are
    * restricted to those scored by ALL m raters (the complete panel —
    * W is undefined on ragged panels; use [[krippendorffAlpha]] there);
    * duplicate (rater, item) rows reduce by max score. n < 2 common
    * items → null W. Output: one row — (n_raters, n_items, w), 6 dp.
    *
    * Scale shape: one (rater, item) hash-agg, a rater-partitioned rank
    * window over the common-item panel (bounded by the ITEM vocabulary
    * per rater), one item hash-agg, one scalar reduce. */
  def kendallsW(df: DataFrame, raterCol: String, itemCol: String,
                scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.core.CacheRegistry.persist(
      df.where(col(raterCol).isNotNull && col(itemCol).isNotNull &&
          col(scoreCol).isNotNull)
        .groupBy(col(raterCol).as("__r"), col(itemCol).as("__i"))
        .agg(max(col(scoreCol).cast("double")).as("__s")))
    val m = base.select(countDistinct("__r")).head().getLong(0)
    val common = base.groupBy("__i").agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") === m).select("__i")
    val ranked = base.join(broadcast(common), Seq("__i"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("__r"))
          .orderBy(col("__s").desc, col("__i").asc)))
    val s = ranked.groupBy("__i")
      .agg(sum("__rank").cast("decimal(38,0)").as("__ri"))
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(col("__ri") * col("__ri")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("__ss"))
    val nD = col("__n").cast("double")
    val mD = lit(m.toDouble)
    val w = (lit(12.0) * col("__ss").cast("double") -
      lit(3.0) * mD * mD * nD * (nD + 1.0) * (nD + 1.0)) /
      (mD * mD * nD * (nD * nD - 1.0))
    s.select(lit(m).as("n_raters"), col("__n").as("n_items"),
      when(col("__n") >= 2, round(w, 6)).as("w"))
  }

  /** Distribution-free median confidence interval — the order-statistic
    * CI (binomial argument: the number of observations below the true
    * median is Bin(n, ½)) that needs NO normality or symmetry, the
    * honest interval for the skewed latency/price/length columns every
    * mean-based CI misrepresents: ranks `⌈n/2 ± z·√n/2⌉`-ish (lower
    * `⌈n/2 − z√n/2⌉`, upper `⌊n/2 + 1 + z√n/2⌋`, clamped to [1, n]),
    * read off the cumulative distinct-value histogram as exact order
    * statistics. Values snap to 6 dp; rank arithmetic is mirrored
    * double→⌈⌉/⌊⌋ on exact integers. Output per group: (group, n,
    * median, ci_lo, ci_hi), 6 dp.
    *
    * Scale shape: the [[mannWhitneyU]] contract — one (group, value)
    * hash-agg, one cumsum window per group over the
    * quantization-bounded histogram, one group reduce. */
  def medianCi(df: DataFrame, groupCol: String, valCol: String,
               z: Double = 1.959964): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), vm.as("__vm"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__vm"))
    val all = Window.partitionBy(col(groupCol))
    val cum = grid.select(col(groupCol), col("__vm"),
      sum("__c").over(w).as("__cw"), sum("__c").over(all).as("__n"))
    val nD = col("__n").cast("double")
    def clamp(r: Column): Column =
      least(greatest(r, lit(1L)), col("__n"))
    val kMed = clamp(ceil(nD / 2.0).cast("long"))
    val kLo = clamp(ceil(nD / 2.0 - lit(z) * sqrt(nD) / 2.0).cast("long"))
    val kHi = clamp(floor(nD / 2.0 + 1.0 + lit(z) * sqrt(nD) / 2.0)
      .cast("long"))
    cum.groupBy(col(groupCol))
      .agg(max("__n").as("n"),
        min(when(col("__cw") >= kMed, col("__vm"))).as("__med"),
        min(when(col("__cw") >= kLo, col("__vm"))).as("__lo"),
        min(when(col("__cw") >= kHi, col("__vm"))).as("__hi"))
      .select(col(groupCol), col("n"),
        round(col("__med").cast("double") / lit(1e6), 6).as("median"),
        round(col("__lo").cast("double") / lit(1e6), 6).as("ci_lo"),
        round(col("__hi").cast("double") / lit(1e6), 6).as("ci_hi"))
  }

  /** Jarque–Bera normality test per group — the gate BEFORE anyone
    * trusts a z-interval or a ±2σ outlier rule on a column: from the
    * population skewness S and kurtosis K,
    * `JB = n/6·(S² + (K−3)²/4) ~ χ²₂` under normality (95% critical
    * value 5.991465). Moments ride raw double power sums with the final
    * statistics 6 dp-rounded (the [[welchAbTest]] sum-order convention —
    * ulps vanish into the quantum); the rejection compares the unrounded
    * JB identically in both engines. Groups under 4 rows or with zero
    * variance → null statistics. Output per group: (group, n, skewness,
    * kurtosis, jb, reject_normal), 6 dp.
    *
    * Scale shape: ONE (group) hash-agg of five power-sum partials
    * (map-side combine, mergeable — the q94 moment family), closed-form
    * arithmetic after. */
  def jarqueBera(df: DataFrame, groupCol: String,
                 valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    val red = df.where(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(v).as("__s1"),
        sum(v * v).as("__s2"), sum(v * v * v).as("__s3"),
        sum(v * v * v * v).as("__s4"))
    val nD = col("n").cast("double")
    val m = col("__s1") / nD
    val m2 = col("__s2") / nD - m * m
    val m3 = col("__s3") / nD - lit(3.0) * m * (col("__s2") / nD) +
      lit(2.0) * m * m * m
    val m4 = col("__s4") / nD - lit(4.0) * m * (col("__s3") / nD) +
      lit(6.0) * m * m * (col("__s2") / nD) - lit(3.0) * m * m * m * m
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    val jb = nD / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    val ok = col("n") >= 4 && m2 > 0
    red.select(col(groupCol), col("n"),
      when(ok, round(skew, 6)).as("skewness"),
      when(ok, round(kurt, 6)).as("kurtosis"),
      when(ok, round(jb, 6)).as("jb"),
      coalesce(when(ok, jb > 5.991465), lit(false)).as("reject_normal"))
  }

  /** Simpson's-paradox check on a two-cohort rate comparison — the
    * mixture-bias alarm for every pooled dashboard number: does the
    * POOLED rate difference point the same way as the per-group
    * differences, or is the aggregate sign an artifact of group
    * composition (the classic kidney-stone / admissions reversal)?
    * `reversal` is strict: every group with both cohorts present
    * disagrees with the pooled sign. All rates are divisions of exact
    * LONG counts; signs compare on the unrounded quotients (identical
    * integers → identical IEEE quotients in any engine). Groups missing
    * a cohort are excluded from the verdict (no within-group comparison
    * exists). Output: one row — (n_groups, pooled_p_a, pooled_p_b,
    * pooled_diff, groups_b_better, groups_a_better, groups_tied,
    * reversal), 6 dp.
    *
    * Scale shape: one (group, variant) hash-agg, one group-level pivot,
    * one scalar reduce — the [[welchAbTest]] contract with a second
    * tiny reduce. */
  def simpsonCheck(df: DataFrame, groupCol: String, variantCol: String,
                   successCol: String, a: String,
                   bVariant: String): DataFrame = {
    val y = when(col(successCol).cast("boolean"), 1L).otherwise(0L)
    val red = df
      .where(col(successCol).isNotNull && col(variantCol).isin(a, bVariant))
      .groupBy(col(groupCol), col(variantCol).as("__var"))
      .agg(count(lit(1)).as("__n"), sum(y).as("__x"))
    def side(tag: String, c: Column): Column = max(when(col("__var") === tag, c))
    val piv = red.groupBy(col(groupCol)).agg(
      coalesce(side(a, col("__n")), lit(0L)).as("__na"),
      coalesce(side(a, col("__x")), lit(0L)).as("__xa"),
      coalesce(side(bVariant, col("__n")), lit(0L)).as("__nb"),
      coalesce(side(bVariant, col("__x")), lit(0L)).as("__xb"))
    val both = col("__na") >= 1 && col("__nb") >= 1
    // when-guarded: ANSI mode turns the cohortless group's 0-denominator
    // into DIVIDE_BY_ZERO before the count filters ever run
    val gdiff = when(both,
      col("__xb").cast("double") / col("__nb").cast("double") -
        col("__xa").cast("double") / col("__na").cast("double"))
    val tot = piv.agg(
      count(when(both, 1)).as("n_groups"),
      coalesce(sum("__na"), lit(0L)).as("__tna"),
      coalesce(sum("__xa"), lit(0L)).as("__txa"),
      coalesce(sum("__nb"), lit(0L)).as("__tnb"),
      coalesce(sum("__xb"), lit(0L)).as("__txb"),
      count(when(both && gdiff > 0, 1)).as("groups_b_better"),
      count(when(both && gdiff < 0, 1)).as("groups_a_better"),
      count(when(both && gdiff === 0.0, 1)).as("groups_tied"))
    val pa = col("__txa").cast("double") / col("__tna").cast("double")
    val pb = col("__txb").cast("double") / col("__tnb").cast("double")
    val pooled = pb - pa
    val okPool = col("__tna") >= 1 && col("__tnb") >= 1
    val reversal = (pooled > 0 && col("groups_b_better") === 0 &&
        col("groups_a_better") > 0) ||
      (pooled < 0 && col("groups_a_better") === 0 &&
        col("groups_b_better") > 0)
    tot.select(col("n_groups"),
      when(col("__tna") >= 1, round(pa, 6)).as("pooled_p_a"),
      when(col("__tnb") >= 1, round(pb, 6)).as("pooled_p_b"),
      when(okPool, round(pooled, 6)).as("pooled_diff"),
      col("groups_b_better"), col("groups_a_better"), col("groups_tied"),
      coalesce(when(okPool && col("n_groups") > 0, reversal), lit(false))
        .as("reversal"))
  }

  /** Per-group exponential goodness-of-fit — the "is this arrival
    * process actually Poisson" verdict over inter-arrival gaps (the
    * modeling assumption behind every `rate × time` capacity estimate
    * and the q88-style spike detectors): one-sample KS of the values
    * against Exp(λ̂ = 1/mean), with the step function checked on BOTH
    * sides of each jump (`max(|c/n − F|, |c_prev/n − F|)` — the sup of a
    * càdlàg difference lives at a step edge). Values snap to 6 dp; the
    * mean is a division of exact integers; F(v) = 1 − e^{−λv} is
    * mirrored double arithmetic (the [[graft.ops.Learn.logisticGd]]
    * transcendental convention: engine libm ulps are far below the 6 dp
    * output quantum). The 95% rejection uses the standard one-sample
    * critical value `1.358/√n` — CONSERVATIVE under an estimated λ
    * (the Lilliefors-corrected threshold is smaller, so exceeding this
    * one implies rejection under it too); a non-rejection is therefore
    * weaker evidence than usual, documented by the column name.
    * Negative values are excluded (gaps), all-zero groups → null λ.
    * Output per group: (group, n, mean, lambda, ks_d,
    * reject_95_conservative), 6 dp.
    *
    * Scale shape: the [[mannWhitneyU]] contract — one (group, value)
    * hash-agg, one cumsum window per group over the
    * quantization-bounded histogram, one group reduce. */
  def exponentialGof(df: DataFrame, groupCol: String,
                     valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df
      .where(col(valCol).isNotNull && col(valCol).cast("double") >= 0)
      .groupBy(col(groupCol), vm.as("__vm"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__vm"))
    val all = Window.partitionBy(col(groupCol))
    val cum = grid.select(col(groupCol), col("__vm"), col("__c"),
      sum("__c").over(w).as("__cw"),
      sum(col("__c").cast("decimal(38,0)") * col("__vm")).over(all)
        .as("__sv"),
      sum("__c").over(all).as("__n"))
    val nD = col("__n").cast("double")
    val mean = col("__sv").cast("double") / lit(1e6) / nD
    val lambda = lit(1.0) / mean
    val fv = lit(1.0) - exp(lit(-1.0) * lambda *
      (col("__vm").cast("double") / lit(1e6)))
    val dRow = greatest(
      abs(col("__cw").cast("double") / nD - fv),
      abs((col("__cw") - col("__c")).cast("double") / nD - fv))
    val red = cum
      .select(col(groupCol), col("__n"), mean.as("__mean"),
        when(col("__sv") > 0, dRow).as("__d"))
      .groupBy(col(groupCol))
      .agg(max("__n").as("n"), max("__mean").as("__mean"),
        max("__d").as("__dmax"))
    val ks = col("__dmax")
    red.select(col(groupCol), col("n"), round(col("__mean"), 6).as("mean"),
      when(col("__mean") > 0, round(lit(1.0) / col("__mean"), 6))
        .as("lambda"),
      when(col("__mean") > 0, round(ks, 6)).as("ks_d"),
      coalesce(when(col("__mean") > 0,
        ks > lit(1.358) / sqrt(col("n").cast("double"))), lit(false))
        .as("reject_95_conservative"))
  }

  /** Benjamini–Hochberg FDR control over a family of p-values — the
    * multiple-testing gate every per-key test family here ([[signTest]],
    * [[welchAbTest]] grids) needs before anyone acts on "47 of 1000
    * suppliers changed": rank p ascending, reject ranks ≤ the largest r
    * with `p_(r) ≤ r·q/m`. The threshold compare runs on exact integers
    * — `p_micro·m ≤ r·q_micro` — so the rejection set is replay-stable;
    * ties in p break by key (a total order). Null p-values are excluded
    * from the family (they don't count toward m). Output: (key, p,
    * rank, rejected).
    *
    * Scale shape: one window pass over the p-value table — bounded by
    * the HYPOTHESIS count (one row per key), not the data; the
    * single-partition window is exact-by-contract like
    * [[equiDepthHistogram]], sized m ≤ |keys|. */
  def bhFdr(pvals: DataFrame, keyCol: String, pCol: String,
            q: Double): DataFrame = {
    require(q > 0 && q < 1, s"bhFdr: need 0 < q < 1, got $q")
    import org.apache.spark.sql.expressions.Window
    val qMicro = math.round(q * 1e6)
    val base = pvals.where(col(pCol).isNotNull)
      .select(col(keyCol), col(pCol).as("p"),
        round(col(pCol).cast("double") * lit(1e6)).cast("long").as("__pm"))
    val w = Window.orderBy(col("__pm"), col(keyCol))
    val all = Window.partitionBy(lit(1))
    val ranked = base
      .withColumn("rank", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(all))
      .withColumn("__flag",
        col("__pm") * col("__m") <= col("rank") * lit(qMicro))
    val cutoff = max(when(col("__flag"), col("rank"))).over(all)
    ranked.withColumn("rejected", col("rank") <= coalesce(cutoff, lit(0)))
      .select(col(keyCol), col("p"), col("rank"), col("rejected"))
  }

  // ---- k-group tests (the ≥3-cohort generalization of the pair tests) ----

  /** Shared ANOVA tail over per-(group, cohort) micro-integer partials
    * `(group, __n LONG, __s dec(38,0), __s2 dec(38,0))`: per group,
    * between/within sums of squares, the F statistic, and η². SSB comes
    * from per-cohort mean deviations against the window grand mean; SSW
    * from `s2_c − s_c²/n_c`. Both are per-cohort IEEE scalars (identical
    * in Spark and the oracle) SNAPPED to decimal(38,0) micro² integers
    * before the order-sensitive cohort sum (the Bradley–Terry rule), so
    * hash-agg ordering cannot move the 6th dp. Exact to the snap while
    * per-cohort micro mass stays under 2^53 (~9·10⁹ value-units); beyond
    * that, still deterministic, no longer bit-exact. SS is reported in
    * MILLIONS of value-units² (`ss_*_m`): at raw SS magnitude (1e11+) a
    * 6-dp round sits below the double's ulp, so engine-specific
    * decimal→double cast differences would surface verbatim; at /1e6 the
    * rounding grid (1e-6) is ~500× the ulp noise and absorbs them. */
  private def anovaTail(partials: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy(col(groupCol))
    val nD = col("__n").cast("double")
    val mCoh = col("__s").cast("double") / nD
    val mAll = sum("__s").over(wg).cast("double") /
      sum("__n").over(wg).cast("double")
    val dev = mCoh - mAll
    val staged = partials.select(col(groupCol), col("__n"),
      round(nD * dev * dev).cast("decimal(38,0)").as("__bt"),
      round(col("__s2").cast("double") - mCoh * col("__s").cast("double"))
        .cast("decimal(38,0)").as("__wt"))
    val red = staged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("k_cohorts"), sum("__n").as("n"),
        sum("__bt").as("__B"), sum("__wt").as("__W"))
    val ssb = greatest(col("__B").cast("double") / lit(1e12), lit(0.0))
    val ssw = greatest(col("__W").cast("double") / lit(1e12), lit(0.0))
    val k = col("k_cohorts").cast("double")
    val bigN = col("n").cast("double")
    val f = (ssb / (k - 1.0)) / (ssw / (bigN - k))
    val ok = col("k_cohorts") >= 2 && col("n") > col("k_cohorts")
    red.select(col(groupCol), col("k_cohorts"), col("n"),
      round(ssb / lit(1e6), 6).as("ss_between_m"),
      round(ssw / lit(1e6), 6).as("ss_within_m"),
      when(ok && ssw > 0, round(f, 6)).as("f_stat"),
      when(ok && ssb + ssw > 0, round(ssb / (ssb + ssw), 6)).as("eta_sq"))
  }

  /** Per-group one-way ANOVA across ALL cohort levels — the k-sample
    * generalization [[welchAbTest]] and [[effectSize]] stop short of: one
    * F statistic answering "does ANY cohort mean differ?" before k·(k−1)/2
    * pairwise tests inflate the false-positive rate, plus η² (SSB/SST),
    * the share of variance the cohort labels explain. Values snap to 6 dp
    * micro-integers; per-cohort Σ/Σ² ride decimal(38,0); a null cohort is
    * its own cohort (house rule). Output: (group, k_cohorts, n,
    * ss_between_m, ss_within_m, f_stat, eta_sq), 6 dp, SS in millions of
    * value-units²; a group with one cohort or zero within-variance yields
    * null F.
    *
    * Scale shape: one (group, cohort) hash-agg of count/Σ/Σ² partials →
    * a cohort-count-bounded window + hash-agg. One scan, one shuffle on
    * the data; everything after is bounded by |groups|·|cohorts|. */
  def anovaF(df: DataFrame, groupCol: String, cohortCol: String,
             valCol: String): DataFrame = {
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val vd = vm.cast("decimal(38,0)")
    val partials = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(cohortCol))
      .agg(count(lit(1)).as("__n"), sum(vd).as("__s"),
        sum(vd * vd).as("__s2"))
    anovaTail(partials, groupCol)
  }

  /** Per-group Kruskal–Wallis H — the rank-based k-sample test
    * ([[mannWhitneyU]]'s ≥3-cohort generalization, [[anovaF]]'s
    * distribution-free twin): detects ANY location shift across cohorts
    * without assuming normality or equal variances, which on heavy-tailed
    * value columns (latencies, revenues) is the honest default. Average
    * ranks come off the per-group distinct-value histogram: a value's
    * doubled average rank `2·cumBefore + t + 1` is an exact integer, so
    * per-cohort doubled rank sums R2_c accumulate as exact decimal(38,0);
    * the per-cohort term `R2_c²/(4·n_c·N·(N+1))` is an IEEE scalar
    * snapped to a micro-integer before the cohort sum (the [[anovaTail]]
    * rule). The tie correction `1 − Σ(t³−t)/(N³−N)` uses exact integer
    * numerators. Output: (group, k_cohorts, n, df, h, h_corrected), 6 dp;
    * one-cohort groups and all-tied groups yield nulls.
    *
    * Scale shape: the [[mannWhitneyU]] contract — one (group, cohort,
    * value) hash-agg, then windows over each group's
    * quantization-bounded distinct-value histogram, then one hash-agg.
    * One scan, one data shuffle. */
  def kruskalWallis(df: DataFrame, groupCol: String, cohortCol: String,
                    valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(cohortCol), vm.as("__vm"))
      .agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("__vm"))
    val wVal = Window.partitionBy(col(groupCol), col("__vm"))
    // default RANGE frame: cumIncl includes every cohort row tied at __vm
    val cumIncl = sum("__c").over(wv).cast("decimal(38,0)")
    val tAt = sum("__c").over(wVal).cast("decimal(38,0)")
    val firstAt = row_number()
      .over(wVal.orderBy(col(cohortCol).asc_nulls_first)) === 1
    val staged = grid.select(col(groupCol), col(cohortCol), col("__c"),
      (col("__c").cast("decimal(38,0)") *
        ((cumIncl - tAt) * 2 + tAt + 1)).as("__r2"),
      when(firstAt, tAt * tAt * tAt - tAt)
        .otherwise(lit(0).cast("decimal(38,0)")).as("__tie"))
    val perCoh = staged.groupBy(col(groupCol), col(cohortCol))
      .agg(sum("__c").as("__n"), sum("__r2").as("__R2"),
        sum("__tie").as("__T"))
    val wg = Window.partitionBy(col(groupCol))
    val bigN = sum("__n").over(wg).cast("double")
    val r2d = col("__R2").cast("double")
    val term = round(r2d * r2d /
      (lit(4.0) * col("__n").cast("double") * bigN * (bigN + 1.0)) *
      lit(1e6)).cast("decimal(38,0)")
    val red = perCoh
      .select(col(groupCol), col("__n"), col("__T"), term.as("__tt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k_cohorts"), sum("__n").as("n"),
        sum("__tt").as("__TT"), sum("__T").as("__ties"))
    val nD = col("n").cast("double")
    val h = lit(12.0) * col("__TT").cast("double") / lit(1e6) -
      lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) -
      col("__ties").cast("double") / (nD * nD * nD - nD)
    val ok = col("k_cohorts") >= 2 && col("n") > col("k_cohorts")
    red.select(col(groupCol), col("k_cohorts"), col("n"),
      when(ok, (col("k_cohorts") - 1).cast("long")).as("df"),
      when(ok, round(h, 6)).as("h"),
      when(ok && corr > 0, round(h / corr, 6)).as("h_corrected"))
  }

  /** Per-group Brown–Forsythe (median-based Levene) test — variance
    * homogeneity across cohorts, the PRECONDITION audit for [[anovaF]]'s
    * pooled within-variance and [[effectSize]]'s pooled SD: one-way
    * ANOVA on |value − cohort median|, with the median (robust center)
    * making the test itself heavy-tail-safe. The cohort median is the
    * exact order statistic `min vm with 2·cum ≥ n` (lower median on even
    * n) read off the cohort's cumulative distinct-value histogram;
    * absolute deviations are exact micro-integers feeding the
    * [[anovaTail]] snap rule. Output: (group, k_cohorts, n, ss_between_m,
    * ss_within_m, f_stat, eta_sq) where F is on the deviations — large F
    * = unequal spreads. 6 dp, SS in millions of deviation-units².
    *
    * Scale shape: one (group, cohort, value) hash-agg, windows over each
    * cohort's quantization-bounded histogram (median + deviations on the
    * grid, never a second data pass), one hash-agg. One scan, one data
    * shuffle. */
  def brownForsythe(df: DataFrame, groupCol: String, cohortCol: String,
                    valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val grid = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(cohortCol), vm.as("__vm"))
      .agg(count(lit(1)).as("__c"))
    val wc = Window.partitionBy(col(groupCol), col(cohortCol))
      .orderBy(col("__vm"))
    val staged = grid.select(col(groupCol), col(cohortCol), col("__vm"),
      col("__c"), sum("__c").over(wc).as("__cum"),
      sum("__c").over(Window.partitionBy(col(groupCol), col(cohortCol)))
        .as("__nc"))
    val med = min(when(col("__cum") * 2 >= col("__nc"), col("__vm")))
      .over(Window.partitionBy(col(groupCol), col(cohortCol)))
    val withMed = staged.select(col(groupCol), col(cohortCol), col("__c"),
      abs(col("__vm") - med).cast("decimal(38,0)").as("__dev"))
    val partials = withMed.groupBy(col(groupCol), col(cohortCol))
      .agg(sum("__c").as("__n"),
        sum(col("__c").cast("decimal(38,0)") * col("__dev")).as("__s"),
        sum(col("__c").cast("decimal(38,0)") * col("__dev") * col("__dev"))
          .as("__s2"))
    anovaTail(partials, groupCol)
  }

  // ---- declarative expectation suite (the metric/threshold form) ----

  /** A verification-suite check: unlike [[Rule]] (a row-level predicate
    * whose violations [[auditCounts]] counts), an `Expectation` compares
    * an OBSERVED TABLE METRIC against a threshold — the Deequ-style
    * contract a pipeline gates a publish on. */
  sealed trait Expectation
  object Expect {
    /** Non-null rate of `colName` ≥ `minRate`. */
    final case class Complete(colName: String, minRate: Double = 1.0)
      extends Expectation
    /** Share of NON-NULL values inside [lo, hi] ≥ `minRate`. */
    final case class ValuesBetween(colName: String, lo: Double, hi: Double,
                                   minRate: Double = 1.0) extends Expectation
    /** Share of NON-NULL values matching `regex` (find-anywhere, Spark
      * `rlike` semantics — anchor with ^$ for full match) ≥ `minRate`. */
    final case class MatchesRegex(colName: String, regex: String,
                                  minRate: Double = 1.0) extends Expectation
    /** Share of NON-NULL values in `allowed` ≥ `minRate`. */
    final case class ValuesIn(colName: String, allowed: Seq[String],
                              minRate: Double = 1.0) extends Expectation
    /** Exact distinct-to-present ratio must be 1 (no duplicate values;
      * nulls don't count as duplicates). */
    final case class Unique(colName: String) extends Expectation
    /** Table row count inside [lo, hi]. */
    final case class RowCountBetween(lo: Long, hi: Long) extends Expectation
    /** Mean of `colName` (6-dp micro-snapped sums) inside [lo, hi]. */
    final case class MeanBetween(colName: String, lo: Double, hi: Double)
      extends Expectation
  }

  /** Declarative data-quality verification suite — evaluate a set of
    * [[Expectation]]s against a table in as few passes as the checks
    * allow and emit one row per check: `(check_id, check_name, col_name,
    * observed, lo, hi, passed)`. This is the publish gate next to
    * [[auditCounts]]' violation counter: `observed` is the metric
    * (a rate, a ratio, a count, a mean), `lo`/`hi` the contract, and
    * `passed` the boolean an orchestrator alerts on. Rates are exact
    * integer counts through ONE IEEE division (engine-identical);
    * means ride 6-dp micro-integer decimal sums; `passed` is decided on
    * the UNROUNDED metric and a check whose metric is undefined (empty
    * column) FAILS — a gate that can't observe its metric must not pass.
    *
    * Scale shape: every scan-stage check (completeness, range, regex,
    * set, row count, mean) folds into ONE aggregate pass over the table
    * (map-side partials, single-row result). Each [[Expect.Unique]]
    * adds its own column-pruned `count distinct` pass (exact, its own
    * hash-agg on that column — kept out of the shared pass so the
    * shared pass never pays Expand). The single-row results cross-join
    * (no data shuffle) and unpivot to ≤ |checks| literal rows. */
  def expectations(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    import Expect._
    require(checks.nonEmpty, "expectations: provide at least one check")
    val have = df.columns.toSet
    def need(c: String): Unit = require(have.contains(c),
      s"expectations: no such column '$c'")
    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    checks.zipWithIndex.foreach { case (e, i) => e match {
      case Complete(c, _) => need(c)
        aggs += count(col(c)).as(s"__p$i")
      case ValuesBetween(c, lo, hi, _) => need(c)
        aggs += count(col(c)).as(s"__p$i")
        aggs += count(when(col(c).cast("double").between(lo, hi), 1))
          .as(s"__q$i")
      case MatchesRegex(c, re, _) => need(c)
        aggs += count(col(c)).as(s"__p$i")
        aggs += count(when(col(c).rlike(re), 1)).as(s"__q$i")
      case ValuesIn(c, allowed, _) => need(c)
        require(allowed.nonEmpty, s"expectations: empty allowed set for '$c'")
        aggs += count(col(c)).as(s"__p$i")
        aggs += count(when(col(c).isin(allowed: _*), 1)).as(s"__q$i")
      case MeanBetween(c, _, _) => need(c)
        aggs += count(col(c)).as(s"__p$i")
        aggs += sum(round(col(c).cast("double") * lit(1e6))
          .cast("decimal(38,0)")).as(s"__q$i")
      case Unique(c) => need(c)
      case RowCountBetween(lo, hi) =>
        require(lo <= hi, s"expectations: row count lo $lo > hi $hi")
    }}
    val allAggs = count(lit(1)).as("__n") +: aggs.toSeq
    val scan = df.agg(allAggs.head, allAggs.tail: _*)
    val uniquePasses = checks.zipWithIndex.collect { case (Unique(c), i) =>
      df.agg(count(col(c)).as(s"__p$i"), countDistinct(col(c)).as(s"__q$i"))
    }
    val combined = uniquePasses.foldLeft(scan)(_ crossJoin _)
    def rate(i: Int): Column =
      when(col(s"__p$i") > 0,
        col(s"__q$i").cast("double") / col(s"__p$i").cast("double"))
    def row(i: Int, name: String, colName: Option[String], obs: Column,
            lo: Option[Double], hi: Option[Double], pass: Column) =
      combined.select(lit(i.toLong).as("check_id"), lit(name).as("check_name"),
        colName.map(lit(_)).getOrElse(lit(null)).cast("string").as("col_name"),
        round(obs, 6).as("observed"),
        lo.map(lit(_)).getOrElse(lit(null)).cast("double").as("lo"),
        hi.map(lit(_)).getOrElse(lit(null)).cast("double").as("hi"),
        coalesce(pass, lit(false)).as("passed"))
    val rows = checks.zipWithIndex.map { case (e, i) => e match {
      case Complete(c, r) =>
        val obs = when(col("__n") > 0,
          col(s"__p$i").cast("double") / col("__n").cast("double"))
        row(i, s"complete($c)", Some(c), obs, Some(r), None, obs >= r)
      case ValuesBetween(c, lo, hi, r) =>
        row(i, s"between($c)", Some(c), rate(i), Some(r), None, rate(i) >= r)
      case MatchesRegex(c, _, r) =>
        row(i, s"matches($c)", Some(c), rate(i), Some(r), None, rate(i) >= r)
      case ValuesIn(c, _, r) =>
        row(i, s"in_set($c)", Some(c), rate(i), Some(r), None, rate(i) >= r)
      case Unique(c) =>
        val obs = rate(i)
        row(i, s"unique($c)", Some(c), obs, Some(1.0), None,
          col(s"__p$i") > 0 && col(s"__q$i") === col(s"__p$i"))
      case RowCountBetween(lo, hi) =>
        row(i, "row_count", None, col("__n").cast("double"),
          Some(lo.toDouble), Some(hi.toDouble),
          col("__n") >= lo && col("__n") <= hi)
      case MeanBetween(c, lo, hi) =>
        val m = when(col(s"__p$i") > 0, col(s"__q$i").cast("double") /
          (lit(1e6) * col(s"__p$i").cast("double")))
        row(i, s"mean($c)", Some(c), m, Some(lo), Some(hi),
          m >= lo && m <= hi)
    }}
    rows.reduce(_ unionByName _)
  }

  /** Per-group difference-in-differences — the quasi-experimental
    * estimator for a rollout WITHOUT random assignment (feature shipped
    * to one cohort at a date; the control cohort absorbs the secular
    * trend): `DiD = (m_t,post − m_t,pre) − (m_c,post − m_c,pre)` over the
    * four (treated × post) cell means, with the Welch-style standard
    * error `√Σ s²ᵢ/nᵢ` across the four cells and the z score —
    * [[welchAbTest]]'s two-period generalization. Cell sums ride exact
    * 6-dp micro-integer decimals (Σ and Σ², order-free), so every mean
    * and variance is identical on any engine; the tail is one IEEE
    * expression, 6 dp. A group missing any of the four cells, or with
    * any cell n < 2 for the SE, reports null did/se/z. Null treat/post
    * flags or values are dropped (they assign to no cell). Output:
    * (group, n, m_treat_pre, m_treat_post, m_ctrl_pre, m_ctrl_post,
    * did, se, z).
    *
    * Scale shape: ONE scan, one (group) hash-agg of 12 conditional
    * partials (4 cells × n/Σ/Σ², map-side combine); nothing after the
    * reduction touches raw rows. */
  def didEstimator(df: DataFrame, groupCol: String, treatCol: String,
                   postCol: String, valCol: String): DataFrame = {
    val vm = round(col(valCol).cast("double") * lit(1e6))
      .cast("decimal(38,0)")
    val base = df.where(col(valCol).isNotNull && col(treatCol).isNotNull &&
      col(postCol).isNotNull)
    def cell(t: Boolean, p: Boolean): Column =
      col(treatCol) === t && col(postCol) === p
    def tag(t: Boolean, p: Boolean): String =
      (if (t) "t" else "c") + (if (p) "1" else "0")
    val cells = for { t <- Seq(true, false); p <- Seq(true, false) } yield (t, p)
    val aggs = cells.flatMap { case (t, p) =>
      val s = tag(t, p)
      Seq(count(when(cell(t, p), 1)).as(s"__n$s"),
        sum(when(cell(t, p), vm)).as(s"__s$s"),
        sum(when(cell(t, p), vm * vm)).as(s"__s2$s"))
    }
    val red = base.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    def n(s: String): Column = col(s"__n$s").cast("double")
    def m(s: String): Column = col(s"__s$s").cast("double") / n(s) / lit(1e6)
    def v(s: String): Column =
      (col(s"__s2$s").cast("double") -
        col(s"__s$s").cast("double") * col(s"__s$s").cast("double") / n(s)) /
        (n(s) - 1.0) / lit(1e12)
    val tags = Seq("t1", "t0", "c1", "c0")
    val allPresent = tags.map(s => col(s"__n$s") > 0).reduce(_ && _)
    val seOk = tags.map(s => col(s"__n$s") >= 2).reduce(_ && _)
    val did = (m("t1") - m("t0")) - (m("c1") - m("c0"))
    val se = sqrt(tags.map(s => v(s) / n(s)).reduce(_ + _))
    red.select(col(groupCol),
      tags.map(s => col(s"__n$s")).reduce(_ + _).as("n"),
      when(col("__nt0") > 0, round(m("t0"), 6)).as("m_treat_pre"),
      when(col("__nt1") > 0, round(m("t1"), 6)).as("m_treat_post"),
      when(col("__nc0") > 0, round(m("c0"), 6)).as("m_ctrl_pre"),
      when(col("__nc1") > 0, round(m("c1"), 6)).as("m_ctrl_post"),
      when(allPresent, round(did, 6)).as("did"),
      when(seOk && se > 0, round(se, 6)).as("se"),
      when(seOk && se > 0, round(did / se, 6)).as("z"))
  }
}
