package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics: conversion funnels and retention cohorts —
  * the marts an events table feeds once sessionization
  * ([[graft.streaming.EventStream]]) exists.
  *
  * Scale shape: both operators are groupBy-on-user / groupBy-on-cohort
  * hash aggregations with map-side partials; the funnel's step join
  * shuffles both sides on the user key once (the A-side is one row per
  * converted user — far smaller than the event log). No windows over the
  * full log, no self-joins on time ranges.
  */
object EventAnalytics {

  /** Two-step conversion funnel: per user, the FIRST `stepA` event and
    * the first `stepB` event STRICTLY AFTER it. One row per user who did
    * `stepA`; `converted` = whether a qualifying `stepB` followed. The
    * strict ordering ("B after A") is what a naive
    * "did-both-event-types" join gets wrong. */
  def twoStepFunnel(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, stepA: String, stepB: String): DataFrame = {
    // persisted: the step-B qualifier and the final outcome join both
    // consume the first-A table — uncached, the step-A event scan + agg
    // would run twice
    val a = graft.core.CacheRegistry.persist(
      events.where(col(typeCol) === stepA)
        .groupBy(userCol).agg(min(tsCol).as("ts_a")))
    val b = events.where(col(typeCol) === stepB)
      .join(a, userCol)
      .where(col(tsCol) > col("ts_a"))
      .groupBy(userCol).agg(min(tsCol).as("ts_b"))
    a.join(b, Seq(userCol), "left")
      .withColumn("converted", col("ts_b").isNotNull)
  }

  /** k-step conversion funnel — [[twoStepFunnel]] generalized: per user,
    * step i+1 must occur STRICTLY after the chosen step-i event (the
    * greedy earliest-qualifying choice, which is optimal: taking the
    * earliest step-i event can only enlarge step-i+1's candidate set).
    * Repeated step types are legal (`view → view` needs two distinct
    * instants). Output: one row per step reached by ≥1 user — (step,
    * step_type, n_users reaching that depth, conv_from_first 6 dp).
    *
    * Scale shape: the type filter prunes the scan to funnel events only;
    * ONE user-keyed exchange builds each user's sorted (ts) sequence
    * (array bounded by the user's funnel-event count); the fold to a
    * depth is a scan-stage HOF; the step explode is ≤ k rows per user
    * into a tiny hash-agg. The step-1 denominator is an agg of the agg,
    * broadcast back — no single-partition window. */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnelSteps: need >= 2 steps, got ${steps.size}")
    val stepsArr = array(steps.map(lit): _*)
    val k = steps.size
    val depths = events
      .where(col(typeCol).isInCollection(steps.distinct))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).cast("timestamp").as("ts"), col(typeCol).as("tp")))).as("__seq"))
      .select(aggregate(col("__seq"),
        struct(lit(0).as("depth"), lit(null).cast("timestamp").as("last")),
        (st, e) => when(
          st.getField("depth") < k &&
            e.getField("tp") === element_at(stepsArr, st.getField("depth") + 1) &&
            (st.getField("last").isNull || e.getField("ts") > st.getField("last")),
          struct((st.getField("depth") + 1).as("depth"),
            e.getField("ts").as("last")))
          .otherwise(st),
        st => st.getField("depth")).as("__depth"))
      .where(col("__depth") >= 1)
    // persisted: the per-step explode and the step-1 denominator both
    // consume the per-user depths — uncached, the event scan + user agg
    // would run twice
    val cached = graft.core.CacheRegistry.persist(depths)
    val first = cached.agg(count(lit(1)).as("__n_first"))
    cached
      .select(explode(sequence(lit(1), col("__depth"))).as("step"))
      .groupBy(col("step").cast("long").as("step"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(first))
      .select(col("step"),
        element_at(stepsArr, col("step").cast("int")).as("step_type"),
        col("n_users"),
        round(col("n_users").cast("double") / col("__n_first"), 6)
          .as("conv_from_first"))
  }

  /** Per-user exponentially-weighted moving average of `valueCol` over
    * the (ts, id)-ordered event sequence: `s₁ = x₁`,
    * `sᵢ = α·xᵢ + (1−α)·sᵢ₋₁` — the recency-weighted behavioral feature
    * that [[userSnapshot]]'s plain mean can't give. Null values are
    * excluded (an EWMA over observed values). The fold is SEQUENTIAL
    * IEEE arithmetic in a fixed order, so an engine replaying the same
    * recurrence (e.g. DuckDB `list_reduce`) reproduces it bit-for-bit;
    * prefer an exactly-representable α (0.25, 0.5) when cross-engine
    * hashes matter. Output: (user, n_events, ewma 6 dp).
    *
    * Scale shape: ONE user-keyed exchange builds the sorted sequence
    * (array bounded by the user's event count); the fold is a scan-stage
    * HOF. A user with unbounded history should be windowed upstream
    * ([[rollingFeatures]]' trailing-n) before folding. */
  def ewmaSnapshot(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ewmaSnapshot: need 0 < alpha <= 1, got $alpha")
    events.where(col(valueCol).isNotNull)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).as("id"),
        col(valueCol).cast("double").as("x")))).as("__seq"))
      .select(col(userCol),
        size(col("__seq")).cast("long").as("n_events"),
        round(aggregate(col("__seq"),
          struct(lit(0).as("cnt"), lit(0.0).as("s")),
          (st, e) => struct(
            (st.getField("cnt") + 1).as("cnt"),
            when(st.getField("cnt") === 0, e.getField("x"))
              .otherwise(lit(alpha) * e.getField("x") +
                lit(1 - alpha) * st.getField("s")).as("s")),
          st => st.getField("s")), 6).as("ewma"))
  }

  /** Event-transition matrix (first-order Markov counts): for every
    * consecutive event pair within a user's timeline, count (from → to).
    * Same-timestamp ties break on `idCol`, so the sequence — and the
    * counts — are total-ordered and deterministic. One partitioned window
    * pass (shuffles on the user key) + one partial-agg shuffle on the
    * tiny (from, to) key. */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Inter-arrival gap statistics per event type: for each event, the
    * time since the same USER's previous event (any type), aggregated to
    * count / mean / exact p50 / p90 per the event's type. Gaps are exact
    * integer MICROSECONDS (no float time arithmetic); the mean is emitted
    * UNROUNDED as the exact-integer-sum quotient (one division of
    * identical integer operands is bit-identical on every engine, while
    * round(·, 6) at 1e10 µs magnitude maps to different ulps per engine);
    * only the percentiles are rounded to 6 dp. Same
    * window shuffle as [[transitionCounts]]; swap `percentile` for
    * `percentile_approx` at unbounded scale. */
  def interArrivalStats(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gapped = events
      .withColumn("__gap_us",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .where(col("__gap_us").isNotNull)
    gapped.groupBy(col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // mean from the EXACT integer-µs sum, divided once and left
        // UNROUNDED: avg(double) accumulates in partition order and
        // drifted an ulp from the sequential replay at sf0.1 row counts
        // (measured), and round(·, 6) at 1e10 µs magnitude maps to
        // different ulps per engine — identical integer operands with no
        // post-rounding make the quotient bit-identical anywhere (the
        // confidentLearning mean_cos device)
        (sum(col("__gap_us")).cast("double") / count(lit(1)))
          .as("mean_gap_us"),
        round(percentile(col("__gap_us").cast("double"), lit(0.5)), 6).as("p50_gap_us"),
        round(percentile(col("__gap_us").cast("double"), lit(0.9)), 6).as("p90_gap_us"))
  }

  /** Rolling per-entity features: for every event, the count / sum / mean
    * of `valueCol` over the entity's LAST `nEvents` events (current
    * included) — the classic point-in-time feature columns an ML training
    * set joins on, computed with the bounded
    * `ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW` frame so no future
    * information leaks into a row's features. Same-timestamp ties break on
    * `idCol` (total order ⇒ deterministic frames); means are 6 dp-rounded.
    *
    * Scale shape: ONE window pass — shuffle on the entity key, one
    * per-partition sort shared by all three aggregates (same partition +
    * order + frame ⇒ one Window node); the bounded frame keeps state O(n)
    * per entity regardless of history length. */
  def rollingFeatures(events: DataFrame, userCol: String, tsCol: String,
                      idCol: String, valueCol: String, nEvents: Int): DataFrame = {
    require(nEvents >= 1, s"rollingFeatures: need nEvents >= 1, got $nEvents")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(nEvents - 1).toLong, Window.currentRow)
    val v = col(valueCol).cast("double")
    events.select(col(userCol), col(idCol), col(tsCol),
      count(v).over(w).as("roll_n"),
      round(sum(v).over(w), 6).as("roll_sum"),
      round(avg(v).over(w), 6).as("roll_avg"))
  }

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * first event; one row per (cohort_week, week_offset) with the count
    * of distinct users active that week. `week_offset` 0 is the cohort
    * week itself. The single `countDistinct` plans as a two-phase
    * aggregate (no Expand); at unbounded user counts swap in
    * `approx_count_distinct` — same plan shape, HLL merge
    * (see [[Sketches]]). */
  /** Assemble per-session ORDERED event sequences — the behavioral-
    * pretraining shape: one row per (user, session) carrying the
    * time-ordered event-type array, ready for [[graft.ops.Packing]] or
    * JSONL export as a training sequence. Session boundaries are
    * [[graft.streaming.EventStream.sessionizeBatch]]'s gap semantics
    * (integer-microsecond gap compare); within a session the order is the
    * total (ts, eventId) order, so ties at the same timestamp are
    * deterministic on any engine and any partitioning.
    *
    * Scale shape: ONE exchange on the user key — the session-marking
    * window, the sequence sort, and the group-by all live on it; the
    * collected array is bounded by session length (gap-bounded by
    * construction), never by user history. */
  /** Discrete-time survival hazard table (Kaplan–Meier style, daily
    * grain): per lifetime day `d`, the users still AT RISK (observed
    * lifetime ≥ d), the uncensored churn events AT exactly d, and the
    * hazard = churned/at_risk — retention decay read the
    * right-censoring-aware way: a user whose last activity is within
    * `censorDays` of `asOf` hasn't been silent long enough to call
    * churned, so they count at risk through their observed lifetime but
    * never as an event (ignoring censoring overstates late hazards —
    * every still-active long-tenure user would look like a churn).
    * Lifetime = last minus first active DATE; day-0 events are one-day
    * users. Output: (lifetime_day, n_at_risk, n_churned, hazard 6 dp).
    *
    * Scale shape: ONE user-keyed hash-agg (min/max, map-side partials)
    * reduces the corpus to per-user lifetimes, then a lifetime-keyed
    * hash-agg to ≤ \|distinct days\| histogram rows; the reverse
    * cumulative at-risk sum is a window over THAT reduced histogram —
    * single-partition by construction but over days, not rows (the
    * q48 pre-reduce device). */
  def hazardTable(events: DataFrame, userCol: String, tsCol: String,
      asOf: java.sql.Date, censorDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(censorDays >= 0,
      s"hazardTable: need censorDays >= 0, got $censorDays")
    val perUser = events.groupBy(col(userCol))
      .agg(datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol))))
          .cast("long").as("__life"),
        (datediff(lit(asOf), max(to_date(col(tsCol)))) >= censorDays)
          .as("__observed"))
    val hist = perUser.groupBy(col("__life").as("lifetime_day"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__observed").cast("long")).as("n_churned"))
    val atRisk = sum("__n").over(Window.orderBy(col("lifetime_day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    hist
      .withColumn("n_at_risk", atRisk)
      .select(col("lifetime_day"), col("n_at_risk"), col("n_churned"),
        round(col("n_churned").cast("double") / col("n_at_risk"), 6)
          .as("hazard"))
  }

  /** Market-basket association rules over arbitrary basket keys (a
    * session, a user-day, an order): for every DIRECTED item pair
    * (antecedent → consequent) co-present in ≥ `minBaskets` baskets,
    * the support count, `confidence = n_both/n_ant`, and
    * `lift = n_both·N / (n_ant·n_cons)` — the behavioral
    * cross-activity signal [[transitionCounts]]' ADJACENT bigrams
    * can't give (co-presence anywhere in the basket, order-free).
    * Items dedup within a basket (presence, not frequency). 6 dp.
    * Output: basket-key-free (antecedent, consequent, n_both, n_ant,
    * n_cons, confidence, lift).
    *
    * Scale shape: one distinct (basket, item) reduction feeds the
    * basket-keyed self-join — pair volume is Σ items-per-basket², the
    * basket bound, never a corpus square; item totals and the basket
    * count ride as broadcasts. */
  def basketRules(df: DataFrame, basketCols: Seq[String], itemCol: String,
                  minBaskets: Long = 1L): DataFrame = {
    require(basketCols.nonEmpty, "basketRules: need at least one basket column")
    require(minBaskets >= 1, s"basketRules: need minBaskets >= 1, got $minBaskets")
    val items = graft.core.CacheRegistry.persist(
      df.select((basketCols.map(col) :+ col(itemCol).as("__it")): _*)
        .where(col("__it").isNotNull).distinct())
    val nB = items.select(basketCols.map(col): _*).distinct()
      .agg(count(lit(1)).as("__nb"))
    val itemCounts = items.groupBy(col("__it")).agg(count(lit(1)).as("__n"))
    val joinCond = basketCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.__it") =!= col("b.__it")
    val pairs = items.as("a").join(items.as("b"), joinCond)
      .groupBy(col("a.__it").as("antecedent"), col("b.__it").as("consequent"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minBaskets)
    pairs
      .join(broadcast(itemCounts.select(col("__it").as("antecedent"),
        col("__n").as("n_ant"))), "antecedent")
      .join(broadcast(itemCounts.select(col("__it").as("consequent"),
        col("__n").as("n_cons"))), "consequent")
      .crossJoin(broadcast(nB))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ant"), col("n_cons"),
        round(col("n_both").cast("double") / col("n_ant"), 6)
          .as("confidence"),
        round(col("n_both").cast("double") * col("__nb") /
          (col("n_ant") * col("n_cons")), 6).as("lift"))
  }

  /** Per-key CUSUM change detection (Page 1954): over each key's
    * (ts, id)-ordered values, the one-sided cumulative sum
    * `s_i = max(0, s_{i−1} + (x_i − (target + slack)))` — the classic
    * sequential drift detector: a sustained upward shift accumulates
    * where a spike decays, the complement of the variance-based
    * [[eventSpikes]] (which flags points, not regime changes). Returns
    * the positions where `s` crosses `threshold` — the alarm points —
    * with the statistic value. The fold is SEQUENTIAL IEEE arithmetic
    * in a fixed order (the [[ewmaSnapshot]] device), so an external
    * engine's ordered recurrence replays it bit-for-bit; null values
    * are excluded before ordering.
    *
    * Scale shape: ONE key exchange builds the sorted per-key sequence;
    * the running fold is a scan-stage higher-order accumulate whose
    * array state is bounded by the key's event count — chunk unbounded
    * keys by window upstream. Output: (key, id, ts, value, cusum). */
  def cusumAlerts(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    require(threshold > 0, s"cusumAlerts: need threshold > 0, got $threshold")
    val drift = target + slack // one literal, interpolated identically
    val seqs = events.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(
        struct(col(tsCol).as("ts"), col(idCol).as("id"),
          col(valueCol).cast("double").as("v")))).as("__seq"))
    // running CUSUM via an array-accumulating fold: acc grows one state
    // per element, the last state is s_{i-1}
    val runs = aggregate(col("__seq"),
      typedLit(Seq.empty[Double]),
      (acc, e) => concat(acc, array(greatest(lit(0.0),
        when(size(acc) === 0, lit(0.0)).otherwise(element_at(acc, size(acc)))
          + (e.getField("v") - lit(drift))))))
    seqs.withColumn("__runs", runs)
      .select(col(keyCol), posexplode(arrays_zip(col("__seq"), col("__runs")))
        .as(Seq("__pos", "__z")))
      .select(col(keyCol), col("__z.__seq.id").as("id"),
        col("__z.__seq.ts").as("ts"), col("__z.__seq.v").as("value"),
        col("__z.__runs").as("cusum"))
      .where(col("cusum") > threshold)
  }

  /** Next-event training examples: per user, every position with a FULL
    * `contextLen`-event history becomes one supervised pair
    * (`context` = the space-joined previous `contextLen` event types in
    * time order, `next_event` = the type at that position) — the
    * behavioral-LM / next-action training set, generated leak-free
    * (context strictly precedes the target in the (ts, id) total order,
    * so ties can't smuggle the label into the context). Positions with a
    * shorter history are dropped (no padding — a padded prefix teaches
    * the model the session boundary instead of the behavior; chain
    * [[sessionSequences]] upstream to cut at session bounds first if
    * session-scoped contexts are wanted).
    *
    * Scale shape: ONE user-keyed exchange shared by the `contextLen`
    * lag frames (same window), scan-stage concat — no explode, no
    * self-join, output rows ≤ input rows. */
  def nextEventExamples(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, contextLen: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(contextLen >= 1,
      s"nextEventExamples: need contextLen >= 1, got $contextLen")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val lags = (contextLen to 1 by -1).map(k =>
      lag(col(typeCol), k).over(byUser))
    events
      .withColumn("__ctx",
        when(lags.map(_.isNotNull).reduce(_ && _),
          concat_ws(" ", lags: _*)))
      .where(col("__ctx").isNotNull)
      .select(col(userCol), col(idCol), col("__ctx").as("context"),
        col(typeCol).as("next_event"))
  }

  def sessionSequences(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapMs > 0, s"sessionSequences: need gapMs > 0, got $gapMs")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val marked = events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new",
        (col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapMs * 1000L)
          .cast("int"))
      .withColumn("session_id", sum("__new").over(byUser))
    marked.groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        count(lit(1)).as("n_events"),
        transform(
          array_sort(collect_list(struct(col(tsCol), col(idCol), col(typeCol)))),
          x => x.getField(typeCol)).as("event_seq"))
  }

  /** Per-user RFM snapshot as of a pinned instant: recency (days since
    * last event), frequency (event count), monetary (Σ value, nulls
    * contribute 0 but rows still count), plus tenure days and distinct
    * active days — the classic behavioral feature block, computed the
    * reproducible way (an explicit `asOf` instead of `current_date`, so
    * backfills and replays produce identical features).
    *
    * Scale shape: ONE user-keyed hash-agg with map-side partials; the
    * single distinct (active days) plans as a two-stage aggregate, not an
    * Expand. */
  def userSnapshot(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, asOf: java.sql.Date): DataFrame =
    events.groupBy(col(userCol))
      .agg(
        datediff(lit(asOf), max(to_date(col(tsCol)))).cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        round(sum(coalesce(col(valueCol), lit(0.0))), 6).as("monetary"),
        datediff(lit(asOf), min(to_date(col(tsCol)))).cast("long").as("tenure_days"),
        countDistinct(to_date(col(tsCol))).as("n_active_days"))

  /** Exponentially time-decayed counters per key as of a PINNED instant —
    * the recency-weighted feature-store counterpart of [[userSnapshot]]'s
    * raw counts: each event at age `a` days contributes
    * `2^(−a / halfLifeDays)` to `decayed_count` and value× that to
    * `decayed_sum`, so "purchases lately" dominates "purchases ever"
    * with a tunable memory. Events after `asOf` are EXCLUDED (point-in-
    * time correctness for backfilled training features); null values
    * count as events but add 0 to the sum (the [[userSnapshot]] rule).
    * Sums are 6 dp-rounded: float accumulation order varies with
    * partitioning, the established absorption device.
    *
    * Scale shape: the decay weight is a scan-stage expression off the
    * raw timestamp (exact integer micros arithmetic, one exp per row);
    * ONE key hash-agg with map-side partials — never a window, never a
    * sort. */
  def decayedCounts(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, asOf: java.sql.Timestamp,
      halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0,
      s"decayedCounts: need halfLifeDays > 0, got $halfLifeDays")
    val lambda = math.log(2.0) / halfLifeDays // per-day decay rate
    // wall-clock → micros through UTC explicitly (NOT getTime, which
    // routes through the JVM default zone): the engine pins the session
    // timezone to UTC, so naive event timestamps are UTC instants and
    // `asOf` must be interpreted the same way on any host
    val asOfMicros = asOf.toLocalDateTime
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val ageDays = (lit(asOfMicros) - unix_micros(col(tsCol)))
      .cast("double") / lit(86400e6)
    val w = exp(-lit(lambda) * ageDays)
    // constant-foldable bound → still pushes into the parquet scan
    events.where(col(tsCol) <= timestamp_micros(lit(asOfMicros)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(w), 6).as("decayed_count"),
        round(sum(w * coalesce(col(valueCol).cast("double"), lit(0.0))), 6)
          .as("decayed_sum"))
  }

  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    events.join(first, userCol)
      .withColumn("week_offset",
        (datediff(date_trunc("week", col(tsCol)), col("cohort_week")) / 7)
          .cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** Cohort LTV curve — [[retentionCohorts]]' value axis: per signup
    * cohort (week of a user's first event) and age week, the cohort's
    * value that week and the cumulative value PER COHORT USER
    * (`cum_ltv`). Reading down a column compares cohorts at equal age —
    * the growth readout that "total revenue by week" scrambles, because
    * it mixes cohorts of different ages. Null values count 0; the
    * divisor is the full cohort size (users inactive in a week still
    * dilute, as LTV should). Output: (cohort_week, week_offset,
    * cohort_users, week_value 6 dp, cum_ltv 6 dp).
    *
    * Scale shape: one per-user min pass (hash-agg) + one
    * (cohort, age) hash-agg over the value stream — both map-side
    * partial; the cumulative window runs per cohort over its AGE rows
    * (bounded by the calendar, not users). */
  def ltvCurve(events: DataFrame, userCol: String, tsCol: String,
               valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = events.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val sizes = first.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_users"))
    val weekly = events.join(first, userCol)
      .withColumn("week_offset",
        (datediff(date_trunc("week", col(tsCol)), col("cohort_week")) / 7)
          .cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(sum(coalesce(col(valCol).cast("double"), lit(0.0))).as("__wv"))
    val cum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly.join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
        round(col("__wv"), 6).as("week_value"),
        round(sum(col("__wv")).over(cum) / col("cohort_users"), 6)
          .as("cum_ltv"))
  }

  /** Daily event-type pivot: one row per day, one (count, value-sum)
    * column pair per event type — the wide ops-dashboard mart. Built on
    * `RelationalGroupedDataset.pivot` with the type domain PINNED
    * (`types`): an unpinned pivot runs a driver-side distinct over the
    * full log to discover columns, an extra pass a 100 TB log cannot
    * afford — and pinning also fixes the output schema, so downstream
    * consumers and the SQL oracle agree on column names
    * (`{type}_n`, `{type}_val`). Types absent on a day get count 0 and
    * null sum. Plans as the same single hash-agg a CASE-WHEN formulation
    * would (pivot is sugar over conditional aggregation — no Expand, no
    * extra shuffle); value sums are 6 dp-rounded for engine-exact
    * comparison. */
  def dailyTypePivot(events: DataFrame, tsCol: String, typeCol: String,
                     valueCol: String, types: Seq[String]): DataFrame = {
    require(types.nonEmpty, "dailyTypePivot: pinned type domain must be non-empty")
    val piv = events
      .groupBy(to_date(col(tsCol)).as("event_date"))
      .pivot(typeCol, types)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("val"))
    types.foldLeft(piv) { (d, t) =>
      d.withColumn(s"${t}_n", coalesce(col(s"${t}_n"), lit(0L)))
        .withColumn(s"${t}_val", round(col(s"${t}_val"), 6))
    }
  }

  /** Volume-spike detection on hourly event counts: flags (hour, type)
    * buckets whose count exceeds `mean + z·stddev` of that type's hourly
    * counts — the monitoring mart that catches a bot burst or an
    * instrumentation bug before the events poison downstream marts.
    *
    * Engine-exact by construction: counts are integers, so the moments
    * Σc and Σc² are BIGINT sums (order-free); mean and sample variance
    * `(n·Σc² − (Σc)²) / (n·(n−1))` are fixed-order IEEE expressions over
    * those integers, and `sqrt` is correctly rounded — no float
    * accumulation anywhere, unlike a built-in `stddev` whose partial-sum
    * order varies with partitioning. Statistics run over the OBSERVED
    * hours of each type (zero-event hours are absent — left-join a
    * calendar spine first if silence should count). Types with a single
    * observed hour get a null stddev and are never flagged.
    *
    * Scale shape: two hash-aggs with map-side partials (hour-bucket, then
    * per-type moments) and one broadcast join of the per-type stats (rows
    * = |types|) back onto the hourly counts. */
  def hourlySpikes(events: DataFrame, tsCol: String, typeCol: String,
                   z: Double): DataFrame = {
    require(z > 0, s"hourlySpikes: z must be > 0, got $z")
    // persisted: the per-type moments and the final flag join both consume
    // the hourly counts — uncached, the event scan + hour agg would run
    // twice (the cache itself is tiny: hours × types rows)
    val hourly = graft.core.CacheRegistry.persist(events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(typeCol))
      .agg(count(lit(1)).as("cnt")))
    val stats = hourly.groupBy(typeCol)
      .agg(count(lit(1)).as("n_hours"), sum("cnt").as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n_hours").cast("double"))
      .withColumn("sd", when(col("n_hours") > 1,
        sqrt((col("n_hours") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_hours") * (col("n_hours") - 1)).cast("double"))))
    hourly.join(broadcast(stats.select(col(typeCol), col("mean"), col("sd"))), typeCol)
      .select(col("hour"), col(typeCol), col("cnt"),
        round(col("mean"), 6).as("mean_cnt"),
        round(col("sd"), 6).as("sd_cnt"),
        coalesce(col("cnt").cast("double") > col("mean") + lit(z) * col("sd"),
          lit(false)).as("is_spike"))
  }

  /** Theil–Sen robust trend of a daily metric (median of all pairwise
    * slopes, with Conover's median-residual intercept): the trend
    * estimate that one bad day can't move — OLS on daily revenue
    * follows a single outlier day, the pairwise-slope median shrugs it
    * off (29.3% breakdown point). Days enter as integer offsets from
    * the first day, so every slope is one IEEE division whose operands
    * differ across engines only by the day-sum's ulps (~1e-12 relative
    * — far below the 6 dp quantum the outputs round to). Output: one
    * row (n_days, slope 6 dp, intercept 6 dp) — slope is metric-units
    * per day.
    *
    * Scale shape: the event log reduces to ONE row per day first (hash-
    * agg with map-side partials); the pairwise stage is quadratic in
    * DAYS, not events — bounded by the calendar (a decade is ~3.7k rows
    * → 6.7M slope pairs, still one small shuffle), which is what makes
    * the robust estimator viable at 100 TB where pairwise-over-events
    * would not be. */
  def theilSenTrend(events: DataFrame, tsCol: String,
                    valCol: String): DataFrame = {
    val daily = graft.core.CacheRegistry.persist(
      events.where(col(tsCol).isNotNull && col(valCol).isNotNull)
        .groupBy(to_date(col(tsCol)).as("__d"))
        .agg(sum(col(valCol).cast("double")).as("__v")))
    val base = daily.select(min("__d").as("__d0"))
    val idx = daily.crossJoin(broadcast(base))
      .select(datediff(col("__d"), col("__d0")).cast("double").as("__x"),
        col("__v"))
    val a = idx.select(col("__x").as("__xa"), col("__v").as("__va"))
    val b = idx.select(col("__x").as("__xb"), col("__v").as("__vb"))
    val slope = a.crossJoin(b).where(col("__xa") < col("__xb"))
      .select(((col("__vb") - col("__va")) / (col("__xb") - col("__xa")))
        .as("__s"))
      .agg(percentile(col("__s"), lit(0.5)).as("__slope"))
    val out = idx.crossJoin(broadcast(slope))
      .select(col("__slope"),
        (col("__v") - col("__slope") * col("__x")).as("__r"))
      .agg(count(lit(1)).as("n_days"),
        round(first("__slope"), 6).as("slope"),
        round(percentile(col("__r"), lit(0.5)), 6).as("intercept"))
    out
  }

  /** Multi-touch attribution: for every conversion event, the touch
    * events (same user, type in `touchTypes`) inside the `lookbackMs`
    * window strictly before it, with the three standard credit models
    * side by side — `w_first` (all credit to the earliest touch),
    * `w_last` (to the latest), `w_linear` (1/n each) — the
    * marketing-attribution mart, and the credit-assignment shape any
    * "which earlier interaction caused this outcome" analysis takes.
    * Ordering inside the window is total ((ts, event_id) tie-break), so
    * first/last are deterministic under timestamp ties; conversions with
    * zero in-window touches emit nothing (the unattributable row is the
    * absence). Output: (conv_id, user, conv_ts, touch_id, touch_type,
    * touch_ts, n_touches, w_first, w_last, w_linear 6 dp).
    *
    * Scale shape: conversions ⋈ touches is ONE user-keyed equi-join with
    * the time window as a post-join filter — fan-out bounded by per-user
    * event counts (lookback-bounded in practice); the per-conversion
    * rank/count is a window partitioned by the conversion id over its
    * own touches, never the log. At heavy per-user skew, pre-bucket by
    * (user, time-band) the way the interval-overlap join does. */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, convType: String,
                  touchTypes: Seq[String], lookbackMs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: provide at least one touch type")
    require(lookbackMs > 0, s"attribution: need lookbackMs > 0, got $lookbackMs")
    import org.apache.spark.sql.expressions.Window
    val conv = events.where(col(typeCol) === convType)
      .select(col(userCol).as("user"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"))
    val touch = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user"), col(idCol).as("touch_id"),
        col(typeCol).as("touch_type"), col(tsCol).as("touch_ts"))
    val win = Window.partitionBy(col("conv_id"))
    val ord = win.orderBy(col("touch_ts"), col("touch_id"))
    conv.join(touch, Seq("user"))
      .where(col("touch_ts") < col("conv_ts") &&
        unix_micros(col("touch_ts")) >=
          unix_micros(col("conv_ts")) - lookbackMs * 1000L)
      .withColumn("__rk", row_number().over(ord))
      .withColumn("n_touches", count(lit(1)).over(win))
      .select(col("conv_id"), col("user").as("user_id"), col("conv_ts"),
        col("touch_id"), col("touch_type"), col("touch_ts"), col("n_touches"),
        when(col("__rk") === 1, 1.0).otherwise(0.0).as("w_first"),
        when(col("__rk") === col("n_touches"), 1.0).otherwise(0.0).as("w_last"),
        round(lit(1.0) / col("n_touches"), 6).as("w_linear"))
  }

  /** Daily + rolling-window active users, EXACT: for every calendar day
    * in the observed range, the distinct users active that day (`dau`)
    * and in the trailing `windowDays`-day window ending that day
    * (`wau`). Distinct counts don't decompose over a sliding window (a
    * user active twice in the window must count once), so the window
    * sum a running-total mart would use is WRONG here — this is the
    * growth-team metric that actually needs care at scale. Days with no
    * events report 0 (the gap itself is the signal).
    * Output: (day, dau, wau), one row per calendar day.
    *
    * Scale shape: the event log collapses to distinct (user, day) ONCE
    * (one hash-agg with map-side partials — the only pass over the
    * log); the ×windowDays fan-out explodes the REDUCED table, and each
    * report day's distinct-user count is a second hash-agg over ≤
    * users·windowDays rows. The calendar scaffold comes from a 1-row
    * min/max aggregate, so zero-event days cost nothing. No range
    * self-join, no window over the log. */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1,
      s"rollingActiveUsers: need windowDays >= 1, got $windowDays")
    val userDays = graft.core.CacheRegistry.persist(
      events.where(col(userCol).isNotNull && col(tsCol).isNotNull)
        .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
        .distinct())
    val days = userDays.agg(min("__d").as("__lo"), max("__d").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val dau = userDays.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau")) // (user, day) already distinct
    val wau = userDays
      .select(col("__u"), explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).as("day"))
      .distinct() // a user active on several window days counts once
      .groupBy("day").agg(count(lit(1)).as("wau"))
    days.join(dau, Seq("day"), "left").join(wau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
  }

  /** Kaplan–Meier survival curve on [[hazardTable]]'s daily grain:
    * `S(d) = Π_{d' ≤ d} (1 − hazard(d'))` — the probability a user
    * survives PAST lifetime day `d`, the curve retention decks plot and
    * the quantity the hazard table's per-day ratios compose into. The
    * product runs as `exp(Σ ln(1 − churned/at_risk))` over the
    * ascending-day cumulative window (both engines fold the running sum
    * in day order, so the IEEE accumulation is identical); a day where
    * everyone at risk churns (`hazard = 1`) pins survival to exactly 0
    * from that day on via an explicit flag instead of `ln(0)` (whose
    * null/−∞ behavior differs across engines). Censoring semantics are
    * [[hazardTable]]'s. Output: the hazard table + `survival` (6 dp).
    *
    * Scale shape: [[hazardTable]]'s two hash-aggs reduce the log to a
    * ≤ \|distinct days\| histogram; both windows (reverse at-risk sum,
    * forward survival product) run over THAT — single-partition over
    * days, never rows (the q48 pre-reduce device). */
  def survivalCurve(events: DataFrame, userCol: String, tsCol: String,
      asOf: java.sql.Date, censorDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = Window.orderBy(col("lifetime_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ratio = col("n_churned").cast("double") / col("n_at_risk")
    hazardTable(events, userCol, tsCol, asOf, censorDays)
      .withColumn("__dead", max((ratio >= 1.0).cast("int")).over(cum))
      .withColumn("__ln", when(ratio < 1.0, log(lit(1.0) - ratio))
        .otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(round(exp(sum("__ln").over(cum)), 6) + lit(0.0)))
      .drop("__dead", "__ln")
  }

  /** CUPED variance reduction (Deng et al. 2013): per-user pre-period
    * metric as the control covariate for the post-period metric,
    * `y_adj = y − θ·(x − x̄)` with `θ = cov(x,y)/var(x)` estimated
    * POOLED across variants — the standard experimentation trick that
    * shrinks metric variance (≈ by the pre/post correlation squared)
    * without biasing the treatment contrast. Variant assignment is
    * md5-deterministic on the user key (replay-stable A/B split); a
    * user absent from the pre-period enters with x = 0 (the standard
    * new-user convention). Per-user sums round to 6 dp (accumulation-
    * order pin), θ and x̄ round to 6 dp before use, so both engines
    * compute the identical adjustment. Output: one row per variant plus
    * an `ALL` row, with n_users, mean_post, mean_adjusted, var_post,
    * var_adjusted (population), var_reduction, theta — and
    * `never_worse`, the in-sample guarantee `var_adjusted ≤ var_post`
    * on the pooled row, which holds by construction when θ is the
    * pooled OLS coefficient (a contract the oracle re-derives, so a
    * co-moment bug becomes a hash mismatch).
    *
    * Scale shape: ONE user-keyed hash-agg reduces the log to a per-user
    * (pre, post) table (persisted); θ/x̄ are a 1-row aggregate broadcast
    * back; the variant rollup is a ≤ 3-row hash-agg. Nothing after the
    * first reduction scales with events. */
  def cupedLift(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, cutover: java.sql.Date): DataFrame = {
    val pre = when(to_date(col(tsCol)) < lit(cutover),
      coalesce(col(valueCol), lit(0.0))).otherwise(lit(0.0))
    val post = when(to_date(col(tsCol)) >= lit(cutover),
      coalesce(col(valueCol), lit(0.0))).otherwise(lit(0.0))
    val perUser = graft.core.CacheRegistry.persist(
      events.where(col(userCol).isNotNull)
        .groupBy(col(userCol))
        .agg(round(sum(pre), 6).as("x"), round(sum(post), 6).as("y"))
        .withColumn("variant",
          when(substring(md5(col(userCol).cast("string")), 1, 1) < "8",
            lit("A")).otherwise(lit("B"))))
    val theta = perUser.agg(
      // zero pre-period variance → θ = 0 (no adjustment), not a
      // DIVIDE_BY_ZERO under ANSI mode
      round(when(var_pop(col("x")) > 0,
        covar_pop(col("x"), col("y")) / var_pop(col("x")))
        .otherwise(lit(0.0)), 6).as("__th"),
      round(avg(col("x")), 6).as("__xbar"))
    val adj = perUser.crossJoin(broadcast(theta))
      .withColumn("y_adj", col("y") - col("__th") * (col("x") - col("__xbar")))
    def rollup(g: org.apache.spark.sql.RelationalGroupedDataset,
               tag: Column): DataFrame =
      g.agg(count(lit(1)).as("n_users"),
        round(avg(col("y")), 6).as("mean_post"),
        round(avg(col("y_adj")), 6).as("mean_adjusted"),
        round(var_pop(col("y")), 6).as("var_post"),
        round(var_pop(col("y_adj")), 6).as("var_adjusted"),
        when(var_pop(col("y")) > 0,
          round(lit(1.0) - var_pop(col("y_adj")) / var_pop(col("y")), 6)
            + lit(0.0)).as("var_reduction"),
        round(first(col("__th")), 6).as("theta"))
        .select(tag.as("variant"), col("n_users"), col("mean_post"),
          col("mean_adjusted"), col("var_post"), col("var_adjusted"),
          col("var_reduction"),
          (col("var_adjusted") <= col("var_post")).as("never_worse"),
          col("theta"))
    rollup(adj.groupBy(col("variant")), col("variant"))
      .unionByName(rollup(adj.groupBy(), lit("ALL")))
  }

  /** Day-of-week seasonal profile of a metric: per (key, dow — Spark's
    * `dayofweek`, 1 = Sunday … 7 = Saturday),
    * event count, total and mean value, and the dow's share of the
    * key's events — plus the key-level `seasonal_strength`
    * `1 − var(residual)/var(daily)` over the DAILY series (variance of
    * daily totals explained by the dow means; 0 = no weekly rhythm,
    * → 1 = the week explains everything), the quick test for whether a
    * weekly-seasonal forecast/alert baseline is worth having. Population
    * variances over the pre-reduced daily table; 6 dp.
    * Output: (key, dow, n_events, total_value, mean_value, share,
    * seasonal_strength — repeated per key).
    *
    * Scale shape: the log reduces ONCE to (key, day) totals (hash-agg,
    * map-side partials); dow means, shares, and the variance-decomposition
    * join all run over that bounded-by-the-calendar table. */
  def dowProfile(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = graft.core.CacheRegistry.persist(
      events.where(col(tsCol).isNotNull)
        .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("__day"))
        .agg(count(lit(1)).as("__n"),
          round(sum(coalesce(col(valueCol), lit(0.0))), 6).as("__v"))
        .withColumn("dow", dayofweek(col("__day"))))
    val byDow = daily.groupBy(col("key"), col("dow"))
      .agg(sum("__n").as("n_events"), round(sum("__v"), 6).as("total_value"),
        round(avg("__v"), 6).as("mean_dow"))
    val keyTot = daily.groupBy(col("key"))
      .agg(sum("__n").as("__kn"), round(var_pop(col("__v")), 6).as("__vt"))
    val resid = daily
      .join(byDow.select(col("key"), col("dow"), col("mean_dow")),
        Seq("key", "dow"))
      .groupBy(col("key"))
      .agg(round(var_pop(col("__v") - col("mean_dow")), 6).as("__vr"))
    byDow
      .join(broadcast(keyTot), Seq("key"))
      .join(broadcast(resid), Seq("key"))
      .select(col("key"), col("dow").cast("long").as("dow"), col("n_events"),
        col("total_value"),
        round(col("total_value") / col("n_events"), 6).as("mean_value"),
        round(col("n_events").cast("double") / col("__kn"), 6).as("share"),
        when(col("__vt") > 0,
          round(lit(1.0) - col("__vr") / col("__vt"), 6) + lit(0.0))
          .as("seasonal_strength"))
  }

  /** Seasonal-naive forecast backtest: per key, score the lag-`season`
    * "same day last week" forecast of the daily value total against the
    * lag-1 naive baseline (Hyndman's MASE convention — a seasonal model
    * is only WORTH something if mase < 1). A day is scored only when BOTH
    * its lag-1 and lag-`season` days observed data, so both MAEs cover
    * the identical day set and the ratio is well-defined; `mase` is null
    * when the naive baseline error is 0. Daily totals are 6 dp-rounded,
    * so each |error| is an exact micro-integer: the MAEs sum LONG micros
    * and divide UNROUNDED ([[graft.ops.Learn.nearestCentroidEval]]'s
    * replay device) — bit-identical on any engine, no .5-boundary round.
    * Output: (key, n_days, mae_seasonal, mae_naive, mase).
    *
    * Scale shape: ONE (key, day) pre-reduction of the event log, then
    * self-joins and the final aggregate on the tiny keys × days frame —
    * the raw log is scanned once, nothing re-shuffles it. */
  def seasonalBacktest(events: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, season: Int = 7): DataFrame = {
    require(season >= 2, s"seasonalBacktest: need season >= 2, got $season")
    val daily = graft.core.CacheRegistry.persist(
      events.where(col(tsCol).isNotNull)
        .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
        .agg(round(sum(coalesce(col(valueCol), lit(0.0))), 6).as("v")))
    val micro = round(col("v") * lit(1000000.0)).cast("long")
    val cur = daily.select(col("key"), col("day"), micro.as("m"))
    val lagS = daily.select(col("key"), date_add(col("day"), season).as("day"),
      micro.as("ms"))
    val lag1 = daily.select(col("key"), date_add(col("day"), 1).as("day"),
      micro.as("m1"))
    cur.join(lagS, Seq("key", "day")).join(lag1, Seq("key", "day"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("m") - col("ms"))).as("__es"),
        sum(abs(col("m") - col("m1"))).as("__en"))
      .select(col("key"), col("n_days"),
        (col("__es").cast("double") / (col("n_days") * lit(1000000.0)))
          .as("mae_seasonal"),
        (col("__en").cast("double") / (col("n_days") * lit(1000000.0)))
          .as("mae_naive"),
        when(col("__en") > 0,
          col("__es").cast("double") / col("__en").cast("double"))
          .as("mase"))
  }

  /** Per-key ordinary-least-squares daily trend — the classical twin of
    * [[theilSenTrend]] (which is global and median-robust): for each key,
    * the daily totals regress on the day index and the slope/intercept
    * come from sufficient statistics. Daily totals snap to exact
    * micro-integers first (the q237 device), and x is an integer day
    * index, so n, Σx, Σy, Σxy, Σx² are all EXACT LONG sums — the
    * closed-form `slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)` is then one
    * double expression over identical inputs on any engine. Keys with a
    * single day (zero x-variance) get NULL slope/intercept; a NULL key
    * forms its own cohort (null-safe base-day join). Output:
    * (key, n_days, slope, intercept) — per-day units, 6 dp.
    *
    * Scale shape: the event log reduces in ONE (key, day) hash-agg;
    * the per-key base-day join and the sufficient-statistic agg run over
    * |keys|·|days| rows. Nothing downstream of the first reduction
    * touches raw events. */
  def olsTrendByKey(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val daily = events
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), to_date(col(tsCol)).as("__d"))
      .agg(round(sum(col(valueCol).cast("double")), 6).as("__v"))
      .withColumn("__m", round(col("__v") * 1000000.0, 0).cast("long"))
    // null-safe base-day join: a null key forms its own cohort (the
    // kAnonymityAudit rule) instead of silently vanishing
    val base = daily.groupBy("__k").agg(min("__d").as("__d0"))
      .withColumnRenamed("__k", "__bk")
    val s = daily.join(base, col("__k") <=> col("__bk"))
      .select(col("__k"), datediff(col("__d"), col("__d0")).cast("long").as("__x"),
        col("__m"))
      .groupBy("__k")
      .agg(count(lit(1)).as("n_days"), sum("__x").as("__sx"),
        sum("__m").as("__sy"), sum(col("__x") * col("__m")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val nd = col("n_days").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val den = nd * sxx - sx * sx
    val num = nd * sxy - sx * sy
    s.select(col("__k").as("key"), col("n_days"),
      when(den > 0, round((num / den) / 1000000.0, 6)).as("slope"),
      when(den > 0,
        round(((sy - (num / den) * sx) / nd) / 1000000.0, 6)).as("intercept"))
  }

  /** Step-to-step conversion LATENCY distribution — the timing mart the
    * funnel counts (q69/q158) don't give: for each adjacent step pair in
    * `steps`, how long do users take to move forward? Latency is
    * first-occurrence to first-occurrence (`min ts` per (user, step) —
    * one reduction), counted only for users whose later step genuinely
    * follows (`t₂ > t₁`), in exact micro difference before the seconds
    * division. The per-pair summary reuses [[graft.ops.Sketches
    * .percentilesExact]] (q45's oracled exact-percentile shape). Output:
    * (step_from, step_to, n, mean, p50, p90, p99) — seconds, 6 dp.
    *
    * Scale shape: the event log reduces to |users|·|steps| first-seen
    * rows in ONE hash-agg (persisted — every pair consumes it); each
    * adjacent pair is a user-keyed self-join over that reduced table;
    * the percentile agg runs per pair over converted users only. */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "funnelLatency: need at least two steps")
    require(steps.distinct.size == steps.size,
      "funnelLatency: steps must be distinct")
    val first = graft.core.CacheRegistry.persist(
      events.where(col(userCol).isNotNull && col(tsCol).isNotNull &&
          col(typeCol).isin(steps: _*))
        .groupBy(col(userCol).as("__u"), col(typeCol).as("__s"))
        .agg(min(unix_micros(col(tsCol))).as("__t")))
    val deltas = steps.sliding(2).map { case Seq(a, b) =>
      first.where(col("__s") === a)
        .select(col("__u"), col("__t").as("__t1"))
        .join(first.where(col("__s") === b)
          .select(col("__u"), col("__t").as("__t2")), Seq("__u"))
        .where(col("__t2") > col("__t1"))
        .select(lit(a).as("step_from"), lit(b).as("step_to"),
          ((col("__t2") - col("__t1")).cast("double") / 1000000.0)
            .as("delta_s"))
    }.reduce(_ unionAll _)
    graft.ops.Sketches.percentilesExact(deltas,
      Seq("step_from", "step_to"), "delta_s")
  }

  /** Per-key Spearman rank correlation between a key's daily VALUE total
    * and its daily event COUNT — the monotone-invariant dependence gauge
    * beside [[olsTrendByKey]] (linear, vs time) and q205's Pearson
    * (linear, raw values): "do busy days pay more" without assuming
    * linearity or caring about outlier days. Daily totals snap to exact
    * micro-integers; both series rank under a STRICT total order
    * (metric, then day — the documented deterministic tie policy), so the
    * rank-Pearson reduces to exact LONG sufficient sums and one mirrored
    * closed-form expression (the q252 device applied to ranks). Keys
    * need ≥ 2 days with value variance; degenerate keys get NULL rho.
    * Output: (key, n_days, rho), 6 dp.
    *
    * Scale shape: ONE (key, day) hash-agg reduces the log; the rank
    * windows are PARTITIONED by key (days per key bounded by the
    * calendar); the sufficient-statistic agg runs over |keys|·|days|
    * rows. */
  def spearmanDaily(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), to_date(col(tsCol)).as("__d"))
      .agg(round(sum(col(valueCol).cast("double")), 6).as("__v"),
        count(lit(1)).as("__c"))
      .withColumn("__m", round(col("__v") * 1000000.0, 0).cast("long"))
    val wv = Window.partitionBy("__k").orderBy(col("__m").asc, col("__d").asc)
    val wc = Window.partitionBy("__k").orderBy(col("__c").asc, col("__d").asc)
    val ranked = daily
      .withColumn("__rx", row_number().over(wv).cast("long"))
      .withColumn("__ry", row_number().over(wc).cast("long"))
    val s = ranked.groupBy("__k").agg(
      count(lit(1)).as("n_days"),
      sum("__rx").as("__sx"), sum("__ry").as("__sy"),
      sum(col("__rx") * col("__ry")).as("__sxy"),
      sum(col("__rx") * col("__rx")).as("__sxx"),
      sum(col("__ry") * col("__ry")).as("__syy"))
    val nd = col("n_days").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val num = nd * col("__sxy").cast("double") - sx * sy
    val dx = nd * col("__sxx").cast("double") - sx * sx
    val dy = nd * col("__syy").cast("double") - sy * sy
    s.select(col("__k").as("key"), col("n_days"),
      when(dx > 0 && dy > 0,
        round(num / (sqrt(dx) * sqrt(dy)), 6)).as("rho"))
  }

  /** Sequential-pattern support over per-user event histories: for every
    * ordered type pair (a, b) with a ≠ b, in how many users does some `a`
    * occur strictly before some `b`? The existential "an a-occurrence
    * precedes a b-occurrence" collapses EXACTLY to `min_ts(a) < max_ts(b)`
    * — so the event log reduces to ONE (user, type)-keyed hash-agg of
    * min/max timestamps, and the pair comparison joins within user over
    * ≤ |types|² bounded rows. Never event × event; a 100 TB log prices at
    * its own reduction. Output: (antecedent, consequent, n_users,
    * support) — support over users-with-events, 6 dp. */
  def sequentialPairs(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String): DataFrame = {
    val r = graft.core.CacheRegistry.persist(
      events.where(col(userCol).isNotNull && col(tsCol).isNotNull &&
          col(typeCol).isNotNull)
        .groupBy(col(userCol).as("__u"), col(typeCol).as("__t"))
        .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx")))
    val total = r.agg(countDistinct(col("__u")).cast("double").as("__users"))
    val a = r.select(col("__u"), col("__t").as("antecedent"), col("__mn"))
    val b = r.select(col("__u"), col("__t").as("consequent"), col("__mx"))
    a.join(b, Seq("__u"))
      .where(col("antecedent") =!= col("consequent") &&
        col("__mn") < col("__mx"))
      .groupBy("antecedent", "consequent")
      .agg(count(lit(1)).as("n_users")) // (user, type) rows are unique
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_users"),
        round(col("n_users").cast("double") / col("__users"), 6).as("support"))
  }

  /** Index-of-dispersion (overdispersion) test on daily counts — "is
    * this stream bursty beyond Poisson", the modeling gate BEFORE
    * trusting a Poisson rate anywhere ([[graft.ops.Quality.exponentialGof]]
    * asks the same of the gaps; this asks it of the counts): under
    * Poisson, daily counts have variance = mean, so `D = s²/x̄` near 1;
    * `(n−1)·D ~ χ²_{n−1}` gives the normal approximation
    * `z = (D−1)·√((n−1)/2)`, one-sided 95% at 1.644854. The series is
    * the key's zero-filled calendar (a day with no events is a
    * zero-count observation, not a missing one). Counts are integers,
    * so every moment is an exact LONG/decimal sum; D and z are mirrored
    * double arithmetic. All-zero keys → null D; single-day keys → null
    * z. Output per key: (key, n_days, mean, variance, dispersion, z,
    * overdispersed), 6 dp.
    *
    * Scale shape: one (key, day) hash-agg, the bounded calendar
    * scaffold, one key reduce — the [[holtForecast]] contract without
    * the fold. */
  def overdispersionTest(df: DataFrame, keyCol: String,
                         tsCol: String): DataFrame = {
    val daily = df.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__y"))
    val span = daily.groupBy(col(keyCol))
      .agg(min("__day").as("__d0"), max("__day").as("__d1"))
    val cal = span
      .select(col(keyCol), col("__d0"),
        explode(sequence(lit(0), datediff(col("__d1"), col("__d0"))))
          .as("__t"))
      .select(col(keyCol), date_add(col("__d0"), col("__t")).as("__day"))
    val series = cal.join(daily, Seq(keyCol, "__day"), "left")
      .select(col(keyCol), coalesce(col("__y"), lit(0L)).as("__y"))
    val red = series.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum("__y").as("__s"),
        sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__s2"))
    val nD = col("n_days").cast("double")
    val mean = col("__s").cast("double") / nD
    val variance = (col("__s2").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD) /
      (nD - 1.0)
    val disp = variance / mean
    val z = (disp - 1.0) * sqrt((nD - 1.0) / 2.0)
    val okD = col("__s") > 0
    val okZ = okD && col("n_days") >= 2
    red.select(col(keyCol), col("n_days"), round(mean, 6).as("mean"),
      when(col("n_days") >= 2, round(variance, 6)).as("variance"),
      when(okZ, round(disp, 6)).as("dispersion"),
      when(okZ, round(z, 6)).as("z"),
      coalesce(when(okZ, z > 1.644854), lit(false)).as("overdispersed"))
  }

  /** Autocorrelation of the daily series at chosen lags — the
    * periodicity detector that turns "it looks weekly" into a number
    * (r₇ high → day-of-week structure, the [[dowProfile]] signal as a
    * statistic; r₁ high → momentum/burst carry-over): textbook ACF with
    * the FULL-series mean, `r_L = Σ_{t>L}(y_t−ȳ)(y_{t−L}−ȳ) /
    * Σ(y_t−ȳ)²`, over the key's zero-filled calendar. The lag products
    * and partial sums are exact integer reductions (counts are
    * integers; cross-products ride decimal(38,0)); the mean expansion
    * `Σy_ty_{t−L} − ȳ(P₁+P₂) + (n−L)ȳ²` is mirrored double arithmetic.
    * Keys with a constant series (zero variance) or fewer than L+2 days
    * → null ACF. Output per (key, lag): (key, lag, n_days, acf), 6 dp.
    *
    * Scale shape: one (key, day) hash-agg, the bounded calendar, ONE
    * window pass computing every requested lag column, one key reduce
    * unpivoted over the ≤ \|lags\| grid. */
  def dailyAutocorrelation(df: DataFrame, keyCol: String, tsCol: String,
                           lags: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"dailyAutocorrelation: need lags >= 1, got $lags")
    val ls = lags.distinct.sorted
    val daily = df.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__y"))
    val span = daily.groupBy(col(keyCol))
      .agg(min("__day").as("__d0"), max("__day").as("__d1"))
    val cal = span
      .select(col(keyCol), col("__d0"),
        explode(sequence(lit(0), datediff(col("__d1"), col("__d0"))))
          .as("__t"))
      .select(col(keyCol), col("__t"), date_add(col("__d0"), col("__t"))
        .as("__day"))
    val series = cal.join(daily, Seq(keyCol, "__day"), "left")
      .select(col(keyCol), col("__t"), coalesce(col("__y"), lit(0L)).as("__y"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
    val lagged = series.select(Seq(col(keyCol), col("__y")) ++ ls.map(l =>
      lag(col("__y"), l).over(w).as(s"__lag$l")): _*)
    val aggs = Seq(count(lit(1)).as("n_days"),
      sum("__y").as("__s"),
      sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__s2")) ++
      ls.flatMap { l =>
        Seq(
          sum(col("__y").cast("decimal(38,0)") * col(s"__lag$l"))
            .as(s"__xy$l"),
          sum(when(col(s"__lag$l").isNotNull, col("__y"))).as(s"__p1_$l"),
          sum(when(col(s"__lag$l").isNotNull, col(s"__lag$l")))
            .as(s"__p2_$l"))
      }
    val red = lagged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val nD = col("n_days").cast("double")
    val mean = col("__s").cast("double") / nD
    val denom = col("__s2").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    val stacked = red.select(col(keyCol), col("n_days"),
      col("__s"), col("__s2"),
      explode(array(ls.map(l => struct(lit(l).as("lag"),
        col(s"__xy$l").as("__xy"), col(s"__p1_$l").as("__p1"),
        col(s"__p2_$l").as("__p2"))): _*)).as("__x"))
    val lagD = col("__x.lag").cast("double")
    val num = col("__x.__xy").cast("double") -
      mean * (col("__x.__p1") + col("__x.__p2")).cast("double") +
      (nD - lagD) * mean * mean
    stacked.select(col(keyCol), col("__x.lag").as("lag"), col("n_days"),
      when(denom > 0 && col("n_days") >= lagD + 2,
        round(num / denom, 6)).as("acf"))
  }

  /** Holt linear-trend forecast per key — double exponential smoothing,
    * the next rung above the EWMA snapshot ([[ewmaSnapshot]] family):
    * level AND trend held across the daily series, then an h-step-ahead
    * linear forecast `ŷ = l_T + h·b_T` — the capacity-planning readout
    * ("where is this source's volume going") a level-only smoother
    * cannot give. Series = the key's calendar days from first to last
    * observation, missing days as 0 (additive-volume semantics).
    * Init `l₂ = y₂, b₂ = y₂ − y₁`; for t ≥ 3:
    * `l_t = α·y_t + (1−α)(l+b)`, `b_t = β(l_t − l) + (1−β)b`.
    *
    * Determinism: daily totals snap to 6 dp, and the state re-snaps to
    * 6 dp after EVERY update (the [[graft.ops.Learn.logisticGd]] device
    * — per-step double ulps vanish into the quantum instead of
    * compounding), so the whole trajectory and every forecast replay
    * bit-identically. Keys with one observed day emit their level and
    * null trend/forecasts. Output per (key, h ∈ 1..horizon): (key,
    * n_days, level, trend, h, forecast), 6 dp.
    *
    * Scale shape: one (key, day) hash-agg; the calendar scaffold and
    * the smoothing fold run per key over its DAY SPAN (a bounded
    * scan-stage array fold, like the BPE merge fold) — the event log is
    * read once and shuffled once; no per-iteration scan, no window over
    * raw events. */
  def holtForecast(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, alpha: Double, beta: Double,
                   horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"holtForecast: need 0 < alpha <= 1, got $alpha")
    require(beta >= 0 && beta <= 1, s"holtForecast: need 0 <= beta <= 1, got $beta")
    require(horizon >= 1, s"holtForecast: need horizon >= 1, got $horizon")
    val daily = df.where(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(round(sum(col(valCol).cast("double")), 6).as("__y"))
    val span = daily.groupBy(col(keyCol))
      .agg(min("__day").as("__d0"), max("__day").as("__d1"))
    val cal = span
      .select(col(keyCol), col("__d0"),
        explode(sequence(lit(0), datediff(col("__d1"), col("__d0"))))
          .as("__t"))
      .select(col(keyCol), date_add(col("__d0"), col("__t")).as("__day"))
    val series = cal.join(daily, Seq(keyCol.toString, "__day"), "left")
      .select(col(keyCol), col("__day"), coalesce(col("__y"), lit(0.0)).as("__y"))
    val packed = series.groupBy(col(keyCol))
      .agg(transform(array_sort(collect_list(struct(col("__day"), col("__y")))),
        x => x.getField("__y")).as("__vals"))
    val n = size(col("__vals"))
    val y1 = element_at(col("__vals"), 1)
    val y2 = element_at(col("__vals"), 2)
    // fold y₃..y_T carrying (level, trend), re-snapped each step
    val state = aggregate(slice(col("__vals"), lit(3), greatest(n - 2, lit(0))),
      struct(y2.as("l"), round(y2 - y1, 6).as("b")),
      (acc, y) => {
        val l2 = round(lit(alpha) * y +
          lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b")), 6)
        struct(l2.as("l"),
          round(lit(beta) * (l2 - acc.getField("l")) +
            lit(1.0 - beta) * acc.getField("b"), 6).as("b"))
      })
    packed
      .select(col(keyCol), n.as("n_days"),
        when(n >= 2, state.getField("l")).otherwise(y1).as("level"),
        when(n >= 2, state.getField("b")).as("trend"),
        explode(sequence(lit(1), lit(horizon))).as("h"))
      .select(col(keyCol), col("n_days"), col("level"), col("trend"),
        col("h"),
        when(col("n_days") >= 2,
          round(col("level") + col("h").cast("double") * col("trend"), 6))
          .as("forecast"))
  }

  /** Watermark-delay design table for a disordered event stream — the
    * `withWatermark` sizing question answered from history: for each
    * candidate allowed-lateness D, how many events a streaming job would
    * DROP. Micro-batch-faithful semantics (how Structured Streaming
    * actually advances watermarks): arrivals bucket into `batchUs`-sized
    * micro-batches, the watermark entering batch b is the max EVENT time
    * seen in any earlier batch, and an event is late by
    * `max(0, watermark − event_time)`. An event is dropped at delay D
    * when its lateness exceeds D. All times are exact LONG microseconds.
    * Null timestamps/arrivals excluded; the first batch is never late
    * (no watermark yet). Output per D: (delay_us, n_events, n_dropped,
    * pct_dropped, max_lateness_us), ratio 6 dp.
    *
    * Scale shape: one (batch) hash-agg for per-batch event-time maxes,
    * ONE window over the batch table (bounded by the time span ÷
    * batchUs, never the event count), a broadcast join back over the
    * scan, and a single-row conditional-sum reduce unpivoted over the
    * ≤ \|delays\| grid (the [[graft.ops.Chunking.truncationLoss]]
    * shape). */
  def watermarkPlan(df: DataFrame, tsCol: String, arrivalCol: String,
                    batchUs: Long, delays: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchUs >= 1, s"watermarkPlan: need batchUs >= 1, got $batchUs")
    require(delays.nonEmpty && delays.forall(_ >= 0),
      s"watermarkPlan: need delays >= 0, got $delays")
    val ds = delays.distinct.sorted
    // exact floor division (subtract-pmod): a double `/` would round the
    // quotient near batch boundaries at epoch-microsecond magnitudes
    val arrL = col(arrivalCol).cast("long")
    val ev = df
      .where(col(tsCol).isNotNull && col(arrivalCol).isNotNull)
      .select(unix_micros(col(tsCol)).as("__us"),
        ((arrL - pmod(arrL, lit(batchUs))) / batchUs).cast("long").as("__b"))
    val wmw = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = ev.groupBy("__b").agg(max("__us").as("__bmax"))
      .select(col("__b"), max("__bmax").over(wmw).as("__wm"))
    val late = ev.join(broadcast(wm), Seq("__b"))
      .select(greatest(lit(0L), coalesce(col("__wm") - col("__us"), lit(0L)))
        .as("__late"))
    val aggs = Seq(count(lit(1)).as("__n"),
      coalesce(max("__late"), lit(0L)).as("__mx")) ++
      ds.map(d => sum(when(col("__late") > d, 1L).otherwise(0L)).as(s"__d$d"))
    val wide = late.agg(aggs.head, aggs.tail: _*)
    wide.select(col("__n").as("n_events"), col("__mx").as("max_lateness_us"),
        explode(array(ds.map(d => struct(lit(d).as("delay_us"),
          col(s"__d$d").as("n_dropped"))): _*)).as("__x"))
      .where(col("n_events") > 0)
      .select(col("__x.delay_us").as("delay_us"), col("n_events"),
        col("__x.n_dropped").as("n_dropped"),
        round(col("__x.n_dropped").cast("double") /
          col("n_events").cast("double"), 6).as("pct_dropped"),
        col("max_lateness_us"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * data-driven credit split [[attribution]]'s positional rules only
    * approximate: build the first-order channel-transition chain over
    * each user's touch journey (START → touches ordered by (ts, id) → CONV
    * on the user's FIRST conversion, NULL otherwise), then credit each
    * channel by its REMOVAL EFFECT — how much P(CONV | START) drops when
    * that channel's state is deleted (transitions into it become lost
    * mass; nothing renormalizes, the standard convention). Absorption
    * probabilities come from `iters` unrolled fixed-point rounds
    * `p(s) ← round₆(P(s→CONV) + Σ_c P(s→c)·p(c))` — the [[Graph.pageRank]]
    * fixed-iteration device, with every term in a FIXED channel order on
    * a single pivoted row, so both engines evaluate the identical
    * expression tree (no sum-order ambiguity at all). Transition
    * probabilities are single divisions of exact LONG counts. Output per
    * channel: (channel, removal_effect, share [of Σ effects],
    * credited_conversions, base_conv_prob). 6 dp.
    *
    * Scale shape: one (user)-keyed conversion reduce, one journey window
    * over each user's own touches, ONE (src, dst) hash-agg — then the
    * whole chain solve happens on a single pivoted row whose width is
    * (|channels|+1)·(|channels|+2): the state space rides in the plan as
    * literals (`channels` must be small — the enum of touch types, not a
    * data-driven set). */
  def markovAttribution(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String, convType: String,
                        channels: Seq[String], iters: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(channels.nonEmpty && channels.size <= 8,
      s"markovAttribution: need 1..8 channels, got ${channels.size}")
    require(!channels.contains(convType),
      "markovAttribution: convType cannot also be a channel")
    require(iters >= 1 && iters <= 30,
      s"markovAttribution: need 1 <= iters <= 30, got $iters")
    val convTs = events.where(col(typeCol) === convType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(struct(col(tsCol).as("t"), col(idCol).as("i"))).as("__c"))
      .select(col("__u"), col("__c.t").as("__cts"), col("__c.i").as("__cid"))
    val touches = events.where(col(typeCol).isin(channels: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(typeCol).as("__ch"))
      .join(convTs, Seq("__u"), "left")
      .where(col("__cts").isNull || col("__ts") < col("__cts")
        || (col("__ts") === col("__cts") && col("__id") < col("__cid")))
    val w = Window.partitionBy("__u")
      .orderBy(col("__ts").asc, col("__id").asc)
    val seqd = touches
      .withColumn("__nxt", lead(col("__ch"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    val mid = seqd.select(col("__ch").as("src"),
      coalesce(col("__nxt"),
        when(col("__cts").isNotNull, lit("CONV")).otherwise(lit("NULL")))
        .as("dst"))
    val start = seqd.where(col("__rn") === 1)
      .select(lit("START").as("src"), col("__ch").as("dst"))
    val noTouch = convTs
      .join(seqd.select("__u").distinct(), Seq("__u"), "left_anti")
      .select(lit("START").as("src"), lit("CONV").as("dst"))
    val trans = mid.unionAll(start).unionAll(noTouch)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    // single-row pivot: exact counts per (src, dst) literal pair, plus
    // per-src denominators (NULL transitions count in the denominator)
    val srcs = "START" +: channels
    val cnt = (s: String, d: String) =>
      coalesce(sum(when(col("src") === s && col("dst") === d, col("n"))),
        lit(0L))
    val pivotAggs =
      (for { (s, i) <- srcs.zipWithIndex; (d, j) <- channels.zipWithIndex }
        yield cnt(s, d).as(s"__n_${i}_$j")) ++
      srcs.zipWithIndex.map { case (s, i) => cnt(s, "CONV").as(s"__nc_$i") } ++
      srcs.zipWithIndex.map { case (s, i) =>
        coalesce(sum(when(col("src") === s, col("n"))), lit(0L))
          .as(s"__d_$i") } :+
      coalesce(sum(when(col("dst") === "CONV", col("n"))), lit(0L))
        .as("__nconv")
    val pivoted = trans.agg(pivotAggs.head, pivotAggs.tail: _*)
    def prob(i: Int, j: Int): Column =
      when(col(s"__d_$i") > 0,
        col(s"__n_${i}_$j").cast("double") / col(s"__d_$i").cast("double"))
        .otherwise(lit(0.0))
    def probConv(i: Int): Column =
      when(col(s"__d_$i") > 0,
        col(s"__nc_$i").cast("double") / col(s"__d_$i").cast("double"))
        .otherwise(lit(0.0))
    // scenarios: -1 = baseline, k = channel k removed (its state's value
    // pinned to 0 by never updating it; terms into it are skipped — the
    // lost-mass convention). p starts at 0 everywhere.
    val scenarios = -1 +: channels.indices
    // a (scenario, state) value participates unless the state IS the
    // removed channel (START is state 0, channel k is state k + 1)
    val live = for (scen <- scenarios; i <- srcs.indices
                    if !(scen >= 0 && i == scen + 1)) yield (scen, i)
    val keep = pivoted.columns.toSeq.map(col)
    var cur = pivoted.select(
      (keep ++ live.map { case (scen, i) =>
        lit(0.0).as(s"__v_${scen}_$i") }): _*)
    for (_ <- 1 to iters) {
      val upd = live.map { case (scen, i) =>
        val terms = channels.indices
          .filter(j => !(scen >= 0 && j == scen))
          .map(j => prob(i, j) * col(s"__v_${scen}_${j + 1}"))
        round(terms.foldLeft(probConv(i))(_ + _), 6)
          .as(s"__v_${scen}_$i")
      }
      cur = cur.select((keep ++ upd): _*)
    }
    val base = col("__v_-1_0")
    val out = channels.zipWithIndex.map { case (ch, k) =>
      struct(lit(ch).as("channel"),
        round(base - col(s"__v_${k}_0"), 6).as("removal_effect"))
    }
    val effTotal = channels.indices
      .map(k => round(base - col(s"__v_${k}_0"), 6))
      .reduce(_ + _)
    cur.select(explode(array(out: _*)).as("__e"),
        effTotal.as("__tot"), base.as("base_conv_prob"),
        col("__nconv"))
      .select(col("__e.channel").as("channel"),
        col("__e.removal_effect").as("removal_effect"),
        round(when(col("__tot") > 0,
          col("__e.removal_effect") / col("__tot")).otherwise(lit(0.0)), 6)
          .as("share"),
        round(when(col("__tot") > 0,
          col("__e.removal_effect") / col("__tot")).otherwise(lit(0.0))
          * col("__nconv").cast("double"), 6).as("credited_conversions"),
        round(col("base_conv_prob"), 6).as("base_conv_prob"))
  }

  /** Classical seasonal decomposition of the daily value series with a
    * robust anomaly flag — total = trend + weekly seasonal + residual,
    * the structured view [[dowProfile]]'s variance split only summarizes
    * and [[cusum]]/EWMA monitor one component of. The day calendar is
    * DENSIFIED first (every day from min to max observed, absent days
    * zero-filled and present in the output) so a calendar gap cannot
    * silently widen the "7-day" window across weeks and skew both the
    * trend and the day-of-week seasonal means. Trend is the centered
    * 7-day moving average (edge days average their available window —
    * documented, mirrored); weekly seasonal is the day-of-week mean of
    * the detrended series; the anomaly gate is MAD-based:
    * |residual| > k · median(|residual|) (a level shift can't drag its
    * own threshold the way a σ-gate lets it). Replay-exact: daily
    * totals are micro-LONG sums, the trend division is exact-integer
    * sum / count, and each derived series re-snaps to micro-LONGs
    * before the next stage, so both engines subtract identical
    * integers. Output per day: (day, total, trend, seasonal, residual,
    * anomaly). 6 dp.
    *
    * Scale shape: ONE (day) hash-agg pre-reduces the log (map-side
    * combine); every window and percentile after runs over the
    * day-calendar-bounded daily table — the [[ewmaDaily]] family's
    * documented exact-by-contract rule. */
  def seasonalDecompose(events: DataFrame, tsCol: String, valCol: String,
                        madK: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(madK > 0, s"seasonalDecompose: need madK > 0, got $madK")
    val vm = round(coalesce(col(valCol), lit(0.0)).cast("double")
      * lit(1000000.0)).cast("long")
    val observed = events.where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(vm).as("__om"))
    // densify: rowsBetween(-3,3) over observed days only would let a
    // calendar gap widen the "7-day" window across weeks; a zero-filled
    // day grid keeps the window a true centered week everywhere
    val bounds = observed.agg(min("day").as("__d0"), max("day").as("__d1"))
    val daily = bounds
      .select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
      .join(observed, Seq("day"), "left")
      .select(col("day"), coalesce(col("__om"), lit(0L)).as("__tm"))
    val wTrend = Window.orderBy("day").rowsBetween(-3, 3)
    val withTrend = daily
      .withColumn("__trm",
        round(sum("__tm").over(wTrend).cast("double")
          / count(lit(1)).over(wTrend).cast("double")).cast("long"))
      .withColumn("__dtm", col("__tm") - col("__trm"))
      .withColumn("__dow", dayofweek(col("day")))
    val seasonal = withTrend.groupBy("__dow")
      .agg(round(sum("__dtm").cast("double")
        / count(lit(1)).cast("double")).cast("long").as("__sm"))
    val resid = withTrend.join(broadcast(seasonal), Seq("__dow"))
      .withColumn("__rm", col("__dtm") - col("__sm"))
    val gate = resid.agg(
      percentile(abs(col("__rm")).cast("double"), lit(0.5)).as("__mad"))
    resid.crossJoin(broadcast(gate))
      .select(col("day"),
        round(col("__tm").cast("double") / 1e6, 6).as("total"),
        round(col("__trm").cast("double") / 1e6, 6).as("trend"),
        round(col("__sm").cast("double") / 1e6, 6).as("seasonal"),
        round(col("__rm").cast("double") / 1e6, 6).as("residual"),
        (abs(col("__rm")).cast("double") > lit(madK) * col("__mad"))
          .as("anomaly"))
  }
}
