package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training-data
  * pipelines.
  *
  * `sample(fraction)` / `rand()` are neither stable across runs nor across
  * engines; a reproducible pipeline derives split membership from the ROW
  * ITSELF. Bucket = md5 of the id, first 8 hex digits as an integer,
  * mod 100 — any engine with md5 reproduces the exact same split, so the
  * train/val boundary survives re-runs, re-partitioning, backfills, and
  * engine migrations. Pure per-row projection: no shuffle at any scale.
  */
object Sampling {

  /** Stable bucket 0-99 from the id's md5 (nibble arithmetic, not a
    * native hash fn, so external engines can reproduce it). */
  def md5Bucket(id: Column): Column = md5Mod(id, 100L)

  /** [[md5Bucket]] at arbitrary modulus — finer-grained membership
    * thresholds (1e-6 resolution at m = 1,000,000). */
  def md5Mod(id: Column, m: Long): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(m))

  /** Assign each row a named split by cumulative percentage. Weights are
    * integer percents summing to ≤ 100 (a remainder falls into the last
    * split). E.g. `Seq("train" -> 90, "val" -> 5, "test" -> 5)`. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      "split percents must sum to <= 100")
    val b = md5Bucket(col(idCol))
    val bounds = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assignment = splits.map(_._1).zip(bounds).init
      .foldRight(lit(splits.last._1)) { case ((name, hi), fallback) =>
        when(b < hi, name).otherwise(fallback)
      }
    df.withColumn("split", assignment)
  }

  /** Deterministic p-percent sample (membership stable across runs).
    *
    * Applied with the same JOIN KEY and rate on several tables, this is
    * COORDINATED sampling: `deterministicSample(orders, "o_orderkey", p)`
    * ⋈ `deterministicSample(lineitem, "l_orderkey", p)` keeps every
    * sampled row's join partners — referential integrity survives the
    * sample (q160), where independent row sampling would keep ~p² of the
    * join. The membership predicate is a scan-stage projection, so each
    * table's sample pushes down with no coordination traffic at all. */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.where(md5Bucket(col(idCol)) < percent)

  /** Stratified deterministic sample: a different keep-percentage per value
    * of `strataCol` (e.g. downsample the dominant language, keep all of a
    * rare one — the standard corpus-rebalancing move). Rows whose stratum is
    * not in `percents` keep `defaultPercent`. Same md5-bucket membership as
    * [[deterministicSample]]: pure per-row projection — no shuffle, no
    * per-stratum pass, stable across runs/engines regardless of how many
    * strata exist. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       percents: Seq[(String, Int)], defaultPercent: Int): DataFrame = {
    require(percents.nonEmpty, "stratifiedSample: provide at least one stratum")
    require((defaultPercent +: percents.map(_._2)).forall(p => p >= 0 && p <= 100),
      "stratifiedSample: percents must be in [0, 100]")
    val threshold = percents.foldRight(lit(defaultPercent)) {
      case ((stratum, p), other) =>
        when(col(strataCol) === stratum, lit(p)).otherwise(other)
    }
    df.where(md5Bucket(col(idCol)) < threshold)
  }

  /** Downsample each stratum so the kept corpus matches the target
    * weight distribution EXACTLY in expectation, keeping as much data as
    * possible without upsampling: the binding stratum (smallest n/w)
    * survives whole, every other stratum is thinned to proportion. Strata
    * absent from `weights` are dropped. Membership is the md5 hash at
    * 1e-6 granularity — deterministic across runs/engines; realized
    * counts differ from expectation only by hash-binomial noise.
    *
    * Scale shape: one tiny counts aggregate, the scalar and per-stratum
    * rate frames broadcast back over the scan — the data itself moves
    * zero times. The "mix web/books/code to 50/30/20" move, declaratively.
    */
  def rebalanceToWeights(df: DataFrame, idCol: String, strataCol: String,
                         weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "rebalanceToWeights: weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toDF(strataCol, "__w")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val capped = counts.join(wdf, strataCol)
      .withColumn("__cap", col("__n").cast("double") / col("__w"))
    val scale = capped.agg(min("__cap").as("__scale"))
    val rates = capped.crossJoin(broadcast(scale))
      .select(col(strataCol),
        (col("__scale") * col("__w") / col("__n")).as("__rate"))
    df.join(broadcast(rates), strataCol)
      .where(md5Mod(col(idCol), 1000000L) < col("__rate") * 1000000.0)
      .drop("__rate")
  }

  /** Token-budget mixture plan: given per-document token counts, target
    * mixture weights, and a total training-token budget, the per-source
    * planning table a run derives before sampling — available documents
    * and tokens, the source's normalized target share of the budget, and
    * `epochs` = target_tokens / available_tokens (how many times the
    * source must repeat to fill its share; < 1 means downsample, > 1
    * means the source repeats — the signal mixture designers watch for
    * over-epoching). Sources absent from `weights` are dropped, mirroring
    * [[rebalanceToWeights]]'s contract; weights are normalized over the
    * LISTED sources.
    *
    * Engine-exact: counts and token sums are integer aggregates; the
    * share/epoch columns are single IEEE divisions rounded to 6 dp.
    * Scale shape: one hash-agg on the source, then arithmetic over
    * |sources| rows — the corpus moves once. */
  def tokenBudgetPlan(df: DataFrame, srcCol: String, tokenCol: String,
                      weights: Seq[(String, Double)],
                      totalBudget: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "tokenBudgetPlan: weights must be positive")
    require(totalBudget > 0, s"tokenBudgetPlan: totalBudget must be > 0, got $totalBudget")
    val spark = df.sparkSession
    import spark.implicits._
    val wsum = weights.map(_._2).sum
    val wdf = weights.map { case (s, w) => (s, w / wsum) }.toDF(srcCol, "target_share")
    df.groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).cast("long").as("n_tokens"))
      .join(broadcast(wdf), srcCol)
      .withColumn("target_tokens",
        round(col("target_share") * totalBudget).cast("long"))
      .select(col(srcCol), col("n_docs"), col("n_tokens"),
        round(col("target_share"), 6).as("target_share"),
        col("target_tokens"),
        round(col("target_tokens").cast("double") / col("n_tokens").cast("double"), 6)
          .as("epochs"))
  }

  /** Temperature-scaled source mixture (the multilingual/source sampling
    * rule popularized by XLM-R/mT5): raw share `p_i = n_i / N`, tempered
    * target share `q_i = p_i^alpha / Σ p_j^alpha`, and
    * `sample_rate = (q_i/p_i) / max_j(q_j/p_j)` — relative up-weights
    * normalized so the MOST up-weighted (smallest) source keeps every
    * row and all rates stay ≤ 1. `alpha = 1` reproduces the natural mix
    * (all rates 1); `alpha = 0` targets the uniform mix; in between,
    * head sources are damped and tail sources promoted — the standard
    * low-resource-language boost.
    *
    * Engine-exact: shares are ratios of exact integer counts, `pow` and
    * the divisions are single IEEE double operations rounded to 6 dp.
    * Scale shape: one hash-agg on the source, then arithmetic over
    * |sources| rows joined via tiny broadcast totals — the corpus moves
    * once; feed the rates to [[rebalanceToWeights]]-style md5 gating to
    * materialize the sample. */
  def temperatureMixture(df: DataFrame, srcCol: String, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperatureMixture: need 0 <= alpha <= 1, got $alpha")
    val counts = graft.core.CacheRegistry.persist(
      df.groupBy(srcCol).agg(count(lit(1)).as("n_docs")))
    val tot = counts.agg(sum("n_docs").cast("double").as("__tot"))
    val shared = graft.core.CacheRegistry.persist(
      counts.crossJoin(broadcast(tot))
        .withColumn("__p", col("n_docs").cast("double") / col("__tot"))
        .withColumn("__pa", pow(col("__p"), alpha)))
    val ptot = shared.agg(sum("__pa").as("__ptot"))
    val scored = graft.core.CacheRegistry.persist(
      shared.crossJoin(broadcast(ptot))
        .withColumn("__q", col("__pa") / col("__ptot"))
        .withColumn("__r", col("__q") / col("__p")))
    val rmax = scored.agg(max("__r").as("__rmax"))
    scored.crossJoin(broadcast(rmax))
      .select(col(srcCol), col("n_docs"),
        round(col("__p"), 6).as("share"),
        round(col("__q"), 6).as("temp_share"),
        round(col("__r") / col("__rmax"), 6).as("sample_rate"))
  }

  /** Keep at most `k` rows per value of `strataCol`, chosen by md5-of-id
    * order — the "cap documents per domain" move that stops one crawl
    * host from dominating a corpus. Deterministic: the md5 order is a
    * pure function of the ids, so the same rows survive across runs,
    * partitionings, and engines (ties on the md5 break on the id, so the
    * cut is total-ordered). One shuffle on the stratum; the per-group
    * sort is bounded by group size, and a running top-k rank (not a full
    * collect) is what executes. When a single stratum is itself too hot
    * to sort, the no-sort path is a bounded min-k aggregate over
    * "md5:id" keys ([[org.apache.spark.sql.graft.KmvSketchAgg]]'s
    * device, as [[graft.ops.Corpus.invertedIndex]] does for postings)
    * plus a semi-join back on the winners. */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String, k: Int): DataFrame = {
    require(k > 0, s"capPerStratum: need k > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(md5(col(idCol).cast("string")), col(idCol))))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic weighted sampling without replacement, `k` rows per
    * stratum (Efraimidis–Spirakis A-ES, Inf. Proc. Letters 2006): each
    * row gets key `u^(1/w)` with `u` a uniform derived from the id's md5
    * (first 8 hex nibbles / 2³²), and the stratum's top-`k` keys win —
    * inclusion probability rises with weight, yet the draw is a pure
    * function of the ids: replays, retries, backfills, and engine
    * migrations reproduce the identical sample (the weighted twin of
    * [[deterministicSample]]; `df.sample()` guarantees none of that).
    * Rows with null or non-positive weight are excluded. Keys are
    * 6 dp-rounded before ranking so cross-engine `pow` ulp differences
    * cannot reorder; ties break on the id.
    *
    * Scale shape: one scan-stage key projection + one per-stratum
    * top-`k` window (shuffle on the stratum; swap the window for a
    * `max_by(k)`-style partial top-k heap if strata are few and hot). */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"weightedSample: need k > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("wkey",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(col("wkey").desc, col(idCol))))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al., NeurIPS 2023): score every raw document by
    * how target-like its hashed-unigram distribution is. Both corpora are
    * reduced to `numBuckets` hashed token features; each bucket gets a
    * log-likelihood ratio `L_b = ln p_target(b) − ln p_raw(b)` under
    * add-one smoothing, and a document's `log_weight` is the sum of its
    * tokens' ratios — the importance weight DSIR feeds to weighted
    * sampling ([[weightedSample]] on `exp(log_weight)`, or rank-filter on
    * `avg_log_ratio` via [[keepTopQuantile]] for a length-neutral cut).
    * Positive means "looks like the target corpus", negative means
    * "looks like the raw pool".
    *
    * Hash buckets use the engine-portable md5 device ([[md5Mod]] of the
    * token), so any engine reproduces the exact same feature space; the
    * per-document sum of `count_b · L_b` terms is rounded to 6 dp —
    * summation order and `ln` ulp differences across engines sit at
    * ~1e-13 relative error, far below the rounding quantum.
    *
    * Scale shape: each side's bucket histogram is ONE token-stream
    * hash-agg with map-side combine onto ≤ `numBuckets` rows; the
    * log-ratio table (≤ `numBuckets` rows) broadcasts back over the raw
    * token stream, and the per-document sum is one `groupBy(id)` whose
    * map-side partials already collapse each document (a document's
    * tokens never cross partitions after the scan-stage explode). The
    * corpus text itself is never shuffled, and nothing scales with the
    * target corpus but its own one-pass histogram. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, numBuckets: Int): DataFrame = {
    require(numBuckets > 1, s"dsirWeights: need numBuckets > 1, got $numBuckets")
    def toks(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(split(col(textCol), " ")).as("__term"): _*)
        .withColumn("__b", md5Mod(col("__term"), numBuckets))
    val rawToks = graft.core.CacheRegistry.persist(toks(raw, col(idCol)))
    val rawHist = graft.core.CacheRegistry.persist(
      rawToks.groupBy("__b").agg(count(lit(1)).as("__rn")))
    val tgtHist = toks(target).groupBy("__b").agg(count(lit(1)).as("__tn"))
    val rawTot = rawHist.agg(sum("__rn").as("__rt"))
    val tgtTot = tgtHist.agg(sum("__tn").as("__tt"))
    // only buckets present in raw can be hit by a raw document, so the
    // raw histogram is the spine; absent target buckets smooth to +1
    val ratios = rawHist
      .join(tgtHist, Seq("__b"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("__b"),
        (log((coalesce(col("__tn"), lit(0L)) + 1).cast("double") /
             (coalesce(col("__tt"), lit(0L)) + numBuckets).cast("double"))
          - log((col("__rn") + 1).cast("double") /
                (col("__rt") + numBuckets).cast("double"))).as("__l"))
    rawToks
      .join(broadcast(ratios), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__l")).as("__sum"))
      .select(col(idCol), col("n_tokens"),
        round(col("__sum"), 6).as("log_weight"),
        round(col("__sum") / col("n_tokens"), 6).as("avg_log_ratio"))
  }

  /** EXACTLY-k deterministic uniform sample: the k rows with the smallest
    * md5(id) keys (ties on the id). [[deterministicSample]] keeps a
    * deterministic ~p% whose realized size carries hash-binomial noise;
    * eval sets and fixed-budget probes need an exact count — the md5
    * order gives the same k rows on any engine, any partitioning, any
    * run, and ADDING rows only ever swaps members at the boundary (the
    * sample is the k-prefix of a total order, so it's as stable under
    * corpus growth as a hash sample can be).
    *
    * Scale shape: TakeOrderedAndProject — per-partition k-heaps merged on
    * the driver, no global sort, no shuffle of the corpus. */
  def exactKSample(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"exactKSample: need k > 0, got $k")
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(k)
  }

  /** EXACTLY k rows PER STRATUM — the k-prefix of the md5(id) total order
    * within each value of `stratumCol` (a stratum with fewer than k rows
    * keeps all of them). Balanced eval sets and per-source probe budgets
    * need exact per-group counts, which [[stratifiedSample]]'s rate-based
    * buckets can't give; membership is engine-portable and growth-stable
    * for the same reason [[exactKSample]]'s is.
    *
    * Scale shape: ONE exchange on the stratum key; the `row_number <= k`
    * predicate is recognized by Spark's WindowGroupLimit rewrite, so each
    * map task keeps only a per-stratum k-heap BEFORE the shuffle — the
    * exchange carries ≤ k·|strata| rows per task, never the corpus, and
    * no stratum is ever fully sorted. */
  def exactKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"exactKPerStratum: need k > 0, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Class-balanced exact downsample: every label keeps EXACTLY the
    * minority class's count, chosen as the k-prefix of the md5(id) order
    * within the label — the classifier-training rebalance that kills
    * majority-class bias without RNG, oversampling, or weights. The same
    * corpus always yields the same balanced set on any engine; adding
    * rows to a label only ever APPENDS to its candidate order.
    *
    * Scale shape: the per-label counts are one hash-agg; their min is an
    * agg of the agg (≤ |labels| rows) broadcast back; the rank is one
    * label-keyed window. The min-count is data-dependent, so Spark's
    * WindowGroupLimit rewrite cannot prune map-side here — each label
    * partition sorts in full. When |minority| is known (or capped),
    * prefer [[exactKPerStratum]] with a literal k, which does prune. */
  def balanceToMinority(df: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val minK = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__n"))
      .agg(min("__n").as("__min_k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.crossJoin(broadcast(minK))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__min_k"))
      .drop("__rn", "__min_k")
  }

  /** Deterministic training-order tape: weighted fair queueing over
    * sources. Each row gets `sched_key = source_rank / weight` where
    * `source_rank` is its 1-based position in the source's md5(id) order —
    * reading rows by ascending `sched_key` interleaves sources at exactly
    * their weight ratios from the very first batch (weight 2.0 appears
    * twice as often as 1.0), with no epoch boundary and no RNG. The same
    * corpus + weights always produce the same tape on any engine. Rows
    * whose source has no weight are dropped (the mixture IS the spec of
    * what trains). Keys are exact IEEE divisions of small integers — no
    * rounding needed for cross-engine agreement.
    *
    * Scale shape: one exchange on the source key + per-source sort for
    * the rank window. A single source skewing the corpus serializes its
    * own rank sort; at that scale rank each source with
    * [[graft.ops.Layout.globalRank]] (range-exchange, no single
    * partition) and join the keys back — same output, documented here so
    * nobody discovers it mid-run. */
  def mixtureSchedule(df: DataFrame, idCol: String, sourceCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "mixtureSchedule: need at least one weight")
    weights.foreach { case (s, w) =>
      require(w > 0, s"mixtureSchedule: weight for '$s' must be > 0, got $w") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val weightExpr = weights.foldLeft(lit(null).cast("double")) {
      case (e, (s, wt)) => when(col(sourceCol) === s, lit(wt)).otherwise(e)
    }
    df.where(col(sourceCol).isInCollection(weights.map(_._1)))
      .withColumn("source_rank", row_number().over(w).cast("long"))
      .withColumn("sched_key", col("source_rank") / weightExpr)
  }

  /** Tape MIXING audit — is a proposed training order actually shuffled?
    * A badly mixed tape (long single-source runs) trains on correlated
    * batches; this is the acceptance test for [[mixtureSchedule]]'s
    * output (or any ordered tape): the observed number of label RUNS
    * against the Wald–Wolfowitz / Barton–David expectation under random
    * arrangement, `E[R] = N + 1 − Σn_i²/N` with the k-category variance
    * `Var[R] = [Σn_i²(Σn_i² + N(N+1)) − 2N·Σn_i³ − N³] / (N²(N−1))`,
    * and the z score (z ≪ 0 = under-mixed/clumped, z ≫ 0 =
    * over-alternating). Runs are counted WITHOUT a global-order window:
    * rows are ranked by the range-exchange device and adjacent
    * positions meet in an equi-join on `rank = rank+1`; every moment is
    * an exact integer sum, the tail one IEEE expression. `(orderCol,
    * tieCol)` must be a total order. Consume inside
    * `CacheRegistry.scoped`. Output: one row — (n, k_labels, runs,
    * runs_exp, runs_var, z), 6 dp; n < 2 or zero variance → null z.
    *
    * Scale shape: one range exchange to rank the tape, one rank-keyed
    * self-join (shuffle on the rank — adjacent ranks co-locate), one
    * label hash-agg for the moments, one scalar reduce. */
  def tapeMixingAudit(df: DataFrame, orderCol: String, tieCol: String,
                      labelCol: String): DataFrame = {
    val ranked = graft.core.CacheRegistry.persist(
      graft.ops.Layout.globalRank(
        df.select(col(orderCol).as("__o"), col(tieCol).as("__t"),
          col(labelCol).as("__l")),
        "__o", "__t", rankCol = "__r"))
    val a = ranked.select(col("__r"), col("__l"))
    val b = ranked.select((col("__r") - 1L).as("__r"), col("__l").as("__ln"))
    val breaks = a.join(b, Seq("__r"))
      .agg(count(lit(1)).as("__adj"),
        count(when(!(col("__l") <=> col("__ln")), 1)).as("__brk"))
    val moments = ranked.groupBy("__l")
      .agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("k_labels"),
        coalesce(sum("__n"), lit(0L)).as("__N"),
        coalesce(sum(col("__n") * col("__n")), lit(0L)).as("__s2"),
        coalesce(sum(col("__n") * col("__n") * col("__n")), lit(0L))
          .as("__s3"))
    val joined = moments.crossJoin(breaks)
    val nD = col("__N").cast("double")
    val s2 = col("__s2").cast("double")
    val s3 = col("__s3").cast("double")
    val runs = when(col("__N") > 0, col("__brk") + 1L)
    val rExp = nD + 1.0 - s2 / nD
    val rVar = (s2 * (s2 + nD * (nD + 1.0)) - lit(2.0) * nD * s3 -
      nD * nD * nD) / (nD * nD * (nD - 1.0))
    joined.select(col("__N").as("n"), col("k_labels"),
      runs.as("runs"),
      when(col("__N") >= 2, round(rExp, 6)).as("runs_exp"),
      when(col("__N") >= 2, round(rVar, 6)).as("runs_var"),
      when(col("__N") >= 2 && rVar > 0,
        round((runs.cast("double") - rExp) / sqrt(rVar), 6)).as("z"))
  }

  /** Deterministic negative sampling for implicit-feedback training:
    * for every user in `interactions`, `k` items they did NOT interact
    * with, drawn from a deterministic `poolSize`-item candidate pool
    * (the [[exactKSample]] md5-prefix of the item universe). Per-user
    * order is the md5 of the (user, item) pair, so two users get
    * independent negative orders, and the same corpus always yields the
    * same negatives on any engine. The pool bounds the candidate blow-up
    * at |users|·poolSize — the price is that negatives only come from
    * the pool (size it ≥ a few× k; a user who interacted with most of
    * the pool gets fewer than k).
    *
    * Scale shape: the pool is ≤ poolSize rows, broadcast; candidates
    * are a broadcast cross join (|users|·poolSize, generated map-side);
    * the seen-filter is one anti-join on the (user, item) key; the
    * literal-k cut goes through Spark's WindowGroupLimit map-side
    * heaps. Output: (userCol, itemCol, neg_rank). */
  def negativeSamples(interactions: DataFrame, userCol: String, itemCol: String,
      itemPool: DataFrame, poolItemCol: String, poolSize: Int, k: Int): DataFrame = {
    require(poolSize > 0, s"negativeSamples: need poolSize > 0, got $poolSize")
    require(k > 0 && k <= poolSize,
      s"negativeSamples: need 0 < k <= poolSize, got k=$k poolSize=$poolSize")
    val pool = exactKSample(
      itemPool.select(col(poolItemCol).as(itemCol)).distinct(), itemCol, poolSize)
    // persisted: the distinct-users projection and the seen anti-join
    // both consume the interactions scan
    val seen = graft.core.CacheRegistry.persist(
      interactions.select(col(userCol), col(itemCol)).distinct())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(md5(concat_ws("|", col(userCol).cast("string"),
        col(itemCol).cast("string"))), col(itemCol))
    seen.select(col(userCol)).distinct()
      .crossJoin(broadcast(pool))
      .join(seen, Seq(userCol, itemCol), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .where(col("neg_rank") <= k)
  }

  /** Group-aware k-fold assignment (scikit-learn `GroupKFold` semantics,
    * deterministically): every row of a group lands in the same fold, so
    * evaluation never sees a group that training saw — the split-leakage
    * guard at assignment time rather than audit time
    * ([[graft.ops.Dedup.splitLeakage]] is the after-the-fact check). The
    * fold is [[md5Mod]] of the GROUP key: stable across runs, engines,
    * partitionings, and corpus growth (new rows of a known group join its
    * existing fold). Pure scan-stage projection — zero shuffle. */
  def groupKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 1, s"groupKFold: need k > 1, got $k")
    df.withColumn("fold", md5Mod(col(groupCol), k.toLong))
  }

  /** Quantile-rank filter per stratum: keep each stratum's top `q`
    * fraction by `scoreCol` — "top 30% quality per source", the
    * RELATIVE curation cut that adapts to each source's own score
    * distribution where a global threshold ([[graft.ops.Quality]] rules)
    * over-prunes weak sources and under-prunes strong ones. Emits every
    * row with its `cume_dist` (share of the stratum scoring ≤ it, 6 dp)
    * and `kept = cume_dist > 1 − q` — STRICT, so a stratum of n
    * distinct scores keeps exactly ⌈q·n⌉ rows (`≥` would also keep the
    * row sitting exactly AT the cut). The verdict compares the RAW
    * cume_dist (an exact k/n rational, identical in any engine), not the
    * display-rounded one — at a billion-row stratum the k/n quantum is
    * finer than any fixed rounding. Standard SQL tie semantics (equal
    * scores share a cume_dist, so a tie straddling the cut keeps ALL its
    * rows — the filter never splits equals arbitrarily).
    *
    * Scale shape: ONE window pass — shuffle on the stratum, per-partition
    * sort by score; no global sort, no percentile pre-pass, and the
    * quantile is exact (a `percentile_approx` threshold join is the
    * looser-but-cheaper twin when strata are too hot to sort). */
  def keepTopQuantile(df: DataFrame, strataCol: String, scoreCol: String,
                      q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"keepTopQuantile: need q in (0, 1], got $q")
    import org.apache.spark.sql.expressions.Window
    val cd = cume_dist().over(
      Window.partitionBy(col(strataCol)).orderBy(col(scoreCol)))
    df.withColumn("__cd", cd)
      .withColumn("cume_dist", round(col("__cd"), 6))
      .withColumn("kept", col("__cd") > lit(1.0) - lit(q))
      .drop("__cd")
  }

  /** 2-D Pareto frontier (skyline) selection: keep the rows whose
    * (x, y) is dominated by NO other point (q dominates p iff q ≥ p in
    * both coordinates and > in at least one, both maximized) — the
    * multi-criteria curation cut when two scores shouldn't be collapsed
    * into one weighted number (length × diversity, quality × novelty):
    * the frontier is every trade-off that is not strictly worse than
    * another. All rows sharing a frontier point are kept; null
    * coordinates are excluded.
    *
    * Scale shape: dominance in 2-D reduces to ONE ordered pass — a
    * point is dominated iff the running max of y over all points
    * earlier in (x desc, y desc) order reaches its own y. The global
    * order is range-partitioned ([[graft.ops.Layout.globalRank]]'s
    * device: per-range window + `numRanges` prior-range maxima folded
    * into a literal expression — never an `Exchange SinglePartition`),
    * the frontier point set broadcasts back, and the O(n²) NOT-EXISTS
    * formulation appears only in the oracle. */
  def paretoFrontier2D(df: DataFrame, idCol: String, xCol: String,
                       yCol: String, numRanges: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numRanges > 0, s"paretoFrontier2D: need numRanges > 0, got $numRanges")
    val pts = graft.core.CacheRegistry.persist(
      df.where(col(xCol).isNotNull && col(yCol).isNotNull)
        .select(col(xCol).cast("double").as("__x"),
          col(yCol).cast("double").as("__y"))
        .distinct()
        .repartitionByRange(numRanges, col("__x").desc, col("__y").desc)
        .withColumn("__range", spark_partition_id()))
    // prior-range running maxima: ranges are ordered by (x desc, y desc),
    // so everything in an earlier range precedes this one in the scan
    val maxes = pts.groupBy("__range").agg(max("__y").as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    var run = Double.NegativeInfinity
    val prior = maxes.map { case (pid, m) =>
      val p = pid -> run; run = math.max(run, m); p
    }
    val priorExpr = prior.foldLeft(lit(Double.NegativeInfinity)) {
      case (e, (pid, mx)) => when(col("__range") === pid, lit(mx)).otherwise(e)
    }
    val w = Window.partitionBy(col("__range"))
      .orderBy(col("__x").desc, col("__y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = pts
      .withColumn("__dom",
        greatest(coalesce(max(col("__y")).over(w),
          lit(Double.NegativeInfinity)), priorExpr) >= col("__y"))
      .where(!col("__dom"))
      .select(col("__x"), col("__y"))
    df.join(broadcast(frontier),
        col(xCol).cast("double") === col("__x") &&
          col(yCol).cast("double") === col("__y"))
      .select(col(idCol), col(xCol), col(yCol))
  }

  /** Cross-source quantile normalization: each row's score is replaced
    * by the GLOBAL score at its source-LOCAL quantile rank — the
    * calibration step before comparing or mixing per-source quality
    * scores whose scales drifted (one scorer's 0.6 is another's 0.9;
    * after normalization the top decile of every source maps to the
    * same global value range). Rank = exact `cume_dist` within the
    * source; the global quantile curve is an EXACT `percentile` at
    * `gridSize` grid points, each 6 dp-rounded at build time (the
    * [[graft.ops.Quality.winsorize]] boundary-stability device), and
    * the row maps to grid cell `ceil(p·gridSize)` (nearest quantile at
    * or above its rank). NULL scores are dropped. Output: (id, source,
    * score, norm_score).
    *
    * Scale shape: one window exchange keyed on the source for the
    * ranks; the reference curve is ONE global aggregate reduced to
    * `gridSize` doubles and broadcast back over a scan-stage lookup —
    * the corpus is never globally sorted (swap the exact `percentile`
    * for `approx_percentile` at unbounded scale, same plan shape). */
  def quantileNormalize(df: DataFrame, idCol: String, srcCol: String,
                        scoreCol: String, gridSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gridSize >= 2,
      s"quantileNormalize: need gridSize >= 2, got $gridSize")
    val v = df.where(col(scoreCol).isNotNull)
    val ps = (1 to gridSize).map(_.toDouble / gridSize)
    val grid = v.agg(transform(
      percentile(col(scoreCol), typedLit(ps)),
      x => round(x, 6)).as("__grid"))
    val p = cume_dist().over(
      Window.partitionBy(col(srcCol)).orderBy(col(scoreCol)))
    v.select(col(idCol), col(srcCol).as("source"),
        col(scoreCol).as("score"), p.as("__p"))
      .crossJoin(broadcast(grid))
      .select(col(idCol), col("source"), col("score"),
        element_at(col("__grid"),
          ceil(col("__p") * gridSize).cast("int")).as("norm_score"))
  }

  /** Purged temporal k-fold assignment with an embargo (the time-series
    * cross-validation split, de Prado-style): the observed time range
    * splits into `k` equal-width contiguous folds, and rows within
    * `embargoMs` of a fold boundary are flagged `is_embargo` — training
    * on `fold != i AND NOT is_embargo` keeps serially-correlated
    * neighbors of the validation fold out of the training set, the
    * leakage a random k-fold over time-series data commits silently
    * ([[groupKFold]] solves the entity-leakage version; this solves the
    * autocorrelation version). Fold edges are integer-microsecond
    * arithmetic — `fold = ⌊(t − lo)·k / span⌋` capped at k−1 — so any
    * engine replays membership exactly; the embargo test reuses the
    * same formula: a row is embargoed iff the fold of `t − embargo` and
    * `t + embargo` (range-clamped) differ, which is precisely "within
    * embargo of some boundary" with no boundary enumeration.
    * Output: (id, ts, fold, is_embargo).
    *
    * Scale shape: one 1-row min/max aggregate broadcast back over the
    * scan; the assignment itself is a codegen'd scan-stage expression —
    * no shuffle, no window, nothing scales with n but the scan. */
  def temporalFolds(df: DataFrame, idCol: String, tsCol: String,
                    k: Int, embargoMs: Long): DataFrame = {
    require(k >= 2, s"temporalFolds: need k >= 2 folds, got $k")
    require(embargoMs >= 0, s"temporalFolds: need embargoMs >= 0, got $embargoMs")
    val us = unix_micros(col(tsCol))
    val base = df.where(col(tsCol).isNotNull)
      .select(col(idCol), col(tsCol), us.as("__us"))
    val bounds = base.agg(min("__us").as("__lo"), max("__us").as("__hi"))
    val span = col("__hi") - col("__lo") + 1L
    // double division then floor on BOTH engines: numerator ≤ span·k
    // ≪ 2^53, so the IEEE quotient is bit-identical cross-engine and
    // the floor can't disagree (exact integer div would differ only in
    // sub-ulp cases, and then identically on each side)
    def foldOf(t: Column) = {
      val clamped = greatest(col("__lo"), least(col("__hi"), t))
      least(lit(k - 1), floor((clamped - col("__lo")) * k / span).cast("int"))
    }
    val e = embargoMs * 1000L
    base.crossJoin(broadcast(bounds))
      .select(col(idCol), col(tsCol),
        foldOf(col("__us")).as("fold"),
        (foldOf(col("__us") - e) =!= foldOf(col("__us") + e)).as("is_embargo"))
  }

  /** Effective sample size of an importance-weighted corpus — the
    * one-number sanity check on any reweighting ([[dsirWeights]],
    * [[temperatureMixture]]): Kish's `ESS = (Σw)²/Σw²`. An `ess_ratio`
    * near 1 means the weights barely move the mixture; near 1/n means a
    * handful of documents dominate the gradient and the reweighting has
    * effectively shrunk the corpus to them. Takes LOG weights (what
    * [[dsirWeights]] emits — raw weights overflow doubles at corpus
    * scale); weights are max-normalized first (ESS is scale-invariant),
    * so `w' = exp(lw − max lw) ∈ (0, 1]`. Determinism device: each w'
    * snaps to nano-integers before the sums — S₁ and S₂ accumulate as
    * exact decimal(38,0) (S₂'s 10¹⁸-scale terms overflow a LONG), and
    * the nano factors cancel in `ESS = S₁²/S₂·(still exact)`. Weights
    * below 5·10⁻¹⁰ of the max snap to 0 — their true contribution is
    * below the 6 dp output quantum. Null log-weights are excluded. One
    * row: (n, max_log_weight, ess, ess_ratio), 6 dp.
    *
    * Scale shape: one max-reduce, one broadcast of the scalar, one
    * sum-reduce — two scans, no shuffle beyond the partial-agg trees. */
  def importanceEss(df: DataFrame, logWeightCol: String): DataFrame = {
    val base = df.where(col(logWeightCol).isNotNull)
      .select(col(logWeightCol).cast("double").as("__lw"))
    val mx = base.agg(max("__lw").as("__mx"))
    val nano = round(exp(col("__lw") - col("__mx")) * lit(1e9))
      .cast("decimal(38,0)")
    val sums = base.crossJoin(broadcast(mx))
      .select(nano.as("__w"), col("__mx"))
      .agg(count(lit(1)).as("__n"), max("__mx").as("__mx"),
        sum(col("__w")).as("__s1"), sum(col("__w") * col("__w")).as("__s2"))
    sums.where(col("__n") > 0 && col("__s2") > 0)
      .select(col("__n").as("n"), round(col("__mx"), 6).as("max_log_weight"),
        round(col("__s1").cast("double") * col("__s1").cast("double") /
          col("__s2").cast("double"), 6).as("ess"),
        round(col("__s1").cast("double") * col("__s1").cast("double") /
          col("__s2").cast("double") / col("__n").cast("double"), 6)
          .as("ess_ratio"))
  }

  /** Neyman-optimal stratified sample allocation — the survey-sampling
    * answer to "I can afford n labeled docs; how many from each source":
    * allocate `n_h ∝ N_h·σ_h` (minimizes the stratified-mean variance at
    * fixed budget — big AND internally-varied strata earn more), then
    * integerize by LARGEST REMAINDER so the allocations sum exactly to
    * the budget. Determinism: values snap to 6 dp so the per-stratum
    * population moments are exact decimal sums; σ, the weights, and the
    * fractional parts are mirrored double arithmetic, and the remainder
    * ranking snaps fractions to micro-integers (ties to the smaller
    * stratum key). An allocation may exceed its stratum's size when the
    * budget is large — `feasible_alloc` caps it (the excess is
    * deliberately NOT redistributed; redistribution is iterative and
    * belongs to the caller's loop). All-zero-σ inputs yield null
    * allocations (no Neyman optimum exists; fall back to proportional).
    * Null values are excluded. Output per stratum: (stratum, n_rows, sd,
    * weight_share, alloc, feasible_alloc), 6 dp.
    *
    * Scale shape: ONE stratum hash-agg of count/Σ/Σ² micro-partials
    * (map-side combine), then windows over the STRATUM table — bounded
    * by the stratum vocabulary, never the data. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valCol: String,
                       budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"neymanAllocation: need budget >= 1, got $budget")
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val red = df.where(col(valCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(vm).cast("decimal(38,0)").as("__s1"),
        sum(vm.cast("decimal(38,0)") * vm.cast("decimal(38,0)")).as("__s2"))
    val nD = col("n_rows").cast("double")
    // population variance from the exact micro moments
    val mean = col("__s1").cast("double") / lit(1e6) / nD
    val varP = (col("__s2").cast("double") / lit(1e12) -
      (col("__s1").cast("double") / lit(1e6)) *
        (col("__s1").cast("double") / lit(1e6)) / nD) / nD
    val sd = sqrt(greatest(varP, lit(0.0)))
    val all = Window.partitionBy(lit(1))
    val w = nD * sd
    val staged = red.select(col(stratumCol), col("n_rows"), sd.as("__sd"),
      w.as("__w"), sum(w).over(all).as("__wt"))
    // when-guarded: ANSI mode turns the degenerate all-flat family
    // (Σw = 0) into DIVIDE_BY_ZERO before the output guards ever run
    val raw = when(col("__wt") > 0,
      lit(budget.toDouble) * col("__w") / col("__wt")).otherwise(lit(0.0))
    val fl = floor(raw).cast("long")
    val fracM = round((raw - fl.cast("double")) * lit(1e6)).cast("long")
    val ranked = staged
      .withColumn("__fl", when(col("__wt") > 0, fl))
      .withColumn("__rk", row_number().over(
        Window.orderBy(fracM.desc, col(stratumCol).asc)))
      .withColumn("__rem", lit(budget) - sum("__fl").over(all))
    ranked.select(col(stratumCol), col("n_rows"),
      round(col("__sd"), 6).as("sd"),
      when(col("__wt") > 0, round(col("__w") / col("__wt"), 6))
        .as("weight_share"),
      when(col("__wt") > 0,
        col("__fl") + when(col("__rk") <= col("__rem"), 1L).otherwise(0L))
        .as("alloc"),
      when(col("__wt") > 0,
        least(col("__fl") +
          when(col("__rk") <= col("__rem"), 1L).otherwise(0L),
          col("n_rows"))).as("feasible_alloc"))
  }

  /** Contrastive training-pair builder — positives from the verified
    * near-dup pairs, negatives md5-drawn from OUTSIDE the anchor's dup
    * cluster: the (anchor, positive, negatives) structure an embedding
    * model trains on, where the cluster guard keeps an unnoticed
    * duplicate from becoming a false negative (the same failure
    * [[clusterSafeSplit]] guards in splits). Negatives draw from a
    * `poolSize` md5-lowest candidate pool ([[graft.ops]]' q164 device —
    * pool-bounded, never anchor×corpus), ranked per anchor by
    * `md5(seed|anchor|cand)` with ties to the lower id, top
    * `negPerAnchor` kept — the cap is per ANCHOR, not per positive: an
    * anchor with three positives still gets `negPerAnchor` negatives
    * total (scale the argument yourself for a per-positive budget).
    * Anchors are drawn from the pair table's A column only — a doc
    * appearing only as `pairBCol` shows up as a positive PARTNER but
    * never anchors negatives of its own; pass a symmetrized pair table
    * (union of both orientations) to anchor both sides. Positives rank
    * per anchor by the partner id. Output:
    * (id_a, id_b, is_positive, pair_rank) — replay-exact on any engine.
    *
    * Scale shape: the [[graft.ops.Dedup.clusters]] propagation labels
    * the corpus once; the candidate fan-out is anchors × the BROADCAST
    * bounded pool (a non-equi guard against the tiny pool, not a
    * corpus cross join), then one per-anchor window over ≤ poolSize
    * rows. */
  def contrastivePairs(ids: DataFrame, idCol: String, pairs: DataFrame,
                       pairACol: String, pairBCol: String, poolSize: Int,
                       negPerAnchor: Int, seed: String = "neg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(poolSize >= 2 && negPerAnchor >= 1,
      s"contrastivePairs: need poolSize >= 2, negPerAnchor >= 1; got $poolSize/$negPerAnchor")
    val p = graft.core.CacheRegistry.persist(
      pairs.select(col(pairACol).as("__pa"), col(pairBCol).as("__pb")))
    val labels = graft.core.CacheRegistry.persist(
      Dedup.clusters(p, "__pa", "__pb", ids.select(col(idCol)), idCol))
    val pool = labels
      .orderBy(md5(concat(lit(s"$seed|pool|"), col(idCol).cast("string"))),
        col(idCol))
      .limit(poolSize)
      .select(col(idCol).as("__cand"), col("cluster_id").as("__cc"))
    val anchors = p.select(col("__pa").as("__anchor")).distinct()
      .join(labels.select(col(idCol).as("__anchor"),
        col("cluster_id").as("__ac")), Seq("__anchor"))
    val byAnchor = Window.partitionBy("__anchor").orderBy(
      md5(concat(lit(s"$seed|"), col("__anchor").cast("string"), lit("|"),
        col("__cand").cast("string"))), col("__cand"))
    val negs = anchors.join(broadcast(pool), col("__ac") =!= col("__cc"))
      .withColumn("__rk", row_number().over(byAnchor))
      .where(col("__rk") <= negPerAnchor)
      .select(col("__anchor").as("id_a"), col("__cand").as("id_b"),
        lit(false).as("is_positive"), col("__rk").cast("long").as("pair_rank"))
    val posW = Window.partitionBy("id_a").orderBy(col("id_b"))
    val pos = p.select(col("__pa").as("id_a"), col("__pb").as("id_b"),
        lit(true).as("is_positive"))
      .withColumn("pair_rank", row_number().over(posW).cast("long"))
    pos.unionByName(negs)
  }

  /** Duplication-aware train/test split — the assignment a naive per-row
    * split gets WRONG: near-duplicate documents must land on the same
    * side, or the test set silently contains paraphrases of training
    * rows (split contamination, the within-corpus twin of
    * [[graft.ops.Dedup.decontaminate]]). Connected near-dup components
    * ([[graft.ops.Dedup.clusters]] over `pairs`) are the split unit: a
    * CLUSTER goes to test iff `md5(salt|cluster_id)`'s 32-bit prefix
    * clears `⌊testFrac·2³²⌋` (the exact-integer cut — any engine
    * reproduces the assignment bit-for-bit). Output: one row per split
    * with (split, n_docs, n_clusters) plus two global audit numbers
    * repeated on each row — `naive_leaked_pairs` (near-dup pairs a
    * per-DOC md5 split at the same fraction would have straddled) and
    * `cluster_leaked_pairs` (straddling pairs under the cluster split —
    * ZERO by construction, the driver-checked contract).
    *
    * Scale shape: the [[graft.ops.Dedup.clusters]] propagation (one
    * shuffle per round over dup-involved nodes only), one cluster-keyed
    * hash-agg, and two broadcast-able id-keyed joins tagging the pair
    * endpoints. The pair table is never squared. */
  def clusterSafeSplit(ids: DataFrame, idCol: String, pairs: DataFrame,
                       pairACol: String, pairBCol: String, testFrac: Double,
                       salt: String = "split"): DataFrame = {
    require(testFrac > 0 && testFrac < 1,
      s"clusterSafeSplit: need 0 < testFrac < 1, got $testFrac")
    val cut = math.floor(testFrac * 4294967296.0).toLong
    def u(c: Column): Column =
      conv(substring(md5(concat(lit(s"$salt|"), c.cast("string"))), 1, 8),
        16, 10).cast("long")
    def splitOf(c: Column): Column =
      when(u(c) < cut, "test").otherwise("train")
    val p = graft.core.CacheRegistry.persist(
      pairs.select(col(pairACol).as("__pa"), col(pairBCol).as("__pb")))
    val assigned = graft.core.CacheRegistry.persist(
      Dedup.clusters(p, "__pa", "__pb", ids.select(col(idCol)), idCol)
        .select(col(idCol).as("__doc"), col("cluster_id"),
          splitOf(col("cluster_id")).as("split"),
          splitOf(col(idCol)).as("__naive")))
    val sides = assigned.select(col("__doc"),
      col("split").as("__cs"), col("__naive").as("__ns"))
    val tagged = p
      .join(sides.toDF("__pa", "__ca", "__na"), Seq("__pa"))
      .join(sides.toDF("__pb", "__cb", "__nb"), Seq("__pb"))
    val leaks = tagged.agg(
      sum(when(col("__na") =!= col("__nb"), 1L).otherwise(0L))
        .as("naive_leaked_pairs"),
      sum(when(col("__ca") =!= col("__cb"), 1L).otherwise(0L))
        .as("cluster_leaked_pairs"))
    assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(broadcast(leaks.select(
        coalesce(col("naive_leaked_pairs"), lit(0L))
          .as("naive_leaked_pairs"),
        coalesce(col("cluster_leaked_pairs"), lit(0L))
          .as("cluster_leaked_pairs"))))
  }
}
