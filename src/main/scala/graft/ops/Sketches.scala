package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based variants of the exact marts — the 100 TB path.
  *
  * Exact `countDistinct` shuffles every distinct (group, value) pair; at
  * scale the distinct sets themselves dominate the shuffle. HyperLogLog++
  * (`approx_count_distinct`) replaces them with fixed-size mergeable
  * registers: the shuffle per group becomes O(sketch) regardless of
  * cardinality, and partial aggregation stays map-side. Same story for
  * medians/percentiles: `percentile_approx` (KLL-style) instead of a global
  * sort.
  *
  * These are alternates, not replacements — the exact operators in
  * [[graft.etl.GoldMarts]] remain the correctness oracle; specs pin the
  * sketch error against them.
  */
object Sketches {

  /** order_rates with HLL++ distinct-order counts (default rsd 5%). */
  def orderRatesApprox(fact: DataFrame, rsd: Double = 0.05): DataFrame = {
    def acd(c: Column) = approx_count_distinct(c, rsd)
    fact.groupBy("SellerID", "SellerName")
      .agg(
        acd(col("OrderID")).as("total_orders_placed"),
        acd(when(col("StatusName") === "Delivered", col("OrderID"))).as("delivered_orders"),
        acd(when(col("StatusName") === "Cancelled", col("OrderID"))).as("cancelled_orders"),
        acd(when(col("StatusName") === "Returned", col("OrderID"))).as("returned_orders"))
      .withColumn("cancellation_rate",
        col("cancelled_orders").cast("double") / col("total_orders_placed").cast("double"))
      .withColumn("return_rate",
        col("returned_orders").cast("double") /
          when(col("delivered_orders") > 0, col("delivered_orders")).otherwise(lit(1L)).cast("double"))
  }

  /** customer_analytics with an HLL++ order count. */
  def customerAnalyticsApprox(fact: DataFrame, rsd: Double = 0.05): DataFrame =
    fact.groupBy("CustomerID", "CustomerName")
      .agg(
        approx_count_distinct(col("OrderID"), rsd).as("total_orders"),
        sum("TotalAmount").as("total_spend"),
        min("OrderDate").as("first_purchase_date"),
        max("OrderDate").as("last_purchase_date"))
      .withColumn("customer_type",
        when(col("total_orders") > 1, "Returning Customer").otherwise("New Customer"))

  /** Distribution sketch of a numeric column per group: approximate
    * p50/p90/p99 without a global sort (document-length QA at corpus scale). */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("mean"),
        percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).as("p50"),
        percentile_approx(col(valueCol), lit(0.9), lit(accuracy)).as("p90"),
        percentile_approx(col(valueCol), lit(0.99), lit(accuracy)).as("p99"))

  /** Exact twin of [[percentiles]] (linear-interpolated, = SQL
    * `percentile_cont`): the correctness oracle the sketch is pinned
    * against, and a driver-checked mart in its own right. Exact percentiles
    * buffer each GROUP's values — fine for bounded groups (status codes,
    * languages); at unbounded group cardinality × row count, use
    * [[percentiles]]. Results rounded to 6 dp so float summation order
    * can't flip a hash compare across engines. */
  def percentilesExact(df: DataFrame, groupCols: Seq[String],
                       valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(avg(col(valueCol)), 6).as("mean"),
        round(percentile(col(valueCol), lit(0.5)), 6).as("p50"),
        round(percentile(col(valueCol), lit(0.9)), 6).as("p90"),
        round(percentile(col(valueCol), lit(0.99)), 6).as("p99"))

  /** Weighted exact percentiles — order statistics where each row counts
    * with a WEIGHT, the corpus-planning form of [[percentilesExact]]:
    * "the median TOKEN lives in a document of length X" (value = doc
    * length, weight = tokens) is a different — and for budget questions,
    * the right — number than the median document. For each p, the
    * smallest value whose cumulative weight reaches `⌈p·W⌉` micro-units.
    * Values AND weights snap to 6 dp micro-integers; cumulative weights
    * are exact decimal(38,0), so every cut replays bit-identically.
    * Rows with null values, or null/non-positive weights, are excluded
    * (a zero-weight row cannot host a percentile). Output per p:
    * (p, total_weight, q), 6 dp.
    *
    * Scale shape: the [[graft.ops.Quality.mannWhitneyU]] contract — one
    * (value) hash-agg of weight partials, one cumsum window over the
    * quantization-bounded histogram, one broadcast theta-join against
    * the ≤ \|ps\| grid. */
  def weightedPercentiles(df: DataFrame, valCol: String, weightCol: String,
                          ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"weightedPercentiles: need 0 < p <= 1, got $ps")
    val grid = ps.distinct.sorted
    val vm = round(col(valCol).cast("double") * lit(1e6)).cast("long")
    val wm = round(col(weightCol).cast("double") * lit(1e6)).cast("long")
    val hist = df
      .where(col(valCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      .groupBy(vm.as("__vm"))
      .agg(sum(wm).cast("decimal(38,0)").as("__w"))
    val w = Window.orderBy(col("__vm"))
    val all = Window.partitionBy(lit(1))
    val cum = hist.select(col("__vm"),
      sum("__w").over(w).as("__cw"), sum("__w").over(all).as("__tw"))
    val pCol = explode(array(grid.map(lit): _*)).as("p")
    cum.select(col("*"), pCol)
      .groupBy(col("p"))
      .agg(max("__tw").as("__twx"),
        min(when(col("__cw").cast("double") >=
          ceil(col("p") * col("__tw").cast("double")), col("__vm")))
          .as("__q"))
      .select(col("p"),
        round(col("__twx").cast("double") / lit(1e6), 6).as("total_weight"),
        round(col("__q").cast("double") / lit(1e6), 6).as("q"))
  }

  /** Sketch-based cross-source overlap — the 100 TB path for
    * [[Dedup.sourceOverlap]], whose exact form self-joins the distinct
    * (source, shingle) table (fine until the distinct sets themselves
    * dominate the shuffle). Here each source reduces to a `k`-minimum-
    * values sketch of its md5'd shingles in ONE hash-agg — no
    * pre-distinct (duplicate hashes cannot change a minimum), no
    * shingle-keyed join, ≤ k strings per source over the wire — and the
    * pairwise estimates are array expressions over the tiny
    * |sources|² sketch join:
    *
    *  - `est_jaccard`: the share of the k smallest of A∪B present in
    *    BOTH sketches (stderr ≈ 1/√k);
    *  - `est_containment`: Jaccard rescaled by the KMV cardinality
    *    estimates `(k−1)/frac(kth minimum)` — comparable to the exact
    *    operator's `∩/min(|A|,|B|)`.
    *
    * Pairs whose union sketch shows zero common minima report 0 —
    * disjoint-ish sources stay in the output (unlike the exact operator,
    * which omits pairs sharing nothing). Estimates are 2 dp-rounded:
    * finer digits are sampling noise at any practical k. */
  def sourceOverlapKmv(df: DataFrame, srcCol: String, textCol: String,
                       n: Int, k: Int): DataFrame = {
    import graft.functions.SketchFunctions.kmvSketch
    import graft.functions.TextFunctions.wordShingles
    val sk = df
      .select(col(srcCol).as("src"),
        explode(wordShingles(col(textCol), n)).as("shingle"))
      .select(col("src"), md5(col("shingle")).as("h"))
      .groupBy("src")
      .agg(kmvSketch(col("h"), k).as("kmv"))
    // KMV cardinality: n̂ = (k−1) / frac(kth minimum), when the sketch
    // saturated (size == k); else the sketch IS the distinct set
    def frac(h: Column): Column =
      conv(substring(h, 1, 12), 16, 10).cast("double") / lit(math.pow(16, 12))
    def card(kmv: Column): Column =
      when(size(kmv) < k, size(kmv).cast("double"))
        .otherwise(lit(k - 1.0) / frac(element_at(kmv, k)))
    val a = sk.toDF("src_a", "kmv_a")
    val b = sk.toDF("src_b", "kmv_b")
    val combined = slice(array_sort(array_union(col("kmv_a"), col("kmv_b"))), 1, k)
    val common = size(array_intersect(
      array_intersect(combined, col("kmv_a")), col("kmv_b")))
    // an empty union sketch (source with no shingles) would make this 0/0 →
    // NULL, contradicting the "disjoint-ish pairs report 0" contract
    val jac = when(size(combined) === 0, lit(0.0))
      .otherwise(common.cast("double") / size(combined).cast("double"))
    // jac = 0 with an empty-sketch side would likewise divide 0 by a 0
    // cardinality estimate; zero overlap IS zero containment
    val containment = when(jac === 0.0, lit(0.0))
      .otherwise(jac * card(combined) /
        least(card(col("kmv_a")), card(col("kmv_b"))))
    a.crossJoin(b).where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(jac, 2).as("est_jaccard"),
        round(containment, 2).as("est_containment"))
  }

  /** Approximate top terms per group by Misra–Gries heavy hitters: ≤ `k`
    * (term, est_count) rows per group, descending. The frequency twin of
    * [[graft.ops.Corpus.vocabulary]]: the exact path's hash-agg shuffles
    * every distinct term (a 100 TB crawl has billions); this shuffles ≤ k
    * counters per group — the summary merges map-side like every sketch
    * here. Guarantees (any run, any partitioning): a term with true count
    * > N/(k+1) is present; est ≤ true ≤ est + N/(k+1). The TAIL of the
    * summary is order-dependent (inherent to MG) — size k so the bound
    * N/(k+1) sits below the counts you care about, and treat entries near
    * the bound as candidates, not rankings. No oracle by design (the
    * summary content is partitioning-dependent); guarantees are
    * spec-pinned against exact counts ([[SketchesSpec]]). */
  def topTermsApprox(df: DataFrame, groupCols: Seq[String], textCol: String,
                     k: Int): DataFrame = {
    import graft.functions.SketchFunctions.misraGries
    val tok = df.select(groupCols.map(col) :+
      explode(graft.ops.Dedup.tokens(col(textCol))).as("__term"): _*)
    tok.groupBy(groupCols.map(col): _*)
      .agg(misraGries(col("__term"), k).as("__mg"))
      .select(groupCols.map(col) :+ explode(col("__mg")).as("__e"): _*)
      .select(groupCols.map(col) :+ col("__e.item").as("term")
        :+ col("__e.est_count").as("est_count"): _*)
  }

  /** Point-frequency estimate from a [[graft.functions.SketchFunctions
    * .countMin]] sketch: `min` over the item's `depth` cells — never
    * undercounts the true frequency, overcounts by at most the colliding
    * mass in the best row. Row `r` hashes by hex window `r` of the
    * item's md5 (the aggregate's rule), so the lookup is a pure
    * scan-stage expression reproducible on any engine — broadcast the
    * 1-row sketch frame and probe any item stream against it. */
  def cmEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4,
      s"cmEstimate: need 1 <= depth <= 4, got $depth")
    require(width >= 1, s"cmEstimate: need width >= 1, got $width")
    val cells = (0 until depth).map { r =>
      val idx = conv(substring(md5(item), r * 8 + 1, 8), 16, 10)
        .cast("long") % width
      element_at(sketch, (idx + (r * width) + 1).cast("int"))
    }
    array_min(array(cells: _*))
  }

  /** KMV cardinality CONTRACT: per source, the k-minimum-values estimate
    * of the distinct shingle count next to the exact count, with
    * `within_bound = |est − exact| ≤ sigmas·exact/√(k−2)` — the KMV
    * relative standard error is 1/√(k−2) (Bar-Yossef et al. 2002 /
    * Beyer et al. 2007), so `sigmas` is the confidence multiplier. The
    * md5-hashed estimator is fully deterministic, so an external engine
    * replays the SAME estimate AND the same boolean: the error bound
    * itself becomes a driver-checkable row, not a scaladoc claim.
    *
    * Scale shape: one (source, hash)-distinct reduction feeds ONE
    * source-keyed hash-agg holding a k-array sketch and a counter —
    * map-side partials, no window, no sort; |sources| rows out. */
  def kmvCardinalityContract(df: DataFrame, srcCol: String, textCol: String,
                             n: Int, k: Int, sigmas: Double): DataFrame = {
    require(k >= 3, s"kmvCardinalityContract: need k >= 3, got $k")
    import graft.functions.SketchFunctions.kmvSketch
    import graft.functions.TextFunctions.wordShingles
    val d = df
      .select(col(srcCol).as("source"),
        explode(array_distinct(wordShingles(col(textCol), n))).as("shingle"))
      .select(col("source"), md5(col("shingle")).as("h"))
      .distinct()
    def frac(h: Column): Column =
      conv(substring(h, 1, 12), 16, 10).cast("double") / lit(math.pow(16, 12))
    val agg = d.groupBy("source")
      .agg(count(lit(1)).as("exact_distinct"), kmvSketch(col("h"), k).as("kmv"))
    val est = when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
      .otherwise(lit(k - 1.0) / frac(element_at(col("kmv"), k)))
    val bound = lit(sigmas) * col("exact_distinct").cast("double") /
      lit(math.sqrt(k - 2.0))
    agg.select(col("source"), col("exact_distinct"),
      round(est, 6).as("est_distinct"),
      round(abs(est - col("exact_distinct").cast("double")), 6).as("abs_err"),
      (abs(est - col("exact_distinct").cast("double")) <= bound)
        .as("within_bound"))
  }

  /** GK-quantile CONTRACT: per group and requested quantile, whether
    * `percentile_approx(v, p, accuracy)`'s answer sits within its rank
    * guarantee — the returned value must hold SOME rank within
    * `p·n ± n/accuracy` (Greenwald–Khanna 1.9; Spark documents `accuracy`
    * as `1/accuracy` relative rank error). With duplicate values the
    * answer's rank is the interval `[n_lt+1, n_le]`, so the check is an
    * interval overlap (±1 slack absorbs rank-convention off-by-ones).
    * The sketch content is implementation-specific, so the OUTPUT carries
    * only what an external engine can recompute — (group, p, n_rows) —
    * plus the boolean an oracle pins to TRUE.
    *
    * Scale shape: one group hash-agg builds the sketches; the rank probe
    * joins the tiny (groups × quantiles) frame back against the data —
    * ONE broadcastable join, no sort, no window. */
  def quantileRankContract(df: DataFrame, groupCol: String, valCol: String,
                           ps: Seq[Double], accuracy: Int): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"quantileRankContract: quantiles must be in (0, 1), got $ps")
    require(accuracy >= 1, s"quantileRankContract: need accuracy >= 1")
    val base = graft.core.CacheRegistry.persist(
      df.select(col(groupCol).as("g"), col(valCol).as("v"))
        .where(col("v").isNotNull))
    val appr = base.groupBy("g").agg(
      percentile_approx(col("v"), array(ps.map(lit): _*), lit(accuracy)).as("qs"),
      count(lit(1)).as("n"))
    val exploded = appr
      .select(col("g"), col("n"), posexplode(col("qs")))
      .select(col("g"), col("n"),
        element_at(typedLit(ps), col("pos").cast("int") + 1).as("p"),
        col("col").as("q"))
    val counts = exploded.join(base, Seq("g"))
      .groupBy("g", "p", "n", "q")
      .agg(sum(when(col("v") < col("q"), 1L).otherwise(0L)).as("n_lt"),
        sum(when(col("v") <= col("q"), 1L).otherwise(0L)).as("n_le"))
    val target = col("p") * col("n").cast("double")
    val tol = col("n").cast("double") / accuracy + 1.0
    counts.select(col("g").as(groupCol), col("p"),
      col("n").as("n_rows"),
      ((col("n_lt") + 1).cast("double") <= target + tol &&
        col("n_le").cast("double") >= target - tol).as("within_rank_bound"))
  }

  /** HLL++ CONTRACT: per group, `approx_count_distinct(v, rsd)` against
    * the exact distinct count with `within_bound = |est − exact| ≤
    * sigmas·rsd·exact` (rsd IS the sketch's relative standard error).
    * The register contents are implementation-specific, so the estimate
    * stays out of the output — the oracle recomputes the exact count and
    * pins the boolean TRUE.
    *
    * Scale shape: one group hash-agg carrying an HLL register set and the
    * exact-distinct two-stage aggregate side by side (the exact side is
    * the JUDGE here, priced like any countDistinct; production monitors
    * would sample it). */
  def hllBoundContract(df: DataFrame, groupCol: String, valCol: String,
                       rsd: Double, sigmas: Double): DataFrame =
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(valCol)).as("exact_distinct"),
        approx_count_distinct(col(valCol), rsd).as("__est"))
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("__est") - col("exact_distinct")).cast("double") <=
          lit(sigmas * rsd) * col("exact_distinct").cast("double"))
          .as("within_bound"))

  /** Misra–Gries CONTRACT: per source, the MG(k) guarantees over the
    * token stream as driver-checkable booleans. The summary CONTENT is
    * partitioning-dependent (inherent to MG merges), but the THEOREMS
    * hold for every partitioning:
    *
    *  - `all_heavy_present` — every term with true count > N/(k+1) is in
    *    the summary;
    *  - `est_within_bound` — every summary entry satisfies
    *    `est ≤ true ≤ est + N/(k+1)`.
    *
    * An oracle pins both columns to TRUE (plus the exact `n_tokens` /
    * `n_heavy` it can recompute): a merge-order bug that broke either
    * guarantee becomes a hash mismatch instead of a silent quality drift.
    *
    * Scale shape: the exact per-(source, term) counts used to JUDGE the
    * sketch are one hash-agg (this is a contract probe, priced like the
    * exact vocabulary); the MG side shuffles ≤ k counters per source. */
  def heavyHittersContract(df: DataFrame, srcCol: String, textCol: String,
                           k: Int): DataFrame = {
    require(k >= 1, s"heavyHittersContract: need k >= 1, got $k")
    import graft.functions.SketchFunctions.misraGries
    val tok = graft.core.CacheRegistry.persist(
      df.select(col(srcCol).as("source"),
        explode(graft.ops.Dedup.tokens(col(textCol))).as("term")))
    val exact = tok.groupBy("source", "term").agg(count(lit(1)).as("cnt"))
    val mg = tok.groupBy("source").agg(misraGries(col("term"), k).as("mg"))
      .select(col("source"), explode(col("mg")).as("e"))
      .select(col("source"), col("e.item").as("term"),
        col("e.est_count").as("est"))
    val thr = sum("cnt").over(
      org.apache.spark.sql.expressions.Window.partitionBy("source"))
      .cast("double") / (k + 1.0)
    val judged = exact
      .join(mg, Seq("source", "term"), "left")
      .withColumn("__thr", thr)
    judged.groupBy("source")
      .agg(sum("cnt").as("n_tokens"),
        sum(when(col("cnt") > col("__thr"), 1L).otherwise(0L)).as("n_heavy"),
        coalesce(min(when(col("cnt") > col("__thr"), col("est").isNotNull)),
          lit(true)).as("all_heavy_present"),
        coalesce(min(when(col("est").isNotNull,
          col("est") <= col("cnt") &&
            col("cnt").cast("double") <= col("est") + col("__thr"))),
          lit(true)).as("est_within_bound"))
  }

  /** Count-min JOIN-SIZE estimation CONTRACT (Cormode & Muthukrishnan
    * 2005 §4.2): the inner product of two count-min sketches bounds the
    * equi-join cardinality `J = Σ_k f_A(k)·f_B(k)` from ABOVE — per
    * depth row, `Σ_w CM_A[r][w]·CM_B[r][w] ≥ J` (colliding keys only
    * ADD non-negative cross terms), and the estimate is the min over
    * rows. This is the sketch a join planner consults before choosing a
    * strategy: two KB-sized summaries answer "how big is this join"
    * without touching either table again — the frequency-aware question
    * KMV/HLL distinct sketches cannot answer. Both the estimate AND the
    * exact size are engine-replayable (the md5-rowed matrix is
    * partitioning-exact, q184's property), so the oracle pins the value
    * and the never-undercount theorem: (join_size_est, join_size_exact,
    * never_under = est ≥ exact), one row.
    *
    * Scale shape: one 1-row sketch aggregate per side (mergeable
    * map-side partials, depth·width longs over the wire); the inner
    * product is array arithmetic over the two broadcast rows. The exact
    * judge is the Σ f_A·f_B reduction — one hash-agg per side plus a
    * key join of the (distinct-key) count tables, priced like any
    * contract probe. */
  def joinSizeContract(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
                       depth: Int, width: Int): DataFrame = {
    import graft.functions.SketchFunctions.countMin
    require(depth >= 1 && depth <= 4,
      s"joinSizeContract: need 1 <= depth <= 4, got $depth")
    require(width >= 1, s"joinSizeContract: need width >= 1, got $width")
    val skA = a.where(col(keyA).isNotNull)
      .agg(countMin(col(keyA).cast("string"), depth, width).as("__ska"))
    val skB = b.where(col(keyB).isNotNull)
      .agg(countMin(col(keyB).cast("string"), depth, width).as("__skb"))
    val prods = zip_with(col("__ska"), col("__skb"), (x, y) => x * y)
    val rowSums = (0 until depth).map { r =>
      aggregate(slice(prods, lit(r * width + 1), lit(width)),
        lit(0L), (acc, x) => acc + x)
    }
    val minRow = if (rowSums.size == 1) rowSums.head else least(rowSums: _*)
    val est = skA.crossJoin(skB)
      .select(minRow.as("join_size_est"))
    val ca = a.where(col(keyA).isNotNull)
      .groupBy(col(keyA).cast("string").as("__k"))
      .agg(count(lit(1)).as("__fa"))
    val cb = b.where(col(keyB).isNotNull)
      .groupBy(col(keyB).cast("string").as("__k"))
      .agg(count(lit(1)).as("__fb"))
    val exact = ca.join(cb, Seq("__k"))
      .agg(coalesce(sum(col("__fa") * col("__fb")), lit(0L))
        .as("join_size_exact"))
    est.crossJoin(exact)
      .select(col("join_size_est"), col("join_size_exact"),
        (col("join_size_est") >= col("join_size_exact")).as("never_under"))
  }

  /** Rolling-active-users CONTRACT: the sketch path for
    * [[graft.ops.EventAnalytics.rollingActiveUsers]] at 100 TB, judged
    * against the exact answer. Distinct counts don't decompose over a
    * sliding window — but HLL UNIONS do: one Datasketches HLL sketch per
    * calendar day (a single pass over the log), then each report day
    * unions its trailing `windowDays` sketches — the window "sum" the
    * exact operator can't have. The exact path explodes the REDUCED
    * (user, day) table ×windowDays and re-distincts, paying
    * users·windowDays shuffle rows; the sketch path ships ONE ≤2^lgK
    * register set per day, so the window stage is independent of user
    * cardinality entirely. Per report day: `wau_exact` and
    * `within_bound` = |estimate − exact| ≤ `sigmas`·(1.04/√2^lgK)·exact
    * (the HLL relative standard error) — the oracle recomputes the exact
    * side and pins the boolean TRUE, so a register/merge bug becomes a
    * hash mismatch. The estimate itself is NOT emitted (sketch registers
    * aren't engine-replayable; q199's convention).
    *
    * Scale shape: day sketches are one hash-agg with mergeable map-side
    * partials; the ×windowDays fan-out moves \|days\|·windowDays sketch
    * blobs (KBs); the exact judge is [[graft.ops.EventAnalytics
    * .rollingActiveUsers]], priced like any countDistinct probe. */
  def rollingActiveContract(events: DataFrame, userCol: String, tsCol: String,
                            windowDays: Int, lgK: Int,
                            sigmas: Double): DataFrame = {
    require(windowDays >= 1 && lgK >= 4 && sigmas > 0,
      s"rollingActiveContract: need windowDays >= 1, lgK >= 4, sigmas > 0")
    val rsd = 1.04 / math.sqrt(math.pow(2.0, lgK))
    val daySketch = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("__d"))
      .agg(hll_sketch_agg(col(userCol), lit(lgK)).as("__sk"))
    val est = daySketch
      .select(explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1)))
        .as("day"), col("__sk"))
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est"))
    val exact = graft.ops.EventAnalytics
      .rollingActiveUsers(events, userCol, tsCol, windowDays)
      .select(col("day"), col("wau").as("wau_exact"))
    exact.join(est, Seq("day"), "left")
      .select(col("day"), col("wau_exact"),
        coalesce(
          abs(col("__est") - col("wau_exact").cast("double")) <=
            lit(sigmas * rsd) * col("wau_exact").cast("double"),
          col("wau_exact") === 0L).as("within_bound"))
  }
}
