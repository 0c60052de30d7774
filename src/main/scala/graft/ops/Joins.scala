package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-management join helpers.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting is for
  * the pathological case AQE cannot fix — one key holding a dominant share
  * of the big side in a shuffle join, where a single reducer partition
  * becomes the whole job's critical path.
  */
object Joins {

  /** As-of join: for every left row, attach the single nearest right row
    * per `key` in the requested `direction` — the point-in-time lookup
    * (trades⋈quotes, events⋈latest-prior-order) that Spark has no
    * built-in operator for. Directions (pandas `merge_asof` semantics):
    * `backward` (default) takes the latest right with
    * `rightTime` ≤ `leftTime`, `forward` the earliest right with
    * `rightTime` ≥ `leftTime`, `nearest` whichever of the two is closer
    * in time (exact tie → the backward match).
    *
    * Composed Spark-first instead of an inequality join: both sides union
    * into one tagged stream, shuffle+sort ONCE on (key, time, side), and a
    * running last-non-null window carries the latest right payload forward
    * into each left row (`forward` runs the same carry over the reversed
    * sort; `nearest` runs both — two sort passes, same single shuffle
    * partitioning). An inequality join would plan a per-key range
    * join — quadratic on a hot key; this is the sort-once linear shape a
    * native as-of physical operator uses, and it scales with the shuffle.
    *
    * Left rows with no matching right row keep null right columns
    * (left-outer semantics). A right row AT the left timestamp matches
    * in every direction. Right rows must be unique per (key, time) —
    * pre-aggregate if they are not, or the winner among equal timestamps
    * is undefined.
    *
    * Contract (enforced): the right side must carry at least one payload
    * column beyond (key, rightTime), and payload names must not collide
    * with left column names — a silent duplicate output column would make
    * every downstream select ambiguous. A staleness `toleranceUs` or
    * `direction = "nearest"` needs TIMESTAMP time columns (both subtract
    * exact microseconds). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               toleranceUs: Long = Long.MaxValue,
               direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(toleranceUs >= 0,
      s"asOfJoin: tolerance must be non-negative, got $toleranceUs")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asOfJoin: unknown direction '$direction' (backward|forward|nearest)")
    if (toleranceUs != Long.MaxValue || direction == "nearest") {
      import org.apache.spark.sql.types.TimestampType
      require(left.schema(leftTime).dataType == TimestampType &&
        right.schema(rightTime).dataType == TimestampType,
        "asOfJoin: a staleness tolerance or direction=nearest needs " +
          "TIMESTAMP time columns " +
          s"(got ${left.schema(leftTime).dataType} / ${right.schema(rightTime).dataType})")
    }
    val rPayload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val lCols = left.columns.filterNot(_ == key).toSeq
    require(rPayload.nonEmpty,
      s"asOfJoin: right side has no payload columns beyond ('$key', '$rightTime') - " +
        "nothing to attach; add the columns the join should carry")
    val dup = rPayload.intersect(lCols)
    require(dup.isEmpty,
      s"asOfJoin: right payload column(s) ${dup.mkString("'", "', '", "'")} collide " +
        "with left column names - rename one side before joining")
    val r = right.select(col(key), col(rightTime).as("__t"),
      struct(rPayload.map(col): _*).as("__rv"), lit(0).as("__side"))
    val l = left.select(col(key), col(leftTime).as("__t"),
      struct(lCols.map(col): _*).as("__lv"), lit(1).as("__side"))
    val union = r.unionByName(l, allowMissingColumns = true)
    // side 0 (right) sorts before side 1 (left) at equal times, in BOTH
    // sort orders → a right row at the left timestamp matches everywhere.
    // Walking ascending, the carry is the latest right ≤ t; walking
    // descending, it is the earliest right ≥ t.
    def carry(descending: Boolean, rv: String, rt: String)(df: DataFrame) = {
      val t = if (descending) col("__t").desc else col("__t").asc
      val w = Window.partitionBy(key).orderBy(t, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(rv, last(col("__rv"), ignoreNulls = true).over(w))
        .withColumn(rt,
          last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    }
    val carried = direction match {
      case "backward" => carry(descending = false, "__r", "__rt")(union)
      case "forward"  => carry(descending = true, "__r", "__rt")(union)
      case "nearest" =>
        val both = carry(descending = true, "__rf", "__rft")(
          carry(descending = false, "__rb", "__rbt")(union))
        val db = unix_micros(col("__t")) - unix_micros(col("__rbt"))
        val dfw = unix_micros(col("__rft")) - unix_micros(col("__t"))
        val back = col("__rbt").isNotNull && (col("__rft").isNull || db <= dfw)
        both.withColumn("__r", when(back, col("__rb")).otherwise(col("__rf")))
          .withColumn("__rt", when(back, col("__rbt")).otherwise(col("__rft")))
    }
    // the carried right TIMESTAMP enforces the optional staleness bound
    // (pandas merge_asof `tolerance`): a match farther than toleranceUs µs
    // nulls the payload, keeping left-outer row semantics. abs() makes the
    // same bound serve every direction.
    val fresh =
      if (toleranceUs == Long.MaxValue) lit(true)
      else col("__rt").isNotNull &&
        abs(unix_micros(col("__t")) - unix_micros(col("__rt"))) <= toleranceUs
    carried
      .where(col("__side") === 1)
      .select(col(key) +:
        (lCols.map(c => col(s"__lv.$c").as(c)) ++
          rPayload.map(c => when(fresh, col(s"__r.$c")).as(c))): _*)
  }

  /** Keyed time-range join: all (left, right) pairs sharing `key` with
    * `right.rightTime` in `[leftTime + lowerUs, leftTime + upperUs]`
    * (microsecond offsets, bounds inclusive) — the "events within the
    * window around each anchor" primitive (feature windows, attribution,
    * prior-activity counts) that naive SQL writes as an inequality join.
    *
    * Spark plans a pure inequality predicate as a per-key nested loop —
    * quadratic on a hot key, exactly like the as-of case above. This
    * operator BANDS time instead: with bucket width `w = upperUs - lowerUs`,
    * a right row lands in one bucket, a left row's window spans at most two
    * adjacent buckets, so each left row is expanded to its (at most) two
    * covering buckets and the join becomes a plain equi-join on
    * (key, bucket) with an exact range filter after it. Shuffle key is
    * (key, bucket); every true pair is found exactly once (the right row's
    * single bucket is among the left row's covered buckets); cost is the
    * equi-join plus a ≤2× expansion of the left side — no N² stage at any
    * scale, and time-skew spreads across buckets even for a hot key.
    *
    * Inner-join semantics: left rows with no right row in range disappear —
    * wrap with a left join against the output to keep them (see q47's
    * count composition). Same column contract as [[saltedEquiJoin]]: `key`
    * must be the only shared column name (enforced), and both time columns
    * must be TIMESTAMP. */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs,
      s"bandedRangeJoin: empty window [$lowerUs, $upperUs]")
    val shared = left.columns.intersect(right.columns).filterNot(_ == key)
    require(shared.isEmpty,
      s"bandedRangeJoin: sides share non-key column(s) ${shared.mkString("'", "', '", "'")} - " +
        "rename them before joining (only the join key may be shared)")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"bandedRangeJoin: both sides must carry join key '$key'")
    val w = upperUs - lowerUs
    // left window [t+lower, t+upper] covers buckets floor((t+lower)/w) ..
    // floor((t+upper)/w): at most 2 since the window is exactly w long
    val l = left
      .withColumn("__b", explode(sequence(
        floor((unix_micros(col(leftTime)) + lowerUs) / w),
        floor((unix_micros(col(leftTime)) + upperUs) / w))))
    val r = right
      .withColumn("__b", floor(unix_micros(col(rightTime)) / w))
    l.join(r, Seq(key, "__b"))
      .where(unix_micros(col(rightTime))
        .between(unix_micros(col(leftTime)) + lowerUs,
          unix_micros(col(leftTime)) + upperUs))
      .drop("__b")
  }

  /** Deterministically salted inner equi-join on `key`, equal to
    * `big.join(small, key)` row-for-row: the big side takes a salt derived
    * from its full row content (no rand() — replays and retries stay
    * stable), the small side is replicated `salt` ways, and the shuffle key
    * becomes (key, salt) so one hot key fans out across `salt` reducers.
    *
    * The replication multiplies the small side ×salt — use for genuinely
    * asymmetric joins (big skewed fact ⋈ modest dimension too large to
    * broadcast). `key` must be the only column name the two sides share
    * (enforced — a violated contract would silently produce a wrong join). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val shared = big.columns.intersect(small.columns).filterNot(_ == key)
    require(shared.isEmpty,
      s"saltedEquiJoin: sides share non-key column(s) ${shared.mkString("'", "', '", "'")} - " +
        "rename them before joining (only the join key may be shared)")
    require(big.columns.contains(key) && small.columns.contains(key),
      s"saltedEquiJoin: both sides must carry join key '$key'")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedEquiJoin: '__salt' is reserved for the internal salt column")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Blocked fuzzy self-match (entity resolution): all id pairs whose
    * `nameCol` values are within `maxDist` Levenshtein edits, found by
    * comparing only WITHIN blocks that share `blockCol` — the classic
    * blocking trick that turns an O(N²) all-pairs string comparison into
    * Σ|block|² local work (record linkage / dirty-dimension dedup:
    * "red widgat" ⋈ "red widget").
    *
    * Scale shape: a self equi-join shuffling once on the block key;
    * `levenshtein` is a codegen'd built-in evaluated only inside blocks.
    * Block choice is the recall/cost dial: a block must be cheap to
    * compute, stable under the typos being matched, and bounded in size —
    * profile with [[skewProfile]] first and salt or sub-block a hot block
    * before running at scale. A single blocking pass misses pairs whose
    * typo falls IN the blocking key; production linkage unions several
    * independent passes (first token, phonetic code, length bucket) and
    * [[Dedup.clusters]] the pair union.
    *
    * Output: (id_a, name_a, id_b, name_b, dist), id_a < id_b, each pair
    * once. `idCol` must be numeric-ordered and names need not be unique. */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                        blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"blockedFuzzyPairs: maxDist must be >= 1, got $maxDist")
    val side = df.select(col(idCol), col(nameCol), col(blockCol))
    // the probe side is repartitioned to the session's parallelism: a small
    // dimension arrives as ONE scan partition, and with the build side
    // broadcast the whole Σ|block|² expansion would otherwise run as a
    // single task (the Similarity.pairCosines lesson)
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val a = side.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      col(blockCol).as("__blk")).repartition(parallelism)
    val b = side.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      col(blockCol).as("__blk"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      // exact pre-filter: levenshtein ≥ |len(a) − len(b)|, so length gaps
      // beyond maxDist never pay the O(m·n) distance loop; exact-equal
      // names (the bulk of a duplicate-heavy dimension) skip it too
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        when(col("name_a") === col("name_b"), lit(0))
          .otherwise(levenshtein(col("name_a"), col("name_b"))))
      .where(col("dist") <= maxDist)
      .drop("__blk")
  }

  /** PassJoin (Li, Deng, Feng & Wang, 2011): the EXACT segment-index
    * edit-distance self-join — same output contract as
    * [[blockedFuzzyPairs]] (all within-block id pairs with
    * `levenshtein ≤ maxDist`), but candidates come from a pigeonhole
    * substring index instead of the full Σ|block|² expansion. Partition
    * every string into `maxDist + 1` segments (τ edits can touch at most
    * τ segments, so a string within distance τ contains at least one
    * segment EXACTLY, starting within ±τ of its home position); index
    * each string's segments, probe each string's aligned substrings, and
    * run `levenshtein` only on candidates that share an aligned segment.
    * On a block of near-unique strings this cuts the verified pairs by
    * orders of magnitude — the difference between a fuzzy join that
    * works on a dirty dimension and one that works on a 100 TB one —
    * while producing the IDENTICAL pair set (pigeonhole is a guarantee,
    * not a heuristic; [[blockedFuzzyPairs]] stays as the oracle twin).
    * Strings shorter than τ+1 characters can't donate non-empty
    * segments; they pair through a plain quadratic pass against the
    * (tiny) length-compatible slice, preserving exactness end to end.
    *
    * Scale shape: both explodes are scan-stage (≤ τ+1 segment rows per
    * indexed string, ≤ (τ+1)·(2τ+1)² substring rows per probe string);
    * the ONE shuffle is the equi-join on (block, segment-index, length,
    * segment-text) — a high-cardinality key, so no reducer sees a
    * whole block — followed by a distinct on the candidate ids and the
    * codegen'd verify. Output: (id_a, name_a, id_b, name_b, dist),
    * id_a < id_b, each pair once. */
  def passJoinFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                         blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"passJoinFuzzyPairs: maxDist must be >= 1, got $maxDist")
    val k = maxDist + 1
    val base = graft.core.CacheRegistry.persist(
      df.where(col(nameCol).isNotNull)
        .select(col(idCol).as("__id"), col(nameCol).as("__nm"),
          col(blockCol).as("__blk"), length(col(nameCol)).as("__l")))
    // segment i of a length-lr string: the first (lr mod k) segments get
    // one extra char — lengths differ by <= 1, starts are exact integers
    def segLen(lr: Column, i: Int): Column =
      (lr / k).cast("int") + when(lit(i) < pmod(lr, lit(k)), 1).otherwise(0)
    def segStart(lr: Column, i: Int): Column =
      lit(i) * (lr / k).cast("int") + least(lit(i), pmod(lr, lit(k)))
    // index side: strings long enough to donate k non-empty segments
    val inx = base.where(col("__l") >= k)
      .select(col("__id").as("id_r"), col("__nm").as("nm_r"), col("__blk"),
        col("__l").as("__lr"),
        explode(array((0 until k).map { i =>
          struct(lit(i).as("i"),
            col("__nm").substr(segStart(col("__l"), i) + 1,
              segLen(col("__l"), i)).as("seg"))
        }: _*)).as("__s"))
      .select(col("id_r"), col("nm_r"), col("__blk"), col("__lr"),
        col("__s.i").as("__i"), col("__s.seg").as("__seg"))
    // probe side: for every (segment index i, indexed length lr = l + dl),
    // the substrings of the probe at the segment's length, starting
    // within ±maxDist of its home position (clamped to the probe)
    val combos = for { i <- 0 until k; dl <- -maxDist to maxDist }
      yield (i, dl)
    val prb = base
      .select(col("__id").as("id_s"), col("__nm").as("nm_s"), col("__blk"),
        col("__l"),
        explode(array(combos.map { case (i, dl) =>
          struct(lit(i).as("i"), (col("__l") + dl).as("lr"))
        }: _*)).as("__c"))
      .where(col("__c.lr") >= k)
      .select(col("id_s"), col("nm_s"), col("__blk"), col("__l"),
        col("__c.i").as("__i"), col("__c.lr").as("__lr"))
    // per-row segment geometry for (i, lr): computed with i as data is
    // awkward column-side, so re-derive via the closed forms keyed by __i
    def byI(f: (Column, Int) => Column, lr: Column): Column =
      (0 until k).foldLeft(lit(-1)) { (acc, i) =>
        when(col("__i") === i, f(lr, i)).otherwise(acc)
      }
    val withGeom = prb
      .withColumn("__len", byI(segLen, col("__lr")))
      .withColumn("__start", byI(segStart, col("__lr")))
      .withColumn("__p", explode(
        when(least(col("__l") - col("__len"), col("__start") + maxDist) >=
          greatest(lit(0), col("__start") - maxDist),
          sequence(greatest(lit(0), col("__start") - maxDist),
            least(col("__l") - col("__len"), col("__start") + maxDist)))))
      .select(col("id_s"), col("nm_s"), col("__blk"),
        col("__i"), col("__lr"),
        col("nm_s").substr(col("__p") + 1, col("__len")).as("__seg"))
    val cand = inx.join(withGeom, Seq("__blk", "__i", "__lr", "__seg"))
      .where(col("id_r") =!= col("id_s"))
      .select(
        least(col("id_r"), col("id_s")).as("id_a"),
        greatest(col("id_r"), col("id_s")).as("id_b"),
        when(col("id_r") < col("id_s"), col("nm_r")).otherwise(col("nm_s"))
          .as("name_a"),
        when(col("id_r") < col("id_s"), col("nm_s")).otherwise(col("nm_r"))
          .as("name_b"))
      .distinct()
    // short strings (< k chars) can't donate segments: plain quadratic
    // pass of the short slice against its length-compatible neighborhood
    // (bounded: every member has < k + maxDist chars)
    val shorts = base.where(col("__l") < k)
      .select(col("__id").as("id_r"), col("__nm").as("nm_r"), col("__blk"))
    val nearShort = base.where(col("__l") < k + maxDist)
      .select(col("__id").as("id_s"), col("__nm").as("nm_s"), col("__blk"))
    val candShort = shorts.join(nearShort, Seq("__blk"))
      .where(col("id_r") =!= col("id_s"))
      .select(
        least(col("id_r"), col("id_s")).as("id_a"),
        greatest(col("id_r"), col("id_s")).as("id_b"),
        when(col("id_r") < col("id_s"), col("nm_r")).otherwise(col("nm_s"))
          .as("name_a"),
        when(col("id_r") < col("id_s"), col("nm_s")).otherwise(col("nm_r"))
          .as("name_b"))
      .distinct()
    cand.union(candShort).distinct()
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        when(col("name_a") === col("name_b"), lit(0))
          .otherwise(levenshtein(col("name_a"), col("name_b"))))
      .where(col("dist") <= maxDist)
  }

  /** Collapse-compare-fanout fuzzy self-match: the EXACT third strategy
    * in the fuzzy-join family, for DUPLICATE-HEAVY dimensions. Same
    * output contract as [[blockedFuzzyPairs]] / [[passJoinFuzzyPairs]],
    * but string comparison runs over the DISTINCT (block, name) values
    * only — U² levenshtein calls instead of N² — and the qualifying name
    * pairs fan back out to id pairs through two equi-joins (plus a
    * same-name self-join for exact-duplicate groups). On a dirty
    * dimension where N ≫ U (the q92 part table: 20,000 rows, 64 names)
    * the comparison stage collapses from 25M pairs to ~10³, and the
    * remaining cost is the OUTPUT itself — which no exact algorithm can
    * avoid. When U is itself crawl-scale, feed the distinct table's
    * comparison through [[passJoinFuzzyPairs]]' segment index; the two
    * devices compose (collapse beats N→U, pigeonhole beats U²).
    *
    * Scale shape: one distinct hash-agg to U rows; the U-level compare
    * shuffles U (tiny by premise); the fan-out joins shuffle on
    * (block, name) with per-key multiplicity = the duplicate-group
    * sizes, so the join output equals the result cardinality — no
    * intermediate blow-up. Output: (id_a, name_a, id_b, name_b, dist),
    * id_a < id_b, each pair once. */
  def fuzzyPairsCollapsed(df: DataFrame, idCol: String, nameCol: String,
                          blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"fuzzyPairsCollapsed: maxDist must be >= 1, got $maxDist")
    val base = graft.core.CacheRegistry.persist(
      df.where(col(nameCol).isNotNull)
        .select(col(idCol).as("__id"), col(nameCol).as("__nm"),
          col(blockCol).as("__blk")))
    val names = base.select("__blk", "__nm").distinct()
    // name-level near pairs (na < nb lexicographically fixes one copy)
    val np = names.select(col("__blk"), col("__nm").as("__na"))
      .join(names.select(col("__blk"), col("__nm").as("__nb")), Seq("__blk"))
      .where(col("__na") < col("__nb") &&
        abs(length(col("__na")) - length(col("__nb"))) <= maxDist)
      .withColumn("__d", levenshtein(col("__na"), col("__nb")))
      .where(col("__d") <= maxDist)
    // fan-out: every id with na × every id with nb (same block)
    val cross = np
      .join(base.select(col("__blk"), col("__nm").as("__na"),
        col("__id").as("__ida")), Seq("__blk", "__na"))
      .join(base.select(col("__blk"), col("__nm").as("__nb"),
        col("__id").as("__idb")), Seq("__blk", "__nb"))
      .select(
        least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        when(col("__ida") < col("__idb"), col("__na")).otherwise(col("__nb"))
          .as("name_a"),
        when(col("__ida") < col("__idb"), col("__nb")).otherwise(col("__na"))
          .as("name_b"),
        col("__d").cast("int").as("dist"))
    // exact-duplicate groups: same (block, name), id-ordered, dist 0
    val same = base.select(col("__blk"), col("__nm"), col("__id").as("__ida"))
      .join(base.select(col("__blk"), col("__nm"), col("__id").as("__idb")),
        Seq("__blk", "__nm"))
      .where(col("__ida") < col("__idb"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("__nm").as("name_a"), col("__nm").as("name_b"),
        lit(0).as("dist"))
    cross.union(same)
  }

  /** Join-key skew profile — the diagnostic that decides whether
    * [[saltedEquiJoin]] (and what salt factor) is needed BEFORE a job
    * falls over on one reducer: the top-`topK` heaviest keys with their
    * row counts, share of the table, and the salt factor that would cap
    * each at `targetRowsPerTask` rows per reducer
    * (`ceil(cnt / targetRowsPerTask)`, floor 1). Keyed to a literal
    * row-count target rather than the session's parallelism so the
    * recommendation is a property of the DATA, reproducible anywhere.
    *
    * Scale shape: one hash-agg on the key with map-side combine, a
    * broadcast single-row total, a TakeOrderedAndProject cut. */
  /** Bloom-prefiltered inner equi-join (semi-join reduction): build a
    * Bloom filter over the small side's join keys, drop big-side rows the
    * filter rules out BEFORE anything shuffles, then run the exact join.
    * Row-for-row equal to `big.join(small, key)` — the filter admits
    * false POSITIVES only, and the exact join removes them — so the
    * speedup is free of semantic risk. This is the semi-join reduction
    * classic warehouses plan automatically; Spark's own runtime filter
    * (`InjectRuntimeFilter`) does it opportunistically for shuffle joins —
    * this operator is the EXPLICIT form for when the small side is a
    * computed/filtered frame the optimizer can't see through, and it
    * reuses Spark's native `BloomFilterAggregate`/`might_contain`
    * machinery (keys xxhash64'd on both sides, the rule's own device).
    *
    * Scale shape: the build side reduces to ONE bloom byte-array row
    * (mergeable agg, map-side partials); the probe is a scan-stage
    * predicate against that literal — at a selective key set it deletes
    * most of the big side's shuffle. Size `expectedItems` near the real
    * build-key count: too low inflates the false-positive rate toward 1
    * (filter stops deleting, join still exact). */
  def bloomSemiReducedJoin(big: DataFrame, small: DataFrame, key: String,
                           expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0,
      s"bloomSemiReducedJoin: need expectedItems > 0, got $expectedItems")
    val shared = big.columns.intersect(small.columns).filterNot(_ == key)
    require(shared.isEmpty,
      s"bloomSemiReducedJoin: sides share non-key column(s) ${shared.mkString("'", "', '", "'")} - " +
        "rename them before joining (only the join key may be shared)")
    require(big.columns.contains(key) && small.columns.contains(key),
      s"bloomSemiReducedJoin: both sides must carry join key '$key'")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    val bloom = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(xxhash64(col(key))), expectedItems)
        .toAggregateExpression())
    // one byte-array row to the driver; an EMPTY build side yields a null
    // bloom, might_contain(null, ·) is null, the filter drops every probe
    // row — exactly the empty join's semantics
    val bytes = small.agg(bloom.as("__bf")).head().getAs[Array[Byte]](0)
    val probe = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(col(key)))))
    big.where(probe).join(small, Seq(key))
  }

  /** Interval-overlap self-join: every pair of CLOSED intervals
    * `[start, end]` that intersect, with the intersection length —
    * concurrent sessions, colliding reservations, overlapping spans.
    * Emits (id_a, id_b, overlap_ms) with `id_a < id_b`; touching
    * intervals (shared endpoint) overlap with 0 ms.
    *
    * Scale shape: the inequality predicate never drives the join —
    * each interval explodes into the `bandMs`-wide time buckets it
    * covers (scan-stage `sequence`, ≤ `len/bandMs + 1` rows per
    * interval), the self-join is an EQUI-join on the bucket, the exact
    * overlap test filters the bucket-mates, and `distinct` collapses
    * pairs that share several buckets. Pick `bandMs` near the typical
    * interval length: too small multiplies the fan-out, too large turns
    * buckets into skewed mini cross-joins — the [[bandedRangeJoin]]
    * sizing rule. */
  def intervalOverlapPairs(df: DataFrame, idCol: String,
                           startCol: String, endCol: String,
                           bandMs: Long): DataFrame = {
    require(bandMs >= 1, s"intervalOverlapPairs: need bandMs >= 1, got $bandMs")
    val bandUs = bandMs * 1000L
    def band(c: String): Column = floor(unix_micros(col(c)) / bandUs)
    // end < start is not an interval — dropped, not banded backwards
    // (sequence() would otherwise step DOWNWARD through unintended bands)
    val banded = df.where(col(startCol) <= col(endCol))
      .select(col(idCol), col(startCol), col(endCol),
        explode(sequence(band(startCol), band(endCol))).as("__band"))
    val a = banded.toDF("id_a", "__sa", "__ea", "__band")
    val b = banded.toDF("id_b", "__sb", "__eb", "__band")
    a.join(b, Seq("__band"))
      .where(col("id_a") < col("id_b")
        && col("__sa") <= col("__eb") && col("__sb") <= col("__ea"))
      .select(col("id_a"), col("id_b"),
        ((least(unix_micros(col("__ea")), unix_micros(col("__eb")))
          - greatest(unix_micros(col("__sa")), unix_micros(col("__sb"))))
          / lit(1000L)).cast("long").as("overlap_ms"))
      .distinct()
  }

  /** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969; the
    * Splink/probabilistic-ER model) over blocked candidate pairs: for
    * every same-block pair (id_a < id_b) and each comparison field,
    * agreement contributes `log2(m / u_f)` and disagreement
    * `log2((1−m) / (1−u_f))`, summed into the pair's match `weight`.
    * `m` (P(agree | match)) is a supplied prior; each field's
    * `u_f` (P(agree | non-match)) is ESTIMATED FROM THE DATA as the
    * collision probability of two random records,
    * `Σ_v (n_v / N)²` over the field's value distribution — rare values
    * thus earn large agreement weights (two records sharing a rare name
    * are strong match evidence; sharing a common one is weak). NULLs
    * compare null-safely (null agrees with null) and form their own
    * frequency cohort. Output: (id_a, id_b, n_agree, weight) — rank or
    * threshold `weight` downstream.
    *
    * Scale shape: each u_f is one single-column hash-agg reduced to a
    * SCALAR (map-side partials, broadcast back — never collected rows);
    * candidate pairs come from a block equi-join (never cartesian, the
    * [[blockedFuzzyPairs]] contract — pick blocks accordingly) and the
    * per-pair score is a pure scan-stage expression over them. */
  def linkageWeights(df: DataFrame, idCol: String, blockCol: String,
                     fields: Seq[String], m: Double = 0.9): DataFrame = {
    require(fields.nonEmpty, "linkageWeights: need at least one field")
    require(m > 0 && m < 1, s"linkageWeights: need 0 < m < 1, got $m")
    // u_f = Σ (n_v/N)² per field: a one-row frame per field, chained
    // into a single broadcast row of |fields| scalars
    val uRow = fields.map { f =>
      df.groupBy(col(f)).agg(count(lit(1)).as("__n"))
        .agg((sum(col("__n").cast("double") * col("__n").cast("double")) /
          (sum("__n").cast("double") * sum("__n").cast("double")))
          .as(s"__u_$f"))
    }.reduce(_ crossJoin _)
    def side(pfx: String): DataFrame =
      df.select((Seq(col(idCol).as(s"${pfx}_id"), col(blockCol).as(s"${pfx}_blk")) ++
        fields.map(f => col(f).as(s"${pfx}_$f"))): _*)
    val pairs = side("__l").join(side("__r"),
      col("__l_blk") === col("__r_blk") && col("__l_id") < col("__r_id"))
    val agree = fields.map(f => col(s"__l_$f") <=> col(s"__r_$f"))
    val contrib = fields.zip(agree).map { case (f, a) =>
      when(a, log2(lit(m) / col(s"__u_$f")))
        .otherwise(log2(lit(1.0 - m) / (lit(1.0) - col(s"__u_$f"))))
    }.reduce(_ + _)
    pairs.crossJoin(broadcast(uRow))
      .select(col("__l_id").as("id_a"), col("__r_id").as("id_b"),
        agree.map(_.cast("int")).reduce(_ + _).cast("long").as("n_agree"),
        round(contrib, 6).as("weight"))
  }

  def skewProfile(df: DataFrame, keyCol: String,
                  targetRowsPerTask: Long, topK: Int): DataFrame = {
    require(targetRowsPerTask > 0 && topK > 0,
      s"skewProfile: need targetRowsPerTask > 0 and topK > 0; " +
        s"got $targetRowsPerTask, $topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("n_total").cast("double")).as("share"),
        greatest(lit(1L),
          ceil(col("cnt").cast("double") / targetRowsPerTask.toDouble).cast("long"))
          .as("salt_factor"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topK)
  }

  /** Exact join-size and strategy advisor — the cost-based-optimizer
    * question answered from the data itself before a 100 TB join is
    * launched: the EXACT output cardinality `Σ_k n_a(k)·n_b(k)` (what a
    * CMS sketch like q216 estimates, priced exactly here), both sides'
    * key profiles, the hottest key's output share, and a strategy
    * verdict — `broadcast` when the small side fits the limit,
    * `salted_shuffle` when one key's product exceeds `skewFactor×` the
    * matched-key average (the straggler-task signature), else
    * `shuffle`. Products and totals ride decimal(38,0) (a hot key's
    * n_a·n_b overflows a LONG at corpus scale); the top key breaks ties
    * to the smallest key string, so the verdict is replay-stable. Null
    * keys never match (inner-join semantics) and are profiled out.
    * Output: one row — (rows_a, ndv_a, max_mult_a, rows_b, ndv_b,
    * max_mult_b, matched_keys, join_rows, top_key, top_share, strategy).
    *
    * Scale shape: one key hash-agg per side (map-side combine), one
    * key-keyed join of the two NDV-sized count tables, two scalar
    * reduces over that reduced table — the raw tables are each read
    * once and never joined row×row. */
  def joinSizeAdvisor(a: DataFrame, b: DataFrame, keyA: String, keyB: String,
                      broadcastRowLimit: Long,
                      skewFactor: Double = 10.0): DataFrame = {
    require(broadcastRowLimit >= 1,
      s"joinSizeAdvisor: need broadcastRowLimit >= 1, got $broadcastRowLimit")
    require(skewFactor >= 1.0,
      s"joinSizeAdvisor: need skewFactor >= 1, got $skewFactor")
    def prof(df: DataFrame, key: String) = df.where(col(key).isNotNull)
      .groupBy(col(key).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
    val ca = graft.core.CacheRegistry.persist(prof(a, keyA))
    val cb = graft.core.CacheRegistry.persist(prof(b, keyB))
    val sideA = ca.agg(coalesce(sum("__n"), lit(0L)).as("rows_a"),
      count(lit(1)).as("ndv_a"),
      coalesce(max("__n"), lit(0L)).as("max_mult_a"))
    val sideB = cb.agg(coalesce(sum("__n"), lit(0L)).as("rows_b"),
      count(lit(1)).as("ndv_b"),
      coalesce(max("__n"), lit(0L)).as("max_mult_b"))
    val prod = graft.core.CacheRegistry.persist(
      ca.join(cb.select(col("__k"), col("__n").as("__m")), Seq("__k"))
        .select(col("__k"),
          (col("__n").cast("decimal(38,0)") * col("__m").cast("decimal(38,0)"))
            .as("__p")))
    val tot = prod.agg(count(lit(1)).as("matched_keys"),
      coalesce(sum("__p"), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")).as("join_rows"),
      max("__p").as("__pmax"))
    val top = prod.crossJoin(broadcast(tot))
      .where(col("__p") === col("__pmax"))
      .agg(min("__k").as("top_key"))
    val avg = col("join_rows").cast("double") /
      col("matched_keys").cast("double")
    val strategy =
      when(col("rows_b") <= broadcastRowLimit, lit("broadcast"))
        .when(col("matched_keys") > 0 &&
          col("__pmax").cast("double") > lit(skewFactor) * avg,
          lit("salted_shuffle"))
        .otherwise(lit("shuffle"))
    sideA.crossJoin(broadcast(sideB)).crossJoin(broadcast(tot))
      .crossJoin(broadcast(top))
      .select(col("rows_a"), col("ndv_a"), col("max_mult_a"),
        col("rows_b"), col("ndv_b"), col("max_mult_b"),
        col("matched_keys"), col("join_rows").cast("long").as("join_rows"),
        col("top_key"),
        when(col("matched_keys") > 0,
          round(col("__pmax").cast("double") /
            col("join_rows").cast("double"), 6)).as("top_share"),
        strategy.as("strategy"))
  }
}
