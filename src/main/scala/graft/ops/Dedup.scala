package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, and SimHash. (Embedding-cosine
  * near-dup lives in [[Similarity.nearDupPairs]].)
  *
  * Scale notes:
  *  - exact dedup is a single hash-aggregate shuffle on the dedup key.
  *  - the pairwise-Jaccard path shuffles on the shingle, so its cost is
  *    Σ df(shingle)² — quadratic in per-shingle document frequency. It is the
  *    exact baseline; at 100 TB use [[minHashLshPairs]], whose shuffle is on
  *    (band index, band hash) and whose candidate set is bounded by the LSH
  *    collision probability, then verify only candidates.
  *  - hashes: the oracle-checkable variants use md5 (same algorithm available
  *    in DuckDB); the hot path at scale should use xxhash64 (codegen'd, 8-byte
  *    output) — [[simHash64]] is that variant.
  */
object Dedup {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (with multiplicity) — a native one-pass expression
    * (org.apache.spark.sql.graft.WordShingles). The built-in formulation it
    * replaced (interpreted per element, ~5× slower over millions of
    * documents) survives as a test-only equivalence witness
    * (EquivalenceWitnesses.shinglesHof, pinned in TextFunctionsSpec). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextFunctions.wordShingles(text, n)

  /** Exploded table of DISTINCT shingles: (id, shingle). */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(array_distinct(shingles(col(textCol), n))).as("shingle"))

  /** Exact dedup: one surviving row (min id) per identical key. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_copies"))

  /** All document pairs with n-gram Jaccard ≥ minJaccard (exact, pairwise).
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|) over distinct shingle sets. */
  /** Per-document DISTINCT shingle arrays — computed in the scan stage by
    * the native kernel: no explode, no shuffle. */
  def shingleArrays(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), array_distinct(shingles(col(textCol), n)).as("sh"))
      .where(size(col("sh")) > 0)

  private def jaccardFromArrays(pairs: DataFrame, arrays: DataFrame,
                                minJaccard: Double): DataFrame = {
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    pairs
      .join(arrays.toDF("id_a", "sh_a"), Seq("id_a"))
      .join(arrays.toDF("id_b", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, minJaccard: Double): DataFrame = {
    // the exploded table feeds the pair-generation join twice; registered
    // for harness drain after the query completes
    val sh = graft.core.CacheRegistry.persist(shingleTable(df, idCol, textCol, n))
    val a = sh.toDF("id_a", "shingle")
    val b = sh.toDF("id_b", "shingle")
    val common = a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    // sizes come from the scan-stage arrays — no aggregation shuffle;
    // persisted because both join sides below consume it (uncached, the
    // shingle kernel would re-run over the corpus twice)
    val sizes = graft.core.CacheRegistry.persist(
      shingleArrays(df, idCol, textCol, n)
        .select(col(idCol), size(col("sh")).as("n_sh")))
    common
      .join(sizes.toDF("id_a", "na"), Seq("id_a"))
      .join(sizes.toDF("id_b", "nb"), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Directional n-gram CONTAINMENT pairs — the quote/excerpt detector
    * Jaccard-based dedup is structurally blind to: a 50-token excerpt
    * inside a 5 000-token article has Jaccard ≈ 0.01 but containment
    * `|A∩B| / |A|` ≈ 1. Emits (contained_id, container_id, containment)
    * for ordered pairs where the CONTAINED side's shingles are covered
    * at ≥ `minContainment` and the contained side has at most
    * `maxContainedTokens` tokens — the asymmetry is the point, so the
    * cap applies only to the quote side. Both directions of a mutual
    * near-dup appear (downstream dedup already handles symmetric pairs;
    * this op's consumers want the quotes).
    *
    * Scale shape: the probe side is PRE-FILTERED to short documents
    * before its shingle explode, so the pair join is (short-doc
    * shingles) ⋈ (corpus shingles) — bounded by the quote-side volume,
    * not the corpus square; sizes ride from scan-stage arrays. The
    * all-pairs exact form (this is the verifier twin, like q21 for
    * Jaccard) still pays Σ df(shingle)·df_short(shingle); band it with
    * [[minHashLshPairs]] on the short side when the quote side itself
    * is corpus-sized. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, minContainment: Double,
                       maxContainedTokens: Int): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      s"containmentPairs: need 0 < minContainment <= 1, got $minContainment")
    require(maxContainedTokens >= n,
      s"containmentPairs: need maxContainedTokens >= n, got $maxContainedTokens")
    val short = df.where(size(split(col(textCol), " ")) <= maxContainedTokens)
    val a = graft.core.CacheRegistry.persist(
      shingleTable(short, idCol, textCol, n)).toDF("contained_id", "shingle")
    val b = shingleTable(df, idCol, textCol, n).toDF("container_id", "shingle")
    val common = a.join(b, Seq("shingle"))
      .where(col("contained_id") =!= col("container_id"))
      .groupBy("contained_id", "container_id")
      .agg(count(lit(1)).as("n_common"))
    val sizes = graft.core.CacheRegistry.persist(
      shingleArrays(short, idCol, textCol, n)
        .select(col(idCol).as("contained_id"), size(col("sh")).as("__na")))
    common.join(sizes, Seq("contained_id"))
      .withColumn("containment",
        round(col("n_common").cast("double") / col("__na"), 6))
      .where(col("containment") >= minContainment)
      .select("contained_id", "container_id", "containment")
  }

  /** MinHash signature columns sig_0..sig_{h-1}: sig_i = min over shingles
    * of md5(i || ':' || shingle) (duplicates cannot change a min, so
    * distinctness is not required). Computed per document in ONE pass by a
    * native expression — no explode, no shuffle: the group-by-doc
    * aggregation the built-in formulation needs disappears entirely. The
    * hex-string hash keeps ordering identical across engines. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val sig = graft.functions.TextFunctions.minHashSig(
      shingles(col(textCol), n), numHashes)
    df.select(col(idCol), sig.as("sig")).where(col("sig").isNotNull)
      .select((col(idCol) +: (0 until numHashes).map(i =>
        element_at(col("sig"), i + 1).as(s"sig_$i"))): _*)
  }

  /** (id, band, band-hash) LSH bucket table — the shared fan-in of
    * [[minHashLshPairs]] (self-dedup) and [[minHashLshPairsAcross]]
    * (batch-vs-corpus). Signatures come from the native one-pass kernel
    * (MinHashSig): no explode, no h-way min groupBy — byte-identical to the
    * min-over-exploded-shingles formulation (TextFunctionsSpec pins it). */
  private def lshBandTable(df: DataFrame, idCol: String, textCol: String,
                           n: Int, bands: Int, rowsPerBand: Int): DataFrame =
    bandsFromSigs(minHashSignatures(df, idCol, textCol, n, bands * rowsPerBand),
      idCol, bands, rowsPerBand)

  private def bandsFromSigs(sigs: DataFrame, idCol: String,
                            bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", slots: _*)).as("bh"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** [[minHashBandTable]] recomputed from STORED shingle arrays (id, sh)
    * instead of raw text — the milestone-re-banding rebuild path
    * ([[graft.streaming.EventStream.streamDedupedIngest]]): when a
    * maintained index re-derives its banding, the signatures must be
    * recomputed at the new (bands, rowsPerBand), and the arrays sibling
    * already holds every standing row's shingles — so the rebuild never
    * touches the standing side's TEXT (which the index tables don't
    * store). Byte-identical to [[minHashBandTable]] over the original
    * text at the same calibration: MinHash mins are invariant under the
    * arrays' `array_distinct` (duplicates cannot change a min). */
  def minHashBandTableFromArrays(arrays: DataFrame, idCol: String,
                                 bands: Int, rowsPerBand: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = graft.functions.TextFunctions.minHashSig(col("sh"), numHashes)
    val sigs = arrays.select(col(idCol), sig.as("sig")).where(col("sig").isNotNull)
      .select((col(idCol) +: (0 until numHashes).map(i =>
        element_at(col("sig"), i + 1).as(s"sig_$i"))): _*)
    bandsFromSigs(sigs, idCol, bands, rowsPerBand)
  }

  /** COUNT-TRACKING MinHash banding — the constant-threshold family
    * (Leskovec/Rajaraman/Ullman ch. 3): the bootstrap calibration
    * (bands0, rows0) fixes the S-curve midpoint t = (1/bands0)^(1/rows0);
    * each DECADE of corpus growth past `n0` adds one signature row per
    * band (r = rows0 + decades) and re-derives the band count that holds
    * the midpoint fixed (b = round(t^-r)) — so recall at the operating
    * threshold is preserved while a sub-threshold pair's band-collision
    * probability b·s^r falls geometrically in r (at s = t/2 each step
    * cuts it ~2^rows0×), countering the n× growth in standing rows each
    * collision is paid against. Cost is the signature width b·r,
    * growing ~(1/t)× per decade — clamped at `maxHashes`, past which
    * the calibration freezes (the documented ceiling of the family).
    * At n ≤ n0 this returns exactly (bands0, rows0) — the gate's bench
    * fixtures never leave the bootstrap decade, so their banding (and
    * their oracle replays) are bit-stable. */
  def recommendedBanding(n: Long, n0: Long, bands0: Int, rows0: Int,
                         maxHashes: Int = 512): (Int, Int) = {
    require(n >= 1 && n0 >= 1 && bands0 >= 1 && rows0 >= 1,
      s"recommendedBanding: need n/n0/bands0/rows0 >= 1, got $n/$n0/$bands0/$rows0")
    val decades =
      if (n <= n0) 0
      else math.floor(math.log10(n.toDouble / n0.toDouble)).toInt
    val t = math.pow(1.0 / bands0, 1.0 / rows0)
    def bandsFor(r: Int): Int =
      math.max(1, math.round(math.pow(t, -r.toDouble)).toInt)
    var r = rows0 + decades
    while (r > rows0 && bandsFor(r) * r > maxHashes) r -= 1
    (bandsFor(r), r)
  }

  /** MinHash + LSH banding: candidate pairs = documents sharing at least one
    * band hash (band j = md5 of its `rowsPerBand` signature slots), then
    * verified with exact Jaccard. numHashes = bands × rowsPerBand. */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                      bands: Int, rowsPerBand: Int, minJaccard: Double): DataFrame = {
    // persisted: both sides of the bucket self-join consume the band table —
    // uncached, the MinHash signature pass over the corpus would run twice
    val banded = graft.core.CacheRegistry.persist(
      lshBandTable(df, idCol, textCol, n, bands, rowsPerBand))
    val x = banded.toDF("id_a", "band", "bh")
    val y = banded.toDF("id_b", "band", "bh")
    val candidates = x.join(y, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with exact Jaccard over per-doc shingle ARRAYS
    // (array_intersect on scan-stage arrays) — no exploded shingle table,
    // no per-shingle shuffle; the whole verify stage shuffles only the
    // (small) candidate set against one row per document
    val arrays = graft.core.CacheRegistry.persist(
      shingleArrays(df, idCol, textCol, n))
    jaccardFromArrays(candidates, arrays, minJaccard)
  }

  /** Incremental (batch-vs-corpus) near-dup detection — the shape an
    * ingestion pipeline actually runs at 100 TB: the standing corpus is NOT
    * re-deduped against itself every run; only the new batch is checked
    * against it. Candidates are (corpus, batch) pairs sharing ≥1 LSH band
    * bucket — the join is corpus-bands ⋈ batch-bands, so its output is
    * bounded by the batch's collisions, never the corpus² pair space — then
    * verified with exact Jaccard over per-doc shingle arrays.
    *
    * Returns (corpus_id, batch_id, jaccard ≥ minJaccard): the batch ids in
    * the result are the rows to drop (or route to human review) before
    * appending the batch to the corpus. In a production loop the corpus
    * band table is PRECOMPUTED and stored (it is append-only — signatures
    * of old docs never change), so each run computes bands only for the
    * batch; this operator recomputes both sides from text, which keeps it
    * storage-free and oracle-checkable while planning the identical join.
    * Ids must be disjoint across the two inputs (not enforced — equal ids
    * on the two sides are legal but meaningless). */
  def minHashLshPairsAcross(corpus: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String, n: Int,
                            bands: Int, rowsPerBand: Int,
                            minJaccard: Double): DataFrame =
    minHashLshPairsAcross(
      lshIndex(corpus, idCol, textCol, n, bands, rowsPerBand), batch, minJaccard)

  /** The precomputed standing-corpus side of [[minHashLshPairsAcross]]:
    * banded signatures and per-doc shingle arrays, both persisted. In the
    * production loop this is the STORED band table (append-only —
    * signatures of old docs never change); in-session it is built once
    * per corpus snapshot and reused across every incoming batch, so each
    * batch pays only its own signature pass
    * ([[graft.streaming.EventStream.streamDedupedIngest]] does exactly
    * this). Construction parameters ride along so a probe can't silently
    * run with mismatched banding. */
  final case class LshCorpusIndex private[ops] (
      idCol: String, textCol: String, n: Int, bands: Int, rowsPerBand: Int,
      bandTable: DataFrame, arrays: DataFrame)

  def lshIndex(corpus: DataFrame, idCol: String, textCol: String,
               n: Int, bands: Int, rowsPerBand: Int): LshCorpusIndex =
    LshCorpusIndex(idCol, textCol, n, bands, rowsPerBand,
      graft.core.CacheRegistry.persist(
        lshBandTable(corpus, idCol, textCol, n, bands, rowsPerBand)),
      graft.core.CacheRegistry.persist(
        shingleArrays(corpus, idCol, textCol, n)))

  /** The (id, band, bh) MinHash LSH band rows of a document frame — the
    * STORABLE half of the standing-corpus index: at 100 TB a standing
    * corpus's band rows are a maintained artifact (computed once,
    * persisted, appended per admitted batch — MinHash band rows are
    * exactly as indexable as sign-LSH rows,
    * [[graft.ops.Similarity.signBandTable]]'s text twin), so ingestion
    * pays only the arriving batch's signature pass plus a (band, bh) join
    * against the stored index, never a per-trigger re-sign of the whole
    * standing side ([[graft.streaming.EventStream.streamDedupedIngest]]
    * maintains exactly this table, beside a [[shingleArrays]] sibling for
    * the exact-Jaccard verify). */
  def minHashBandTable(df: DataFrame, idCol: String, textCol: String,
                       n: Int, bands: Int, rowsPerBand: Int): DataFrame =
    lshBandTable(df, idCol, textCol, n, bands, rowsPerBand)

  /** Banded SELF-pairs + exact-Jaccard verify from PRECOMPUTED band and
    * shingle-array tables — the sign-once hook for callers that already
    * hold [[minHashBandTable]]/[[shingleArrays]] of the frame (the
    * streaming gate's intra-batch reduction signs the batch once and
    * feeds the same tables here, into the standing-index join, and into
    * the sibling-index appends — VERDICT r10 #3 measured the previous
    * shape signing every intra-batch trigger twice). Set-identical to
    * [[minHashLshPairs]] when the inputs are exactly that frame's band
    * and array tables. Caller owns persistence of both inputs (each is
    * consumed by both sides of the self-join / the verify). */
  def minHashLshPairsOn(bandTable: DataFrame, arrays: DataFrame,
                        idCol: String, minJaccard: Double): DataFrame = {
    val slim = bandTable.select(col(idCol), col("band"), col("bh"))
    val candidates = slim.toDF("id_a", "band", "bh")
      .join(slim.toDF("id_b", "band", "bh"), Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    jaccardFromArrays(candidates, arrays.select(col(idCol), col("sh")), minJaccard)
  }

  /** Batch-vs-standing MinHash near-dup detection against a PRECOMPUTED
    * stored index — the maintained-artifact form of
    * [[minHashLshPairsAcross]] (set-identical when `standingBands` /
    * `standingArrays` are exactly [[minHashBandTable]] /
    * [[shingleArrays]] of the standing side at the same calibration):
    * candidates are (standing, batch) id pairs sharing a (band, bh)
    * between the INDEX and the batch's freshly-banded signatures; verify
    * fetches shingle arrays by id from `standingArrays` — an id-keyed
    * join bounded by the candidate set, so the standing side's text is
    * never re-shingled and its signatures never recomputed. Returns
    * (corpus_id, batch_id, jaccard ≥ minJaccard).
    *
    * `rebalance` re-spreads the stored band rows to the session's
    * parallelism before the hot join (a stored index read back from a
    * handful of parquet files would cap the join's parallelism at the
    * FILE count — the measured [[graft.ops.Similarity.lshNearDupPairsIndexed]]
    * pitfall); pass false when the bands were just computed in-plan.
    *
    * `batchBands`/`batchArrays`: PRECOMPUTED [[minHashBandTable]]/
    * [[shingleArrays]] of the batch (caller-persisted) — the sign-once
    * hook: a caller that already signed the batch (e.g. for an
    * intra-batch reduction) passes the tables through instead of paying
    * the signature pass again. Must be at the SAME (n, bands,
    * rowsPerBand) calibration as the standing index. */
  def minHashLshPairsIndexed(standingBands: DataFrame, standingArrays: DataFrame,
                             batch: DataFrame, idCol: String, textCol: String,
                             n: Int, bands: Int, rowsPerBand: Int,
                             minJaccard: Double,
                             rebalance: Boolean = true,
                             batchBands: Option[DataFrame] = None,
                             batchArrays: Option[DataFrame] = None): DataFrame = {
    val slim = standingBands.select(col(idCol), col("band"), col("bh"))
    val cb =
      (if (rebalance)
        slim.repartition(batch.sparkSession.sparkContext.defaultParallelism)
      else slim).toDF("id_a", "band", "bh")
    val bb = batchBands.map(_.select(col(idCol), col("band"), col("bh")))
      .getOrElse(lshBandTable(batch, idCol, textCol, n, bands, rowsPerBand))
      .toDF("id_b", "band", "bh")
    val candidates = cb.join(bb, Seq("band", "bh"))
      .select("id_a", "id_b").distinct()
    val ca = standingArrays.select(col(idCol), col("sh")).toDF("id_a", "sh_a")
    val ba = batchArrays.map(_.select(col(idCol), col("sh")))
      .getOrElse(graft.core.CacheRegistry.persist(
        shingleArrays(batch, idCol, textCol, n))).toDF("id_b", "sh_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    candidates
      .join(ca, Seq("id_a")).join(ba, Seq("id_b"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a").as("corpus_id"), col("id_b").as("batch_id"), col("jaccard"))
  }

  /** [[minHashLshPairsAcross]] against a precomputed corpus index: only
    * the batch side computes signatures; the corpus side reads its cached
    * band table and verify arrays. */
  def minHashLshPairsAcross(index: LshCorpusIndex, batch: DataFrame,
                            minJaccard: Double): DataFrame = {
    val cb = index.bandTable.toDF("id_a", "band", "bh")
    val bb = lshBandTable(batch, index.idCol, index.textCol,
        index.n, index.bands, index.rowsPerBand)
      .toDF("id_b", "band", "bh")
    val candidates = cb.join(bb, Seq("band", "bh"))
      .select("id_a", "id_b").distinct()
    val ca = index.arrays.toDF("id_a", "sh_a")
    val ba = graft.core.CacheRegistry.persist(
      shingleArrays(batch, index.idCol, index.textCol, index.n)).toDF("id_b", "sh_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    candidates
      .join(ca, Seq("id_a")).join(ba, Seq("id_b"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a").as("corpus_id"), col("id_b").as("batch_id"), col("jaccard"))
  }

  /** 16-bit SimHash from the first 16 hex nibbles of each token's md5:
    * bit i votes +1 if nibble i ≥ 8 else −1; signature bit i = (Σ votes > 0).
    * Returned as a bigint in [0, 65535]. Oracle-checkable (md5 + set
    * membership only); see [[simHash64]] for the scale variant.
    *
    * Computed per document in ONE scan-stage pass by a native expression
    * (org.apache.spark.sql.graft.SimHash16) — SimHash is a pure per-row
    * function, so the explode-tokens → 16 vote-sums → groupBy formulation
    * would shuffle the entire token stream to compute what a kernel
    * computes moving nothing (that form survives as a test-only
    * equivalence witness, EquivalenceWitnesses.simHash16Agg). */
  def simHash16(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.TextFunctions.simHash16(col(textCol)).as("simhash16"))

  /** Connected components over near-duplicate pairs: assigns every document
    * the MINIMUM id reachable through the pair graph (its cluster id /
    * canonical representative) — the step that turns pairwise dedup output
    * into keep/drop decisions.
    *
    * Algorithm: iterative min-label propagation (the standard large-graph
    * formulation — alternating small-star/large-star joins). Each round
    * every node adopts the smallest label among itself and its neighbors;
    * rounds needed = graph diameter in the worst case, O(log n) for the
    * star-shaped clusters dedup produces. Each round is one shuffle on the
    * edge key, so the cost is rounds × |edges| — no driver-side state, scales
    * to any edge count.
    *
    * Propagation runs over the EDGE-INDUCED subgraph only: a node with no
    * edges can never change label, so the per-round join and label cache
    * cover just the duplicate-involved ids (typically a few percent of a
    * corpus), and singletons rejoin via one left join at the end. At 100 TB
    * this is the difference between shuffling billions of corpus rows per
    * round and shuffling only the dup-pair nodes.
    *
    * @param pairs    edges (idA, idB) — undirected, any orientation
    * @param ids      one row per document id (nodes with no edges become
    *                 singleton clusters)
    * @param maxIters cap on propagation rounds — the loop exits as soon as a
    *                 round changes nothing, so a generous cap costs nothing
    *                 when clusters are shallow; non-convergence throws
    *                 (silent wrong labels are worse than a failed job)
    */
  def clusters(pairs: DataFrame, pairACol: String, pairBCol: String,
               ids: DataFrame, idCol: String, maxIters: Int = 20): DataFrame = {
    import graft.core.CacheRegistry
    // ONE materialization of the (possibly expensive — LSH verify) pair
    // stream: the symmetric-edge union references it twice, so checkpoint
    // it first. CacheRegistry.checkpoint = localCheckpoint (materialize +
    // lineage cut in one job) with deterministic scope/drain release.
    val half = CacheRegistry.checkpoint(
      pairs.select(col(pairACol).as("src"), col(pairBCol).as("dst")))
    // adaptive propagation width: rounds shuffle ONLY dup-involved nodes
    // (typically a few percent of a corpus), so size the per-round
    // exchanges to the measured edge count instead of the session default
    // — a few hundred pairs would otherwise pay full-width task scheduling
    // per tiny stage × rounds (the round-4 q53 bench tax), while billions
    // of edges still get the session's full parallelism
    val sess = half.sparkSession
    val nEdges = 2L * half.count()
    val maxParts = math.max(sess.sparkContext.defaultParallelism,
      sess.conf.get("spark.sql.shuffle.partitions").toInt)
    val parts = math.max(1L, math.min(maxParts.toLong, nEdges / 2000000L + 1L)).toInt
    // symmetric edge list, pre-partitioned on the per-round join key (dst)
    // so every round reuses the edge-side exchange
    val edges = CacheRegistry.checkpoint(half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(parts, col("dst")))
    // only nodes with at least one edge can ever change label — propagate
    // over them alone and fold the (vastly larger) singleton set back in
    // with one left join after convergence
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var it = 0
    while (it < maxIters && !converged) {
      // neighbor minimum: for each node, the smallest label among neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("label").as("nmin"))
      // carry a per-row changed flag so convergence is a filter over the
      // round's own checkpoint — no second join against the previous labels.
      // The eager localCheckpoint is the round's ONE materializing job and
      // cuts lineage (labels appears twice in each round's plan — directly
      // and inside neighborMin — so carrying plans forward doubles the tree
      // every round); the convergence count is then a cheap cached scan.
      val next = CacheRegistry.checkpoint(
        labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
            (col("nmin").isNotNull && col("nmin") < col("label")).as("__changed")))
      converged = next.where(col("__changed")).count() == 0L
      labels = next.drop("__changed")
      it += 1
    }
    // min-label propagation needs diameter rounds: a chain longer than
    // maxIters hops would silently return WRONG (non-converged) cluster ids
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.clusters did not converge in $maxIters rounds - " +
          "the pair graph has a component of diameter > maxIters; raise maxIters")
    ids.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("label", "__edge_label"), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__edge_label"), col("id")).as("cluster_id"))
  }

  /** The full dedup decision, composed end-to-end: near-dup pairs →
    * connected components → keep the minimum id of every cluster. Returns
    * the SURVIVING ids (singletons included). This is the operator a
    * training-data pipeline actually runs; the pieces stay public for
    * pipelines that need the intermediate tables.
    *
    * At 100 TB swap the exact pair generator for [[minHashLshPairs]] via
    * `pairGen` — the composition is agnostic to how pairs were found. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         n: Int, minJaccard: Double,
                         pairGen: Option[DataFrame] = None): DataFrame = {
    val pairs = pairGen.getOrElse(ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
    val assign = clusters(pairs, "id_a", "id_b", df.select(idCol), idCol)
    // survivor = the cluster representative (min id == its own id)
    assign.where(col(idCol) === col("cluster_id")).select(col(idCol))
  }

  /** Benchmark decontamination: flag every corpus document that shares at
    * least one word `n`-gram with ANY document in `bench` (the eval/test
    * sets that must not leak into training data — the n-gram-overlap
    * check of GPT-3 appendix C / PaLM, at word granularity). Returns
    * (id, contaminated) for every corpus row.
    *
    * Scale shape: the benchmark side is small by nature (eval suites are
    * thousands of docs, the corpus is billions), so its DISTINCT shingle
    * set is broadcast and the overlap probe runs map-side against the
    * corpus shingle explode — no shuffle of corpus data at all. */
  def contaminationFlags(corpus: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String, n: Int): DataFrame = {
    val benchShingles = bench
      .select(explode(array_distinct(shingles(col(textCol), n))).as("shingle"))
      .distinct()
    val contaminated = shingleTable(corpus, idCol, textCol, n)
      .join(broadcast(benchShingles), "shingle")
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(true))
    // hit set size is data-dependent (usually tiny): leave the final join
    // strategy to AQE rather than forcing a broadcast
    corpus.select(col(idCol))
      .join(contaminated, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__hit"), lit(false)).as("contaminated"))
  }

  /** Audit twin of [[dropNearDuplicates]]: one row per DROPPED document
    * with the representative that kept it out — the "why did my document
    * disappear" report a curation pipeline must be able to answer.
    * Same pair/cluster machinery; only the final filter flips. */
  def nearDuplicateAudit(df: DataFrame, idCol: String, textCol: String,
                         n: Int, minJaccard: Double,
                         pairGen: Option[DataFrame] = None): DataFrame = {
    val pairs = pairGen.getOrElse(ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
    val assign = clusters(pairs, "id_a", "id_b", df.select(idCol), idCol)
    assign.where(col(idCol) =!= col("cluster_id"))
      .select(col(idCol).as("dropped_id"), col("cluster_id").as("kept_id"))
  }

  /** Duplication-count training weights: one row per SURVIVING
    * representative (min-id policy, exactly [[dropNearDuplicates]]'s
    * keeper) with `weight` = its cluster's member count, singletons 1.
    * Hard dedup silently reshapes the training distribution — a document
    * the web repeated 10,000 times collapses to one copy with the same
    * loss contribution as a one-off page; carrying the multiplicity out
    * lets training re-weight the survivor (or cap the weight) instead of
    * forgetting it. Feed to an example-weighted loss, or to
    * [[Sampling.weightedSample]] to materialize a count-aware sample.
    *
    * Scale shape: the same pair→component machinery as
    * [[dropNearDuplicates]], then ONE hash-agg keyed on the cluster id
    * (map-side partials — only one count per cluster crosses the wire). */
  def duplicationWeights(df: DataFrame, idCol: String, textCol: String,
                         n: Int, minJaccard: Double,
                         pairGen: Option[DataFrame] = None): DataFrame = {
    val pairs = pairGen.getOrElse(ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
    val assign = clusters(pairs, "id_a", "id_b", df.select(idCol), idCol)
    assign.groupBy(col("cluster_id").as(idCol))
      .agg(count(lit(1)).as("weight"))
  }

  /** CENTRALITY-aware cluster representative: per near-dup cluster the
    * MEDOID — the member minimizing the summed Levenshtein distance to
    * its cluster mates (ties → smallest id) — where
    * [[bestRepresentatives]] prefers the longest copy, the medoid
    * prefers the most TYPICAL one (robust against a cluster member that
    * concatenated junk onto the shared text, which max-length would
    * crown). Null texts compare as empty strings rather than poisoning
    * the distance sums with nulls. Returns one row per cluster,
    * singletons included with cost 0:
    * (cluster_id, medoid_id, n_members, medoid_cost).
    *
    * Scale shape: the same pair→component machinery as
    * [[dropNearDuplicates]]; the distance matrix is WITHIN-cluster pairs
    * only (one cluster-keyed self-join — quadratic bounded by cluster
    * size, the [[graft.ops.Similarity.semanticNearDups]] device), then
    * two cluster-keyed hash-aggs; the argmin is a sort-free `min_by`,
    * never a window. Levenshtein cost is O(len²) per pair — cap member
    * text length upstream for clusters of long documents. */
  def clusterMedoids(df: DataFrame, idCol: String, textCol: String,
                     n: Int, minJaccard: Double,
                     pairGen: Option[DataFrame] = None): DataFrame = {
    val pairs = pairGen.getOrElse(ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
    val assign = clusters(pairs, "id_a", "id_b", df.select(idCol), idCol)
    // persisted: both sides of the within-cluster self-join read it
    val m = graft.core.CacheRegistry.persist(assign.join(
      df.select(col(idCol), coalesce(col(textCol), lit("")).as("__txt")), idCol))
    val costs = m.select(col("cluster_id"), col(idCol).as("__idl"),
        col("__txt").as("__tl"))
      .join(m.select(col("cluster_id"), col(idCol).as("__idr"),
        col("__txt").as("__tr")), "cluster_id")
      .groupBy(col("cluster_id"), col("__idl"))
      .agg(coalesce(sum(when(col("__idl") =!= col("__idr"),
        levenshtein(col("__tl"), col("__tr")))), lit(0L)).as("__cost"))
    costs.groupBy("cluster_id")
      .agg(expr("min_by(__idl, struct(__cost, __idl))").as("medoid_id"),
        count(lit(1)).as("n_members"),
        min("__cost").as("medoid_cost"))
  }

  /** Quality-aware variant of [[dropNearDuplicates]]: within each near-dup
    * cluster keep the LONGEST document (ties → smallest id) instead of the
    * smallest id — the curation policy that prefers the fullest copy of a
    * mirrored page over whichever crawl happened to assign it a low id.
    * Returns one row per cluster (singletons included):
    * (cluster_id, rep_id, n_members, rep_len).
    *
    * Scale shape: the same pair→component machinery as
    * [[dropNearDuplicates]], then ONE extra shuffle keyed on cluster_id
    * for the per-cluster arg-max (a sort-free `max_by` two-phase
    * aggregation, not a row_number window — partials combine map-side and
    * only one (rep, len) pair per cluster crosses the wire). */
  def bestRepresentatives(df: DataFrame, idCol: String, textCol: String,
                          n: Int, minJaccard: Double,
                          pairGen: Option[DataFrame] = None): DataFrame = {
    val pairs = pairGen.getOrElse(ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
    val assign = clusters(pairs, "id_a", "id_b", df.select(idCol), idCol)
    // NULL text → length NULL, and a null first field sorts FIRST in
    // Spark's struct ordering — a null-text doc would beat every real one
    // as representative (and diverge from SQL engines' NULLS LAST).
    // Coalesce to -1 so null-text docs lose to any non-null text.
    val scored = assign.join(
      df.select(col(idCol), coalesce(length(col(textCol)), lit(-1)).as("__len")), idCol)
    // arg-max by (length desc, id asc): min_by over a struct ordered as
    // (NEGATED length, id) — the length is always numeric (char count), so
    // the negation is type-safe for ANY id type, and including the id in
    // the struct makes the minimum unique (deterministic tiebreak)
    scored.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min_by(col(idCol), struct(-col("__len"), col(idCol))).as("rep_id"),
        max(col("__len")).as("rep_len"))
      .select(col("cluster_id"), col("rep_id"), col("n_members"), col("rep_len"))
  }

  /** Train/eval split-leakage audit: for every held-out document (md5
    * bucket of the id ≥ `trainPct`, [[Sampling.deterministicSplit]]'s
    * device), the share of its distinct word `n`-grams that also appear
    * anywhere in the TRAIN split — the self-check a pipeline runs after
    * splitting, because a deduplicated corpus can still leak content
    * across splits through partial overlaps below the dedup threshold
    * (Lee et al. 2022). Returns (id, n_grams, n_leaked, leak_ratio,
    * leaky) per held-out doc; `leaky` flags ratio ≥ `maxRatio`.
    *
    * Scale shape: one shingle scan feeds both sides; the train side
    * reduces to a DISTINCT shingle set (hash-agg), the held-out side
    * left-semi-joins against it keyed on the shingle and aggregates per
    * doc. Shuffle carries distinct (doc, shingle) pairs once — the same
    * movement bound as [[contaminationFlags]] without the broadcast
    * assumption, since a train split is NOT small. */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   n: Int, trainPct: Int, maxRatio: Double): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"splitLeakage: trainPct must be in (0, 100), got $trainPct")
    // persisted: three consumers (train grams, leak counts, totals) would
    // otherwise each re-run the shingle explode over the corpus
    val sh = graft.core.CacheRegistry.persist(
      shingleTable(df, idCol, textCol, n)
        .withColumn("__train", Sampling.md5Bucket(col(idCol)) < trainPct))
    val trainGrams = sh.where(col("__train")).select("shingle").distinct()
    val heldOut = sh.where(!col("__train"))
    val leaked = heldOut.join(trainGrams, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_leaked"))
    heldOut.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
      .join(leaked, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .withColumn("leak_ratio",
        round(col("n_leaked").cast("double") / col("n_grams").cast("double"), 6))
      .withColumn("leaky", col("leak_ratio") >= maxRatio)
  }

  /** Per-document n-gram novelty: the share of each document's distinct
    * word `n`-grams that appear in NO other document — the inverse of
    * boilerplate. Low novelty = template/mirror content that near-dup
    * thresholds may still pass; high novelty = unique text worth its
    * tokens (and, for eval sets, a memorization-risk signal: high-novelty
    * grams that a model reproduces verbatim were memorized, not
    * generalized). Returns (id, n_grams, n_unique, novelty 6 dp) for every
    * doc with at least one shingle.
    *
    * Scale shape: one shingle scan feeds a (shingle → doc-frequency)
    * hash-agg with map-side combine; the per-doc roll-up joins the tiny
    * df=1 verdict back on the shingle — shuffle carries distinct
    * (doc, shingle) pairs once, the [[splitLeakage]] movement bound. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // persisted: the df-count aggregation and the join probe would each
    // re-run the shingle explode otherwise
    val sh = graft.core.CacheRegistry.persist(shingleTable(df, idCol, textCol, n))
    val dfCounts = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
    sh.join(dfCounts, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** Span-level exact-duplicate detection: the maximal token spans of each
    * document whose every word `n`-gram occurs at least `minOccurrences`
    * times corpus-wide — the primitive behind exact-substring dedup
    * (dedup at the SPAN level, where document-level near-dup keeps both
    * copies of a page that merely quotes the same boilerplate paragraph).
    * Returns (id, span_start, span_tokens): 1-based start token index and
    * span length in tokens; positions outside any span are unique text.
    *
    * Scale shape: positional grams are generated in the scan stage
    * (`transform` over a `sequence`, no join); the occurrence count is one
    * hash-agg with map-side combine; duplicated positions come back via a
    * left-semi join on the gram; span merging (gaps-and-islands) is a
    * per-document window — partitioned by doc, bounded by doc length.
    * Gram keys stay exact strings so the result is engine-exact and
    * collision-free; at 100 TB key the agg/join on `xxhash64(gram)` to cut
    * shuffle bytes ~8× if span-boundary exactness can tolerate a ~2⁻⁶⁴
    * per-pair collision rate. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String, n: Int,
                    minOccurrences: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = duplicatedGramStarts(df, idCol, textCol, n, minOccurrences)
    // gaps-and-islands: runs of consecutive duplicated gram positions merge
    // into one maximal span covering (run length + n - 1) tokens
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min("pos").as("span_start"),
        (count(lit(1)) + lit(n - 1).cast("long")).as("span_tokens"))
      .select(col(idCol), col("span_start"), col("span_tokens"))
  }

  /** (id, pos) of every word `n`-gram occurring ≥ `minOccurrences` times
    * corpus-wide; `pos` is the 1-based index of the gram's first token.
    * Shared kernel of [[repeatedSpans]] / [[removeRepeatedSpans]]. */
  private def duplicatedGramStarts(df: DataFrame, idCol: String,
      textCol: String, n: Int, minOccurrences: Long): DataFrame = {
    require(n >= 1 && minOccurrences >= 1L,
      s"repeated spans: need n >= 1 and minOccurrences >= 1; got n=$n minOccurrences=$minOccurrences")
    val upper = size(col("__toks")) - (n - 1)
    // (id, pos, gram): generated in the scan stage — no join, no window
    val grams = graft.core.CacheRegistry.persist(
      df.withColumn("__toks", tokens(col(textCol)))
        .select(col(idCol), posexplode(
          // sequence(1, 0) counts DOWN in Spark — guard short docs
          when(upper >= 1, transform(sequence(lit(1), upper),
            i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))))
        .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("gram")))
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= minOccurrences).select("gram")
    grams.join(dup, Seq("gram"), "left_semi").select(col(idCol), col("pos"))
  }

  /** Exact-substring dedup, removal step: cuts every token covered by a
    * corpus-repeated `n`-gram (the spans [[repeatedSpans]] reports) and
    * reassembles the surviving tokens in order. Returns the full input
    * cardinality as (id, clean_text, n_dropped): fully-boilerplate docs
    * come back with an empty `clean_text` (filter on `n_dropped` or
    * emptiness to drop them); untouched docs have `n_dropped = 0`.
    * Complements [[TextStats.removeCommonSegments]], which cuts whole
    * segments by corpus document-frequency — this cuts any exact repeat,
    * including within a single document.
    *
    * Scale shape: one hash-agg + semi-join finds duplicated gram starts
    * (see [[duplicatedGramStarts]]); starts collapse to one small array
    * per affected doc (`collect_set`, bounded by doc length); the splice
    * itself is a scan-stage higher-order `filter` over the token array —
    * the corpus text is never shuffled, only joined against the per-doc
    * start arrays (docs with no repeats see a null array and pass
    * through). */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int, minOccurrences: Long = 2L): DataFrame = {
    val starts = duplicatedGramStarts(df, idCol, textCol, n, minOccurrences)
      .groupBy(idCol).agg(collect_set(col("pos")).as("__starts"))
    val covered = (i: Column) => exists(col("__starts"),
      s => s <= i && i < s + n)
    df.join(starts, Seq(idCol), "left")
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__kept", when(col("__starts").isNull, col("__toks"))
        .otherwise(filter(col("__toks"), (_, i0) => !covered(i0 + 1))))
      .select(col(idCol), concat_ws(" ", col("__kept")).as("clean_text"),
        // null text → no token arrays: report the empty string untouched
        // rather than a null count
        coalesce(size(col("__toks")) - size(col("__kept")), lit(0))
          .cast("long").as("n_dropped"))
  }

  /** Cross-source content-overlap matrix: for every pair of sources
    * sharing at least one word `n`-gram, the distinct-shingle intersection
    * size, both set sizes, and the containment coefficient
    * `|A∩B| / min(|A|,|B|)` — the corpus-composition report that catches
    * one crawl source republishing another (mirrors, scrapers) before both
    * copies reach training. Containment, not Jaccard: a small source fully
    * contained in a large one is exactly the case to surface, and Jaccard
    * would bury it.
    *
    * Engine-exact: set sizes and intersections are integer counts; the
    * coefficient is one IEEE division at the end.
    *
    * Scale shape: (source, shingle) distinct → self-join keyed on the
    * shingle. Per-shingle fan-out is bounded by the SOURCE count (not the
    * document count) — a shingle row meets at most `n_sources²` pairs, so
    * the join never goes quadratic in documents. Corpus-stop-shingles
    * (boilerplate present in every source) still dominate the key
    * distribution; at 100 TB drop shingles above a df ceiling first (they
    * carry no discriminating signal) or estimate per-pair intersections
    * with sketches instead of exact counts.
    *
    * Guarded like [[Similarity.lshTopK]] guards its single-band form:
    * `exact = true` is a REQUIRED opt-in, because the distinct-shingle
    * self-join materializes every (source, shingle) row and is only
    * appropriate on bounded corpora (verification, audits, small-N
    * sources). The default (false) throws, pointing at the estimator a
    * 100 TB run should use instead — [[Sketches.sourceOverlapKmv]], whose
    * shuffle is ≤ k strings per source and whose output keeps the same
    * pair grain (est_jaccard/est_containment at stderr ≈ 1/√k). */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String, n: Int,
                    exact: Boolean = false): DataFrame = {
    require(exact,
      "sourceOverlap computes the EXACT cross-source containment matrix " +
        "(a distinct-shingle self-join over the full corpus). At scale use " +
        "Sketches.sourceOverlapKmv, or pass exact = true to opt in on a " +
        "bounded corpus.")
    // persisted: three consumers (sizes + both self-join sides) would
    // otherwise each re-run the shingle explode + distinct shuffle
    val sh = graft.core.CacheRegistry.persist(df
      .select(col(srcCol).as("src"), explode(array_distinct(shingles(col(textCol), n))).as("shingle"))
      .distinct())
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n_sh"))
    val inter = sh.toDF("src_a", "shingle")
      .join(sh.toDF("src_b", "shingle"), "shingle")
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.toDF("src_a", "n_a")), "src_a")
      .join(broadcast(sizes.toDF("src_b", "n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
        (col("n_common").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
          .as("containment"))
  }

  /** 64-bit SimHash on xxhash64 tokens — the codegen-friendly scale variant
    * (no md5 string churn; one 8-byte hash per token). One scan-stage pass
    * per document (org.apache.spark.sql.graft.SimHash64), zero shuffle. */
  def simHash64(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.TextFunctions.simHash64(col(textCol)).as("simhash64"))

  /** LSH dedup RECALL contract: the measured answer to "what does the
    * banded plan actually miss", as a driver-checkable row — the dedup
    * twin of the ANN recall grid. The exact n-gram Jaccard pairs at
    * `minJaccard` are the ground truth; the MinHash+LSH verified pairs
    * are the scale path (a verified pair is always a true pair, so LSH
    * ⊆ exact and recall = found/exact); both sides are md5-deterministic,
    * so an external engine replays the SAME ratio — the banded plan's
    * quality is a pinned number, not a probability claim in a scaladoc.
    * Output: one row (n_exact_pairs, n_lsh_found, recall 6 dp; recall
    * null when no exact pair exists).
    *
    * Scale shape: the CONTRACT runs the exact Σdf² generator as judge —
    * a probe you run on a SAMPLE at corpus scale (same pricing as every
    * other contract's exact side); the LSH side is the production
    * banded join. The intersection is a join on the canonical
    * (id_a < id_b) pair key. */
  def lshRecallContract(df: DataFrame, idCol: String, textCol: String,
                        n: Int, bands: Int, rowsPerBand: Int,
                        minJaccard: Double,
                        exactGen: Option[DataFrame] = None,
                        lshGen: Option[DataFrame] = None): DataFrame = {
    // exactGen/lshGen: callers holding maintained pair indexes (the same
    // frames this contract would build) pass them in instead of paying
    // both signature passes again — the pairGen convention of
    // [[dropNearDuplicates]], applied to both sides of the contract
    val exact = graft.core.CacheRegistry.persist(
      exactGen.getOrElse(ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
        .select(col("id_a"), col("id_b")))
    val lsh = lshGen.getOrElse(minHashLshPairs(df, idCol, textCol, n, bands,
      rowsPerBand, minJaccard)).select(col("id_a"), col("id_b"))
    val found = exact.join(lsh, Seq("id_a", "id_b"))
    exact.agg(count(lit(1)).as("n_exact_pairs"))
      .crossJoin(found.agg(count(lit(1)).as("n_lsh_found")))
      .select(col("n_exact_pairs"), col("n_lsh_found"),
        when(col("n_exact_pairs") > 0,
          round(col("n_lsh_found").cast("double") / col("n_exact_pairs"), 6))
          .as("recall"))
  }

  /** MinHash ESTIMATOR-error contract (the guarantee itself as rows — the
    * [[lshRecallContract]] family): for every banded candidate pair whose
    * exact shingle Jaccard is ≥ `minJaccard`, the signature-agreement
    * estimate `est = matches/h` must sit within
    * `5·√(J(1−J)/h) + 1/h` of the exact J — the per-permutation Bernoulli
    * 5σ band plus one discretization quantum. A salt misalignment, a slot
    * off-by-one, or a non-min reduction makes `est` ≈ collision-chance
    * noise and flips `within` on every genuinely-similar pair; the oracle
    * recomputes both sides from the same md5 permutations. `minJaccard`
    * must be ≥ 0.15: below that the banded-candidate conditioning biases
    * `est` upward past the unconditional bound (a pair that got lucky in
    * one band IS the selection), so the theorem being pinned would not
    * hold. Output: (id_a, id_b, n_matches, est, jaccard, bound, within).
    *
    * Scale shape: [[minHashLshPairs]]' banded candidate join plus ONE
    * signature-table join per side (h small integers per doc) — the
    * contract adds no pass over the corpus text. */
  def minHashEstimateContract(df: DataFrame, idCol: String, textCol: String,
                              n: Int, bands: Int, rowsPerBand: Int,
                              minJaccard: Double): DataFrame = {
    require(minJaccard >= 0.15,
      s"minHashEstimateContract: need minJaccard >= 0.15 (candidate-" +
        s"conditioning bias breaks the bound below), got $minJaccard")
    val h = bands * rowsPerBand
    val sigs = graft.core.CacheRegistry.persist(
      minHashSignatures(df, idCol, textCol, n, h))
    val bandCols = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", slots: _*)).as("bh"))
    }
    val banded = sigs.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val candidates = banded.toDF("id_a", "band", "bh")
      .join(banded.toDF("id_b", "band", "bh"), Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val arrays = graft.core.CacheRegistry.persist(
      shingleArrays(df, idCol, textCol, n))
    val verified = jaccardFromArrays(candidates, arrays, minJaccard)
    val aSigs = sigs.toDF(("id_a" +: (0 until h).map(i => s"a_$i")): _*)
    val bSigs = sigs.toDF(("id_b" +: (0 until h).map(i => s"b_$i")): _*)
    val matches = (0 until h).map(i =>
      when(col(s"a_$i") === col(s"b_$i"), 1L).otherwise(0L)).reduce(_ + _)
    val est = col("n_matches").cast("double") / lit(h.toDouble)
    val bound = lit(5.0) *
      sqrt(col("jaccard") * (lit(1.0) - col("jaccard")) / lit(h.toDouble)) +
      lit(1.0) / lit(h.toDouble)
    verified.join(aSigs, Seq("id_a")).join(bSigs, Seq("id_b"))
      .withColumn("n_matches", matches)
      .select(col("id_a"), col("id_b"), col("n_matches"), est.as("est"),
        col("jaccard"), bound.as("bound"),
        (abs(est - col("jaccard")) <= bound).as("within"))
  }

  /** Per-source dedup-rate mart: for every source, how much of its
    * contribution the near-dup pass removes — n_docs, n_survivors
    * (cluster representatives), and dup_rate. The crawl-health number
    * that catches a mirrored or re-crawled source BEFORE it silently
    * dominates training epochs: a source whose dup_rate jumps is
    * re-serving content the corpus already has (cross-source duplicates
    * count against the source of the DROPPED copy, which is exactly the
    * attribution an ingest gate needs). Output: (source, n_docs,
    * n_survivors, dup_rate 6 dp).
    *
    * Scale shape: the pair generation/clustering is whatever `pairGen`
    * supplies (banded LSH at corpus scale — the composition is agnostic,
    * [[dropNearDuplicates]]' contract); the mart itself adds one
    * source-keyed hash-agg over the survivor-flagged id table. */
  def sourceDedupRates(df: DataFrame, idCol: String, textCol: String,
                       srcCol: String, n: Int, minJaccard: Double,
                       pairGen: Option[DataFrame] = None): DataFrame = {
    val pairs = pairGen.getOrElse(
      ngramJaccardPairs(df, idCol, textCol, n, minJaccard))
    val assign = clusters(pairs, "id_a", "id_b", df.select(idCol), idCol)
    df.select(col(idCol), col(srcCol))
      .join(assign, Seq(idCol))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col(idCol) === col("cluster_id"), 1)).as("n_survivors"))
      .select(col(srcCol), col("n_docs"), col("n_survivors"),
        round(lit(1.0) - col("n_survivors").cast("double") / col("n_docs"), 6)
          .as("dup_rate"))
  }

  /** Per-field survivorship rules for [[goldenRecord]]. Every rule is
    * deterministic under ties and partitioning (struct-ordered argmax,
    * not `max_by`'s arbitrary tie), so the golden record is
    * engine-replayable:
    *  - [[Survivorship.Longest]] — longest string; ties → the
    *    lexicographically greatest (one total order, no RNG);
    *  - [[Survivorship.MaxNum]] / [[Survivorship.MinNum]] — numeric
    *    extreme (freshest timestamp, highest balance);
    *  - [[Survivorship.FromPrimary]] — the value carried by the
    *    cluster's primary row (smallest id): "trust the master record"
    *    for fields where mixing sources is wrong. */
  sealed trait Survivorship { def field: String }
  object Survivorship {
    final case class Longest(field: String) extends Survivorship
    final case class MaxNum(field: String) extends Survivorship
    final case class MinNum(field: String) extends Survivorship
    final case class FromPrimary(field: String) extends Survivorship
  }

  /** Golden-record construction (MDM survivorship): collapse each
    * duplicate cluster to ONE merged row, field by field — the step
    * after entity resolution ([[graft.ops.Joins.fuzzyPairsCollapsed]] →
    * [[clusters]]) that [[clusterBestRep]] doesn't do: best-rep PICKS a
    * row, survivorship MERGES the best value of each field across the
    * cluster (the longest name may sit on one row, the freshest balance
    * on another). Output: (cluster, survivor_id = min id, n_members,
    * one column per rule named after its field).
    *
    * Scale shape: ONE hash-agg on the cluster key — every rule compiles
    * to a min/max over (orderable struct) with map-side partials; no
    * window, no self-join, nothing scales with cluster size but the
    * scan. Nulls lose to real values under `Longest`/`MaxNum`/`MinNum`
    * (aggregate null semantics); `FromPrimary` takes the primary row's
    * value verbatim, null included — that IS "trust the master". */
  def goldenRecord(df: DataFrame, idCol: String, clusterCol: String,
                   rules: Seq[Survivorship]): DataFrame = {
    require(rules.nonEmpty, "goldenRecord: provide at least one rule")
    import Survivorship._
    val aggs =
      min(col(idCol)).as("survivor_id") +:
      count(lit(1)).as("n_members") +:
      rules.map {
        case Longest(f) =>
          max(struct(length(col(f)).as("l"), col(f).as("v")))
            .getField("v").as(f)
        case MaxNum(f) => max(col(f)).as(f)
        case MinNum(f) => min(col(f)).as(f)
        case FromPrimary(f) =>
          min(struct(col(idCol).as("i"), col(f).as("v")))
            .getField("v").as(f)
      }
    df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Deduplication SAVINGS report — the before/after budget line a
    * curation run answers to: per source, documents and whitespace
    * tokens before the near-dup drop vs after, with the drop rates as
    * exact integer ratios. Token savings is the number that matters (a
    * thousand dropped boilerplate pages ≠ a thousand dropped books);
    * q224's dup RATES say how duplicated a source is, this says what
    * removing them actually buys. A source can lose everything (its
    * docs' cluster representatives may all live in OTHER sources), and
    * NULL sources form their own cohort — both fall out of the
    * flag-then-aggregate shape, which never joins on the source key.
    * Output: (source, docs_before, docs_after, tokens_before,
    * tokens_after, doc_drop_rate, token_drop_rate), 6 dp.
    *
    * Scale shape: ONE id-keyed left join marks survivors (ids are
    * non-null by contract), then ONE source hash-agg carries both the
    * before and after sums — the corpus is scanned once beyond the
    * pair machinery that produced `kept`. */
  def dedupSavings(all: DataFrame, kept: DataFrame, idCol: String,
                   textCol: String, srcCol: String): DataFrame = {
    val tok = size(split(col(textCol), " ")).cast("long")
    val k = kept.select(col(idCol)).withColumn("__k", lit(1L))
    all.join(k, Seq(idCol), "left")
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("docs_before"),
        coalesce(sum(col("__k")), lit(0L)).as("docs_after"),
        sum(tok).as("tokens_before"),
        coalesce(sum(when(col("__k").isNotNull, tok).otherwise(lit(0L))),
          lit(0L)).as("tokens_after"))
      .select(col("source"), col("docs_before"), col("docs_after"),
        col("tokens_before"), col("tokens_after"),
        round((col("docs_before") - col("docs_after")).cast("double") /
          col("docs_before").cast("double"), 6).as("doc_drop_rate"),
        round((col("tokens_before") - col("tokens_after")).cast("double") /
          col("tokens_before").cast("double"), 6).as("token_drop_rate"))
  }

  /** Similarity-threshold sweep — "which Jaccard cut should this corpus
    * dedup at": for every candidate threshold, how many verified pairs
    * survive and how many distinct documents they touch, from ONE pair
    * table (generate candidates once at the LOWEST threshold, then the
    * grid is a broadcast re-filter — never re-shingle per threshold).
    * The pair count falls smoothly with the cut while docs_involved
    * shows the affected-population cliff; the knee picks the threshold
    * the q35/q53 pipelines then run at. Output per threshold:
    * (threshold, pairs_kept, docs_involved), zero-filled.
    *
    * Scale shape: the pair table is persisted once; the sweep is a
    * ≤|grid| broadcast fan-out over it, one hash-agg per metric (the
    * distinct is per (threshold, doc) — map-side partials). Pair
    * generation itself inherits the caller's generator contract
    * ([[ngramJaccardPairs]] exact, or banded [[minHashLshPairs]]). */
  def thresholdSweep(pairs: DataFrame, aCol: String, bCol: String,
                     simCol: String, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep: provide thresholds")
    val spark = pairs.sparkSession
    import spark.implicits._
    val grid = thresholds.toDF("threshold")
    val p = graft.core.CacheRegistry.persist(pairs.select(
      col(aCol).as("__a"), col(bCol).as("__b"),
      col(simCol).cast("double").as("__s")))
    val keyed = p.crossJoin(broadcast(grid))
      .where(col("__s") >= col("threshold"))
    val pairCounts = keyed.groupBy("threshold")
      .agg(count(lit(1)).as("pairs_kept"))
    val docCounts = keyed.select(col("threshold"), col("__a").as("__d"))
      .unionAll(keyed.select(col("threshold"), col("__b").as("__d")))
      .groupBy("threshold")
      .agg(count_distinct(col("__d")).as("docs_involved"))
    grid.join(pairCounts, Seq("threshold"), "left")
      .join(docCounts, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("pairs_kept"), lit(0L)).as("pairs_kept"),
        coalesce(col("docs_involved"), lit(0L)).as("docs_involved"))
  }

  /** Corpus snapshot diff — "what changed between corpus v1 and v2", the
    * release-notes mart every dataset version bump needs before anyone
    * retrains on it. Rows key by id, compare by content hash
    * (md5 of `textCol`, NULL text hashing like empty):
    * `added` (id only in new), `removed` (id only in old), `changed`
    * (same id, different hash), `unchanged`. `n_content_rekeyed` audits
    * id-churn masquerading as data-churn: added docs whose exact content
    * already existed in old (re-keyed in — the version bump renamed, it
    * did not add), and removed docs whose content survives in new under
    * another id (re-keyed out). Statuses with zero rows are omitted.
    * Output: (status, n_docs, n_content_rekeyed).
    *
    * Scale shape: each side reduces to (id, hash) in its scan; one
    * id-keyed full-outer hash join, two hash-keyed left joins against
    * the distinct-hash sides for the rekey flags, one 4-row hash-agg.
    * Content never moves — only 16-byte hashes shuffle. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    def hashed(df: DataFrame) = df.select(col(idCol).as("__id"),
      md5(coalesce(col(textCol), lit(""))).as("__h"))
    val o = graft.core.CacheRegistry.persist(hashed(oldDf))
    val n = graft.core.CacheRegistry.persist(hashed(newDf))
    val j = o.toDF("__id", "__ho")
      .join(n.toDF("__id", "__hn"), Seq("__id"), "full_outer")
    val status = when(col("__ho").isNull, "added")
      .when(col("__hn").isNull, "removed")
      .when(col("__ho") === col("__hn"), "unchanged")
      .otherwise("changed")
    j.select(status.as("status"), col("__ho"), col("__hn"))
      .join(o.select(col("__h").as("__hn")).distinct()
        .withColumn("__hn_in_old", lit(true)), Seq("__hn"), "left")
      .join(n.select(col("__h").as("__ho")).distinct()
        .withColumn("__ho_in_new", lit(true)), Seq("__ho"), "left")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(
          when(col("status") === "added" && col("__hn_in_old"), 1L)
            .when(col("status") === "removed" && col("__ho_in_new"), 1L)
            .otherwise(0L)), lit(0L)).as("n_content_rekeyed"))
  }
}
