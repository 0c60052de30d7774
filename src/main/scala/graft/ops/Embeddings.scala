package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage transforms: scalar int8 quantization (and its
  * inverse) — the 4× storage/bandwidth cut a 100 TB embedding corpus
  * takes before ANN indexing. Pure per-row projections in the scan
  * stage: no shuffle, rides whole-stage codegen, reproducible on any
  * engine (IEEE divide + half-away-from-zero rounding only).
  */
object Embeddings {

  /** Per-vector absolute max — the quantization range. */
  private def absMax(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions via
    * a DETERMINISTIC ±1 sign matrix (Achlioptas 2003's database-friendly
    * projection): `y_j = (Σ_i s_ji·x_i) / √outDim`, signs derived from
    * md5(seed|j|i) so every run, engine, and backfill builds the SAME
    * matrix — no RNG state to ship. The d/outDim× cheaper vectors
    * approximately preserve pairwise distances (distortion ~1/√outDim),
    * the standard pre-ANN or pre-clustering dimension cut when
    * [[truncateRenorm]]'s matryoshka prefix isn't available (arbitrary
    * embeddings have no trained prefix structure). Elements 6 dp.
    *
    * Scale shape: the matrix rides in the PLAN as `outDim` literal
    * float rows; each output element is one codegen'd
    * [[graft.functions.VectorFunctions.dotF]] kernel over the scan —
    * zero shuffle, the corpus is read once. */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
                       inDim: Int, outDim: Int,
                       seed: String = "jl"): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"randomProjection: need 1 <= outDim <= inDim, got $inDim -> $outDim")
    val scale = math.sqrt(outDim.toDouble)
    val rows = projectionSigns(inDim, outDim, seed)
    val projCols = rows.map { row =>
      round(graft.functions.VectorFunctions.dotF(
        col(vecCol), typedLit(row)) / scale, 6)
    }
    emb.select(col(idCol), array(projCols: _*).as("proj"))
  }

  /** The deterministic ±1 rows of [[randomProjection]]'s matrix —
    * exposed so an external engine (or the oracle) can reuse the SAME
    * literal matrix instead of re-deriving md5 signs. */
  def projectionSigns(inDim: Int, outDim: Int,
                      seed: String = "jl"): Seq[Seq[Float]] = {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (0 until outDim).map(j => (0 until inDim).map(i =>
      if (Integer.parseInt(md5hex(s"$seed|$j|$i").substring(0, 1), 16) < 8)
        1f else -1f))
  }

  /** Symmetric scalar int8 quantization: per-vector scale = max|x|/127,
    * elements mapped to round(x/scale) clamped into [-127, 127] (so the
    * max-magnitude element hits ±127 exactly). All-zero vectors get
    * scale 0 and all-zero codes. Output: id, scale, `qvec: array<int>`
    * (int-typed for engine portability; pack to bytes at the storage
    * boundary). */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = absMax(col(vecCol)) / lit(127.0)
    emb.select(
      col(idCol),
      scale.as("scale"),
      when(scale === 0.0,
        transform(col(vecCol), _ => lit(0)))
        .otherwise(transform(col(vecCol), x =>
          greatest(lit(-127), least(lit(127),
            round(x.cast("double") / scale).cast("int")))))
        .as("qvec"))
  }

  /** Inverse of [[quantizeInt8]]: `qvec[i] * scale` (float). Lossy by
    * design; [[quantizeInt8]]'s scale choice bounds per-element error by
    * scale/2 = max|x|/254. */
  def dequantize(df: DataFrame, qvecCol: String, scaleCol: String): Column =
    transform(col(qvecCol), q => (q.cast("double") * col(scaleCol)).cast("float"))

  /** Feature-hashing ("hashing trick") text vectorizer: each token lands
    * in dimension `md5(token) mod d` with a ±1 sign drawn from an
    * independent md5 nibble, and the document's vector is the signed
    * count per dimension — a model-free embedding that lets every
    * vector operator in this library ([[Similarity]] ANN, k-means,
    * [[quantizeInt8]]) run on corpora that have no trained encoder.
    * Signed hashing keeps collisions mean-zero (Weinberger et al. 2009).
    * md5, not xxhash64, so the vectors are engine-reproducible; counts
    * are integers, so results are exact.
    *
    * Output is the SPARSE exploded layout (id, dim, val), val ≠ 0 —
    * the shape that joins/aggregates without materializing d-wide
    * arrays; densify at the consumer if a fixed-width vector is needed.
    *
    * Scale shape: the d-long accumulator is computed per row by a native
    * one-pass kernel (org.apache.spark.sql.graft.HashEmbed — the
    * [[graft.functions.TextFunctions.simHash64]] pattern), then
    * posexplode + non-zero filter, ALL in the scan stage: zero shuffle,
    * zero token movement. [[hashEmbedAgg]] is the explode+groupBy
    * formulation kept as the kernel's equivalence oracle. */
  def hashEmbed(df: DataFrame, idCol: String, textCol: String, d: Int): DataFrame = {
    require(d >= 2, s"hashEmbed: need d >= 2 dims, got $d")
    df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.hashEmbedVec(col(textCol), d))
          .as(Seq("dim", "val")))
      .where(col("val") =!= 0)
  }

  /** Per-label mean embedding (class prototypes): the nearest-class-mean
    * classifier's model, label-balance QA, and the seed for supervised
    * cluster analysis — one row per (label, dim) with the member count
    * and 6 dp-rounded element mean.
    *
    * Scale shape: ONE hash-agg keyed on the label using the native
    * [[graft.functions.VectorFunctions.vectorSumF]] array aggregate, so
    * partial per-label sums combine map-side and the shuffle carries
    * (labels × dim) doubles — never the N·d element rows a
    * posexplode-first formulation would move (same design as
    * [[Similarity.kmeansStep]]). */
  def labelCentroids(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.vectorSumF
    // n_members counts NON-NULL vectors only — vectorSumF skipped null
    // rows, and dividing by a row count that included them would deflate
    // every mean (and diverge from the oracle's per-dim avg)
    emb.groupBy(col(labelCol))
      .agg(count(col(vecCol)).as("n_members"), vectorSumF(col(vecCol)).as("sums"))
      .select(col(labelCol), col("n_members"),
        posexplode(transform(col("sums"), x => x / col("n_members")))
          .as(Seq("dim", "mean_val")))
      .withColumn("mean_val", round(col("mean_val"), 6))
  }

  /** Per-group embedding centroid drift: for every value of `labelCol`
    * (a source, a label, an ingest batch), the cosine between the group's
    * centroid and the GLOBAL centroid — the one-number-per-group answer
    * to "which slice of the corpus sits somewhere else in embedding
    * space" (a new crawl with shifted embeddings, a mislabeled source, an
    * encoder version change). Low drift_cosine = the group points away
    * from the corpus mean direction.
    *
    * Engine-exact: both centroids are [[labelCentroids]]' 6 dp-rounded
    * per-dim means, so the cosine's operands are bit-identical anywhere;
    * the d-term dot/norm sums are rounded at 6 dp. A zero-norm centroid
    * (all-zero means) reports 0, not NULL. Scale shape: two
    * [[labelCentroids]] passes (one global) — native vector-sum buffers,
    * no element explode of the corpus; the join keys the ≤ |groups|·d
    * exploded mean rows against a broadcast d-row global table. */
  def centroidDrift(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val grp = labelCentroids(emb, labelCol, vecCol)
    val glob = labelCentroids(emb.select(lit(1).as("__g"), col(vecCol)), "__g", vecCol)
      .select(col("dim"), col("mean_val").as("__gm"))
    grp.join(broadcast(glob), "dim")
      .groupBy(col(labelCol), col("n_members"))
      .agg(
        sum(col("mean_val") * col("__gm")).as("__dot"),
        sum(col("mean_val") * col("mean_val")).as("__n1"),
        sum(col("__gm") * col("__gm")).as("__n2"))
      .select(col(labelCol), col("n_members"),
        when(col("__n1") === 0.0 || col("__n2") === 0.0, lit(0.0))
          .otherwise(round(col("__dot") / (sqrt(col("__n1")) * sqrt(col("__n2"))), 6))
          .as("drift_cosine"))
  }

  /** Mean pairwise cosine WITHIN each group — the redundancy/diversity
    * number for a training batch, a retrieval result list, or a source
    * slice (1 = every vector points the same way, 0 = mutually
    * orthogonal). Computed WITHOUT generating pairs via the norm-of-sum
    * identity over unit vectors: |Σu|² = n + 2·Σᵢ<ⱼ uᵢ·uⱼ, so
    * mean cosine = (|Σu|² − n) / (n(n−1)) — one native vector-sum pass,
    * no O(n²) join at any group size.
    *
    * Engine-exact: each vector is normalized in double off its exact
    * float elements, re-rounded to storage-precision FLOAT (the agg's
    * input type), per-dim sums rounded at 6 dp before the square — the
    * same float-storage contract as [[dimStats]]. Zero-norm / null
    * vectors are excluded from n; groups with n < 2 report NULL (no
    * pairs exist). Scale shape: one hash-agg on the group key over the
    * vector-sum buffers; nothing ever explodes or self-joins. */
  def intraGroupDiversity(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.vectorSumF
    val v = col(vecCol)
    val nrm = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val unit = transform(v, x => (x.cast("double") / col("__nrm")).cast("float"))
    emb.select(col(labelCol), v, nrm.as("__nrm"))
      .where(col("__nrm") > 0.0)
      .select(col(labelCol), unit.as("__u"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_members"), vectorSumF(col("__u")).as("__s"))
      .select(col(labelCol), col("n_members"),
        when(col("n_members") < 2, lit(null).cast("double"))
          .otherwise(round(
            (aggregate(transform(col("__s"), s => round(s, 6)), lit(0.0),
              (acc, s) => acc + s * s) - col("n_members")) /
              (col("n_members") * (col("n_members") - lit(1.0))), 6))
          .as("mean_pairwise_cosine"))
  }

  /** Per-dimension corpus statistics of an embedding column: mean and
    * population standard deviation per dim, the profile behind
    * [[standardize]] (and the drift check between two embedding builds).
    * Output: (dim, mean_val, std_val), 6 dp.
    *
    * Scale shape: ONE global aggregate over two native double-accumulating
    * vector-sum buffers (Σv and Σv² — see
    * [[org.apache.spark.sql.graft.FloatVectorSumAgg]]); no per-element
    * explode, the vectors never shuffle. Squares are computed in FLOAT
    * (the storage precision, matching engines that square REALs natively)
    * and accumulated in DOUBLE; variance uses the Σv²/n − mean² identity
    * clamped at 0 against fp cancellation. Null vectors are skipped on
    * both the sums and the divisor. */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame = {
    import graft.functions.VectorFunctions.vectorSumF
    emb.agg(
        vectorSumF(col(vecCol)).as("__s"),
        vectorSumF(zip_with(col(vecCol), col(vecCol), (a, b) => a * b)).as("__s2"),
        count(col(vecCol)).as("__n"))
      .select(posexplode(zip_with(col("__s"), col("__s2"), (s, s2) => {
        val m = s / col("__n")
        struct(m.as("m"),
          sqrt(greatest(s2 / col("__n") - m * m, lit(0.0))).as("sd"))
      })).as(Seq("dim", "__st")))
      .select(col("dim"),
        round(col("__st.m"), 6).as("mean_val"),
        round(col("__st.sd"), 6).as("std_val"))
  }

  /** Z-score the embedding column against [[dimStats]]: per dim,
    * `(x − mean) / std` (a zero-variance dim maps to 0 instead of ±inf) —
    * the standardization pass run before distance-based ops (k-means,
    * IVF, MAD-style outlier flags) so no high-variance dim dominates.
    *
    * The d (mean, std) pairs are pulled to the driver — bounded exactly
    * like the k-means centroid pull-down — rounded to 6 dp, and pushed
    * back as LITERAL arrays, so the per-row rescale is a codegen'd
    * scan-stage transform with no join and no second shuffle. Stats and
    * data deliberately come from the same frame; pass a precomputed
    * frame for train-stats-on-eval application via `statsFrom`. */
  def standardize(emb: DataFrame, idCol: String, vecCol: String,
                  statsFrom: Option[DataFrame] = None): DataFrame = {
    val stats = statsFrom.getOrElse(dimStats(emb, vecCol))
      .select(col("dim"), col("mean_val"), col("std_val"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(stats.nonEmpty, "standardize: no non-null vectors to profile")
    val means = array(stats.map(s => lit(s._2)): _*)
    val stds = array(stats.map(s => lit(s._3)): _*)
    emb.select(col(idCol),
      transform(col(vecCol), (x, i) =>
        when(element_at(stds, i + 1) =!= 0.0,
          round((x.cast("double") - element_at(means, i + 1)) /
            element_at(stds, i + 1), 6))
          .otherwise(lit(0.0))).as("zvec"))
  }

  /** Matryoshka truncation: keep the first `dim` dimensions and
    * re-normalize to unit L2 — the MRL serving trick (Kusupati et al.
    * 2022) that trades a controlled recall loss for a `d/dim`× cut in
    * ANN memory and dot-product cost, usable by every consumer in
    * [[Similarity]] as-is. Elements are computed in double (exact
    * float→double widening), divided by the truncated norm, and rounded
    * to 6 dp so any engine reproduces them bit-for-bit; zero-norm
    * truncations (including all-zero vectors) come back all-zero rather
    * than NaN. Output: (id, `tvec: array<double>`).
    *
    * Scale shape: pure per-row projection in the scan stage — zero
    * shuffle, rides whole-stage codegen. */
  def truncateRenorm(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"truncateRenorm: need dim > 0, got $dim")
    val sliced = transform(slice(col(vecCol), 1, dim), x => x.cast("double"))
    val norm = sqrt(aggregate(sliced, lit(0.0), (acc, x) => acc + x * x))
    emb.select(col(idCol),
      when(norm === 0.0, transform(sliced, _ => lit(0.0)))
        .otherwise(transform(sliced, x => round(x / norm, 6)))
        .as("tvec"))
  }

  /** Per-label embedding outliers: each vector's cosine to its own label's
    * centroid, flagging rows below `minCos` — the label-QA pass that
    * surfaces mislabeled or corrupt embeddings before they poison
    * centroid-based ops ([[labelCentroids]], [[Similarity.ivfTopK]]).
    * Output: (id, label, cos_to_centroid 6 dp, is_outlier); a zero-norm
    * vector (or all-zero centroid) gets a null cosine and is never
    * flagged.
    *
    * Scale shape: centroids come from ONE label-keyed hash-agg over the
    * native [[graft.functions.VectorFunctions.vectorSumF]] buffer (the
    * [[labelCentroids]] shuffle bound), are rounded to 6 dp and FLOAT
    * round-tripped (the [[Similarity.kmeansFit]] reproducibility device),
    * then BROADCAST back — the per-row cosine is one codegen'd dot in the
    * scan stage, no second shuffle of the embedding table. */
  def labelOutliers(emb: DataFrame, idCol: String, labelCol: String,
                    vecCol: String, minCos: Double): DataFrame = {
    import graft.functions.VectorFunctions.{dotF, normF, vectorSumF}
    // divisor counts NON-NULL vectors only — vectorSumF skipped null rows,
    // and the oracle's per-dim avg sees no rows for them either; a label
    // with NO non-null vectors has no centroid and drops from the output
    val cents = emb.groupBy(col(labelCol))
      .agg(vectorSumF(col(vecCol)).as("__sums"), count(col(vecCol)).as("__n"))
      .where(col("__n") > 0)
      .select(col(labelCol),
        transform(col("__sums"), x => round(x / col("__n"), 6).cast("float"))
          .as("__cvec"))
    val denom = normF(col(vecCol)) * normF(col("__cvec"))
    emb.join(broadcast(cents), Seq(labelCol))
      .select(col(idCol), col(labelCol),
        when(denom =!= 0.0,
          round(dotF(col(vecCol), col("__cvec")) / denom, 6))
          .as("cos_to_centroid"))
      .withColumn("is_outlier",
        coalesce(col("cos_to_centroid") < minCos, lit(false)))
  }

  /** Semantic decontamination flags: for every corpus embedding, the
    * maximum cosine to ANY benchmark/eval-set embedding and whether it
    * clears `minCos` — the embedding-space twin of
    * [[graft.ops.Dedup.contaminationFlags]], catching paraphrased or
    * translated eval leakage the n-gram check can't see. Returns
    * (id, max_cos 6 dp, contaminated) for every corpus row with a
    * non-null vector.
    *
    * Scale shape: the bench side is small by nature (eval suites), so it
    * BROADCASTS and the N×|bench| cosine grid is generated map-side in the
    * scan stage (codegen'd [[graft.functions.VectorFunctions.dotF]]); the
    * per-row max is a hash-agg whose map-side partial collapses the grid
    * back to one row per corpus id before anything shuffles. */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            minCos: Double): DataFrame = {
    import graft.functions.VectorFunctions.{dotF, normF}
    val b = broadcast(bench.where(col(vecCol).isNotNull)
      .select(col(vecCol).as("__bvec"), normF(col(vecCol)).as("__bnorm")))
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol), normF(col(vecCol)).as("__norm"))
      .crossJoin(b)
      .select(col(idCol),
        round(dotF(col(vecCol), col("__bvec")) / (col("__norm") * col("__bnorm")), 6)
          .as("__cos"))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= minCos)
  }

  /** Dominant principal direction of the embedding cloud (uncentered PCA)
    * by matrix-free power iteration: w ← normalize(Xᵀ(Xw)), starting from
    * the constant unit vector `1/√d`. One row per dimension:
    * (dim, loading, eigenvalue), loadings 6 dp-rounded, eigenvalue = the
    * Rayleigh estimate ‖Xᵀ(Xw)‖ of the final step. The anisotropy probe a
    * pipeline runs before ANN indexing (a dominant direction means
    * [[Similarity.lshNearDupPairs]]'s random signs and IVF cells are
    * fighting correlated coordinates) — and the whitening vector for
    * removing it.
    *
    * Scale shape: each iteration is ONE scan — the per-row projection
    * `s = v·w` is an unrolled fixed-order codegen sum against the literal
    * w, and `Σ s·v` is the native
    * [[graft.functions.VectorFunctions.vectorWeightedSumF]] aggregate, so
    * a pass moves exactly one d-long buffer per partition and collects
    * O(d) to the driver (the [[Similarity.kmeansFit]] pattern). Iterates
    * are 6 dp-rounded at each collect so results are engine-reproducible;
    * convergence is geometric in λ₁/λ₂ — a handful of iterations
    * suffices for the diagnostic. Deterministic by construction (fixed
    * start, no randomness); if the cloud is EXACTLY orthogonal to the
    * start vector the iteration returns the zero vector rather than
    * diverging. */
  def topPrincipalComponent(emb: DataFrame, vecCol: String,
                            d: Int, iters: Int): DataFrame = {
    require(d >= 1 && iters >= 1,
      s"topPrincipalComponent: need d >= 1, iters >= 1; got d=$d iters=$iters")
    import graft.functions.VectorFunctions.vectorWeightedSumF
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // s = v·w as an unrolled index-order double sum (codegen'd built-ins,
    // bit-identical to a sequential dot in any engine)
    def proj(w: Array[Double]): Column =
      (0 until d).map(i =>
        element_at(col(vecCol), i + 1).cast("double") * lit(w(i)))
        .reduce(_ + _)
    var w = Array.fill(d)(round6(1.0 / math.sqrt(d)))
    for (_ <- 1 until iters) {
      val row = emb.agg(vectorWeightedSumF(col(vecCol), proj(w)).as("t")).head()
      // an empty table (or all-null vectors) aggregates to NULL: fall back
      // to the zero vector so iters >= 2 degrades exactly like iters == 1
      // (the final distributed pass then emits no rows)
      val t = if (row.isNullAt(0)) Array.fill(d)(0.0)
              else row.getSeq[Double](0).toArray
      val norm = math.sqrt(t.map(x => x * x).sum)
      w = if (norm == 0.0) t else t.map(x => round6(x / norm))
    }
    // final iteration stays distributed: one aggregated row → (dim, loading)
    emb.agg(vectorWeightedSumF(col(vecCol), proj(w)).as("t"))
      .withColumn("__norm",
        sqrt(aggregate(col("t"), lit(0.0), (acc, x) => acc + x * x)))
      .select(posexplode(col("t")).as(Seq("dim", "__tv")), col("__norm"))
      .select(col("dim"),
        round(when(col("__norm") === 0.0, lit(0.0))
          .otherwise(col("__tv") / col("__norm")), 6).as("loading"),
        round(col("__norm"), 6).as("eigenvalue"))
  }

  // ---- product quantization (Jégou et al. 2011, TPAMI 33(1)) ----

  /** Subvector `j` (0-based) of a `dim`-dim vector split into `m`
    * contiguous subspaces of `dim / m` elements each. */
  private[ops] def subVec(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Nearest sub-codebook entry by squared L2 distance, as a scan-stage
    * expression against the LITERAL codebook: the ranking key is the
    * reduced distance `round(|c|² − 2·x·c, 6)` (dropping the |x|² term
    * common to every candidate), ties to the lowest code. `|c|²` is
    * computed driver-side with the same left-to-right double accumulation
    * as [[graft.functions.VectorFunctions.dotF]], so the key — and
    * therefore the code — is engine-exact. */
  private[ops] def nearestCode(sub: Column, book: IndexedSeq[Array[Float]]): Column = {
    import graft.functions.VectorFunctions.dotF
    val cents = typedLit(book.map(_.toSeq))
    val cnorm2 = typedLit(book.map(_.foldLeft(0.0)((s, f) => s + f.toDouble * f.toDouble)))
    val dists = transform(sequence(lit(0), lit(book.size - 1)), i =>
      round(element_at(cnorm2, i + 1)
        - lit(2.0) * dotF(sub, element_at(cents, i + 1)), 6))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** A (subspace, code, cvec) codebook frame collected to driver arrays,
    * code-ordered per subspace — m·k·(dim/m) floats, the driver-resident
    * contract every PQ implementation uses. */
  private[ops] def collectBooks(codebook: DataFrame, m: Int): Array[IndexedSeq[Array[Float]]] = {
    val rows = codebook.select(col("subspace"), col("code"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, "PQ codebook is empty")
    val bySub = rows.groupBy(_._1)
    require(bySub.keySet == (0 until m).toSet,
      s"PQ codebook must cover subspaces 0..${m - 1}; has ${bySub.keySet.toSeq.sorted}")
    Array.tabulate(m)(j => bySub(j).sortBy(_._2).map(_._3).toIndexedSeq)
  }

  /** Product-quantization codebook training: split each `dim`-dim vector
    * into `m` contiguous subvectors and run Lloyd's k-means independently
    * in every subspace — k^m composite centroids from m·k stored ones,
    * the codebook family behind IVF-PQ ANN indexes (Jégou et al. 2011).
    * Seeds follow [[Similarity.kmeansFit]]'s md5-hash-ordered sample rule
    * (the SAME k seed vectors sliced per subspace); assignment ranks by
    * reduced squared L2 (see [[nearestCode]]); means are 6 dp-rounded and
    * FLOAT round-tripped between iterations (the kmeansFit reproducibility
    * device). Cells that lose every member are retired; the returned codes
    * are positions in the surviving code-ordered book. Returns (subspace,
    * code, cvec) — feed to [[pqEncode]] / [[pqTopK]]. `iters = 0` returns
    * the raw seed codebook.
    *
    * Scale shape: one collect of k seed vectors; per iteration ONE scan
    * assigns all m subspaces (scan-stage [[nearestCode]] against literal
    * books, no join) and ONE hash-agg reduces to m·k mean buffers via the
    * native vector-sum aggregate (map-side partials — the shuffle carries
    * m·k·(dim/m) doubles per partition, never N·d rows). Train on a
    * deterministic sample ([[Sampling.deterministicSample]]) at 100 TB —
    * codebook quality saturates long before full-corpus coverage. */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, k: Int, iters: Int): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"pqTrain: need dim divisible by m; got dim=$dim m=$m")
    require(k >= 1 && iters >= 0,
      s"pqTrain: need k >= 1, iters >= 0; got k=$k iters=$iters")
    import graft.functions.VectorFunctions.vectorSumF
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val clean = emb.where(col(vecCol).isNotNull)
    val seeds = clean
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k).select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray)
    require(seeds.nonEmpty, "pqTrain: no non-null vectors to seed from")
    var books: Array[IndexedSeq[Array[Float]]] =
      Array.tabulate(m)(j => seeds.map(_.slice(j * subDim, (j + 1) * subDim)).toIndexedSeq)
    for (_ <- 1 to iters) {
      val withCodes = clean.select(
        (0 until m).map(j =>
          nearestCode(subVec(col(vecCol), j, subDim), books(j)).as(s"__c$j"))
          :+ col(vecCol): _*)
      // (subspace, code, subvec) rows generated scan-stage; one shuffle
      val pairs = withCodes.select(explode(array((0 until m).map(j =>
        struct(lit(j).as("j"), col(s"__c$j").as("code"),
          subVec(col(vecCol), j, subDim).as("sv"))): _*)).as("p"))
        .select(col("p.j").as("j"), col("p.code").as("code"), col("p.sv").as("sv"))
      val means = pairs.groupBy(col("j"), col("code"))
        .agg(vectorSumF(col("sv")).as("s"), count(lit(1)).as("n"))
        .select(col("j"), col("code"),
          transform(col("s"), x => round(x / col("n"), 6).cast("float")).as("cv"))
        .as[(Int, Int, Array[Float])].collect()
      val bySub = means.groupBy(_._1)
      // empty cells retire; surviving books stay ordered by prior code, so
      // positions keep ranking ties aligned with code order across engines
      books = Array.tabulate(m)(j =>
        bySub.getOrElse(j, Array.empty).sortBy(_._2).map(_._3).toIndexedSeq)
      require(books.forall(_.nonEmpty),
        "pqTrain: a subspace lost every cell — empty or all-null input?")
    }
    (for { (book, j) <- books.zipWithIndex; (cv, c) <- book.zipWithIndex }
      yield (j, c, cv.toSeq)).toSeq
      .toDF("subspace", "code", "cvec")
      .select(col("subspace"), col("code"), col("cvec").cast("array<float>"))
  }

  /** PQ encode: each vector becomes `m` small codes — `m·log₂k` bits
    * instead of `dim` floats (dim=1024, m=8, k=256: 8 bytes vs 4 KiB).
    * Returns (id, codes array<int>). Scan-stage only: the codebook rides
    * along as literals, assignment is [[nearestCode]] per subspace — zero
    * shuffle, zero join, the corpus is read exactly once. */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"pqEncode: need dim divisible by m; got dim=$dim m=$m")
    val subDim = dim / m
    val books = collectBooks(codebook, m)
    emb.where(col(vecCol).isNotNull)
      .select(col(idCol), array((0 until m).map(j =>
        nearestCode(subVec(col(vecCol), j, subDim), books(j))): _*).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k by approximate inner product: for
    * every query, score(x) = Σⱼ lut[j][codes(x)(j)] where lut[j][c] =
    * round(qⱼ·cvec, 6) — the query meets full-precision centroids, the
    * corpus only its codes (Jégou et al. 2011 §IV). Ranks by approximate
    * MIPS score (ties to the lower candidate id); inner product — unlike
    * cosine/L2 — decomposes EXACTLY over subspaces, so the only error is
    * quantization itself. Returns (query_id, cand_id, score, rank).
    *
    * Scale shape: per-query LUTs (m·k doubles) are computed scan-stage on
    * the BROADCAST query side; scoring a candidate is m array lookups on
    * the codes column — the d-dim dot never touches the corpus, and the
    * corpus vectors themselves never load (codes only: the 512× smaller
    * table). One window pass cuts top-k per query. Compose with IVF cells
    * ([[Similarity.ivfTopK]]'s assignment) to prune the candidate set
    * before scoring — classic IVF-PQ — when |corpus|·|queries| rows is
    * the bottleneck. */
  def pqTopK(codes: DataFrame, idCol: String, codesCol: String,
             queries: DataFrame, qidCol: String, vecCol: String,
             codebook: DataFrame, dim: Int, m: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"pqTopK: need topK >= 1, got $topK")
    require(m >= 1 && dim >= m && dim % m == 0,
      s"pqTopK: need dim divisible by m; got dim=$dim m=$m")
    import org.apache.spark.sql.expressions.Window
    val books = collectBooks(codebook, m)
    val q = broadcast(queries.where(col(vecCol).isNotNull)
      .select(col(qidCol).as("query_id"),
        adcLut(col(vecCol), books, dim / m).as("__lut")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id").asc)
    codes.crossJoin(q)
      .select(col("query_id"), col(idCol).as("cand_id"),
        adcScore(col("__lut"), col(codesCol), m).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }

  /** Per-query ADC lookup table: m arrays of `round(qⱼ·cvec, 6)` against
    * the literal codebook — computed scan-stage on the (small) query side. */
  private[ops] def adcLut(vec: Column, books: Array[IndexedSeq[Array[Float]]],
                          subDim: Int): Column = {
    import graft.functions.VectorFunctions.dotF
    array(books.indices.map(j =>
      transform(typedLit(books(j).map(_.toSeq)), c =>
        round(dotF(subVec(vec, j, subDim), c), 6))): _*)
  }

  /** ADC score: Σⱼ lut[j][codes(j)], summed in subspace order, 6 dp. */
  private[ops] def adcScore(lut: Column, codes: Column, m: Int): Column =
    round((0 until m).map(j =>
      element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1))
      .reduce(_ + _), 6)

  // ---- binary (sign) codes + Hamming ANN ----

  /** Sign-bit binarization: dimension `i` contributes bit `i mod 32` of
    * word `i / 32` when the element is ≥ 0 — a `dim`-bit code packed into
    * `ceil(dim/32)` BIGINT words (32 bits per word so every value stays
    * positive: portable to engines whose `<<` on the sign bit is
    * undefined). 32× smaller than float vectors and 8× smaller than int8;
    * with random-hyperplane-rotated inputs, Hamming distance between
    * codes estimates angle (Charikar 2002) — here the identity rotation
    * keeps it engine-exact and deterministic. Scan-stage, zero shuffle.
    * Returns (id, code: array<bigint>). */
  def binarize(emb: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"binarize: need dim >= 1, got $dim")
    val words = (dim + 31) / 32
    val code = array((0 until words).map { w =>
      val bits = math.min(32, dim - w * 32)
      (0 until bits).map { b =>
        when(element_at(col(vecCol), w * 32 + b + 1) >= 0f,
          lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)  // disjoint bits: + == OR
    }: _*)
    emb.where(col(vecCol).isNotNull)
      .select(col(idCol), code.as("code"))
  }

  /** Exact-integer Hamming top-k over [[binarize]] codes: distance =
    * Σ popcount(xor(word)) across the words of the two codes — all
    * integer arithmetic, so ranking (ties to the lower candidate id) is
    * EXACT on every engine, no rounding device needed. Queries broadcast
    * with their own codes; the per-candidate cost is `words` xor+popcount
    * ops against the codes column (the float vectors never load). Returns
    * (query_id, cand_id, hamming, rank). */
  def hammingTopK(codes: DataFrame, idCol: String, codeCol: String,
                  queries: DataFrame, qidCol: String, qcodeCol: String,
                  words: Int, topK: Int): DataFrame = {
    require(topK >= 1 && words >= 1,
      s"hammingTopK: need topK >= 1, words >= 1; got topK=$topK words=$words")
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries
      .select(col(qidCol).as("query_id"), col(qcodeCol).as("__qcode")))
    val dist = (0 until words).map(w =>
      bit_count(element_at(col(codeCol), w + 1)
        .bitwiseXOR(element_at(col("__qcode"), w + 1))))
      .reduce(_ + _).cast("long")
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("cand_id").asc)
    codes.crossJoin(q)
      .select(col("query_id"), col(idCol).as("cand_id"), dist.as("hamming"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }

  /** Aggregation formulation of [[hashEmbed]] — shuffles O(tokens); the
    * per-group integer sums equal the kernel's per-row sums exactly
    * (integer addition is order-free), which the spec pins. */
  def hashEmbedAgg(df: DataFrame, idCol: String, textCol: String, d: Int): DataFrame = {
    require(d >= 2, s"hashEmbedAgg: need d >= 2 dims, got $d")
    val tok = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("dim", Sampling.md5Mod(col("tok"), d.toLong).cast("int"))
      .withColumn("sign",
        pmod(conv(substring(md5(col("tok")), 9, 1), 16, 10).cast("long"), lit(2L))
          .cast("long") * 2L - 1L)
    tok.groupBy(col(idCol), col("dim"))
      .agg(sum("sign").as("val"))
      .where(col("val") =!= 0)
  }

  /** Binary-tier ANN recall CONTRACT: the measured recall@k of the
    * sign-code Hamming ranking ([[binarize]] + [[hammingTopK]], the 1
    * bit/dim compression tier) against the exact cosine top-k — per
    * query, as driver-checkable rows. Everything on both sides is
    * deterministic (sign codes are exact integers, cosines are
    * 6 dp-rounded with id tie-breaks), so an external engine replays the
    * RATIO itself: the cheapest compression tier ships its measured
    * quality, not a hope. Zero-norm vectors are excluded from both
    * sides (cosine undefined). Output: (query_id, n_found, recall 6 dp)
    * — `n_found` = exact-top-k hits inside the Hamming top-k.
    *
    * Scale shape: the exact side is the contract's judge — a
    * \|queries\|-bounded broadcast cosine scan (run on a query SAMPLE at
    * corpus scale, like every contract's exact side); the Hamming side
    * is the production integer ranking over the codes column. The
    * intersection joins two ≤ k·\|queries\| lists. */
  def hammingRecallContract(corpus: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, dim: Int,
                            k: Int): DataFrame = {
    require(k >= 1, s"hammingRecallContract: need k >= 1, got $k")
    val words = (dim + 31) / 32
    val ham = hammingTopK(
      binarize(corpus, idCol, vecCol, dim), idCol, "code",
      binarize(queries, idCol, vecCol, dim), idCol, "code", words, k)
      .select(col("query_id"), col("cand_id"))
    recallAgainstExact(corpus, queries, idCol, vecCol, k, ham)
  }

  /** Int8-tier ANN recall CONTRACT — [[hammingRecallContract]]'s sibling
    * one tier up: ranking by cosine over the [[quantizeInt8]] integer
    * vectors (the per-vector scale CANCELS inside the cosine, so the
    * int8 ranking needs no dequantize at all — pure integer dots,
    * 6 dp-rounded with id ties, engine-exact because q66 pins the codes
    * themselves) vs the exact float cosine top-k. 4× smaller vectors;
    * this contract reports what the rounding to 255 levels costs in
    * recall@k — typically near-1 where the binary tier is lossy.
    * Output: (query_id, n_found, recall 6 dp). */
  def int8RecallContract(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{dotF, normF}
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"int8RecallContract: need k >= 1, got $k")
    def ints(df: DataFrame, as: String) =
      quantizeInt8(df, idCol, vecCol)
        .select(col(idCol).as(as),
          transform(col("qvec"), x => x.cast("float")).as(s"__${as}v"))
        .withColumn(s"__${as}n", normF(col(s"__${as}v")))
        .where(col(s"__${as}n") > 0)
    val c = ints(corpus, "cand_id")
    val q = broadcast(ints(queries, "query_id"))
    val rk = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("cand_id").asc)
    val i8 = c.crossJoin(q)
      .select(col("query_id"), col("cand_id"),
        round(dotF(col("__cand_idv"), col("__query_idv")) /
          (col("__cand_idn") * col("__query_idn")), 6).as("__cos"))
      .withColumn("__r", row_number().over(rk)).where(col("__r") <= k)
      .select("query_id", "cand_id")
    recallAgainstExact(corpus, queries, idCol, vecCol, k, i8)
  }

  /** Shared judge of the compression-tier recall contracts: the exact
    * float-cosine top-k per query (6 dp round, id ties, zero-norm
    * vectors excluded) intersected with the tier's candidate k-list —
    * a \|queries\|-bounded broadcast scan, run on a query SAMPLE at
    * corpus scale like every contract's exact side. */
  private def recallAgainstExact(corpus: DataFrame, queries: DataFrame,
                                 idCol: String, vecCol: String, k: Int,
                                 found: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.{dotF, normF}
    import org.apache.spark.sql.expressions.Window
    val c = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("cand_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", normF(col("__cv"))).where(col("__cn") > 0)
    val q = broadcast(queries.where(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", normF(col("__qv"))).where(col("__qn") > 0))
    val rk = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("cand_id").asc)
    val exact = c.crossJoin(q)
      .select(col("query_id"), col("cand_id"),
        round(dotF(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")), 6)
          .as("__cos"))
      .withColumn("__r", row_number().over(rk)).where(col("__r") <= k)
      .select("query_id", "cand_id")
    exact.join(found.withColumn("__hit", lit(true)),
        Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(count(when(col("__hit"), 1)).as("n_found"))
      .select(col("query_id"), col("n_found"),
        round(col("n_found").cast("double") / k, 6).as("recall"))
  }
}
