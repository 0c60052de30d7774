package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: vocabulary building and per-document
  * TF-IDF term ranking — the "what is this corpus made of" pass a
  * training-data pipeline runs before tokenizer training and filtering.
  *
  * Scale shape: both operators reduce to (term) or (doc, term) hash
  * aggregations with map-side partial aggregation. Document frequency is
  * computed WITHOUT `countDistinct` (no Expand, no per-term distinct set):
  * first collapse to (doc, term) counts, then aggregate per term — two
  * pipelined shuffles whose first stage combines map-side, the shape that
  * survives a 100 TB corpus. Global top-k uses orderBy+limit
  * (TakeOrderedAndProject — per-partition heaps, no single-partition
  * window).
  */
object Corpus {

  /** The inverted-index pair casts the id to long; a non-integral id would
    * silently become NULL — still counted by df_docs but dropped from the
    * postings heap, so a string-id corpus would get wrong df counts and
    * empty postings with no error. Fail loudly instead; hash string ids to
    * long (e.g. xxhash64) upstream. */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    val integral = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    require(integral,
      s"$op: id column '$idCol' must be an integral type, got ${dt.simpleString}")
  }

  /** Per-(doc, term) occurrence counts — the shared first stage. */
  private def docTermCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Full per-term corpus stats (no cut): total occurrences and document
    * frequency. The MERGEABLE form — stats from disjoint document sets
    * combine by summation ([[mergeTermStats]]), so a growing corpus
    * maintains its vocabulary incrementally (stats of the new batch only,
    * merged into the stored table) instead of rescanning history. */
  def termStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    docTermCounts(df, idCol, textCol)
      .groupBy("term")
      .agg(sum("tf").as("tf"), count(lit(1)).as("df_docs"))

  /** Merge term stats from DISJOINT document sets (both tf and df are
    * additive over disjoint docs). Merge BEFORE any top-k cut — a cut
    * frame has lost the tail and under-counts after merging. */
  def mergeTermStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("term")
      .agg(sum("tf").as("tf"), sum("df_docs").as("df_docs"))

  /** Deterministic top-`k` cut by total count (ties break on the term). */
  def topTerms(stats: DataFrame, k: Int): DataFrame =
    stats.orderBy(col("tf").desc, col("term")).limit(k)

  /** Corpus vocabulary: the `topK` terms by total occurrence count, with
    * document frequency. Ties break on the term itself, so the cut is
    * total-ordered and deterministic. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame =
    topTerms(termStats(df, idCol, textCol), topK)

  /** Frequency-ordered term dictionary: every term with `tf >= minTf`
    * assigned a stable integer id, 1 = most frequent (ties on the term
    * itself) — the string-indexer step that turns categorical/token
    * columns into the dense ids a trainer consumes. Deterministic and
    * engine-portable: the id is a pure function of the corpus counts.
    *
    * Scale shape: [[termStats]]' term-keyed hash-agg, then
    * [[graft.ops.Layout.globalRank]]'s range-exchange ranking over the
    * ≤ |vocab| stat rows — no single-partition window, no driver
    * materialization of the vocabulary. */
  def termIds(df: DataFrame, idCol: String, textCol: String,
      minTf: Long = 1L): DataFrame = {
    require(minTf >= 1, s"termIds: need minTf >= 1, got $minTf")
    val stats = termStats(df, idCol, textCol)
      .where(col("tf") >= minTf)
      .withColumn("__neg_tf", -col("tf"))
    graft.ops.Layout.globalRank(stats, "__neg_tf", "term", rankCol = "term_id")
      .select(col("term"), col("tf"), col("df_docs"), col("term_id"))
  }

  /** Vocabulary coverage / OOV curve: for each candidate vocabulary size
    * V, the share of ALL token occurrences the top-V term types cover
    * ([[termIds]]' ordering: tf desc, ties on the term) and the
    * out-of-vocabulary remainder. This is the tokenizer-budget design
    * curve — pick V where the marginal coverage of the next thousand
    * types stops paying for their embedding rows; an `oov_rate` that
    * stays high at large V means the corpus tail is unbounded (shattered
    * tokenization, or genuine open vocabulary that needs subword units).
    * Sizes beyond the realized vocabulary simply report full coverage,
    * so one fixed size grid serves every corpus scale.
    *
    * Scale shape: one [[termStats]] term-keyed hash-agg, [[termIds]]'
    * range-exchange rank over the ≤ |vocab| stat rows, then a broadcast
    * theta-join against the ≤ |sizes| grid (each term duplicated once
    * per size it falls under) and one size-keyed hash-agg — the corpus
    * text is scanned once and never rescanned per size. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1),
      s"vocabCoverage: need sizes >= 1, got $sizes")
    val spark = df.sparkSession
    import spark.implicits._
    val ids = graft.core.CacheRegistry.persist(
      termIds(df, idCol, textCol))
    val tot = ids.agg(coalesce(sum("tf"), lit(0L)).cast("long")
      .as("total_tokens"))
    val sz = sizes.distinct.sorted.toDF("vocab_size")
    ids.join(broadcast(sz), col("term_id") <= col("vocab_size"), "right")
      .groupBy("vocab_size")
      .agg(coalesce(sum("tf"), lit(0L)).cast("long").as("covered_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("vocab_size"), col("covered_tokens"), col("total_tokens"),
        round(col("covered_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("coverage"),
        round((col("total_tokens") - col("covered_tokens")).cast("double") /
          col("total_tokens").cast("double"), 6).as("oov_rate"))
  }

  /** Vocabulary richness / unseen-mass estimators — how much vocabulary
    * the corpus has NOT shown yet, from the frequency-of-frequencies
    * alone: Chao1's bias-corrected richness floor
    * `V + F1·(F1−1) / (2·(F2+1))` (F1 = singleton types, F2 = doubleton
    * types; the +1 keeps it defined when no doubletons exist) and the
    * Good–Turing unseen probability mass `F1 / N` — the chance the NEXT
    * token drawn is a type never seen. Together they answer the
    * corpus-planning question behind [[vocabCoverage]]'s curve: a high
    * unseen mass means more crawl genuinely buys new vocabulary, a
    * chao1 close to the realized V means the type inventory is nearly
    * exhausted. One row: (vocab_size, total_tokens, f1, f2, chao1,
    * gt_unseen_mass), 6 dp.
    *
    * Scale shape: [[termStats]]' term-keyed hash-agg, then ONE
    * partial-agg reduce over the ≤ |vocab| stat rows — the corpus text
    * never shuffles and nothing is global. */
  def vocabRichness(df: DataFrame, idCol: String, textCol: String): DataFrame =
    termStats(df, idCol, textCol)
      .agg(count(lit(1)).as("vocab_size"),
        coalesce(sum("tf"), lit(0L)).cast("long").as("total_tokens"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("tf") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab_size"), col("total_tokens"), col("f1"), col("f2"),
        round(col("vocab_size").cast("double") +
          (col("f1") * (col("f1") - 1)).cast("double") /
            (lit(2.0) * (col("f2") + 1).cast("double")), 6).as("chao1"),
        round(col("f1").cast("double") /
          col("total_tokens").cast("double"), 6).as("gt_unseen_mass"))

  /** Zipf tail index of the token-frequency distribution — the one-number
    * corpus-health check that catches template spam (alpha collapses
    * toward 1 as a few phrases dominate) and shattered tokenization
    * (alpha inflates as mass spreads over the tail). Hill's estimator on
    * the discrete tail `tf >= minFreq`:
    * `alpha = 1 + n / Σ ln(tf / (minFreq - 0.5))` (the −0.5 is the
    * standard continuity correction). An empty tail reports NULL.
    *
    * Scale shape: [[termStats]]' one term-keyed hash-agg, then a global
    * partial-agg reduce over the ≤ |vocab| tail rows — the corpus text
    * never shuffles. */
  def zipfAlpha(df: DataFrame, idCol: String, textCol: String,
      minFreq: Long = 5L): DataFrame = {
    require(minFreq >= 2, s"zipfAlpha: need minFreq >= 2, got $minFreq")
    termStats(df, idCol, textCol)
      .where(col("tf") >= minFreq)
      .agg(
        count(lit(1)).as("n_tail_terms"),
        round(lit(1.0) + count(lit(1)) /
          sum(log(col("tf") / lit(minFreq - 0.5))), 6).as("alpha"))
  }

  /** Unigram-LM familiarity scoring — the cheap perplexity proxy a
    * curation pipeline runs when no trained LM is available: documents
    * whose tokens are common in the corpus score high; gibberish and
    * wrong-language text (rare tokens) score low. Also reports the
    * out-of-vocabulary rate against the top-`vocabK` vocabulary.
    *
    * Engine-exact by construction: the score is
    * `SUM(corpus_tf(token)) / n_tokens` — an integer sum (associative,
    * order-free) followed by ONE IEEE division — rather than a float
    * log-prob sum, whose accumulation order differs across engines. A
    * real log-prob variant is a `ln()` away; the ratio form keeps the
    * operator oracle-checkable.
    *
    * Scale shape: token stream → (term) hash-agg with map-side combine
    * for the stats; the per-token stats join keys on `term` (Zipf-skewed
    * but each term row is tiny — AQE skew-split handles the head); the
    * vocabulary (top-`vocabK` rows) broadcasts. No window, no Expand. */
  def familiarity(df: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
    // persisted: the tf join and the vocabulary cut both consume the term
    // stats — uncached, the corpus-wide token hash-agg would run twice
    val stats = graft.core.CacheRegistry.persist(termStats(df, idCol, textCol))
    val vocab = topTerms(stats, vocabK).select(col("term"), lit(true).as("in_vocab"))
    toks
      .join(stats.select(col("term"), col("tf")), Seq("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("tf").as("familiar_sum"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("familiar_sum"),
        (col("familiar_sum").cast("double") / col("n_tokens")).as("familiarity"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Per-source KL divergence from the corpus-wide term distribution —
    * the information-theoretic "which source sits elsewhere in token
    * space" scalar ([[graft.ops.Embeddings.centroidDrift]]'s text twin):
    * a shifted crawl, a template farm, or a different language all push
    * KL up. Distributions are add-one smoothed over the GLOBAL
    * vocabulary (`p(t) = (tf+1)/(N+V)`), so the sum runs over every
    * (source, term) cell including absences and is a TRUE KL (≥ 0, 0 iff
    * identical). Natural log, 6 dp round (absorbs cross-engine sum
    * order). Output: (source, n_tokens, kl).
    *
    * Scale shape: ONE token hash-agg to (source, term) cells; the global
    * distribution rolls up from those cells (the corpus is scanned
    * once); the |V|·|sources| smoothing grid comes from a broadcast
    * cross join against the per-source totals — bounded by vocabulary ×
    * source count, never by corpus size. */
  def sourceDivergence(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    // persisted: the global rollup, the totals, and the KL grid all
    // consume the (source, term) cells — uncached, the corpus token
    // explode + agg would run three times
    val st = graft.core.CacheRegistry.persist(
      df.select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("tf_s")))
    val g = st.groupBy("term").agg(sum("tf_s").as("tf_g"))
    val totals = st.groupBy("source").agg(sum("tf_s").as("n_s"))
    val gt = g.agg(count(lit(1)).as("v"), sum("tf_g").as("n_g"))
    val pS = (coalesce(col("tf_s"), lit(0L)).cast("double") + 1.0) /
      (col("n_s") + col("v")).cast("double")
    val pG = (col("tf_g").cast("double") + 1.0) /
      (col("n_g") + col("v")).cast("double")
    g.crossJoin(broadcast(totals))
      .join(st, Seq("source", "term"), "left")
      .crossJoin(broadcast(gt))
      .groupBy(col("source"))
      .agg(max("n_s").as("n_tokens"),
        round(sum(pS * log(pS / pG)), 6).as("kl"))
  }

  /** Sparse lexical "more like this": for each query document, the top-k
    * most TF-IDF-cosine-similar other documents, computed through the
    * postings (term) join — the production related-content / lexical
    * retrieval shape when there are no embeddings ([[bm25]] is its
    * free-text-query sibling; this one takes documents as queries).
    * Weights are `tf · (ln((N+1)/(df+1)) + 1)` (smoothed idf, so a
    * term in every doc still scores), cosine-normalized per doc; terms
    * with document frequency above `maxDfShare·N` are PRUNED from the
    * postings — stop-tokens carry no ranking signal and their posting
    * lists are exactly the ones that explode the term join. Cosines are
    * 6 dp-rounded, ties break to the smaller candidate id, a query doc
    * never matches itself. Output: (query_id, cand_id, cos, rank).
    *
    * Scale shape: tf/df/norms are the module's standard no-Expand
    * hash-aggs; the query-side weight table is \|queryIds\| docs —
    * BROADCAST into the one term-keyed postings join; per-pair partial
    * dot products combine map-side; the final top-k is a
    * WindowGroupLimit cut (map-side k-heaps), never a full sort. */
  def moreLikeThis(df: DataFrame, idCol: String, textCol: String,
                   queryIds: Seq[Long], topK: Int,
                   maxDfShare: Double = 0.5): DataFrame = {
    require(maxDfShare > 0 && maxDfShare <= 1,
      s"moreLikeThis: need 0 < maxDfShare <= 1, got $maxDfShare")
    moreLikeThisOn(
      graft.core.CacheRegistry.persist(
        tfidfPostings(df, idCol, textCol, maxDfShare)),
      queryIds, topK)
  }

  /** The TF-IDF weighted postings table (doc, term, w) [[moreLikeThis]]
    * and [[lateInteractionRerank]]'s retrieval stage rank through —
    * smoothed-idf weights `tf · (ln((N+1)/(df+1)) + 1)`, stop-tokens
    * with document frequency above `maxDfShare·N` pruned. Exposed so a
    * caller serving MANY retrieval queries can build (and persist) the
    * index ONCE and pass it to [[moreLikeThisOn]] per request — the
    * production shape, where the postings index is a maintained
    * artifact, not a per-query rebuild.
    *
    * Scale shape: one corpus explode into a (doc, term) hash-agg with
    * map-side combine, a term-keyed df join, and a broadcast 1-row
    * total — no Expand, no window. */
  def tfidfPostings(df: DataFrame, idCol: String, textCol: String,
                    maxDfShare: Double = 0.5): DataFrame = {
    require(maxDfShare > 0 && maxDfShare <= 1,
      s"tfidfPostings: need 0 < maxDfShare <= 1, got $maxDfShare")
    // persisted: dfT and the weight build both consume the postings —
    // without the cut the corpus explode + hash-agg runs twice in one plan
    val tf = graft.core.CacheRegistry.persist(
      df.select(col(idCol).cast("long").as("doc"),
          explode(split(col(textCol), " ")).as("term"))
        .groupBy("doc", "term").agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val nTot = df.agg(count(lit(1)).as("n"))
    tf.join(dfT, "term").crossJoin(broadcast(nTot))
      .where(col("df_docs").cast("double") <= lit(maxDfShare) * col("n"))
      .select(col("doc"), col("term"),
        (col("tf").cast("double") *
          (log((col("n").cast("double") + 1.0) /
            (col("df_docs").cast("double") + 1.0)) + 1.0)).as("w"))
  }

  /** [[moreLikeThis]] over a prebuilt (and ideally persisted)
    * [[tfidfPostings]] frame `w` — same ranking, same output; the
    * caller owns the index's lifetime. */
  def moreLikeThisOn(w: DataFrame, queryIds: Seq[Long],
                     topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryIds.nonEmpty, "moreLikeThis: need at least one query id")
    require(topK >= 1, s"moreLikeThis: need topK >= 1, got $topK")
    val norms = w.groupBy("doc").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val q = w.where(col("doc").isin(queryIds: _*))
      .select(col("doc").as("query_id"), col("term"), col("w").as("wq"))
    val qn = norms.where(col("doc").isin(queryIds: _*))
      .select(col("doc").as("query_id"), col("nrm").as("nq"))
    val dots = broadcast(q).join(w, "term")
      .where(col("doc") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc").as("cand_id"))
      .agg(sum(col("wq") * col("w")).as("dot"))
    val scored = dots
      .join(broadcast(qn), "query_id")
      .join(norms.select(col("doc").as("cand_id"), col("nrm").as("nc")), "cand_id")
      .select(col("query_id"), col("cand_id"),
        round(col("dot") / (col("nq") * col("nc")), 6).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("cand_id").asc)))
      .where(col("rank") <= topK)
  }

  /** Per-source bigram entropy and perplexity: Shannon entropy of each
    * source's bigram OCCURRENCE distribution (`H = −Σ p ln p`,
    * `ppl = e^H` = the effective vocabulary of adjacent pairs) — the
    * corpus-level diversity gauge for synthetic/generated data QA:
    * template expansion and mode-collapsed generation crater the bigram
    * perplexity long before document-level dedup notices, while
    * [[graft.functions.TextFunctions.charEntropy]] sees only characters
    * and [[zipfAlpha]] only unigram shape. Docs with < 2 tokens
    * contribute nothing; 6 dp rounds. Output:
    * (source, n_bigrams, distinct_bigrams, entropy, perplexity).
    *
    * Scale shape: the [[bigramSurprisal]] kernel pair stream feeds ONE
    * (source, pair) hash-agg; the entropy fold then runs over distinct
    * pairs per source with the per-source totals joined back on the
    * source key (broadcast-sized). */
  def bigramEntropy(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val pairs = df.where(size(split(col(textCol), " ")) >= 2)
      .select(col(srcCol).as("source"), explode(
        graft.functions.TextFunctions.adjPairs(col(textCol))).as("__pair"))
      .groupBy("source", "__pair").agg(count(lit(1)).as("__c"))
    val totals = pairs.groupBy("source").agg(sum("__c").as("__n"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    pairs.join(broadcast(totals), "source")
      .groupBy("source")
      .agg(max("__n").as("n_bigrams"),
        count(lit(1)).as("distinct_bigrams"),
        round(-sum(p * log(p)), 6).as("entropy"))
      // e^H of the ROUNDED entropy: both engines exponentiate the same
      // 6 dp value, and the outer round absorbs the libm ulp
      .withColumn("perplexity", round(exp(col("entropy")), 6))
      .select(col("source"), col("n_bigrams"), col("distinct_bigrams"),
        col("entropy"), col("perplexity"))
  }

  /** Term burstiness (Church & Gale 1995): the variance-to-mean ratio
    * of a term's per-document tf among the documents CONTAINING it —
    * the lexical signal separating content words (bursty: absent
    * mostly, then repeated — VMR ≫ 1) from function/template words
    * (Poisson-ish: VMR ≈ 1). Complements [[zipfAlpha]] (corpus shape)
    * and tf-idf (df only, blind to WITHIN-doc clumping): a
    * high-df-high-VMR term is topical boilerplate, high-df-low-VMR is
    * grammar. Population variance from exact integer power sums,
    * `minDf` cut, 6 dp. Output: (term, df_docs, total_tf, mean_tf,
    * vmr).
    *
    * Scale shape: the module's standard no-Expand reduction — one
    * (doc, term) hash-agg, then one (term) hash-agg over exact integer
    * Σtf/Σtf²; nothing after the second agg exceeds \|vocab\| rows. */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String,
                     minDf: Int = 5): DataFrame = {
    require(minDf >= 1, s"termBurstiness: need minDf >= 1, got $minDf")
    // per-(doc, term) tf first — burstiness is about within-doc clumping
    val perDoc = df.select(col(idCol).as("__doc"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy("__doc", "term").agg(count(lit(1)).as("__tf"))
    perDoc.groupBy("term")
      .agg(count(lit(1)).as("df_docs"), sum("__tf").as("total_tf"),
        sum(col("__tf") * col("__tf")).as("__sq"))
      .where(col("df_docs") >= minDf)
      .select(col("term"), col("df_docs"), col("total_tf"),
        round(col("total_tf").cast("double") / col("df_docs"), 6)
          .as("mean_tf"),
        round((col("__sq").cast("double") / col("df_docs")
          - (col("total_tf").cast("double") / col("df_docs"))
            * (col("total_tf").cast("double") / col("df_docs")))
          / (col("total_tf").cast("double") / col("df_docs")), 6)
          .as("vmr"))
  }

  /** Late-interaction (MaxSim) rerank of candidate document pairs —
    * ColBERT's scoring rule (Khattab & Zaharia, SIGIR 2020) re-expressed
    * relationally: `score(q, d) = (1/|q|) Σ_{i ∈ q positions}
    * max_{j ∈ d} cos(e_i, e_j)`, the retrieve-then-rerank second stage
    * over a first-stage candidate list ([[moreLikeThis]] / [[bm25]] /
    * an ANN probe). Identical tokens always score max 1, so equality
    * contributes exactly; per-token cosines are 6 dp-rounded BEFORE the
    * max (the round-before-argmax device — max selection is then
    * engine-deterministic). Positional MaxSim collapses EXACTLY to
    * tf-weighted distinct-token MaxSim (equal tokens share one max), so
    * the join runs over distinct-token pairs, never positions.
    *
    * Token vectors here are md5-derived pseudo-embeddings with
    * EXACTLY-REPRESENTABLE elements ((nibble − 8)/8 — halves of eighths,
    * so float, double, and any engine agree bit-for-bit): a
    * deterministic stand-in encoder, like the multimodal decode stub —
    * the real product slot is a (token → vector) dictionary join; the
    * MaxSim machinery is unchanged by the swap. Dots/norms run through
    * the native codegen dot ([[graft.functions.VectorFunctions.dotF]]),
    * whose sequential index-ordered double accumulation is bit-identical
    * to the HOF fold an external engine's `list_reduce` replays (the
    * values are float-exact, so the float storage tier changes nothing);
    * zero-norm tokens score cosine 0.
    *
    * Scale shape: the corpus prunes to the pair docs via a semi-join
    * BEFORE tokenization; work is \|pairs\| · \|q tokens\| · \|d
    * tokens\| distinct-token rows — rerank-bounded (a top-k candidate
    * list, not a corpus product). ONE persisted pruned-postings frame
    * carries tf + token vector + norm; both MaxSim join sides broadcast
    * it (candidate-bounded by contract), so the fan-out runs inside a
    * single codegen span and the two-level max/mean are hash-aggs on
    * the pair key. Output: (query_id, cand_id, maxsim). */
  def lateInteractionRerank(df: DataFrame, idCol: String, textCol: String,
                            pairs: DataFrame, queryCol: String,
                            candCol: String, dim: Int = 8): DataFrame = {
    require(dim >= 1 && dim <= 32,
      s"lateInteractionRerank: need 1 <= dim <= 32 md5-nibble dims, got $dim")
    val p = graft.core.CacheRegistry.persist(
      pairs.select(col(queryCol).cast("long").as("__q"),
        col(candCol).cast("long").as("__c")))
    val ids = p.select(col("__q").as("__id"))
      .union(p.select(col("__c"))).distinct()
    val nib = (k: Int) =>
      (conv(substring(md5(col("__tok")), k, 1), 16, 10).cast("double") - 8.0) / 8.0
    // ONE persisted frame carries tf AND the token pseudo-vector: the
    // vector is a pure function of the token, so computing it per
    // (doc, token) row costs one md5 per posting instead of a distinct +
    // two more materializations + two token-keyed joins (this used to be
    // three persists and a 4-join chain — each stage tiny but paying
    // full scheduling/exchange cost). Values are float-exact halves of
    // eighths, so the native codegen dot accumulates the SAME doubles in
    // the SAME index order — oracle-unchanged.
    val tfv = graft.core.CacheRegistry.persist(
      df.join(ids, col(idCol) === col("__id"), "left_semi")
        .select(col(idCol).cast("long").as("__doc"),
          explode(split(col(textCol), " ")).as("__tok"))
        .groupBy("__doc", "__tok").agg(count(lit(1)).as("__tf"))
        .withColumn("__v", array((1 to dim).map(nib): _*).cast("array<float>"))
        .withColumn("__n2",
          graft.functions.VectorFunctions.dotF(col("__v"), col("__v"))))
    // both sides BROADCAST: the rerank is candidate-bounded by contract
    // (|pairs| ≤ |queries|·topK, so pair-doc postings stay tiny no matter
    // the corpus size) — the MaxSim fan-out then runs as two broadcast
    // hash joins inside one codegen span, no exchange until the final agg
    val qSide = p
      .join(broadcast(tfv.select(col("__doc").as("__q"),
        col("__tok").as("__qtok"), col("__tf").as("__qtf"),
        col("__v").as("__qv"), col("__n2").as("__qn2"))), "__q")
    val tokPairs = qSide
      .join(broadcast(tfv.select(col("__doc").as("__c"),
        col("__v").as("__cv"), col("__n2").as("__cn2"))), "__c")
    val dot = graft.functions.VectorFunctions.dotF(col("__qv"), col("__cv"))
    val cos = when(col("__qn2") === 0.0 || col("__cn2") === 0.0, lit(0.0))
      .otherwise(round(dot / sqrt(col("__qn2") * col("__cn2")), 6))
    tokPairs
      .select(col("__q"), col("__c"), col("__qtok"), col("__qtf"), cos.as("__cos"))
      .groupBy("__q", "__c", "__qtok", "__qtf")
      .agg(max("__cos").as("__mc"))
      .groupBy(col("__q").as("query_id"), col("__c").as("cand_id"))
      .agg(round(sum(col("__qtf") * col("__mc")) / sum("__qtf"), 6).as("maxsim"))
  }

  /** Mutual information between term PRESENCE and a document label —
    * the classic filter-feature-selection score (which terms carry label
    * signal) and, inverted, a leakage probe (a term with outsized MI
    * against a split/source label marks template contamination).
    * For each term with document frequency ≥ `minDf`:
    * `MI = Σ_{t∈{present,absent}, l} p(t,l)·ln(p(t,l) / (p(t)·p(l)))`
    * over the doc-level presence/label contingency grid; zero cells
    * contribute 0 (the x·ln x limit), null labels form their own cohort
    * (the [[graft.ops.Quality.kAnonymityAudit]] rule), 6 dp round.
    * Output: (term, df_docs, mi).
    *
    * Scale shape: doc-level presence collapses scan-stage
    * (`array_distinct` before the explode — no per-term distinct agg,
    * no Expand); ONE (term, label) hash-agg with map-side partials; the
    * MI grid is \|terms\| × \|labels\| with the label histogram and the
    * doc total broadcast — corpus text never shuffles twice. */
  def termLabelMI(df: DataFrame, textCol: String, labelCol: String,
                  minDf: Int = 5): DataFrame = {
    require(minDf >= 1, s"termLabelMI: need minDf >= 1, got $minDf")
    // persisted: the df cut and the grid probe both consume the cells
    val tl = graft.core.CacheRegistry.persist(
      df.select(col(labelCol).as("label"),
        explode(array_distinct(split(col(textCol), " "))).as("term"))
        .groupBy("term", "label").agg(count(lit(1)).as("n_tl")))
    val labels = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_l"))
    val nTot = df.agg(count(lit(1)).as("n"))
    val nt = tl.groupBy("term").agg(sum("n_tl").as("n_t"))
      .where(col("n_t") >= minDf)
    val n11 = coalesce(col("n_tl"), lit(0L)).cast("double")
    val n01 = (col("n_l") - coalesce(col("n_tl"), lit(0L))).cast("double")
    val bigN = col("n").cast("double")
    val pT = col("n_t").cast("double") / bigN
    val pL = col("n_l").cast("double") / bigN
    val present = when(n11 > 0,
      (n11 / bigN) * log((n11 / bigN) / (pT * pL))).otherwise(lit(0.0))
    val absent = when(n01 > 0,
      (n01 / bigN) * log((n01 / bigN) / ((lit(1.0) - pT) * pL)))
      .otherwise(lit(0.0))
    // null-SAFE label key (<=>): a null-label cohort must attach its
    // (term, label) presence counts to the grid like any other label —
    // a plain equi-join would silently score those docs as 'absent'
    nt.crossJoin(broadcast(labels))
      .join(tl.select(col("term").as("__tl_term"), col("label").as("__tl_label"),
          col("n_tl")),
        col("term") === col("__tl_term") && col("label") <=> col("__tl_label"),
        "left")
      .crossJoin(broadcast(nTot))
      .groupBy(col("term"))
      .agg(max("n_t").as("df_docs"),
        round(sum(present + absent), 6).as("mi"))
  }

  /** Per-term chi-squared statistic against a document label — the second
    * classic filter-feature-selection score next to [[termLabelMI]]
    * (chi² weights rare-but-exclusive terms harder than MI; the pair
    * disagreeing on a term is itself a leakage signal). For each term
    * with document frequency ≥ `minDf`, over the doc-level
    * presence/absence × label contingency grid:
    * `chi² = Σ_{t∈{1,0}, l} (O_tl − E_tl)² / E_tl`,
    * `E_tl = (n_t or N−n_t)·n_l / N`; zero-expectation cells contribute 0
    * (only possible when a label cohort is empty, which can't happen by
    * construction), null labels form their own cohort via the null-safe
    * `<=>` key (the [[termLabelMI]] rule), 6 dp round.
    * Output: (term, df_docs, chi2).
    *
    * Scale shape: identical to [[termLabelMI]] — scan-stage
    * `array_distinct` before the explode, ONE (term, label) hash-agg with
    * map-side partials, grid is \|terms\| × \|labels\| with the label
    * histogram and doc total broadcast. */
  def termLabelChi2(df: DataFrame, textCol: String, labelCol: String,
                    minDf: Int = 5): DataFrame = {
    require(minDf >= 1, s"termLabelChi2: need minDf >= 1, got $minDf")
    val tl = graft.core.CacheRegistry.persist(
      df.select(col(labelCol).as("label"),
        explode(array_distinct(split(col(textCol), " "))).as("term"))
        .groupBy("term", "label").agg(count(lit(1)).as("n_tl")))
    val labels = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_l"))
    val nTot = df.agg(count(lit(1)).as("n"))
    val nt = tl.groupBy("term").agg(sum("n_tl").as("n_t"))
      .where(col("n_t") >= minDf)
    val o11 = coalesce(col("n_tl"), lit(0L)).cast("double")
    val o01 = (col("n_l") - coalesce(col("n_tl"), lit(0L))).cast("double")
    val bigN = col("n").cast("double")
    val e11 = col("n_t").cast("double") * col("n_l").cast("double") / bigN
    val e01 = (bigN - col("n_t").cast("double")) *
      col("n_l").cast("double") / bigN
    def cell(o: Column, e: Column): Column =
      when(e > 0, (o - e) * (o - e) / e).otherwise(lit(0.0))
    nt.crossJoin(broadcast(labels))
      .join(tl.select(col("term").as("__tl_term"), col("label").as("__tl_label"),
          col("n_tl")),
        col("term") === col("__tl_term") && col("label") <=> col("__tl_label"),
        "left")
      .crossJoin(broadcast(nTot))
      .groupBy(col("term"))
      .agg(max("n_t").as("df_docs"),
        round(sum(cell(o11, e11) + cell(o01, e01)), 6).as("chi2"))
  }

  /** Per-document bigram surprisal under the corpus's own add-one
    * bigram model: `mean over adjacent pairs of −ln p(w₂|w₁)`,
    * `p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V)` — the model-free perplexity
    * proxy (CCNet-style LM filtering without an external LM): template
    * spam scores low, shattered or mis-extracted text scores high.
    * Docs with < 2 tokens are excluded. 6 dp round. Output:
    * (id, n_pairs, surprisal).
    *
    * Scale shape: pair and unigram counts are each ONE hash-agg over
    * kernel-generated scan-stage streams ([[bpePairCounts]]'s AdjPairs);
    * the merged (pair, c_pair, c_w1) stats table joins the per-doc pair
    * stream on the pair key — the one corpus-sized shuffle — and V rides
    * in as a broadcast scalar. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def docPairs = df.where(size(split(col(textCol), " ")) >= 2)
      .select(col(idCol), explode(
        graft.functions.TextFunctions.adjPairs(col(textCol))).as("pair"))
    val c1 = df.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c_w1"))
    // persisted: V and the probe join both consume the unigram counts
    val c1c = graft.core.CacheRegistry.persist(c1)
    val vv = c1c.agg(count(lit(1)).as("v"))
    val stats = docPairs.groupBy("pair").agg(count(lit(1)).as("c_pair"))
      .join(c1c.withColumnRenamed("term", "__w1"),
        element_at(split(col("pair"), " "), 1) === col("__w1"))
      .select(col("pair"), col("c_pair"), col("c_w1"))
    docPairs.join(stats, "pair")
      .crossJoin(broadcast(vv))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(-log((col("c_pair") + 1).cast("double") /
          (col("c_w1") + col("v")).cast("double"))), 6).as("surprisal"))
  }

  /** One BPE-style merge-candidate step: counts of ADJACENT token pairs
    * across the corpus, cut to the top-`k` (ties on the pair string, so
    * the cut is total-ordered). Iterating this — count pairs, merge the
    * argmax, re-tokenize — is exactly tokenizer training; one step is the
    * engine-side primitive, and it is what dominates the cost at corpus
    * scale (the merge itself touches only the matched pair).
    *
    * Scale shape: the pair stream is generated in the scan stage by ONE
    * native kernel pass per row (org.apache.spark.sql.graft.AdjPairs —
    * the `transform`/`element_at` formulation allocated an interpreted
    * lambda frame per pair; it survives as [[bpePairsHof]], the kernel's
    * equivalence oracle), then ONE hash-agg on the pair with map-side
    * combine; the top-k cut is TakeOrderedAndProject (per-partition
    * heaps, no global sort). */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.where(size(split(col(textCol), " ")) >= 2)
      .select(explode(
        graft.functions.TextFunctions.adjPairs(col(textCol))).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** Higher-order-function pair generation of [[bpePairCounts]], kept as
    * the equivalence oracle for the native AdjPairs kernel. */
  def bpePairsHof(textCol: Column): Column = {
    val ts = split(textCol, " ")
    when(size(ts) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(ts) - 2),
        i => concat_ws(" ", element_at(ts, i + 1), element_at(ts, i + 2))))
  }

  /** Inverted index (term → postings), the retrieval-side product of a
    * corpus: per term its document frequency and the first `cap` postings
    * by ascending doc id, emitted EXPLODED as (term, df_docs, slot,
    * doc_id) rows rather than array cells — the layout a downstream
    * sharded index loader consumes, and one that never materializes an
    * unbounded per-term array. `df_docs` counts ALL matching documents
    * (pre-cap), so idf stays exact even where postings are truncated.
    *
    * Scale shape: ONE hash-agg on the term computes df and the capped
    * posting list together, via the native bounded min-k aggregate
    * (org.apache.spark.sql.graft.LongMinKAgg — map-side partial heaps, ≤
    * `cap` ids per term over the wire). The previous `row_number` window
    * SORTED every term's full posting list to keep `cap` of them — on a
    * stop word that is a sort of most of the corpus for a `cap`-row
    * answer; it survives as [[invertedIndexWindowed]], the kernel's
    * equivalence oracle. Requires an integral id column. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String, cap: Int): DataFrame = {
    requireIntegralId(df, idCol, "invertedIndex")
    val dt = df
      .select(col(idCol).cast("long").as("doc"),
        explode(split(col(textCol), " ")).as("term"))
      .distinct()
    dt.groupBy("term")
      .agg(count(lit(1)).as("df_docs"),
        graft.functions.SketchFunctions.minKLong(col("doc"), cap).as("__post"))
      .select(col("term"), col("df_docs"),
        posexplode(col("__post")).as(Seq("__pos", idCol)))
      .select(col("term"), col("df_docs"),
        (col("__pos") + 1).cast("long").as("slot"), col(idCol))
  }

  /** `row_number`-window formulation of [[invertedIndex]], kept as the
    * equivalence oracle for the bounded min-k aggregate. */
  def invertedIndexWindowed(df: DataFrame, idCol: String, textCol: String,
                            cap: Int): DataFrame = {
    requireIntegralId(df, idCol, "invertedIndexWindowed")
    val dt = df
      .select(col(idCol).cast("long").as("doc"), explode(split(col(textCol), " ")).as("term"))
      .distinct()
    val dfDocs = dt.groupBy("term").agg(count(lit(1)).as("df_docs"))
    dt.withColumn("slot",
        row_number().over(Window.partitionBy("term").orderBy("doc")).cast("long"))
      .where(col("slot") <= cap)
      .join(dfDocs, "term")
      .select(col("term"), col("df_docs"), col("slot"), col("doc").as(idCol))
  }

  /** Windowed term co-occurrence with PMI-style lift: unordered term
    * pairs within ±`window` tokens, cut to the top-`k` by pair count, each
    * with its components' corpus counts and
    * `lift = n_ab·N / (n_a·n_b)` — the ratio inside the PMI log. The raw
    * ratio keeps the operator engine-exact (see [[tfidfTopTerms]] for the
    * same reasoning); callers wanting true PMI take `ln` of it.
    * Association mining over a corpus — the statistics phrase detection
    * and static-embedding training start from.
    *
    * Scale shape: pair generation runs in the scan stage as ONE native
    * kernel pass per row (org.apache.spark.sql.graft.CoocPairs — the
    * nested-`transform` formulation allocated two interpreted lambda
    * frames per pair and ran ~5× slower; it survives as
    * [[coocPairsHof]], the kernel's equivalence oracle); what shuffles is
    * the (pair) hash-agg with map-side combine, then a
    * TakeOrderedAndProject cut. Output is bounded by `k`. */
  def cooccurrence(df: DataFrame, textCol: String, window: Int, k: Int): DataFrame = {
    require(window >= 1, s"cooccurrence: window must be >= 1, got $window")
    val ts = split(col(textCol), " ")
    val pairs = df.where(size(ts) >= 2)
      .select(explode(
        graft.functions.TextFunctions.coocPairs(col(textCol), window)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_ab"))
      .select(
        substring_index(col("pair"), " ", 1).as("term_a"),
        substring_index(col("pair"), " ", -1).as("term_b"),
        col("n_ab"))
    // persisted: both pair-side joins consume the term counts (uncached,
    // the token explode + hash-agg would run twice); the corpus token
    // total folds from the counts — no third corpus scan
    val counts = graft.core.CacheRegistry.persist(
      df.select(explode(split(col(textCol), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n")))
    val total = counts.agg(sum(col("n")).as("n_total"))
    pairs
      .join(counts.toDF("term_a", "n_a"), "term_a")
      .join(counts.toDF("term_b", "n_b"), "term_b")
      .crossJoin(broadcast(total))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") * col("n_total").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy(col("n_ab").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Higher-order-function pair generation of [[cooccurrence]], kept as
    * the equivalence oracle for the native CoocPairs kernel (the spec
    * pins element-identical output on real documents). */
  def coocPairsHof(textCol: Column, window: Int): Column = {
    val ts = split(textCol, " ")
    // guarded: sequence(0, -1) on a sub-2-token doc would count DOWN
    when(size(ts) < 2, array().cast("array<string>"))
      .otherwise(flatten(transform(
        sequence(lit(0), size(ts) - 2),
        i => transform(
          sequence(i + 1, least(i + lit(window), size(ts) - 1)),
          j => {
            val a = element_at(ts, i + 1)
            val b = element_at(ts, j + 1)
            when(a <= b, concat_ws(" ", a, b)).otherwise(concat_ws(" ", b, a))
          }))))
  }

  /** BM25 retrieval scoring against a FIXED literal query: the top-`topK`
    * documents by Lucene-form BM25
    * (`idf = ln(1 + (N−df+0.5)/(df+0.5))`, tf part
    * `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`). The per-document total is
    * a FIXED-ORDER sum of the per-term scores (one conditional-agg column
    * per query term, added left-to-right), not a float sum whose
    * accumulation order varies with partitioning — that plus the final
    * 6 dp round keeps scores reproducible across engines. Ranking the
    * whole corpus against a query is the retrieval-side read path of the
    * [[invertedIndex]] this engine also builds.
    *
    * Scale shape: the term filter hits the scan (only query-term tokens
    * survive the explode); doc lengths are one hash-agg over the corpus;
    * everything else is per-surviving-doc arithmetic plus a
    * TakeOrderedAndProject cut. The df/N/avgdl side inputs are single
    * rows or |Q| rows — broadcast. */
  def bm25(df: DataFrame, idCol: String, textCol: String, query: Seq[String],
           k1: Double, b: Double, topK: Int): DataFrame = {
    require(query.nonEmpty, "bm25: query must be non-empty")
    require(query.distinct.size == query.size,
      s"bm25: duplicated query term(s) ${query.diff(query.distinct).distinct.mkString("'", "', '", "'")} " +
        "would double-count their scores - dedupe the query first")
    // both persisted: docLen feeds the corpus totals AND the score join;
    // qtf feeds the df counts AND the score rows — uncached, each would
    // re-run its corpus scan
    val docLen = graft.core.CacheRegistry.persist(
      df.select(col(idCol), size(split(col(textCol), " ")).cast("long").as("dl")))
    val totals = docLen.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val qtf = graft.core.CacheRegistry.persist(
      df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
        .where(col("term").isin(query: _*))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
    val dfDocs = qtf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val scored = qtf
      .join(broadcast(dfDocs), "term")
      .join(docLen, idCol)
      .crossJoin(broadcast(totals))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df_docs").cast("double") + 0.5)
          / (col("df_docs").cast("double") + 0.5)))
      .withColumn("s",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    // one column per query term, summed in query order → deterministic
    val perTerm = query.zipWithIndex.map { case (q, i) =>
      sum(when(col("term") === q, col("s"))).as(s"s_$i")
    }
    val total = query.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col(idCol), round(total, 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    * fuse the [[bm25]] lexical ranking with a dense-ish ranking — cosine
    * between each document's [[Embeddings.hashEmbed]] vector and the SAME
    * hash-embedding of the query string — via
    * `Σ 1 / (rrfK + rank)` over the two top-`listK` lists. RRF needs only
    * RANKS, so fusing survives the two scorers living on incomparable
    * scales — which is exactly why production retrieval stacks use it to
    * combine lexical and vector legs. Docs on one list only get that
    * leg's term (standard RRF). Returns (id, rrf 6 dp, rank ≤ topK).
    *
    * Engine-exact: ranks are integers; each term is `1.0 / (rrfK + r)` —
    * one IEEE division — and the two terms add in fixed (lexical, vector)
    * order. The vector leg's cosine is integer-dot / (sqrt(int)·sqrt(int)),
    * rounded at 6 dp, so the rank lists themselves reproduce anywhere.
    *
    * Scale shape: the lexical leg is [[bm25]] (one scan + broadcast side
    * inputs); the vector leg is the one-pass `hash_embed` kernel scan,
    * one (doc, dim)-collapse hash-agg, and a TakeOrdered heap cut to
    * `listK` — a full sort never happens; the fusion join touches two
    * ≤ listK row lists. A corpus whose query-relevant slice exceeds
    * `listK` needs a bigger `listK`, not a different shape. */
  def hybridRrf(df: DataFrame, idCol: String, textCol: String,
                query: Seq[String], d: Int, listK: Int, rrfK: Int,
                topK: Int): DataFrame = {
    require(listK >= 1 && rrfK >= 1 && topK >= 1,
      s"hybridRrf: need listK/rrfK/topK >= 1; got listK=$listK rrfK=$rrfK topK=$topK")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.TextKernels
    // the query embeds driver-side through the SAME kernel the docs use
    val qarr = TextKernels.hashEmbed(
      org.apache.spark.unsafe.types.UTF8String.fromString(query.mkString(" ")), d)
    val qvec = (0 until d).map(qarr.getLong).toArray
    val qnorm = math.sqrt(qvec.map(v => (v * v).toDouble).sum)
    require(qnorm > 0,
      s"hybridRrf: query terms ${query.mkString("'", "', '", "'")} hash-cancel to the zero vector")
    // lexical leg: bm25's TakeOrdered cut, then ranks over <= listK rows
    val wl = Window.orderBy(col("bm25").desc, col(idCol).asc)
    val lexRank = bm25(df, idCol, textCol, query, 1.5, 0.75, listK)
      .select(col(idCol), row_number().over(wl).as("r_lex"))
    // vector leg: sparse hash-embed rows against the literal query vector
    val qlit = typedLit(qvec.toIndexedSeq)
    val cosd = Embeddings.hashEmbed(df, idCol, textCol, d)
      .withColumn("__q", element_at(qlit, col("dim") + 1))
      .groupBy(col(idCol))
      .agg(sum(col("val") * col("__q")).as("__dot"),
        sum(col("val") * col("val")).as("__n2"))
      .select(col(idCol),
        round(col("__dot").cast("double")
          / (sqrt(col("__n2").cast("double")) * lit(qnorm)), 6).as("cos"))
    val wv = Window.orderBy(col("cos").desc, col(idCol).asc)
    val vecRank = cosd.orderBy(col("cos").desc, col(idCol)).limit(listK)
      .select(col(idCol), row_number().over(wv).as("r_vec"))
    val rrf = round(
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("r_lex")), lit(0.0))
        + coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("r_vec")), lit(0.0)), 6)
    val wf = Window.orderBy(col("rrf").desc, col(idCol).asc)
    lexRank.join(vecRank, Seq(idCol), "full_outer")
      .select(col(idCol), rrf.as("rrf"))
      .withColumn("rank", row_number().over(wf))
      .where(col("rank") <= topK)
  }

  /** Per-document top-`k` terms by TF-IDF. The idf is the RAW ratio
    * `n_docs / df` (no logarithm): ln() is libm-dependent and not
    * bit-identical across engines, while IEEE division is — so the score
    * `tf * n_docs / df` reproduces exactly on any engine, which keeps the
    * operator oracle-checkable. Ranking per document is a window over the
    * doc key (partitioned — scales with the corpus); ties break on the
    * term. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // persisted: the df counts and the score join both consume the
    // (doc, term) table — uncached, the corpus explode + collapse would
    // run twice
    val dt = graft.core.CacheRegistry.persist(docTermCounts(df, idCol, textCol))
    val termDf = dt.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = dt.join(termDf, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * col("n_docs").cast("double")
          / col("df_docs").cast("double"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df_docs"), col("tfidf"),
        col("rk").cast("long").as("rk"))
  }

  /** Offline ranking-quality metrics over a table of ranked results with
    * graded relevance — the evaluation side of the retrieval stack
    * ([[bm25]], [[hybridRrf]], [[Similarity]] ANN): per query,
    * reciprocal rank of the first relevant hit (MRR's summand),
    * precision@k / recall@k, and nDCG@k with linear gain
    * `rel / log2(rank + 1)` against the query's own ideal ordering.
    * Macro-averaging across queries is one more tiny aggregate the
    * caller owns (per-query rows are what you drill into when a ranker
    * regresses). A query with no relevant results scores 0 everywhere
    * (not NULL — absent relevance is a finding, not a missing value).
    *
    * `rankCol` must hold each query's 1-based ranks; `relCol` is a
    * non-negative grade (0 = irrelevant, higher = better).
    *
    * Engine-exact: counts and rank minima are integers; each metric is a
    * handful of IEEE divisions, with the two log-sums (DCG and the
    * ideal DCG) rounded at 6 dp — the one place summation order and
    * `log` ulps could diverge across engines. Scale shape: ONE shuffle
    * on the query key — the ideal ordering is a window over it, and the
    * final aggregate reuses the exchange (same key, no second shuffle);
    * nothing is ever globally sorted and no list is collected. */
  def rankingMetrics(runs: DataFrame, queryCol: String, rankCol: String,
                     relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics: need k >= 1, got $k")
    val rel = col(relCol).cast("double")
    val isRel = rel > 0
    // ideal rank: this query's grades sorted descending. Ties in grade
    // make the ideal DCG invariant to the tiebreak; the rank column
    // pins it anyway so the plan is deterministic.
    val ideal = row_number().over(
      Window.partitionBy(col(queryCol))
        .orderBy(rel.desc, col(rankCol).asc))
    val log2rk = log(2.0, col(rankCol).cast("double") + 1)
    val log2ideal = log(2.0, col("__ideal").cast("double") + 1)
    runs.withColumn("__ideal", ideal)
      .groupBy(col(queryCol))
      .agg(
        count(lit(1)).as("n_results"),
        count(when(isRel, 1)).as("n_rel"),
        min(when(isRel, col(rankCol))).as("__first"),
        count(when(isRel && col(rankCol) <= k, 1)).as("__relk"),
        sum(when(col(rankCol) <= k, rel / log2rk).otherwise(lit(0.0))).as("__dcg"),
        sum(when(col("__ideal") <= k, rel / log2ideal).otherwise(lit(0.0))).as("__idcg"))
      .select(col(queryCol), col("n_results"), col("n_rel"),
        when(col("__first").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__first")).as("reciprocal_rank"),
        (col("__relk").cast("double") / k).as("precision_at_k"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("__relk").cast("double") / col("n_rel")).as("recall_at_k"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(round(col("__dcg"), 6) / round(col("__idcg"), 6)).as("__ndcg"))
      .withColumn("ndcg_at_k", round(col("__ndcg"), 6))
      .drop("__ndcg")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus-level
    * keywords as PageRank centrality over the word co-occurrence graph:
    * the [[cooccurrence]] pair kernel builds the edges (±`window` token
    * pairs, weight = pair count), [[graft.ops.Graph.pageRank]] runs the
    * fixed-iteration rank (6 dp per-round snaps — the deterministic
    * replay device), and the top-`topK` terms by rank are the keyword
    * list. Degree alone over-rewards raw frequency; centrality rewards
    * terms that co-occur with OTHER central terms — the difference
    * between "the" and an actual topic word once stopwords are stripped
    * upstream. Ties break to the lexicographically smaller term.
    * Output: (term, rank, kw_rank 1..topK).
    *
    * Scale shape: one scan-stage pair explode + hash-agg builds the
    * edge list; each PageRank round is ONE destination-keyed hash-agg;
    * the final top-k is a single bounded window over the vocabulary-
    * sized rank table. */
  def textRank(df: DataFrame, textCol: String, window: Int,
               damping: Double, iters: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    require(topK >= 1, s"textRank: need topK >= 1, got $topK")
    val pairs = df.where(size(split(col(textCol), " ")) >= 2)
      .select(explode(
        graft.functions.TextFunctions.coocPairs(col(textCol), window))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_ab"))
      .select(substring_index(col("pair"), " ", 1).as("term_a"),
        substring_index(col("pair"), " ", -1).as("term_b"), col("n_ab"))
    // pair strings are canonically sorted, so one union symmetrizes
    val edges = pairs.select(col("term_a").as("src"),
        col("term_b").as("dst"), col("n_ab").cast("double").as("w"))
      .unionAll(pairs.select(col("term_b").as("src"),
        col("term_a").as("dst"), col("n_ab").cast("double").as("w")))
      .where(col("src") =!= col("dst"))
    val ranked = Graph.pageRank(edges, "src", "dst", "w", damping, iters)
    // TakeOrdered cut FIRST (map-side k-heaps, no vocabulary-sized
    // single-partition sort — round 12, guide §2.4), then the bounded
    // ≤ topK frame gets its 1-based positions; identical rows and ranks
    // to a global row_number + filter
    val top = ranked.orderBy(col("rank").desc, col("node").asc).limit(topK)
    top.withColumn("__r",
        row_number().over(W.orderBy(col("rank").desc, col("node").asc)))
      .select(col("node").as("term"), col("rank"),
        col("__r").cast("long").as("kw_rank"))
  }

  /** Compute-optimal data-budget plan (Hoffmann et al. 2022, "Chinchilla")
    * — "is this corpus big enough for the model the budget buys": for
    * each training FLOP budget C, the compute-optimal parameter count
    * `Nopt = √(C/120)` and token count `Dopt = 20·Nopt` (from C ≈ 6·N·D
    * and the measured D/N ≈ 20 optimum), compared against the corpus's
    * ACTUAL whitespace-token count T (one exact LONG sum). `epochs_needed
    * = Dopt / T` and `data_limited = Dopt > T` tell the pipeline whether
    * curation must GROW the corpus before that budget is spendable —
    * the planning row the q306 Heaps-law and q314 learning-curve
    * forecasts feed into. All derived values are closed-form doubles of
    * (budget literal, exact T), 6 dp / integer-rounded.
    *
    * Scale shape: ONE corpus scan ending in a single-row sum, then a
    * ≤|budgets| literal grid cross-joined against the broadcast total.
    * Nothing else touches the data. */
  def chinchillaPlan(df: DataFrame, textCol: String,
                     budgetsFlops: Seq[Double]): DataFrame = {
    require(budgetsFlops.nonEmpty, "chinchillaPlan: provide FLOP budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val t = df.where(col(textCol).isNotNull)
      .agg(sum(TextStats.tokenCount(col(textCol)).cast("long"))
        .as("corpus_tokens"))
    val grid = budgetsFlops.map(c => (c, math.sqrt(c / 120.0)))
      .toDF("flops_budget", "__nstar")
    grid.crossJoin(broadcast(t))
      .select(col("flops_budget"),
        coalesce(col("corpus_tokens"), lit(0L)).as("corpus_tokens"),
        round(col("__nstar")).cast("long").as("opt_params"),
        round(col("__nstar") * 20.0).cast("long").as("opt_tokens"),
        round(col("__nstar") * 20.0
          / coalesce(col("corpus_tokens"), lit(0L)).cast("double"), 6)
          .as("epochs_needed"),
        (round(col("__nstar") * 20.0)
          > coalesce(col("corpus_tokens"), lit(0L)).cast("double"))
          .as("data_limited"))
  }

  /** Rank-biased overlap (Webber et al. 2010) between two rankings of the
    * same items — "do two quality signals pick the same head of the
    * corpus", the list-level agreement metric [[rankingMetrics]] can't
    * express (it needs graded relevance; RBO compares two ORDERINGS
    * directly, top-weighted by persistence `p`). Per group, items rank by
    * `scoreA` and `scoreB` (desc, 6 dp micro-snapped, ties to the lower
    * id); an item with ranks (ra, rb) both ≤ k first enters the overlap
    * at depth m = max(ra, rb), so truncated RBO@k decomposes PER ITEM:
    * `RBO = (1−p)/p · Σ_items c(m)` with `c(m) = Σ_{d=m..k} p^d/d`. Each
    * `p^d/d` term snaps to a micro-LONG before the sum (both engines add
    * identical integers in any order), making the decomposition
    * replay-exact. Lists shorter than k contribute their actual depth —
    * absent ranks simply never enter. Output per group: (group, n_items,
    * n_common [items in both top-k], overlap_at_k, rbo), 6 dp.
    *
    * Scale shape: ONE shuffle on the group key — both row_number ranks
    * are windows over the same exchange — then a filter to ≤ 2k rows per
    * group, a bounded ≤ k-term literal fold per row (scan stage), and a
    * group hash-agg. No list is collected and nothing joins item×item. */
  def rboOverlap(df: DataFrame, groupCol: String, idCol: String,
                 scoreA: Column, scoreB: Column, k: Int,
                 p: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"rboOverlap: need k >= 1, got $k")
    require(p > 0 && p < 1, s"rboOverlap: need 0 < p < 1, got $p")
    val am = round(scoreA.cast("double") * lit(1000000.0)).cast("long")
    val bm = round(scoreB.cast("double") * lit(1000000.0)).cast("long")
    val base = df
      .where(col(idCol).isNotNull && scoreA.isNotNull && scoreB.isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("long").as("__id"),
        am.as("__am"), bm.as("__bm"))
    val wa = Window.partitionBy("g").orderBy(col("__am").desc, col("__id").asc)
    val wb = Window.partitionBy("g").orderBy(col("__bm").desc, col("__id").asc)
    val ranked = base
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rb", row_number().over(wb))
    val counts = ranked.groupBy("g").agg(count(lit(1)).as("n_items"))
    val common = ranked
      .where(col("__ra") <= k && col("__rb") <= k)
      .withColumn("__m", greatest(col("__ra"), col("__rb")))
      // c(m) = Σ_{d=m..k} round(p^d/d · 10⁶): a ≤ k-term literal fold,
      // snapped per TERM so the integer sum is order-free on any engine
      .withColumn("__c", expr(
        s"""aggregate(sequence(CAST(__m AS INT), $k), CAST(0 AS BIGINT),
           |  (acc, d) -> acc + CAST(round(pow(CAST($p AS DOUBLE), d) / d
           |    * 1000000.0) AS BIGINT))""".stripMargin))
      .groupBy(col("g").as("__cg"))
      .agg(count(lit(1)).as("n_common"), sum("__c").as("__csum"))
    // null-safe group key: a null source is its own cohort (the
    // [[termLabelMI]] rule)
    counts.join(common, col("g") <=> col("__cg"), "left")
      .select(col("g").as(groupCol), col("n_items"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") / k, 6)
          .as("overlap_at_k"),
        round(lit((1.0 - p) / p) *
          coalesce(col("__csum"), lit(0L)).cast("double") / lit(1000000.0), 6)
          .as("rbo"))
  }

  /** Full BPE tokenizer TRAINING (Sennrich et al. 2016) — the iterated
    * form of [[bpePairCounts]]' single step: collapse the corpus to word
    * types with frequencies ONCE, split each type to characters, then
    * `numMerges` rounds of (count adjacent symbol pairs weighted by word
    * frequency → pick the most frequent, ties by (pair) ascending →
    * apply the merge everywhere in one LEFT-TO-RIGHT pass). The
    * single-pass fold is the pinned contract ("aaa" under (a,a) →
    * ["aa","a"]): both engines replay the same fold, so the learned
    * merge table is engine-exact. Output: one row per learned merge
    * (step, left, right, merged, pair_count) — the tokenizer's merge
    * list in training order.
    *
    * Scale shape: the ONLY corpus-sized pass is the word-type collapse
    * (one token hash-agg); every round after runs on the VOCABULARY
    * (types × avg symbols), shuffling one (l, r) hash-agg with map-side
    * partials and taking the argmax via TakeOrdered(1). The merge
    * application is a scan-stage higher-order fold with the chosen pair
    * as literals (codegen'd, no shuffle); each round checkpoints to cut
    * the k-deep plan lineage. Driver state: one (l, r, count) triple
    * per round. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"bpeTrain: need numMerges >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var words = graft.core.CacheRegistry.checkpoint(
      df.select(explode(split(col(textCol), " ")).as("__w"))
        .where(length(col("__w")) > 0)
        .groupBy("__w").agg(count(lit(1)).as("__freq"))
        .select(col("__freq"), split(col("__w"), "").as("__syms")))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (step <- 1 to numMerges) {
      val best = words
        .select(col("__freq"), explode(
          // sequence(0, -1) counts DOWN in Spark — guard single-symbol words
          when(size(col("__syms")) >= 2,
            transform(sequence(lit(0), size(col("__syms")) - 2), i =>
              struct(element_at(col("__syms"), i + 1).as("l"),
                element_at(col("__syms"), i + 2).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum("__freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)].collect().headOption
      best match {
        case None => // every word is a single symbol: nothing left to merge
        case Some((l, r, cnt)) =>
          merges += ((step, l, r, l + r, cnt))
          // single left-to-right merge pass: the sentinel keeps the
          // last-element probe total on the empty accumulator. The value
          // must be one no symbol can ever equal — words come from split
          // on ' ', so a space can never appear INSIDE a symbol (a NUL
          // can), making " " the only collision-free choice; it is also
          // exactly what the apply side (bpeMergePass) uses, keeping
          // train and apply pinned to the same fold.
          val sentinel = array(lit(" "))
          val applied = aggregate(col("__syms"),
            array().cast("array<string>"),
            (acc, s) => {
              val last = element_at(concat(sentinel, acc), -1)
              when(last === l && s === r,
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(concat(acc, array(s)))
            })
          words = graft.core.CacheRegistry.checkpoint(
            words.select(col("__freq"), applied.as("__syms")))
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("step", "left", "right", "merged", "pair_count")
  }

  /** BPE tokenization with a learned merge list — [[bpeTrain]]'s apply
    * side, closing the tokenizer loop: each document's words split to
    * characters, then every merge applies IN TRAINING ORDER as the same
    * single left-to-right pass the trainer pinned. Emits the per-doc
    * fertility mart instead of raw token arrays: `n_chars` (symbol
    * count before merging), `n_tokens` (after), and `chars_per_token` —
    * the compression-ratio / fertility number tokenizer work optimizes,
    * and the per-language fairness metric (a language the tokenizer
    * fragments pays more sequence length for the same text).
    *
    * Scale shape: ENTIRELY scan-stage — the merge list arrives as
    * literals (driver-held, numMerges pairs), and the m folds compose
    * as nested higher-order expressions over each word's symbol array;
    * no join, no shuffle, nothing scales with the corpus but the scan.
    * Word-type caching ([[bpeTrain]]'s collapse) is deliberately NOT
    * reused: tokenization is a per-document projection, and the scan is
    * the cost either way. */
  /** One left-to-right BPE merge pass over a symbol array — the shared
    * apply-side fold of [[bpeTokenStats]] and [[bpeRoundTrip]], pinned to
    * the trainer's exact semantics (the sentinel keeps the last-element
    * probe total on the empty accumulator). */
  private def bpeMergePass(syms: Column, l: String, r: String): Column = {
    val sentinel = array(lit(" "))
    aggregate(syms, array().cast("array<string>"), (acc, s) => {
      val last = element_at(concat(sentinel, acc), -1)
      when(last === l && s === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s)))
    })
  }

  def bpeTokenStats(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "bpeTokenStats: provide at least one merge")
    val words = explode(split(col(textCol), " ")).as("__w")
    val chars = split(col("__w"), "")
    val merged = merges.foldLeft(chars) {
      case (syms, (l, r)) => bpeMergePass(syms, l, r) }
    df.select(col(idCol), words)
      .where(length(col("__w")) > 0)
      .select(col(idCol), size(split(col("__w"), "")).cast("long").as("__nc"),
        size(merged).cast("long").as("__nt"))
      .groupBy(col(idCol))
      .agg(sum("__nc").as("n_chars"), sum("__nt").as("n_tokens"))
      .select(col(idCol), col("n_chars"), col("n_tokens"),
        round(col("n_chars").cast("double") / col("n_tokens"), 6)
          .as("chars_per_token"))
  }

  /** Tokenizer FAIRNESS mart — the per-group (per-language) aggregate
    * [[bpeTokenStats]]'s scaladoc promises: corpus-level fertility
    * `Σ chars / Σ tokens` per group (exact LONG sums, ONE division — not
    * a mean of per-doc ratios, which would weight short docs up), and
    * PARITY = own fertility / best fertility. A language the tokenizer
    * fragments (parity ≪ 1) pays proportionally more sequence length —
    * and therefore more training compute — for the same text; this mart
    * is the number multilingual tokenizer work optimizes. NULL groups
    * form their own cohort. Output: (group, n_docs, n_chars, n_tokens,
    * chars_per_token, parity), 6 dp.
    *
    * Scale shape: the per-doc stats are [[bpeTokenStats]]'s scan-stage
    * fold; one id-keyed join attaches the group, one group hash-agg
    * reduces, and the best-fertility scalar rides back broadcast. */
  def bpeFertilityByGroup(df: DataFrame, idCol: String, textCol: String,
                          groupCol: String,
                          merges: Seq[(String, String)]): DataFrame = {
    val per = bpeTokenStats(df, idCol, textCol, merges)
    val g = per.join(df.select(col(idCol), col(groupCol).as("__grp")),
        Seq(idCol))
      .groupBy("__grp")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("__ratio",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
    val best = g.agg(max("__ratio").as("__best"))
    g.crossJoin(broadcast(best))
      .select(col("__grp").as(groupCol), col("n_docs"), col("n_chars"),
        col("n_tokens"), round(col("__ratio"), 6).as("chars_per_token"),
        round(col("__ratio") / col("__best"), 6).as("parity"))
  }

  /** Tokenizer LOSSLESSNESS contract — [[bpeTokenStats]]'s round-trip
    * twin: for every word, the learned merges applied in training order
    * must concatenate back to the exact original word (BPE only ever
    * joins adjacent symbols, so detokenization is plain concatenation —
    * a fold bug, an ordering slip, or a lossy normalization in the apply
    * path flips `all_ok`). Output: (id, n_words, n_ok, all_ok), and the
    * oracle RE-DERIVES every token list rather than trusting the claim.
    *
    * Scale shape: identical to [[bpeTokenStats]] — merge literals ride
    * the plan, the check is a scan-stage fold + string compare, one
    * id-keyed hash-agg. */
  def bpeRoundTrip(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "bpeRoundTrip: provide at least one merge")
    val words = explode(split(col(textCol), " ")).as("__w")
    val chars = split(col("__w"), "")
    val merged = merges.foldLeft(chars) {
      case (syms, (l, r)) => bpeMergePass(syms, l, r) }
    df.select(col(idCol), words)
      .where(length(col("__w")) > 0)
      .select(col(idCol),
        (array_join(merged, "") === col("__w")).cast("long").as("__ok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("__ok").as("n_ok"))
      .select(col(idCol), col("n_words"), col("n_ok"),
        (col("n_words") === col("n_ok")).as("all_ok"))
  }

  /** CCNet-style per-language perplexity bucketing (Wenzek et al. 2020):
    * every document lands in its language's `head` / `middle` / `tail`
    * tercile by LM score — CCNet buckets by Wikipedia-LM perplexity and
    * trains mostly on head+middle; here the score is [[familiarity]]'s
    * no-model proxy (HIGHER = more familiar = lower-perplexity-like, so
    * `head` is the top tercile). Per language, the ⅓ and ⅔ familiarity
    * quantiles become value CUTS and rows classify by comparison —
    * CCNet's actual semantics (perplexity thresholds per language), not
    * an exact-count ntile, so ties land in one bucket deterministically.
    * Engine-exact: familiarity is an integer÷integer IEEE division
    * (bit-identical anywhere), the cuts interpolate identical inputs.
    * Output: (id, lang, n_tokens, familiarity 6 dp, ppl_bucket).
    *
    * Scale shape: one [[familiarity]] pass (token hash-agg + term join),
    * then TWO doubles per language from one exact-percentile agg,
    * broadcast back over the scored table — no window, no per-language
    * sort; the bucketing is a codegen'd scan-stage comparison. At
    * unbounded per-language cardinality swap the exact percentile for
    * `approx_percentile` (the q45 percentiles split) — the cut moves
    * within sketch error, the mechanism is identical. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, vocabK: Int): DataFrame = {
    val fam = graft.core.CacheRegistry.persist(
      familiarity(df, idCol, textCol, vocabK)
        .join(df.select(col(idCol), col(langCol)), Seq(idCol))
        .select(col(idCol), col(langCol), col("n_tokens"), col("familiarity")))
    val cuts = fam.groupBy(col(langCol)).agg(
      percentile(col("familiarity"), lit(1.0 / 3.0)).as("__c1"),
      percentile(col("familiarity"), lit(2.0 / 3.0)).as("__c2"))
    fam.join(broadcast(cuts), Seq(langCol))
      .select(col(idCol), col(langCol), col("n_tokens"),
        round(col("familiarity"), 6).as("familiarity"),
        when(col("familiarity") > col("__c2"), "head")
          .when(col("familiarity") > col("__c1"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Interpolated Kneser–Ney bigram language model trained on the corpus
    * itself — the smoothing that actually powers count-based LM filters
    * (KenLM-style): instead of add-one's uniform back-off
    * ([[bigramSurprisal]]'s model), probability mass discounted from seen
    * bigrams is redistributed by CONTINUATION counts, so "Francisco"
    * (frequent but only ever after "San") stops looking like a good
    * unigram continuation. With absolute discount `d`:
    *
    *   P(w₂|w₁) = (max(c(w₁w₂)−d, 0) + d · N₁₊(w₁·) · Pcont(w₂)) / c(w₁)
    *   Pcont(w₂) = N₁₊(·w₂) / |bigram types|
    *
    * Output: the top-`k` bigrams by count (ties on the pair string) with
    * (pair, c_pair, n_follow, n_precede, p_kn) — p_kn rounded 6 dp.
    *
    * Scale shape: the corpus collapses to the bigram-type table in ONE
    * kernel-generated pair stream + hash-agg (AdjPairs, map-side
    * combined); c(w₁), N₁₊(w₁·), N₁₊(·w₂) and the type total are three
    * small re-aggs OVER that reduced table (|types| ≪ N tokens), joined
    * back on its own keys; the type total rides in broadcast. The final
    * cut is TakeOrderedAndProject. Nothing rescans the corpus. */
  def kneserNeyBigrams(df: DataFrame, textCol: String, k: Int,
                       d: Double = 0.75): DataFrame = {
    require(k >= 1, s"kneserNeyBigrams: need k >= 1, got $k")
    require(d > 0.0 && d < 1.0, s"kneserNeyBigrams: need 0 < d < 1, got $d")
    val pc = graft.core.CacheRegistry.persist(
      df.where(size(split(col(textCol), " ")) >= 2)
        .select(explode(
          graft.functions.TextFunctions.adjPairs(col(textCol))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c_pair"))
        .withColumn("w1", element_at(split(col("pair"), " "), 1))
        .withColumn("w2", element_at(split(col("pair"), " "), 2)))
    val left = pc.groupBy("w1")
      .agg(sum("c_pair").as("c_w1"), count(lit(1)).as("n_follow"))
    val right = pc.groupBy("w2").agg(count(lit(1)).as("n_precede"))
    val types = pc.agg(count(lit(1)).as("__b"))
    pc.join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("pair"), col("c_pair"), col("n_follow"), col("n_precede"),
        round((greatest(col("c_pair").cast("double") - lit(d), lit(0.0)) +
          lit(d) * col("n_follow").cast("double") *
            (col("n_precede").cast("double") / col("__b").cast("double"))) /
          col("c_w1").cast("double"), 6).as("p_kn"))
      .orderBy(col("c_pair").desc, col("pair"))
      .limit(k)
  }

  /** Heaps'-law vocabulary-growth fit — the corpus-PLANNING curve beside
    * [[zipfAlpha]]'s frequency tail: how many NEW token types appear as
    * the corpus grows (`V(n) ≈ K·n^β`), i.e. "what does 10× more data
    * buy the tokenizer?". Documents are totally ordered by `idCol` via
    * the range-exchange rank (never a single-partition window); the
    * corpus is cut at `checkpoints` evenly spaced document boundaries
    * (`⌊j·D/cp⌋`, exact integer arithmetic) and each checkpoint reports
    * its cumulative doc/token counts and vocabulary (a term counts from
    * the bucket of its FIRST occurrence — min rank, since the bucket id
    * is monotone in the rank). β and K come from log–log OLS over the
    * checkpoint points: ln() values snap to 6-dp micro-integer LONGS
    * before the order-sensitive sums (exact products < 2⁶³), so the
    * closed-form slope is one double expression over identical inputs on
    * any engine. Consume inside `CacheRegistry.scoped` (rank device).
    * Output: one row per checkpoint — (ckpt, n_docs, n_tokens, vocab,
    * beta, k_coef), the fit repeated on every row, 6 dp.
    *
    * Scale shape: one range exchange to rank the corpus (the same
    * sampled-boundary shuffle a global sort pays), one token explode →
    * (term) hash-agg for first-occurrence buckets, one doc-level
    * hash-agg for per-bucket doc/token totals; everything after is
    * bounded by `checkpoints` rows. */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String,
               checkpoints: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(checkpoints >= 2,
      s"heapsLaw: need checkpoints >= 2, got $checkpoints")
    val docs = df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        size(split(col(textCol), " ")).cast("long").as("__ntok"))
    val ranked = graft.core.CacheRegistry.persist(
      graft.ops.Layout.globalRank(docs, "__id", "__id", rankCol = "__r"))
    val d = ranked.agg(coalesce(max("__r"), lit(0L))).head().getLong(0)
    require(d >= 1, "heapsLaw: no documents to fit")
    val cp = math.min(checkpoints.toLong, d)
    // bucket of rank r = ceil(r·cp/D): exact integer division both engines
    val bucket = expr(s"(__r * $cp + $d - 1) div $d")
    val perBucketDocs = ranked
      .groupBy(bucket.as("__j"))
      .agg(count(lit(1)).as("__docs"), sum("__ntok").as("__toks"))
    val firstBucket = ranked
      .select(bucket.as("__jj"), explode(split(col("__t"), " ")).as("__term"))
      .groupBy("__term").agg(min("__jj").as("__fj"))
      .groupBy(col("__fj").as("__j")).agg(count(lit(1)).as("__new"))
    // ≤ cp rows from here on: the single-partition cumsum is bounded
    val w = Window.orderBy(col("__j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perBucketDocs.join(firstBucket, Seq("__j"), "left")
      .select(col("__j"), sum("__docs").over(w).as("n_docs"),
        sum("__toks").over(w).as("n_tokens"),
        sum(coalesce(col("__new"), lit(0L))).over(w).as("vocab"))
    val xm = round(log(col("n_tokens").cast("double")) * lit(1e6))
      .cast("long")
    val ym = round(log(col("vocab").cast("double")) * lit(1e6)).cast("long")
    val fit = pts.where(col("n_tokens") > 0 && col("vocab") > 0)
      .select(xm.as("__x"), ym.as("__y"))
      .agg(count(lit(1)).as("__k"), sum("__x").as("__sx"),
        sum("__y").as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val kD = col("__k").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val num = kD * col("__sxy").cast("double") - sx * sy
    val den = kD * col("__sxx").cast("double") - sx * sx
    val beta = num / den
    val fitRow = fit.select(
      when(col("__k") >= 2 && den > 0, round(beta, 6)).as("beta"),
      when(col("__k") >= 2 && den > 0,
        round(exp((sy - beta * sx) / kD / lit(1e6)), 6)).as("k_coef"))
    pts.select(col("__j").as("ckpt"), col("n_docs"), col("n_tokens"),
        col("vocab"))
      .crossJoin(broadcast(fitRow))
  }

  /** Burrows' Delta — the STYLOMETRY drift gauge (Burrows 2002): over
    * the corpus's `topK` most frequent terms, each group's relative
    * term frequencies are z-scored against the across-group panel
    * (population mean/SD per term, zero counts included via the full
    * group×term panel), and a group's Delta is the mean |z| — the
    * classic "whose style sits furthest from the house style" scalar
    * (a shifted crawl, a template farm, machine-generated text).
    * Relative frequencies snap to 6 dp micro-integer LONGS, so per-term
    * panel moments are exact integer sums and every z is one IEEE
    * expression; per-group |z| sums are micro-snapped before the final
    * mean (the anovaTail rule). Terms with zero across-group variance
    * carry no signal and are excluded from every group's mean. A null
    * group is its own cohort (null-safe panel join). Output: (group,
    * n_terms, delta), 6 dp.
    *
    * Scale shape: one token hash-agg for the vocabulary cut, one
    * (group, term) hash-agg, then a |groups|×topK broadcast panel with
    * term-keyed window moments — the corpus text is scanned once. */
  def burrowsDelta(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 2, s"burrowsDelta: need topK >= 2, got $topK")
    val toks = df.where(col(textCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__term"))
    val gt = graft.core.CacheRegistry.persist(
      toks.groupBy(col("__g"), col("__term"))
        .agg(count(lit(1)).as("__c")))
    val vocab = gt.groupBy("__term").agg(sum("__c").as("__tf"))
      .orderBy(col("__tf").desc, col("__term")).limit(topK)
      .select(col("__term"))
    val groups = gt.groupBy("__g").agg(sum("__c").as("__ntok"))
    // full group x vocab panel, zero counts included; null-safe group key
    val gtR = gt.select(col("__g").as("__gg"), col("__term").as("__tt"),
      col("__c"))
    val panel = groups.crossJoin(broadcast(vocab))
      .join(gtR, col("__g") <=> col("__gg") && col("__term") === col("__tt"),
        "left")
      .select(col("__g"), col("__term"), col("__ntok"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    // 6dp-snapped relative frequency: exact integer panel moments
    val fm = round(col("__c").cast("double") / col("__ntok").cast("double")
      * lit(1e6)).cast("long")
    val wt = Window.partitionBy(col("__term"))
    val staged = panel.select(col("__g"), col("__term"), fm.as("__fm"))
      .select(col("__g"), col("__term"), col("__fm"),
        count(lit(1)).over(wt).as("__k"),
        sum("__fm").over(wt).as("__sf"),
        sum(col("__fm") * col("__fm")).over(wt).as("__sf2"))
    val kD = col("__k").cast("double")
    val meanT = col("__sf").cast("double") / kD
    val varT = col("__sf2").cast("double") / kD - meanT * meanT
    val z = (col("__fm").cast("double") - meanT) / sqrt(varT)
    staged.where(col("__sf2").cast("double") * kD >
        col("__sf").cast("double") * col("__sf").cast("double"))
      .select(col("__g"),
        round(abs(z) * lit(1e6)).cast("long").as("__zm"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n_terms"), sum("__zm").as("__sz"))
      .select(col("__g").as(groupCol), col("n_terms"),
        round(col("__sz").cast("double") /
          (col("n_terms").cast("double") * lit(1e6)), 6).as("delta"))
  }
}
