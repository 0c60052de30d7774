package graft.ops

import org.apache.spark.sql.DataFrame
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
    val stats = termStats(df, idCol, textCol)
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

  /** One BPE-style merge-candidate step: counts of ADJACENT token pairs
    * across the corpus, cut to the top-`k` (ties on the pair string, so
    * the cut is total-ordered). Iterating this — count pairs, merge the
    * argmax, re-tokenize — is exactly tokenizer training; one step is the
    * engine-side primitive, and it is what dominates the cost at corpus
    * scale (the merge itself touches only the matched pair).
    *
    * Scale shape: the pair stream is generated in the scan stage
    * (`transform` over the token array — no shuffle), then ONE hash-agg
    * on the pair with map-side combine; the top-k cut is
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val ts = df.select(split(col(textCol), " ").as("ts"))
      .where(size(col("ts")) >= 2) // sequence(0, -1) would yield [0, -1]
    ts.select(explode(transform(
        sequence(lit(0), size(col("ts")) - 2),
        i => concat_ws(" ", element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Inverted index (term → postings), the retrieval-side product of a
    * corpus: per term its document frequency and the first `cap` postings
    * by ascending doc id, emitted EXPLODED as (term, df_docs, slot,
    * doc_id) rows rather than array cells — the layout a downstream
    * sharded index loader consumes, and one that never materializes an
    * unbounded per-term array. `df_docs` counts ALL matching documents
    * (pre-cap), so idf stays exact even where postings are truncated.
    *
    * Scale shape: (doc, term) distinct → hash-agg; the per-term cap is a
    * window keyed on `term` — partitioned, so it scales with the term
    * count, and the `cap` bound keeps hub terms (stop words) from
    * emitting unbounded postings. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String, cap: Int): DataFrame = {
    val dt = df
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("term"))
      .distinct()
    val dfDocs = dt.groupBy("term").agg(count(lit(1)).as("df_docs"))
    dt.withColumn("slot",
        row_number().over(Window.partitionBy("term").orderBy("doc")).cast("long"))
      .where(col("slot") <= cap)
      .join(dfDocs, "term")
      .select(col("term"), col("df_docs"), col("slot"), col("doc").as(idCol))
  }

  /** Per-document top-`k` terms by TF-IDF. The idf is the RAW ratio
    * `n_docs / df` (no logarithm): ln() is libm-dependent and not
    * bit-identical across engines, while IEEE division is — so the score
    * `tf * n_docs / df` reproduces exactly on any engine, which keeps the
    * operator oracle-checkable. Ranking per document is a window over the
    * doc key (partitioned — scales with the corpus); ties break on the
    * term. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val dt = docTermCounts(df, idCol, textCol)
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
}
