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
