package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into overlapping fixed-size
  * token windows — the complement of [[Packing]] (packing joins short
  * docs up to a budget; chunking cuts long docs down to one). Standard
  * prep for context-window-bounded training and for embedding long
  * documents piecewise.
  *
  * Scale shape: pure per-row generate-and-explode in the scan stage — no
  * shuffle, no state; output size is input tokens × (window/stride)
  * overlap factor, linear in the corpus.
  */
object Chunking {

  /** Cut each document into whitespace-token windows of `window` tokens,
    * starting every `stride` tokens (stride < window ⇒ overlapping
    * chunks). Every token lands in ≥1 chunk: starts are 0, stride, 2·stride,
    * …, up to the smallest start covering the tail; a document of ≤ window
    * tokens yields exactly one chunk. Output: one row per (doc, chunk)
    * with the chunk index, its text, and its token count. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkByTokens: need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    val nTok = size(toks).cast("long")
    // number of stride-steps AFTER the first chunk: ceil((nTok-window)/stride).
    // Column./ is DOUBLE division in Spark — cast back to long (exact for
    // any realistic token count; truncation == floor for positives).
    val extra = when(nTok <= window, lit(0L))
      .otherwise(((nTok - window + (stride - 1)) / stride).cast("long"))
    df.select(col(idCol), toks.as("__toks"), nTok.as("__n"),
        explode(sequence(lit(0L), extra)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)), " ").as("chunk_text"),
        least(lit(window.toLong), col("__n") - col("chunk_id") * stride)
          .as("n_chunk_tokens"))
  }

  /** Deterministic T5-style span-corruption plan: for each document, the
    * merged token spans a denoising objective would mask. Token position
    * `p` opens a span iff `md5(id|p) mod startMod = 0` (expected noise
    * density ≈ `mean_span/startMod`); its length is `1 + md5(id|p|L)
    * mod maxSpan`, clipped at the document end; overlapping or adjacent
    * spans merge into maximal islands (T5 treats consecutive masked
    * tokens as ONE sentinel span). md5-derived, so the mask plan is
    * replay-stable across runs, engines, and repartitioning — the same
    * property the split/sampling family builds on — instead of an RNG
    * the trainer can't reproduce. Output: one row per merged span
    * (id, n_tokens, span_start, span_end, span_tokens), 0-based
    * inclusive positions; unmasked documents emit nothing.
    *
    * Scale shape: ENTIRELY scan-stage — the start positions are a
    * higher-order `filter` over the position sequence, the island merge
    * is a higher-order `aggregate` (fold) over the per-doc span array
    * (bounded by doc length), and the only row growth is the final
    * explode of merged spans. No shuffle, no window, no join; the
    * oracle's gaps-and-islands window formulation is the equivalence
    * proof, not the plan. */
  def spanCorruptionPlan(df: DataFrame, idCol: String, textCol: String,
                         startMod: Int, maxSpan: Int): DataFrame = {
    import org.apache.spark.sql.Column
    require(startMod >= 2, s"spanCorruptionPlan: need startMod >= 2, got $startMod")
    require(maxSpan >= 1, s"spanCorruptionPlan: need maxSpan >= 1, got $maxSpan")
    val n = size(split(col(textCol), " "))
    val idStr = col(idCol).cast("string")
    def m(s: Column, mod: Int): Column =
      pmod(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), lit(mod))
    val starts = filter(sequence(lit(0), n - 1),
      p => m(concat(idStr, lit("|"), p.cast("string")), startMod) === 0)
    val spans = transform(starts, p => struct(
      p.as("s"),
      least(n - 1, p +
        m(concat(idStr, lit("|"), p.cast("string"), lit("|L")), maxSpan)
          .cast("int")).as("e")))
    // fold-merge overlapping/adjacent spans; the sentinel keeps the
    // last-element probe total on the empty accumulator (ANSI element_at
    // would throw on it), and the probe itself decides merge-vs-append
    val sentinel = array(struct(lit(-2).as("s"), lit(-2).as("e")))
    val merged = aggregate(spans,
      array().cast("array<struct<s:int,e:int>>"),
      (acc, sp) => {
        val last = element_at(concat(sentinel, acc), -1)
        when(sp.getField("s") <= last.getField("e") + 1,
          concat(slice(acc, lit(1), size(acc) - 1), array(struct(
            last.getField("s").as("s"),
            greatest(last.getField("e"), sp.getField("e")).as("e")))))
          .otherwise(concat(acc, array(sp)))
      })
    df.select(col(idCol), n.as("n_tokens"), explode(merged).as("__sp"))
      .select(col(idCol), col("n_tokens"),
        col("__sp.s").as("span_start"), col("__sp.e").as("span_end"),
        (col("__sp.e") - col("__sp.s") + 1).as("span_tokens"))
  }

  /** Context-length truncation loss curve — the design table for picking
    * a training context window: for each candidate length L, how many
    * documents get cut (`n > L`) and what fraction of the corpus' tokens
    * a truncate-at-L policy throws away (`Σ max(0, n−L) / Σ n`). Read it
    * against [[chunkByTokens]]: the tokens-lost column is exactly what
    * chunking (instead of truncating) would recover at that L. All
    * counts are exact LONG sums; the two ratios are single divisions,
    * 6 dp. One row per L: (context_len, n_docs, docs_truncated,
    * pct_docs_truncated, total_tokens, tokens_lost, pct_tokens_lost).
    *
    * Scale shape: ONE corpus scan computes every L's conditional
    * aggregates side by side (no per-L rescan, no grid cross-join), then
    * a literal-stack unpivot over the ≤ |lengths| result columns. */
  def truncationLoss(df: DataFrame, idCol: String, textCol: String,
                     lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ >= 1),
      s"truncationLoss: need lengths >= 1, got $lengths")
    val ls = lengths.distinct.sorted
    val n = size(split(col(textCol), " ")).cast("long")
    val aggs = Seq(count(lit(1)).as("__d"),
      coalesce(sum(col("__n")), lit(0L)).as("__t")) ++
      ls.flatMap { l =>
        Seq(sum(when(col("__n") > l, 1L).otherwise(0L)).as(s"__dt$l"),
          coalesce(sum(when(col("__n") > l, col("__n") - l).otherwise(0L)),
            lit(0L)).as(s"__tl$l"))
      }
    val wide = df.select(n.as("__n")).agg(aggs.head, aggs.tail: _*)
    // explode-unpivot the single aggregate row: one scan total, not one
    // per candidate length
    val stacked = wide.select(col("__d").as("n_docs"),
        col("__t").as("total_tokens"),
        explode(array(ls.map(l => struct(lit(l).as("context_len"),
          col(s"__dt$l").as("docs_truncated"),
          col(s"__tl$l").as("tokens_lost"))): _*)).as("__x"))
      .select(col("__x.context_len").as("context_len"), col("n_docs"),
        col("__x.docs_truncated").as("docs_truncated"),
        col("total_tokens"), col("__x.tokens_lost").as("tokens_lost"))
    stacked.where(col("n_docs") > 0)
      .select(col("context_len"), col("n_docs"), col("docs_truncated"),
        round(col("docs_truncated").cast("double") /
          col("n_docs").cast("double"), 6).as("pct_docs_truncated"),
        col("total_tokens"), col("tokens_lost"),
        round(col("tokens_lost").cast("double") /
          col("total_tokens").cast("double"), 6).as("pct_tokens_lost"))
  }
}
