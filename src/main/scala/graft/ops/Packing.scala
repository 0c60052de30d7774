package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign each document a position in a
  * fixed-token-budget training bin (context window), so the materialization
  * step can concatenate each bin's documents into one training sequence.
  *
  * Exact bin packing is inherently sequential; the distributed form is
  * greedy-by-order packing WITHIN independent shards: documents are
  * deterministically sharded (md5 of the id — same engine-portable device
  * as [[Sampling.md5Bucket]]), each shard orders its documents by id, and
  * a running token total assigns `bin = floor(tokens_before / budget)`.
  * Documents whose span crosses a bin boundary are the materializer's
  * decision (truncate, or spill into the next bin) — this operator fixes
  * WHERE every document starts, deterministically.
  *
  * Scale shape: one window per shard (shuffle on the shard key, one sort
  * per shard) — shards bound both the sort size and the parallelism, so
  * raising `nShards` scales the pack linearly; no global ordering
  * bottleneck. Replays and engine migrations reproduce identical bins.
  */
object Packing {

  /** Assign (shard, bin, start_offset) to every row. `tokenCol` must be a
    * non-null integer token count; rows larger than `budgetTokens` get a
    * bin to themselves (still deterministic — flagged via `oversize`). */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
                 budgetTokens: Long, nShards: Int): DataFrame = {
    require(budgetTokens > 0, "packGreedy: budgetTokens must be positive")
    require(nShards > 0, "packGreedy: nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
    val w = Window.partitionBy("shard").orderBy(idCol)
    df.withColumn("shard", shard)
      .withColumn("__cum_after", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("start_offset", col("__cum_after") - col(tokenCol).cast("long"))
      .withColumn("bin", floor(col("start_offset") / budgetTokens))
      .withColumn("oversize", col(tokenCol).cast("long") > budgetTokens)
      .drop("__cum_after")
  }

  /** Materialize [[packGreedy]] bins into training sequences: one row per
    * (shard, bin) with the documents concatenated in offset order. The
    * per-bin collect is bounded by the token budget (a bin holds at most
    * budget/min-doc-tokens documents), so the `collect_list` is small by
    * construction — this is NOT an unbounded group collect. One shuffle on
    * (shard, bin); deterministic output (offsets are unique within a bin,
    * so the sort is total). */
  def materializeBins(packed: DataFrame, textCol: String,
                      separator: String = "\n\n"): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        concat_ws(separator,
          transform(
            array_sort(collect_list(struct(col("start_offset"), col(textCol)))),
            s => s.getField(textCol))).as("packed_text"))

  /** Padding-bucket planning mart — the batching cost table for a trainer
    * that pads each batch to a fixed length: every document assigned to
    * the smallest power-of-two bucket holding its token count, aggregated
    * to (bucket, n_docs, sum_tokens, padded_tokens, waste_ratio). A high
    * waste ratio in a hot bucket is the signal to add a bucket boundary
    * or route those documents through [[packGreedy]] instead.
    *
    * `pow(2, ceil(log2(n)))` is engine-exact: log2 is exact at powers of
    * two and never within FP error of an integer elsewhere at realistic
    * lengths. Scale shape: scan-stage token count + bucket, one hash-agg
    * with map-side partials. */
  def paddingBuckets(df: DataFrame, textCol: String): DataFrame = {
    val n = size(split(col(textCol), " ")).cast("long")
    val bucket = pow(lit(2.0), ceil(log2(n.cast("double")))).cast("long")
    df.select(n.as("__n"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) - col("sum_tokens") /
          (col("bucket") * col("n_docs")).cast("double"), 6).as("waste_ratio"))
  }

  /** Sorted ("smart") batching: documents ordered by token count and cut
    * into fixed-size batches of `batchSize`, each padded to ITS OWN max —
    * the training-efficiency layout where random batching pads every
    * batch to its longest straggler (length-sorted neighbors ≈ equal
    * lengths → near-zero padding except at batch boundaries). Emits the
    * per-batch cost table: (batch_id, n_docs, max_tokens, sum_tokens,
    * padded_tokens, waste_ratio 6 dp) — compare Σ padded against
    * [[paddingBuckets]]' power-of-two layout or an unsorted baseline to
    * price the shuffle the sort costs. Ties break on the id (total
    * order, engine-deterministic); the tail batch may be short.
    *
    * Scale shape: the global length order comes from
    * [[graft.ops.Layout.globalRank]]'s range-partitioned device (never
    * a single-partition window), then ONE batch-keyed hash-agg. */
  def sortedBatches(df: DataFrame, idCol: String, textCol: String,
                    batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"sortedBatches: need batchSize >= 1, got $batchSize")
    val toks = df.select(col(idCol).as("__id"),
      size(split(col(textCol), " ")).cast("long").as("__n"))
    graft.ops.Layout.globalRank(toks, "__n", "__id", rankCol = "__rank")
      // exact integer division (the writePlan rule) — never a double divide
      .withColumn("batch_id", expr(s"(__rank - 1) div $batchSize"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"), max("__n").as("max_tokens"),
        sum("__n").as("sum_tokens"))
      .select(col("batch_id"), col("n_docs"), col("max_tokens"),
        col("sum_tokens"),
        (col("max_tokens") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) - col("sum_tokens") /
          (col("max_tokens") * col("n_docs")).cast("double"), 6)
          .as("waste_ratio"))
  }

  /** Bin-composition diagnostics for [[packGreedy]] — the training-order
    * health check the packing literature warns about: a context window
    * whose documents all come from one source trains on correlated text
    * (the gradient sees a mini-domain, not the mixture), and id-ordered
    * greedy packing can silently produce exactly that when ids cluster
    * by source. Per (shard, bin): document count, distinct groups, the
    * group entropy `−Σ (c/n)·ln(c/n)` (0 = single-source bin,
    * ln(n_groups) = perfectly mixed), and the majority share. Null
    * groups form their own cohort (consistent with the engine-wide
    * convention). Read it next to [[materializeBins]]: bins with
    * `top_share` ≈ 1 on a hot source are the signal to salt the pack
    * order (shard on a different key) before materializing.
    *
    * Scale shape: one (shard, bin, group)-keyed hash-agg over the packed
    * frame, then a (shard, bin)-partitioned window to attach bin totals
    * (≤ |groups| rows per bin) and ONE re-agg — the documents never
    * reshuffle after the pack's own window. */
  def binMixing(packed: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBin = Window.partitionBy("shard", "bin")
    packed.groupBy(col("shard"), col("bin"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum("__c").over(byBin))
      .groupBy("shard", "bin")
      .agg(max("__n").as("n_docs"),
        count(lit(1)).as("n_groups"),
        // abs() normalizes IEEE −0.0 from single-group bins (−Σ of one
        // zero term) so both engines emit +0.0
        abs(round(-sum((col("__c").cast("double") / col("__n").cast("double")) *
          log(col("__c").cast("double") / col("__n").cast("double"))), 6))
          .as("entropy"),
        round(max("__c").cast("double") / max("__n").cast("double"), 6)
          .as("top_share"))
  }
}
