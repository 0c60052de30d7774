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
}
