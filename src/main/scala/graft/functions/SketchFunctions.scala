package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, CountMinAgg, KmvSketchAgg, LongMinKAgg, MisraGriesAgg}

/** Column-level API over the native sketch aggregates (implementation in
  * `org.apache.spark.sql.graft.SketchAggregates`). */
object SketchFunctions {

  /** KMV distinct-set sketch: the `k` smallest distinct hash strings per
    * group as a sorted array — mergeable, intersection-capable (see
    * [[org.apache.spark.sql.graft.KmvSketchAgg]]). Feed md5-hex (or any
    * fixed-width hex) values; no pre-distinct needed. */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** The k smallest distinct longs per group as a sorted array — the
    * per-group bounded top-k that replaces a `row_number` window sort
    * (see [[org.apache.spark.sql.graft.LongMinKAgg]]); negate the input
    * for largest-k. */
  def minKLong(v: Column, k: Int): Column =
    ColumnBridge.column(
      LongMinKAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Misra–Gries heavy hitters: ≤ k (item, est_count) counters per group,
    * est_count-desc — every item with true count > N/(k+1) guaranteed
    * present, undercount ≤ N/(k+1), mergeable (see
    * [[org.apache.spark.sql.graft.MisraGriesAgg]]). */
  def misraGries(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k).toAggregateExpression())

  /** Count-min sketch: a depth×width counter matrix (row-major
    * `array<long>`) for point-frequency estimates that never undercount;
    * the element-wise merge is EXACT, so the matrix is identical under
    * any partitioning (see [[org.apache.spark.sql.graft.CountMinAgg]]).
    * Query with [[graft.ops.Sketches.cmEstimate]]. */
  def countMin(item: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(item), depth, width)
        .toAggregateExpression())
}
