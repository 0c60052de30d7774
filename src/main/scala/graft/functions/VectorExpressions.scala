package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.{ColumnBridge, FloatVectorDot, FloatVectorSumAgg, FloatVectorWeightedSumAgg}

/** Column-level API over the native vector expressions (implementation in
  * `org.apache.spark.sql.graft.VectorExpressions` — the expression-authoring
  * surface is `private[sql]`). */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, codegen'd (see
    * [[org.apache.spark.sql.graft.FloatVectorDot]]). */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm — dot with itself; compute ONCE per row before any pairwise
    * join so the N² stage only pays one dot product per pair. */
  def normF(a: Column): Column = sqrt(dotF(a, a))

  /** Element-wise SUM aggregate over `array<float>` → `array<double>`
    * (see [[org.apache.spark.sql.graft.FloatVectorSumAgg]]): one buffer per
    * group with map-side partial aggregation — the shuffle carries
    * (groups × dim) doubles instead of the N·d rows a posexplode/groupBy
    * formulation moves. */
  def vectorSumF(a: Column): Column =
    ColumnBridge.column(
      FloatVectorSumAgg(ColumnBridge.expression(a)).toAggregateExpression())

  /** Element-wise Σ `w·a` aggregate over `array<float>` with a per-row
    * double weight `w` — the matrix-free Gram-vector product of power
    * iteration (see [[org.apache.spark.sql.graft.FloatVectorWeightedSumAgg]]);
    * same (groups × dim) shuffle bound as [[vectorSumF]]. */
  def vectorWeightedSumF(a: Column, w: Column): Column =
    ColumnBridge.column(
      FloatVectorWeightedSumAgg(
        ColumnBridge.expression(a), ColumnBridge.expression(w))
        .toAggregateExpression())
}
