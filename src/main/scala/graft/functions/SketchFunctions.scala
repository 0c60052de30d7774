package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, KmvSketchAgg}

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
}
