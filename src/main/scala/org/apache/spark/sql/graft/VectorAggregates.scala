package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Element-wise SUM over an `array<float>` column, accumulated in double —
  * the aggregate an embedding pipeline needs for centroid computation
  * (k-means steps, cell statistics) that Spark has no built-in for.
  *
  * The composable formulation (`posexplode` → `groupBy(key, pos)` →
  * `sum` → re-assemble) shuffles N·d rows — every element of every vector
  * crosses the network. This aggregate keeps one `Array[Double]` buffer per
  * group and merges partials, so map-side partial aggregation reduces the
  * shuffle to (groups × d) doubles: at 100 TB the difference between
  * shuffling the whole dataset and shuffling the (tiny) centroid table.
  * VectorAggSpec pins equivalence against the posexplode formulation.
  *
  * Rows may have differing lengths (buffer grows to the longest; missing
  * trailing elements contribute 0 — same as the posexplode formulation,
  * where shorter vectors simply have no row for that position). NULL rows
  * are ignored; an all-NULL (or empty) group evaluates to NULL.
  */
case class FloatVectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf =
        if (buffer.length >= n && buffer.length > 0) buffer
        else java.util.Arrays.copyOf(buffer, math.max(n, buffer.length))
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getFloat(i).toDouble
        i += 1
      }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * java.lang.Double.BYTES)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / java.lang.Double.BYTES)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FloatVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FloatVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FloatVectorSumAgg =
    copy(child = newChild)
}

/** Weighted element-wise SUM: Σ rows of `weight · vec` over an
  * `array<float>` column with a per-row double weight — the matrix-free
  * Gram-vector product `Xᵀ(Xw)` at the core of power iteration (and of any
  * scatter-style weighted centroid update). Each element contributes
  * `((double) vec[i]) * weight`; accumulation and merge are in double,
  * exactly like [[FloatVectorSumAgg]], so the shuffle carries one d-long
  * buffer per group instead of N·d exploded rows. NULL vectors and NULL
  * weights are ignored; an empty group evaluates to NULL.
  */
case class FloatVectorWeightedSumAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), DoubleType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_weighted_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v == null || w == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val wd = w.asInstanceOf[Double]
      val n = arr.numElements()
      val buf =
        if (buffer.length >= n && buffer.length > 0) buffer
        else java.util.Arrays.copyOf(buffer, math.max(n, buffer.length))
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getFloat(i).toDouble * wd
        i += 1
      }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * java.lang.Double.BYTES)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / java.lang.Double.BYTES)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FloatVectorWeightedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FloatVectorWeightedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorWeightedSumAgg =
    copy(left = newLeft, right = newRight)
}
