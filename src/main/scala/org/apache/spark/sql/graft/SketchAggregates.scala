package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-set sketch: the k smallest DISTINCT
  * hash strings seen per group, as a sorted `array<string>`.
  *
  * Why another sketch when HLL++ exists: HLL registers estimate ONE set's
  * cardinality and only merge by union — they cannot answer intersection
  * questions. KMV sketches of two sets support Jaccard / containment /
  * intersection ESTIMATES with plain array expressions over the two
  * arrays (Bar-Yossef et al. 2002; Beyer et al. 2007, "distinct sampling"):
  * the k smallest of A ∪ B is `slice(array_sort(array_union(a, b)), 1, k)`,
  * and the share of those minima present in both sketches estimates
  * Jaccard with stderr ≈ 1/√k. That turns the exact cross-source overlap
  * matrix ([[graft.ops.Dedup.sourceOverlap]]) — whose distinct-shingle
  * self-join dominates at corpus scale — into a per-source aggregate of
  * k strings plus an O(|sources|²) driver-sized join.
  *
  * Mergeable by construction (k-min of k-mins = k-min of the union), so
  * partial aggregation stays map-side and the shuffle carries ≤ k strings
  * per group. Duplicates cannot change a minimum, so the input needs NO
  * pre-distinct — feed the raw exploded stream. Inputs are expected to be
  * fixed-width hex hashes (md5): ordering is lexicographic, which for
  * equal-width hex equals numeric hash order; NULL inputs are ignored.
  * Groups with no rows evaluate to an empty array.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"kmv_sketch: need k >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def offer(buf: java.util.TreeSet[String], s: String): Unit =
    if (buf.size < k) { buf.add(s); () }
    else if (s.compareTo(buf.last) < 0 && buf.add(s)) { buf.remove(buf.last); () }

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: java.util.TreeSet[String], b: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeUTF(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[String]()
    var i = 0
    while (i < n) { buf.add(in.readUTF()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** The `k` smallest DISTINCT long values per group, as a sorted
  * `array<bigint>` — the bounded order-statistics aggregate behind
  * per-group top/bottom-k WITHOUT a window sort.
  *
  * The window formulation (`row_number() over (partition by g order by v)
  * <= k`) SORTS every group's full value list to keep k of them — on a
  * hub group (a stop word's postings, a hot key's events) that is a sort
  * and shuffle of the whole group for a k-row answer. This aggregate
  * keeps a k-capped ordered buffer per group instead: map-side partials
  * combine (k-min of k-mins = k-min of the union), so the shuffle
  * carries ≤ k longs per group and nothing is ever globally sorted.
  * Duplicates cannot change a minimum (no pre-distinct needed); NULLs
  * are ignored; an empty group evaluates to an empty array. For
  * "largest k" feed the negated value. */
case class LongMinKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"min_k_long: need k >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.LongType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_long"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.remove(buf.last); () }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongMinKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongMinKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongMinKAgg =
    copy(child = newChild)
}

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982): at most `k`
  * (item, count) counters per group, as `array<struct<item, est_count>>`
  * sorted by est_count DESC then item ASC.
  *
  * The deterministic frequency sketch completing the mergeable-summary
  * family (HLL → distinct count, KMV → intersections, approx_percentile →
  * quantiles, THIS → frequent items): every item with true count
  * > N/(k+1) is GUARANTEED present, and every estimate undercounts by at
  * most N/(k+1) (est ≤ true ≤ est + N/(k+1)). That bound survives merging
  * (Agarwal et al. 2012, "Mergeable Summaries": sum matching counters,
  * then subtract the (k+1)-th largest count and drop non-positives), so
  * partial aggregation stays map-side and the shuffle carries ≤ k
  * counters per group — where the exact vocabulary/term-stats path
  * shuffles every distinct term. Use it for top-terms dashboards and
  * stopword discovery at corpus scale; use [[graft.ops.Corpus]] when
  * exact counts are worth the full hash-agg.
  *
  * The summary content depends on encounter order (inherent to MG), so
  * two runs may report different TAILS; the guarantee above holds for
  * every run. NULL inputs are ignored; empty groups evaluate to an empty
  * array. Update is O(1) amortized via the shared-decrement offset trick
  * (decrementing all k counters = raising the buffer's offset). */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries: need k >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("est_count",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  /** Decrement-all = evict zero-weight counters explicitly (k is small:
    * the O(k) sweep amortizes over the k increments that preceded it). */
  private def decrementAll(buf: java.util.HashMap[String, Array[Long]]): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getValue()(0) -= 1L
      if (e.getValue()(0) <= 0L) it.remove()
    }
  }

  private def offer(buf: java.util.HashMap[String, Array[Long]],
                    item: String, by: Long): Unit = {
    val slot = buf.get(item)
    if (slot != null) slot(0) += by
    else if (buf.size < k) buf.put(item, Array(by))
    else {
      // absorb the new item against the decrement pool: `by` copies of
      // (insert-then-decrement-all). net: survivors lose min(by, their
      // count); the new item keeps whatever exceeds the smallest counter
      var remaining = by
      while (remaining > 0L && buf.size >= k) {
        var minC = Long.MaxValue
        val it = buf.values().iterator()
        while (it.hasNext) { val c = it.next()(0); if (c < minC) minC = c }
        val step = math.min(remaining, minC)
        val it2 = buf.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          e.getValue()(0) -= step
          if (e.getValue()(0) <= 0L) it2.remove()
        }
        remaining -= step
      }
      if (remaining > 0L) buf.put(item, Array(remaining))
    }
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
                      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: java.util.HashMap[String, Array[Long]],
                     b: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    // Agarwal et al. merge: sum matching counters (offer handles both the
    // match and the evict-by-decrement when a overflows k)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(a, e.getKey, e.getValue()(0))
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    val sorted = entries.sortBy(t => (-t._2, t._1))
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c): Any
    })
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), Array(in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** Count-min sketch (Cormode & Muthukrishnan 2005): a depth × width
  * counter matrix answering POINT-FREQUENCY queries — the family member
  * the others can't replace (HLL → distinct, KMV → intersections,
  * Misra–Gries → frequent items; THIS → "how often did THIS item
  * occur", for any item, after the fact). Estimates never undercount
  * (`est = min_r matrix[r][h_r(item)] ≥ true`) and overcount by at most
  * the colliding mass in the best row.
  *
  * Unlike Misra–Gries, the merge (element-wise add) is EXACT, so the
  * sketch is identical under any partitioning and engine — row `r`
  * hashes an item by hex window `r` of its md5 (so depth ≤ 4), making
  * the whole matrix reproducible cross-engine, oracle-checkable, and
  * safe for map-side partial aggregation (the shuffle carries
  * depth·width longs per group, never the item stream). Query the
  * sketch with plain array expressions (min over the depth cells) —
  * see graft.ops.Sketches.cmEstimate. NULLs are ignored. Output:
  * `array<long>` of length depth·width, row-major. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 4,
    s"count_min: need 1 <= depth <= 4 (md5 has 4 independent hex windows), got $depth")
  require(width >= 1, s"count_min: need width >= 1, got $width")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = TextKernels.md5Hex(v.asInstanceOf[UTF8String].toString)
      var r = 0
      while (r < depth) {
        val idx = (java.lang.Long.parseLong(hex.substring(r * 8, r * 8 + 8), 16)
          % width).toInt
        buf(r * width + idx) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}
