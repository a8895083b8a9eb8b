package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a native Spark
  * aggregate — the "novel sketch" slot of the operator brief, and the
  * library's demonstration of the distributed aggregation contract
  * (update / merge / serialize) that scalar Expressions don't cover.
  *
  * Sketch: keep the k smallest xxhash64 values of the input (unsigned
  * order, duplicates collapse). With fewer than k distinct hashes the
  * count is exact; otherwise the k-th minimum's normalized position u
  * estimates density and (k−1)/u estimates the distinct count
  * (Bar-Yossef et al. 2002). Relative error ≈ 1/√(k−2).
  *
  * Properties that matter at 100 TB: fixed k·8-byte state per group
  * regardless of input size; merge is a set-union-truncate, so partial
  * aggregation map-side-combines and the result is bit-identical
  * under ANY partitioning/order (min-sets are order-free) — unlike
  * mergeable-but-order-sensitive float accumulators. Unlike HLL++
  * (`approx_count_distinct`), two KMV sketches also support
  * intersection estimates (Jaccard over the union sketch) — the
  * near-dup corpus-overlap use case.
  */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 8, s"KMV needs k >= 8 for a usable estimate, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Stored values are hash ^ Long.MinValue so natural signed order
    * equals unsigned hash order. */
  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val f = XxHash64Function.hash(v, child.dataType, 42L) ^ Long.MinValue
      buf.add(f)
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      // u = unsigned position of the k-th minimum in [0, 1)
      val u = (buf.last.toDouble - Long.MinValue.toDouble + 1.0) /
        math.pow(2.0, 64)
      (k - 1).toDouble / u
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Same KMV state, but evaluating to the raw sketch (the ascending
  * flipped-hash array) instead of the estimate — the mergeable form
  * for set-operation estimates across groups/datasets
  * (`SketchOps.kmvUnionEstimate` / `kmvJaccardEstimate`). */
case class KmvSketchValues(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 8, s"KMV needs k >= 8, got $k")

  private val base = KmvSketch(child, k)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    base.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    base.update(buf, input)
  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    base.merge(buf, other)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    base.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    base.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
