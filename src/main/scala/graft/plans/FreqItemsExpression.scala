package graft.plans

import java.nio.ByteBuffer
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native Spark aggregate —
  * bounded-state heavy-hitter candidates in ONE pass over the corpus.
  *
  * State: at most k (item, counter) pairs. Stream update is classic
  * Misra-Gries (increment if present, insert if room, else decrement
  * every counter); merge is the mergeable-summaries form (Agarwal et
  * al. 2012): sum counters, then subtract the (k+1)-th largest counter
  * from all and drop the non-positive — the error bound n/(k+1) is
  * preserved under arbitrary merge trees, so map-side partial
  * aggregation is safe on any partitioning.
  *
  * Guarantee (what makes the sketch USEFUL at 100 TB): every item with
  * true count > n/(k+1) is in the final candidate set, no matter how
  * the data was partitioned. The candidate set itself is
  * order-dependent (like any MG sketch), so exactness is restored
  * downstream: re-count JUST the ≤k candidates with a broadcast
  * semi-join and filter by the exact threshold — the result is then
  * the exact heavy-hitter set, deterministically (see
  * `t12_heavy_hitters`).
  *
  * Output: candidate items sorted lexicographically (determinism of
  * the array layout given the same state).
  */
case class FreqItemsSketch(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JHashMap[UTF8String, java.lang.Long]] {
  require(k >= 2, s"graft_freq_items needs k >= 2 counters, got $k")

  // analysis-time type guard (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items needs a STRING column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): JHashMap[UTF8String, java.lang.Long] =
    new JHashMap[UTF8String, java.lang.Long]()

  override def update(buf: JHashMap[UTF8String, java.lang.Long],
                      input: InternalRow): JHashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = buf.get(key)
      if (cur != null) buf.put(key, java.lang.Long.valueOf(cur.longValue + 1L))
      else if (buf.size < k) // clone: eval may reuse buffers
        buf.put(key.clone(), java.lang.Long.valueOf(1L))
      else {
        // full and absent: decrement all, evicting zeros
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1L))
        }
      }
    }
    buf
  }

  override def merge(buf: JHashMap[UTF8String, java.lang.Long],
                     other: JHashMap[UTF8String, java.lang.Long]): JHashMap[UTF8String, java.lang.Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue
        else java.lang.Long.valueOf(cur.longValue + e.getValue.longValue))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next().longValue; i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue <= sub) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - sub))
      }
    }
    buf
  }

  override def eval(buf: JHashMap[UTF8String, java.lang.Long]): Any = {
    val items = new Array[UTF8String](buf.size)
    buf.keySet().toArray(items)
    java.util.Arrays.sort(items.asInstanceOf[Array[Object]])
    new GenericArrayData(items.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: JHashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    var n = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) { n += 12 + it0.next().getKey.numBytes() }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(e.getValue.longValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[UTF8String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JHashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_freq_items"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
