package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise vector sum as a native aggregate (`graft_vec_dsum`) —
  * the centroid/mean primitive for embedding columns.
  *
  * The declarative alternative (posexplode → groupBy(group, pos) →
  * decimal sum → collect_list → re-sort) expands every vector into
  * `dim` shuffle rows and needs two aggregation levels; at 100 TB ×
  * 64–4096 dims that dim× row expansion IS the job. This aggregate
  * keeps vectors whole: per-partition buffers accumulate element-wise,
  * partial aggregation map-side-combines, and the shuffle carries one
  * `dim`-element state per group — the same reduction in shuffled rows
  * the word-count map-side combine gives, but for vector means.
  *
  * Exactness/determinism: each element is rounded once to a scale-15
  * decimal (mirroring the `cast("decimal(30,15)")` of the declarative
  * path) and summed in exact BigDecimal arithmetic — addition is
  * associative and commutative, so the result is bit-identical under
  * ANY partitioning or merge order, unlike a double accumulator.
  * Evaluates to array<double> of the exact sums (one final rounding
  * per element); divide by `count(*)` for the mean.
  *
  * Null/ragged handling: null vectors and vectors containing a null
  * element are SKIPPED (they carry no direction — same contract as the
  * norm>0 prep filter in SimilaritySearch); pair `count` filters with
  * the same predicate if exact member counts matter. The first
  * non-null vector fixes the dimension; a later mismatch throws rather
  * than silently truncating a centroid. */
case class VecDecimalSum(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[JBigDecimal]] {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[JBigDecimal] = Array.empty

  /** Mirrors Spark's cast(double -> decimal(30,15)) bit-for-bit:
    * Decimal(Double) parses Double.toString (the shortest decimal
    * form), not the exact binary expansion — the two round scale-15
    * ties differently, and hash-stable parity with the declarative
    * posexplode path requires Spark's choice. */
  private def toDec(x: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(x))
      .setScale(15, RoundingMode.HALF_UP)

  override def update(buf: Array[JBigDecimal],
                      input: InternalRow): Array[JBigDecimal] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return buf; i += 1 }
    val out =
      if (buf.isEmpty) Array.fill(n)(JBigDecimal.ZERO)
      else if (buf.length == n) buf
      else throw new IllegalArgumentException(
        s"graft_vec_dsum: dimension mismatch (${buf.length} vs $n)")
    i = 0
    while (i < n) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = out(i).add(toDec(x))
      i += 1
    }
    out
  }

  override def merge(buf: Array[JBigDecimal],
                     other: Array[JBigDecimal]): Array[JBigDecimal] = {
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else if (buf.length != other.length)
      throw new IllegalArgumentException(
        s"graft_vec_dsum: dimension mismatch (${buf.length} vs ${other.length})")
    else {
      var i = 0
      while (i < buf.length) { buf(i) = buf(i).add(other(i)); i += 1 }
      buf
    }
  }

  override def eval(buf: Array[JBigDecimal]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(buf.map(_.doubleValue()))

  override def serialize(buf: Array[JBigDecimal]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { d =>
      val unscaled = d.unscaledValue().toByteArray
      out.writeInt(unscaled.length)
      out.write(unscaled)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[JBigDecimal] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n) {
      val len = bb.getInt
      val raw = new Array[Byte](len)
      bb.get(raw)
      new JBigDecimal(new java.math.BigInteger(raw), 15)
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_vec_dsum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
