package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting") — the
  * candidate generator of the exact-substring dedup operator
  * (`Dedup.exactSubstrPairs`, after Lee et al. 2021's ExactSubstr).
  *
  * Rolling k-gram hashes (base-31 polynomial mod 1e9+7 over code
  * points — the `Fingerprint` family) are winnowed: each window of `w`
  * consecutive hashes selects its minimum (rightmost on ties), each
  * selected position emitted once. The paper's guarantee makes the
  * downstream operator EXACT, not approximate: any substring shared by
  * two documents with length ≥ w + k − 1 contains a window fully
  * inside it on both sides, both sides select the same (aligned)
  * minimum from identical content, so at least one selected
  * fingerprint is shared. Density is ~2/(w+1): only ~2-5% of positions
  * leave the scan — the reduction that makes substring dedup
  * shuffle-viable at 100 TB (all-positions n-gram join is the job you
  * can't run).
  *
  * Returns array<struct<pos:int, h:long>> with 1-based `pos` (aligned
  * with SQL `substring`); fewer than w hashes → the global minimum
  * (every doc of length ≥ k yields ≥ 1 anchor); length < k → empty.
  * Positions are code-point-based like substring/length. */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1, s"graft_winnow k must be >= 1, got $k")
  require(w >= 1, s"graft_winnow w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Winnow.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  private val P = 1000000007L
  private val B = 31L

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString
    // code points, so positions line up with substring()/length()
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    // forward rolling hash: h(i+1) = (h(i) - cp(i)*B^(k-1)) * B + cp(i+k)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * B % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = ((h - cps(i - 1) * pow % P + P * P) % P * B + cps(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (m <= w) {
      // shorter than one window: emit the global rightmost minimum
      var best = 0
      i = 1
      while (i < m) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      out += new GenericInternalRow(Array[Any](best + 1, hashes(best)))
    } else {
      var last = -1
      var start = 0
      while (start + w <= m) {
        var best = start
        i = start + 1
        while (i < start + w) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
        if (best != last) {
          out += new GenericInternalRow(Array[Any](best + 1, hashes(best)))
          last = best
        }
        start += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Longest common prefix LENGTH of two strings, in code points — the
  * match-extension primitive of exact-substring verification (extend a
  * shared anchor right with lcp, left with lcp over reversed
  * prefixes). Single fused loop; the HOF equivalent pays a lambda +
  * two substrings per compared character. */
case class LongestCommonPrefix(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lcp expects (string, string), got $other")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcp"

  override def nullSafeEval(a: Any, b: Any): Any =
    LongestCommonPrefix.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.LongestCommonPrefix.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongestCommonPrefix {
  /** Shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val sa = a.toString; val sb = b.toString
    val na = sa.length; val nb = sb.length
    var i = 0; var cp = 0
    while (i < na && i < nb) {
      val ca = sa.codePointAt(i)
      if (ca != sb.codePointAt(i)) return cp
      cp += 1
      i += Character.charCount(ca)
    }
    cp
  }
}
