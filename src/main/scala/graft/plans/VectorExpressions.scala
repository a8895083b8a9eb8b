package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two array<double> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),
  * 0d, +)`) allocates an intermediate array per row and evaluates its
  * lambdas interpreted — measured as the hot path of the ANN/near-dup
  * pair joins. This expression generates a tight primitive loop inside
  * whole-stage codegen: no allocation, no boxing, same left-to-right
  * summation order (so results — and the DuckDB oracle hashes — are
  * bit-identical to the HOF version).
  *
  * Preference order per SURVEY §4: built-in ops first; custom
  * `Expression` with doGenCode only where the built-ins can't express
  * the performance shape. This is that case.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _) => Some(FloatType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<double> or array<float> on both sides, " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  /** Float inputs are widened to double PER ELEMENT before the multiply
    * (explicit casts in both eval paths), so the result is bit-identical
    * to casting the whole array to array<double> first — float→double
    * conversion is exact — while the pair join that feeds this kernel
    * shuffles half the bytes. Sides are independent, so a float corpus
    * column dots against a double centroid literal without widening the
    * corpus. */
  private def leftIsFloat: Boolean = elemType(left.dataType).contains(FloatType)
  private def rightIsFloat: Boolean = elemType(right.dataType).contains(FloatType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  /** Length mismatch OR any null element → null, matching the HOF
    * formulation exactly (zip_with pads with null and a null product
    * nulls the whole sum) — a silently truncated or garbage-slotted
    * dot would corrupt similarity rankings undetectably. The null
    * parity is also what makes the RewriteDotProduct optimizer rule a
    * sound substitution on nullable-element arrays. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
      var s = 0.0
      i = 0
      while (i < n) {
        val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${if (leftIsFloat) s"((double) $a.getFloat($i))" else s"$a.getDouble($i)"}
         |      * ${if (rightIsFloat) s"((double) $b.getFloat($i))" else s"$b.getDouble($i)"};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering graft's native expressions; enable
  * with `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_minhash numHashes must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_minhash numHashes must be a literal")
        }
        MinHashSig(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketSig].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case l if l.foldable => l.eval() match {
            case i: Int => i
            case l2: Long => l2.toInt
            case other => throw new IllegalArgumentException(
              s"graft_lsh_bucket $what must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"graft_lsh_bucket $what must be a literal")
        }
        val nBits = intLit(children(1), "nBits")
        val offset = if (children.length > 2) intLit(children(2), "bitOffset") else 0
        LshBucketSig(children.head, nBits, offset)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_shingles k must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_shingles k must be a literal")
        }
        Shingles(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[Fingerprint].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => Fingerprint(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv_distinct"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_kmv_distinct k must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_kmv_distinct k must be a literal")
        }
        KmvSketch(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FreqItemsSketch].getName, "graft_freq_items"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_freq_items k must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_freq_items k must be a literal")
        }
        FreqItemsSketch(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchValues].getName, "graft_kmv_sketch"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_kmv_sketch k must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_kmv_sketch k must be a literal")
        }
        KmvSketchValues(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case l if l.foldable => l.eval() match {
            case i: Int => i
            case l2: Long => l2.toInt
            case other => throw new IllegalArgumentException(
              s"graft_winnow $what must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"graft_winnow $what must be a literal")
        }
        Winnow(children.head, intLit(children(1), "k"), intLit(children(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "graft_deflate_size"),
      (children: Seq[Expression]) => {
        val level =
          if (children.length < 2) 6
          else children(1) match {
            case e if e.foldable => e.eval() match {
              case i: Int => i
              case l: Long => l.toInt
              case other => throw new IllegalArgumentException(
                s"graft_deflate_size level must be an int literal, got $other")
            }
            case _ => throw new IllegalArgumentException(
              "graft_deflate_size level must be a literal")
          }
        DeflateSize(children.head, level)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lcp"),
      new ExpressionInfo(classOf[LongestCommonPrefix].getName, "graft_lcp"),
      (children: Seq[Expression]) =>
        LongestCommonPrefix(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dsum"),
      new ExpressionInfo(classOf[VecDecimalSum].getName, "graft_vec_dsum"),
      (children: Seq[Expression]) =>
        VecDecimalSum(children.head).toAggregateExpression()))
    // Spark's OWN bloom-filter expressions (the pair Catalyst injects
    // for runtime join filters), surfaced as session functions for the
    // BloomMembership operator: build = map-side-combining typed
    // aggregate, probe = codegen'd predicate. Values are xxhash64
    // longs on both sides (BloomMembership applies the hash).
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))))
  }
}
