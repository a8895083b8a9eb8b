package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native MinHash signature: numHashes min-hashes over an
  * array<string> of shingles with the double-hashing family
  * h_i(s) = (h1(s) + i·h2(s)) mod p.
  *
  * The higher-order-function formulation pays interpreted lambda
  * dispatch per (shingle × lane) plus one boxed accumulator array
  * allocation per shingle; this expression is two murmur hashes per
  * shingle and a primitive long[] nested loop — the whole signature in
  * one codegen'd pass. Hash family is IDENTICAL to the HOF fallback
  * (`Dedup.minhashSignatureHof`): h1 = murmur3(s, 42) = `hash(s)`,
  * h2 = murmur3(s, h1) = `hash(s, s)` — so signatures do not depend on
  * whether GraftExtensions is registered (MinHashFamilySpec).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val s = arr.getUTF8String(j)
      val b = s.getBytes
      val h1 = Murmur3_x86_32.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42)
      val h1p = MinHashSig.posMod(h1, P)
      val h2p = MinHashSig.posMod(
        Murmur3_x86_32.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, h1), P)
      var i = 0
      while (i < numHashes) {
        val v = (h1p + i * h2p) % P
        if (v < acc(i)) acc(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bytes = ctx.freshName("bytes")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v")
      s"""
         |long[] $acc = new long[$numHashes];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  byte[] $bytes = $a.getUTF8String($j).getBytes();
         |  int ${h1}raw = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |    $bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, $bytes.length, 42);
         |  long $h1 = graft.plans.MinHashSig.posMod(${h1}raw, ${P}L);
         |  long $h2 = graft.plans.MinHashSig.posMod(
         |    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, $bytes.length, ${h1}raw), ${P}L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = ($h1 + $i * $h2) % ${P}L;
         |    if ($v < $acc[$i]) $acc[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Static helper shared by eval and generated code. */
  def posMod(x: Long, p: Long): Long = { val m = x % p; if (m < 0) m + p else m }
}
