package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernel (SURVEY §2.4). Vectors are array<float>
  * columns widened to double at the edge; math is higher-order-function
  * based (`zip_with`/`aggregate`) so it stays columnar and codegen-
  * friendly — no UDF serialization per row.
  */
object VectorOps {

  /** Sequential left-to-right dot product in double (higher-order-
    * function form — portable, but interpreted per element). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native codegen'd dot product (graft.plans.VecDot) — identical
    * result (same summation order), ~no allocation. Requires
    * GraftExtensions on the session (Verify/Bench/tests set it). */
  def fastDot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))
  def fastNorm(a: Column): Column = sqrt(fastDot(a, a))

  /** Cosine similarity with optional precomputed norms (precompute per
    * row before a pair join: O(n) norms instead of O(n²)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    fastDot(a, b) / (na * nb)

  /** Widen an array<float> to array<double> once, at the scan edge. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Random-hyperplane LSH signature: nBits sign bits of dot products
    * with pseudo-random ±1 hyperplanes derived from
    * xxhash64(bitOffset + bit, dim) — deterministic, no stored model.
    * Packs to a long bucket id. Native codegen'd expression
    * (graft.plans.LshBucketSig): the ±1 signs are cached per JVM, each
    * row pays one primitive multiply-add loop. `bitOffset` selects an
    * independent hash table for multi-table LSH. Requires
    * GraftExtensions (Verify/Bench/tests set it). */
  def lshBucket(v: Column, nBits: Int, bitOffset: Int = 0): Column =
    call_function("graft_lsh_bucket", v, lit(nBits), lit(bitOffset))

  /** Multi-probe bucket list: the primary bucket plus `nProbes − 1`
    * neighbors with the lowest-|margin| sign bits flipped — the bits
    * most likely to differ for a true near neighbor (Lv et al., VLDB
    * 2007). Margins are per-hyperplane dots, computed HOF-style: this
    * runs on the (small) query side only; candidates keep the single
    * native bucket. Probing multiplies recall without re-bucketing the
    * corpus — the knob to turn when more tables are too expensive. */
  def lshProbeBuckets(v: Column, nBits: Int, nProbes: Int,
                      bitOffset: Int = 0): Column = {
    require(nProbes >= 1 && nProbes <= nBits, s"nProbes in [1, $nBits], got $nProbes")
    val margins = transform(sequence(lit(0), lit(nBits - 1)), i =>
      aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, j) => x * when(xxhash64(i + bitOffset, j) % 2 === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x))
    val primary = lshBucket(v, nBits, bitOffset)
    // bits ranked by |margin| ascending: cheapest to flip first
    val ranked = array_sort(zip_with(margins, sequence(lit(0), lit(nBits - 1)),
      (m, i) => struct(abs(m).as("a"), i.as("i"))))
    val powers = array((0 until nBits).map(b => lit(1L << b)): _*)
    array((0 until nProbes).map {
      case 0 => primary
      case p => primary.bitwiseXOR(
        element_at(powers, element_at(ranked, p).getField("i") + 1))
    }: _*)
  }

  /** Portable higher-order-function form of `lshBucket` — same result
    * bit-for-bit (LshBucketSpec asserts it), interpreted per element:
    * keep for sessions without GraftExtensions and as the differential
    * oracle for the native expression. */
  def lshBucketHof(v: Column, nBits: Int, bitOffset: Int = 0): Column = {
    val bits = (0 until nBits).map { i =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, j) => x * when(xxhash64(lit(bitOffset + i), j) % 2 === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
