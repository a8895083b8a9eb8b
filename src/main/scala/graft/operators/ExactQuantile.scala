package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT quantiles with bounded memory — the sketch-to-exact pattern
  * (same family as t12's Misra-Gries recount): Spark's exact
  * `percentile` buffers the value multiset per group in executor
  * memory, which is fine per-language at sf0.1 and fatal on a
  * 10¹²-row column. This operator gets the SAME bit-exact
  * (n−1)·p-interpolated answer in three bounded passes:
  *
  *   1. one aggregation: n + an approx_percentile BRACKET [lo, hi]
  *      around the target rank (KLL sketch, rank error ≤ n/accuracy);
  *   2. one aggregation: exact ranks of the bracket (count below lo,
  *      count inside);
  *   3. exact `percentile` over ONLY the in-bracket slice — memory
  *      bounded by ~4n/accuracy rows by the sketch's rank guarantee,
  *      tunable independently of n — hitting the two order statistics
  *      that straddle rank (n−1)·p, interpolated with the same
  *      formula Spark/DuckDB use.
  *
  * The approx sketch only picks the BRACKET: any valid bracket yields
  * the identical exact result, so the output is deterministic and
  * partition-invariant even though approx_percentile itself is not
  * (ExactQuantileSpec asserts both). If the sketch's bracket misses
  * (pathological skew beyond its rank bound), the operator widens to
  * the full domain — correct, just memory-heavy — rather than erring.
  */
object ExactQuantile {

  /** Exact p-quantile of a numeric column (continuous/interpolated,
    * ≡ `percentile(col, p)` ≡ DuckDB `quantile_cont`). Returns the
    * value as Double. `accuracy` trades pass-3 memory for bracket
    * tightness (slice ≈ 4n/accuracy rows). */
  def quantileAt(df: DataFrame, valueCol: String, p: Double,
                 accuracy: Int = 10000): Double = {
    require(p >= 0 && p <= 1, s"p must be in [0,1], got $p")
    val v = col(valueCol).cast("double")
    val delta = 2.0 / accuracy
    val pLo = math.max(0.0, p - delta); val pHi = math.min(1.0, p + delta)
    val s1 = df.agg(
      count(v).as("n"),
      approx_percentile(v, lit(pLo), lit(accuracy)).as("lo"),
      approx_percentile(v, lit(pHi), lit(accuracy)).as("hi")).head()
    val n = s1.getLong(0)
    require(n > 0, "quantile of an empty (or all-null) column")
    if (n == 1L) return df.agg(max(v)).head().getDouble(0)
    val rank = (n - 1) * p // target: order stats floor(rank), ceil(rank)
    val k = math.floor(rank).toLong
    val frac = rank - k

    def attempt(lo: Double, hi: Double): Option[Double] = {
      val s2 = df.agg(
        sum(when(v < lo, 1L).otherwise(0L)).as("below"),
        sum(when(v >= lo && v <= hi, 1L).otherwise(0L)).as("m")).head()
      val below = s2.getLong(0); val m = s2.getLong(1)
      // both straddling order stats must land inside the slice
      val kHi = if (frac == 0.0) k else k + 1
      if (k < below || kHi >= below + m) return None
      // the straddling order statistics, picked DIRECTLY by global
      // rank (slice rank + below) — no computed-fraction percentile
      // whose q·(m−1) round-trip could drift an ulp. The one-task
      // window is the point: the slice IS the memory/sort budget,
      // sized by `accuracy`, independent of n.
      val w = org.apache.spark.sql.expressions.Window.orderBy("__v")
      val stats = df.filter(v >= lo && v <= hi).select(v.as("__v"))
        .withColumn("__rn", row_number().over(w).cast("long") + below - 1)
        .filter(col("__rn") === k || col("__rn") === kHi)
        .orderBy("__rn").select("__v").collect().map(_.getDouble(0))
      if (frac == 0.0) Some(stats.head)
      // Spark's percentile and DuckDB's quantile_cont both interpolate
      // as (higher − position)·lo + (position − lower)·hi — NOT the
      // algebraically-equal lo + (hi−lo)·frac, which rounds differently
      // (42 + 1·0.9 = 42.9 vs 0.1·42 + 0.9·43 = 42.900000000000006)
      else Some((kHi - rank) * stats(0) + (rank - k) * stats(1))
    }

    attempt(s1.getDouble(1), s1.getDouble(2)).getOrElse {
      // bracket missed (beyond the sketch's rank bound): widen to the
      // whole domain — pass 3 degrades to the memory-heavy exact path
      val mm = df.agg(min(v), max(v)).head()
      attempt(mm.getDouble(0), mm.getDouble(1)).get
    }
  }

  /** Convenience: several quantiles of one column (one bracket scan
    * each — callers wanting many quantiles of one modest column should
    * use plain `percentile(col, array(...))`). */
  def quantilesAt(df: DataFrame, valueCol: String, ps: Seq[Double],
                  accuracy: Int = 10000): Seq[Double] =
    ps.map(quantileAt(df, valueCol, _, accuracy))
}
