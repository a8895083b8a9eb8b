package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable relative-error quantile sketch — the 100 TB companion to
  * [[ExactQuantile]] (exact, three passes) and `approx_percentile`
  * (KLL, nondeterministic across partitionings).
  *
  * Design: a log-linear histogram in the DDSketch / HdrHistogram
  * family (Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019; Tene's
  * HdrHistogram) with ONE deliberate deviation: buckets are anchored
  * at powers of two with 2^`subBits` linear sub-buckets per octave,
  * instead of powers of an arbitrary γ. That choice makes the bucket
  * of an integer value a pure INTEGER computation —
  *
  *   e  = floor(log2 x)  =  length(bin(x)) − 1          (string length)
  *   m  = (x · 2^s) div 2^e − 2^s            ∈ [0, 2^s)  (integer div)
  *   id = e · 2^s + m
  *
  * — no `ln()` anywhere, so the same value lands in the same bucket
  * in every engine and on every platform (IEEE `log` differs in the
  * last ulp across libms, which would flip boundary values between
  * buckets and break cross-engine reproducibility; that is why the
  * catalog's DuckDB oracle can replay this sketch EXACTLY while
  * `approx_percentile` is forever rows-only). The representative
  * value 2^e · (1 + (m + ½)/2^s) is a dyadic rational — every step of
  * its evaluation is exact in IEEE doubles, again engine-invariant.
  *
  * Guarantees:
  *   - relative error ≤ 2^−(s+1) per estimated quantile (the midpoint
  *     of a bucket is within half a sub-bucket width of any member,
  *     and every member is ≥ the octave base): s = 5 → ≤ 1.6 %;
  *   - fully mergeable with NO error growth: the sketch is a bucket →
  *     count table, merging is `+` (commutative, associative), so
  *     map-side partial aggregation applies and sketches built on
  *     disjoint shards/days/corpora combine into the identical table
  *     a single pass would have produced (order-independent —
  *     unlike KLL/t-digest whose compactions are merge-order
  *     sensitive);
  *   - bounded size: values in [1, 2^62) span < 62 · 2^s buckets, so
  *     a per-group sketch is ≤ ~2k rows at s = 5 whatever n is — the
  *     per-group quantile-extraction window is bounded by
  *     construction, never by group row count (hub-safe).
  *
  * Domain: non-negative integers < 2^(62−s) (0 gets a dedicated
  * bucket −1 with representative 0.0; negatives are rejected — counts
  * and lengths, the things one sketches at corpus scale, are ≥ 0).
  *
  * Rank convention: quantile q returns the representative of the
  * bucket holding the 0-based rank ⌊q·(n−1)⌋ order statistic —
  * the nearest-lower-rank value, against which the error gate in
  * QuantileSketchSpec measures.
  */
object QuantileSketch {

  /** Bucket id of non-negative integral `v` (−1 for 0). Pure integer
    * arithmetic — engine-exact; see object doc. */
  def bucketId(v: Column, subBits: Int = 5): Column = {
    require(subBits >= 0 && subBits <= 16, s"subBits out of range: $subBits")
    val s2 = 1L << subBits
    val x = v.cast("long")
    val e = (length(bin(x)) - 1).cast("int")
    // (x·2^s) >> e — pure integer shift (the SQL shiftright accepts a
    // column shift amount; the Scala wrapper doesn't, hence
    // call_function). No division, no doubles, no ulp anywhere.
    val m = call_function("shiftright", x * lit(s2), e) - s2
    when(x <= 0, lit(-1)).otherwise((e * s2 + m).cast("int"))
  }

  /** Representative (estimate) value of a bucket id: the sub-bucket
    * midpoint 2^e·(1 + (m+½)/2^s) — dyadic-exact in doubles. */
  def bucketValue(id: Column, subBits: Int = 5): Column = {
    val s2 = 1L << subBits
    val e = (id.cast("long") / lit(s2)).cast("long").cast("int")
    val m = pmod(id.cast("long"), lit(s2))
    when(id < 0, lit(0.0)).otherwise(
      pow(lit(2.0), e) * (lit(1.0) + (m.cast("double") + 0.5) / s2))
  }

  /** Build the sketch: one count per (group, bucket) — the mergeable,
    * persistable form (cf. the repo's other build/probe indexes). One
    * shuffle, map-side combine; output ≤ groups · 62·2^s rows. */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
            subBits: Int = 5): DataFrame = {
    val x = col(valueCol).cast("long")
    val guarded = when(x < 0, raise_error(concat(
        lit(s"QuantileSketch: negative value in $valueCol: "),
        x.cast("string")))).otherwise(x)
    df.select(groupCols.map(col) :+ guarded.as("__v"): _*)
      .withColumn("__bucket", bucketId(col("__v"), subBits))
      .groupBy(groupCols.map(col) :+ col("__bucket"): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Weighted build: bucket mass = Σ weight instead of row count —
    * e.g. token-weighted length percentiles ("the p90 of the corpus BY
    * TOKEN MASS"), the distribution a budget planner actually wants.
    * With integer weights this is EXACTLY `build` over the
    * weight-replicated rows (QuantileSketchSpec proves it), at
    * aggregation cost instead of blow-up cost; [[quantiles]] then
    * ranks by cumulative mass unchanged. Weights must be
    * non-negative; zero-weight rows contribute nothing. */
  def buildWeighted(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    weightCol: String, subBits: Int = 5): DataFrame = {
    val x = col(valueCol).cast("long")
    val w = col(weightCol).cast("long")
    val guarded = when(x < 0 || w < 0, raise_error(concat(
        lit(s"QuantileSketch: negative value/weight in $valueCol/$weightCol"),
        lit("")))).otherwise(x)
    df.select(groupCols.map(col) ++ Seq(guarded.as("__v"), w.as("__w")): _*)
      .withColumn("__bucket", bucketId(col("__v"), subBits))
      .groupBy(groupCols.map(col) :+ col("__bucket"): _*)
      .agg(sum(col("__w")).as("__cnt"))
      .filter(col("__cnt") > 0)
  }

  /** Merge sketches over the same group columns: union + re-sum.
    * Exact — bucket counts are commutative sums, so
    * merge(build(A), build(B)) ≡ build(A ∪ B) row-for-row. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("__bucket"): _*)
      .agg(sum(col("__cnt")).as("__cnt"))

  /** Extract quantile estimates per group from a built sketch.
    * `qs` are (outputColumn → q). The per-group cumsum window runs
    * over the bucket table — bounded by the bucket-count cap, not by
    * group size (see object doc), so a hot group costs what a cold
    * one does. */
  def quantiles(sketch: DataFrame, groupCols: Seq[String],
                qs: Seq[(String, Double)], subBits: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt"))
        .over(Window.partitionBy(groupCols.map(col): _*)))
    // rank r_q = floor(q·(n−1)); the winning bucket is the FIRST with
    // cum > r_q  ⇔  min bucket among those with cum ≥ r_q + 1 —
    // a combinable min-struct per group, no second window needed
    val aggs = qs.map { case (name, q) =>
      val rank = floor(lit(q) * (col("__n") - 1).cast("double")).cast("long")
      min(when(col("__cum") >= rank + 1,
        struct(col("__bucket")))).getField("__bucket").as(s"__b_$name")
    }
    val picked = cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    qs.foldLeft(picked) { case (d, (name, _)) =>
      d.withColumn(name, bucketValue(col(s"__b_$name"), subBits))
        .drop(s"__b_$name")
    }
  }

  /** One-shot convenience: build + quantiles. */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     qs: Seq[(String, Double)],
                     subBits: Int = 5): DataFrame =
    quantiles(build(df, groupCols, valueCol, subBits), groupCols, qs, subBits)
}
