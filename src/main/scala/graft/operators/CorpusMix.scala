package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing under a token budget — the "data mixture" step of a
  * training-data pipeline: from each stratum (language, source,
  * domain...) keep a deterministic pseudo-random prefix of documents
  * whose cumulative token count stays under that stratum's budget.
  *
  * Determinism: documents are ranked by a fixed multiplicative-hash
  * permutation of the id (Knuth's 2654435761 mod 1e9+7 — plain integer
  * arithmetic, so an external SQL engine reproduces the exact same
  * sample; no engine-specific RNG or hash). Rank ties break on the id.
  *
  * Scale shape (r11): `SUM() OVER (PARTITION BY stratum ORDER BY
  * rank)` would drag a mega-stratum ("en" is half of any LLM corpus)
  * through ONE task's sort. Instead the cumsum is two-level: the rank
  * is a hash permutation and therefore UNIFORM on [0, p), so fixed
  * arithmetic range-buckets `rank·N/p` split every stratum evenly with
  * no sampling pass — (stratum, bucket) sums are a partial-agg
  * combinable aggregate, their per-stratum exclusive prefix is a
  * window over ≤ `numBuckets` tiny rows, and the within-bucket window
  * runs on stratum/N-sized groups. Everything stays declarative (no
  * jobs at plan-construction time) and the integers are identical to
  * the single-window formulation. At larger corpus scale raise
  * `numBuckets` (groups shrink ∝ 1/N; the offset table grows only to
  * strata·N tiny rows). The greedy prefix rule (`cumulative tokens
  * BEFORE this doc < budget`) admits at most one budget-crossing
  * document per stratum, the standard greedy knapsack-prefix
  * semantics.
  */
object CorpusMix {

  /** Bucket count sized for ~`targetRows` rows per (stratum, bucket)
    * window task: 1 for small inputs — where the whole corpus fits one
    * task's sort and the two-level machinery only costs — growing
    * linearly with the corpus so the per-task cap holds at any scale
    * (r12, VERDICT r11 item 7: sf0.1's 5 000 docs pay the 1024-bucket
    * overhead for strata that fit in one task a thousand times over).
    * One count job, but column-pruned to count-star over the scan —
    * parquet answers it from footer metadata. */
  def autoBuckets(df: DataFrame, targetRows: Long = 1L << 16): Int = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val n = df.count()
    math.min(1L << 20, math.max(1L, (n + targetRows - 1) / targetRows)).toInt
  }

  /** Documents of `df` kept under per-stratum token budgets.
    * `budgets` maps stratum value → token budget; strata not listed get
    * `defaultBudget`. Adds `__rank` (the permutation rank) and
    * `__cum_before` (tokens admitted before this doc).
    *
    * Id range: the id is reduced mod 1e9+7 BEFORE the multiply —
    * mathematically identical to (id·K) mod p by modular arithmetic,
    * but the intermediate product stays below 2^62 for ANY 64-bit id,
    * so the rank can never silently wrap under non-ANSI Spark (where
    * an overflowing plain multiply wraps while ANSI engines error — a
    * cross-engine divergence). Any SQL engine with C-style `%`
    * replays it exactly. */
  def tokenBudgetSample(df: DataFrame, strataCol: String, idCol: String,
                        tokenCol: String, budgets: Map[String, Long],
                        defaultBudget: Long, numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val p = 1000000007L
    val rank = ((col(idCol) % lit(p)) * lit(2654435761L)) % lit(p)
    val budget = budgets.foldRight(lit(defaultBudget): org.apache.spark.sql.Column) {
      case ((s, b), els) => when(col(strataCol) === s, lit(b)).otherwise(els)
    }
    // rank < p and numBuckets ≤ 2^31, so rank·N < 2^62: no overflow;
    // the mapping is monotone in rank, so (bucket, rank, id) and
    // (rank, id) induce the same total order within a stratum
    // NULL tokens count as 0 — exactly what the single-window
    // formulation did (SUM skips nulls, the row itself stays eligible);
    // without the coalesce a null __tok would null __cum_before and
    // silently DROP the row. Negative counts would break the
    // max(__incl)=bucket-sum identity below (the cumsum would not be
    // monotone), so they fail fast instead of corrupting the sample.
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    val base0 = df.withColumn("__rank", rank)
      .withColumn("__tok", when(tok < 0, raise_error(concat(
          lit("tokenBudgetSample: negative token count for id "),
          col(idCol).cast("string")))).otherwise(tok))
    // numBuckets == 1 (the autoBuckets small-corpus case): the offset
    // table would be one zero row per stratum — skip it and run the
    // plain per-stratum exclusive-prefix window. Only reachable when
    // the caller has bounded the input (autoBuckets keeps every
    // stratum under targetRows), so the keyed window is NOT a hub
    // risk here; identical rows to the bucketed path by construction
    // (PipelineOpsSpec pins the differential).
    if (numBuckets == 1) {
      val w1 = Window.partitionBy(col(strataCol))
        .orderBy(col("__rank"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      return base0
        .withColumn("__cum_before", coalesce(sum(col("__tok")).over(w1), lit(0L)))
        .filter(col("__cum_before") < budget)
        .drop("__tok")
    }
    val base = base0
      .withColumn("__bkt", (col("__rank") * lit(numBuckets.toLong)) / lit(p))
    // ONE full-frame shuffle: the within-bucket inclusive cumsum runs
    // first, and the per-bucket totals fall out of it as max(__incl)
    // — an aggregate over the ALREADY (stratum, bucket)-partitioned
    // window output, so no second exchange of the corpus; only the
    // tiny (strata·N)-row offset table shuffles again for its
    // per-stratum prefix and the join-back
    val wIn = Window.partitionBy(col(strataCol), col("__bkt"))
      .orderBy(col("__rank"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = base.withColumn("__incl", sum(col("__tok")).over(wIn))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withCum.groupBy(col(strataCol), col("__bkt"))
      .agg(max(col("__incl")).as("__bs"))
      .withColumn("__off", coalesce(sum(col("__bs")).over(wOff), lit(0L)))
      .drop("__bs")
    withCum.join(offsets, Seq(strataCol, "__bkt"))
      .withColumn("__cum_before", col("__off") + col("__incl") - col("__tok"))
      .filter(col("__cum_before") < budget)
      .drop("__bkt", "__off", "__tok", "__incl")
  }
}
