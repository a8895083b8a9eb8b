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
  * Scale shape: ONE shuffle — the per-stratum window sort. The greedy
  * prefix rule (`cumulative tokens BEFORE this doc < budget`) admits at
  * most one budget-crossing document per stratum, the standard greedy
  * knapsack-prefix semantics. Strata counts are bounded (languages /
  * sources), so per-partition windows are the natural partitioning at
  * any corpus size; a skewed mega-stratum would use a two-level
  * (salted prefix-sum) variant of the same rule.
  */
object CorpusMix {

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
                        defaultBudget: Long): DataFrame = {
    val rank = ((col(idCol) % lit(1000000007L)) * lit(2654435761L)) % lit(1000000007L)
    val w = Window.partitionBy(col(strataCol)).orderBy(rank, col(idCol))
    val budget = budgets.foldRight(lit(defaultBudget): org.apache.spark.sql.Column) {
      case ((s, b), els) => when(col(strataCol) === s, lit(b)).otherwise(els)
    }
    df.withColumn("__rank", rank)
      .withColumn("__cum_before",
        coalesce(sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("__cum_before") < budget)
  }
}
