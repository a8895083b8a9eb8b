package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement — Efraimidis–Spirakis
  * priority sampling (A-ES, IPL 2006): each row draws a uniform
  * u ∈ (0,1] and gets key u^(1/w); the k largest keys are EXACTLY a
  * weighted sample without replacement. The corpus-curation use: pick
  * k documents ∝ token count / quality weight, in one pass, with no
  * per-group state.
  *
  * Scale shape: the key is a map-side column expression and the
  * selection is `orderBy(key).limit(k)` — Spark executes that as a
  * distributed TakeOrdered (per-partition top-k, then a k-row merge on
  * the driver); nothing shuffles, nothing collects but the k winners.
  * The keyed form is also mergeable across corpora: the union's top-k
  * is the top-k of the per-corpus top-k's, so incremental ingest keeps
  * a k-row priority index instead of resampling (same pattern as the
  * KMV sketch).
  *
  * Determinism: u is hash-derived from (id, salt) — reruns and
  * re-partitionings pick the identical sample; vary `salt` for fresh
  * draws. Comparison uses ln(u)/w (monotone in u^(1/w)), which never
  * under/overflows for any positive weight. */
object Sampling {

  /** ln(u)/w sort key (maximize): u hash-uniform in (0,1] from
    * (xxhash64(id, salt) mod 2^52 + 1) / 2^52, mantissa-exact. */
  private[graft] def esKey(id: Column, weight: Column, salt: Column): Column = {
    val h = pmod(xxhash64(id, salt), lit(1L << 52))
    val u = (h + lit(1L)).cast("double") / lit((1L << 52).toDouble)
    log(u) / weight.cast("double")
  }

  /** Top-k weighted sample without replacement. Rows with
    * non-positive or null weight are excluded (they have no selection
    * mass). Ties (possible only via hash collision) break toward the
    * lower id, so the result is a deterministic function of
    * (ids, weights, salt, k). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es_key", esKey(col(idCol), col(weightCol), lit(salt)))
      .orderBy(desc("__es_key"), asc(idCol))
      .limit(k)
      .drop("__es_key")
  }
}
