package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Per-source corpus "data card" (p11) — the report a training-data
  * pipeline publishes alongside every corpus drop: volume, exact
  * duplication, token mass, length percentiles, quality posture, and
  * the dominant token, one row per source.
  *
  * Every field is deterministic arithmetic, so the whole card is
  * oracle-exact — including the percentiles, which go through the
  * t34 QuantileSketch (engine-exact bucket math) rather than
  * `percentile`/`approx_percentile`:
  *
  *   - n_docs, tokens: plain counts/sums (token count = t3's
  *     whitespace convention);
  *   - n_distinct / dup_frac: exact distinct of md5(text) — the d1
  *     exact-dedup key (at 100 TB swap in the d6 KMV sketch for
  *     bounded state; the card's SCHEMA doesn't change, which is the
  *     point of reporting an estimate-shaped column);
  *   - p50/p90 chars: QuantileSketch (mergeable, bounded, ≤1.6 %);
  *   - avg_quality: t2 score, decimal-summed (order-independent);
  *   - gopher_keep_frac: t33's composite gate pass rate;
  *   - top_token: argmax by (count, token) via a combinable
  *     max-struct — vocabulary-sized state, no window.
  *
  * Shape: three aggregations over one scan family — the per-source
  * base (map-side partials), the sketch build (bucket table), the
  * token argmax (vocab-bounded) — joined on the tiny per-source key.
  * At 1000 sources the joined frames are KB-sized; every heavy stage
  * is combinable. */
object CorpusStats {

  def report(docs: DataFrame): DataFrame = {
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      sum(TextOps.wsTokenCount(col("text"))).as("tokens"),
      (sum(TextOps.qualityScore(col("text")).cast("decimal(10,6)"))
        .cast("double") / count(lit(1))).as("avg_quality"),
      (sum(when(TextOps.gopherShape(col("text")).getField("keep"), 1L)
        .otherwise(0L)).cast("double") / count(lit(1)))
        .as("gopher_keep_frac"))
      .withColumn("dup_frac",
        (col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"))
    val lengths = QuantileSketch.groupQuantiles(
      docs.select(col("source"), col("n_chars")), Seq("source"), "n_chars",
      Seq("p50_chars" -> 0.5, "p90_chars" -> 0.9))
    val top = docs
      .select(col("source"), explode(split(trim(col("text")), " +")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(max(struct(col("cnt"), col("tok"))).as("m"))
      .select(col("source"), col("m.tok").as("top_token"),
        col("m.cnt").as("top_token_cnt"))
    base.join(lengths, Seq("source")).join(top, Seq("source"))
      .select("source", "n_docs", "n_distinct", "dup_frac", "tokens",
        "p50_chars", "p90_chars", "avg_quality", "gopher_keep_frac",
        "top_token", "top_token_cnt")
      .orderBy("source")
  }
}
