package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusMix, Decontaminate}

/** Decontamination + corpus-mix operators (SURVEY §2.8). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags planted eval overlap, not clean docs") {
    val evalDf = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "pack my box with five dozen liquor jugs right now")).toDF("doc_id", "text")
    val corpus = Seq(
      // contaminated: contains a full eval sentence
      (10L, "prefix text then the quick brown fox jumps over the lazy dog tonight and more"),
      // clean: no shared 8-gram
      (11L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq"),
      // partially contaminated: shares a shorter eval fragment
      (12L, "something about five dozen liquor jugs right here")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, evalDf, "doc_id", "text",
        k = 8, minShared = 3L)
      .orderBy("doc_id")
      .collect()
    val ids = got.map(_.getLong(0)).toSeq
    assert(ids.contains(10L), "fully planted doc must be flagged")
    assert(!ids.contains(11L), "clean doc must not be flagged")
    got.foreach { r =>
      val (shared, grams, contam) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(shared >= 3 && shared <= grams)
      assert(contam === shared.toDouble / grams)
    }
    // the planted doc contains the whole eval text → overlap dominated
    val planted = got.find(_.getLong(0) == 10L).get
    assert(planted.getLong(1) > 30, "full-sentence plant shares many 8-grams")
  }

  test("decontaminate broadcasts the eval side (corpus never shuffles on grams)") {
    val evalDf = Seq((1L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val corpus = Seq((2L, "qrstuvwxyz0123456789")).toDF("doc_id", "text")
    val plan = Decontaminate.overlap(corpus, evalDf, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side must broadcast-join, got:\n$plan")
  }

  test("tokenBudgetSample respects budgets with at most one overshoot doc") {
    val docs = (0L until 300L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", 10L + (i % 7)))
      .toDF("id", "src", "toks")
    val budgets = Map("a" -> 200L, "b" -> 350L)
    val kept = CorpusMix.tokenBudgetSample(docs, "src", "id", "toks", budgets, 100L)
    val bySrc = kept.groupBy("src")
      .agg(sum(col("toks")).as("tot"), max(col("toks")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((s, b) <- budgets) {
      val (tot, mx) = bySrc(s)
      assert(tot < b + mx, s"stratum $s: total $tot exceeds budget $b by more than one doc")
      assert(tot >= b.min(150 * 10), s"stratum $s underfilled: $tot vs budget $b")
    }
  }

  test("tokenBudgetSample rank is exact for any 64-bit id (no overflow wrap)") {
    // ids near 2^62: the pre-fix (id * K) % p long multiply wrapped
    // silently here (ADVICE r4); the mod-first form must equal the
    // exact BigInt value
    val big = Seq(0L, 1L, 1L << 40, (1L << 62) + 12345L, Long.MaxValue)
    val docs = big.map(i => (i, "a", 1L)).toDF("id", "src", "toks")
    val got = CorpusMix.tokenBudgetSample(docs, "src", "id", "toks", Map.empty, 1000L)
      .select("id", "__rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    big.foreach { i =>
      val expect = ((BigInt(i) * BigInt(2654435761L)) mod BigInt(1000000007L)).toLong
      assert(got(i) == expect, s"id $i: rank ${got(i)} != exact $expect")
    }
  }

  test("tokenBudgetSample is deterministic under repartitioning") {
    val docs = (0L until 500L)
      .map(i => (i, s"s${i % 3}", 5L + (i % 11))).toDF("id", "src", "toks")
    val a = CorpusMix.tokenBudgetSample(docs, "src", "id", "toks", Map.empty, 300L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = CorpusMix.tokenBudgetSample(docs.repartition(13), "src", "id", "toks",
        Map.empty, 300L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "sample must not depend on physical partitioning")
    assert(a.nonEmpty)
  }

  test("tokenBudgetSample single-bucket fast path is row-identical") {
    // the autoBuckets small-corpus branch (numBuckets == 1, plain
    // per-stratum window) must keep EXACTLY the bucketed path's rows,
    // including __rank and __cum_before
    val docs = (0L until 400L)
      .map(i => (i, s"s${i % 3}", if (i % 29 == 0) null
        else java.lang.Long.valueOf(5L + (i % 11))))
      .toDF("id", "src", "toks")
    def rows(n: Int) = CorpusMix.tokenBudgetSample(
        docs, "src", "id", "toks", Map("s0" -> 150L), 300L, numBuckets = n)
      .select("id", "src", "__rank", "__cum_before")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(rows(1) == rows(1024))
    assert(rows(1).nonEmpty)
  }

  test("autoBuckets: 1 for small inputs, linear growth, capped") {
    val small = (0L until 100L).map(i => (i, "a", 1L)).toDF("id", "src", "toks")
    assert(CorpusMix.autoBuckets(small) == 1)
    assert(CorpusMix.autoBuckets(small, targetRows = 30L) == 4)
  }
}
