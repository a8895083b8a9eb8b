package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The native graft_minhash expression and the portable HOF fallback
  * must produce IDENTICAL signatures (same murmur3 double-hashing
  * family) — otherwise results silently change with whether
  * GraftExtensions is registered (VERDICT r1 item 5). Also pins the
  * blocked-simhash candidate contract: 16-bit blocks lose no pair
  * within the maxDist bound and generate far fewer candidates than
  * 8-bit chunks on a random corpus. */
class MinHashFamilySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "lake", "river", "stone", "cloud", "ember", "frost")
    (1 to n).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("native and HOF minhash signatures are identical") {
    val df = corpus(120, seed = 23)
    val n = df.filter(length($"text") >= 5)
      .select(Dedup.minhashSignature($"text", 5, 64).as("a"),
        Dedup.minhashSignatureHof($"text", 5, 64).as("b"))
      .filter($"a" =!= $"b").count()
    assert(n == 0, s"$n rows diverge between native and HOF signatures")
  }

  test("16-bit simhash blocks: lossless within bound, fewer candidates than 8-bit") {
    val rnd = new Random(31)
    val base = corpus(250, seed = 29)
    // plant exact dups (hamming 0 — within every maxDist bound)
    val dups = base.filter($"doc_id" <= 20)
      .select(($"doc_id" + 10000).as("doc_id"), $"text")
    val df = base.union(dups).cache()

    val pairs16 = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 3, blocks = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (i <- 1L to 20L)
      assert(pairs16.contains((i, i + 10000)), s"planted dup $i lost by 16-bit blocking")

    val cand16 = Dedup.simhashCandidates(df, "doc_id", "text", blocks = 4).count()
    val cand8 = Dedup.simhashCandidates(df, "doc_id", "text", blocks = 8).count()
    assert(cand16 < cand8,
      s"16-bit blocking should prune candidates: $cand16 vs $cand8")
    df.unpersist()
  }
}
