package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer: the classic Sennrich corpus must produce the textbook
  * merge sequence; merges are partition-invariant; overlap merging is
  * left-to-right greedy; encode round-trips the training corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the BPE paper's worked example vocabulary: low x5, lower x2,
  // newest x6, widest x3. Hand-derived first merges with the
  // (count desc, pair asc) tie rule:
  //   (e,s)=9 ties (s,t)=9 -> (e,s); then (es,t)=9; (l,o)=7 ties
  //   (o,w)=7 -> (l,o); then (lo,w)=7.
  private lazy val corpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("classic corpus yields the textbook merge sequence") {
    val (merges, vocab) = Bpe.train(corpus, "text", 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val segs = vocab.select(array_join(col("syms"), "|"), col("cnt"))
      .as[(String, Long)].collect().toMap
    assert(segs("low") == 5L)            // low fully merged
    assert(segs("low|e|r") == 2L)
    assert(segs("n|e|w|est") == 6L)
    assert(segs("w|i|d|est") == 3L)
  }

  test("merges are partition-invariant") {
    val docs = (1L to 400L)
      .map(i => s"alpha beta gamma${i % 7} alpha beta")
      .toDF("text")
    val (m1, _) = Bpe.train(docs, "text", 6)
    val (m2, _) = Bpe.train(docs.repartition(13), "text", 6)
    assert(m1 == m2, s"merge sequence must not depend on partitioning:\n$m1\n$m2")
    assert(m1.nonEmpty)
  }

  test("overlap merging is left-to-right greedy") {
    val (merges, vocab) = Bpe.train(Seq("aaaa").toDF("text"), "text", 1)
    assert(merges == Seq(("a", "a")))
    val seg = vocab.select(array_join(col("syms"), "|")).as[String].head()
    assert(seg == "aa|aa", s"'aaaa' + merge(a,a) must give aa|aa, got $seg")
  }

  test("encode applies merges in training order and counts tokens") {
    val (merges, _) = Bpe.train(corpus, "text", 4)
    val enc = Bpe.encode(Seq("low lowest", "").toDF("text"), "text", merges)
      .select("bpe_tokens", "bpe_seg").as[(Long, String)].collect()
    // low: (l,o) -> [lo w], (lo,w) -> [low]. lowest: (e,s) ->
    // l o w es t, (es,t) -> l o w est, (l,o) -> lo w est,
    // (lo,w) -> low est. Total 1 + 2 = 3 tokens.
    assert(enc(0) == ((3L, "low low est")), s"got ${enc(0)}")
    assert(enc(1) == ((0L, "")), s"empty text must encode to 0 tokens, got ${enc(1)}")
  }

  test("trainDetailed reports pair counts and the token trajectory") {
    // initial tokens: 3*5 + 5*2 + 6*6 + 6*3 = 79; each of the first 4
    // merges is overlap-free, so toksAfter drops by exactly n
    val (steps, _) = Bpe.trainDetailed(corpus, "text", 4)
    assert(steps.map(s => (s.a, s.b, s.n, s.toksAfter)) == Seq(
      ("e", "s", 9L, 70L), ("es", "t", 9L, 61L),
      ("l", "o", 7L, 54L), ("lo", "w", 7L, 47L)))
    // overlap chain: "aaaa" counts (a,a) 3 times but merges twice
    val (ov, _) = Bpe.trainDetailed(Seq("aaaa").toDF("text"), "text", 1)
    assert(ov == Seq(Bpe.MergeStep("a", "a", 3L, 2L)))
  }

  test("train halts early when every word is fully merged") {
    val (merges, vocab) = Bpe.train(Seq("ab ab ab").toDF("text"), "text", 10)
    assert(merges == Seq(("a", "b")))
    assert(vocab.select(size(col("syms"))).as[Int].head() == 1)
  }

  test("minCount floor drops the junk tail before it reaches training") {
    // the distinct singletons share the (z,q) prefix and would dominate
    // pair counts if kept ((z,q)=5 vs (a,b)=2); with minCount=2 only
    // "ab" (x2) survives, so the first merge must come from it.
    val docs = Seq("ab ab zq1x zq2x zq3x zq4x zq5x").toDF("text")
    val (mAll, _) = Bpe.train(docs, "text", 1)
    assert(mAll == Seq(("z", "q"))) // unbounded: 5 singleton words win
    val (mFloor, vocab) = Bpe.train(docs, "text", 1, minCount = 2L)
    assert(mFloor == Seq(("a", "b")))
    assert(vocab.count() == 1L, "singletons must not reach the driver")
  }

  test("maxVocabRows caps the collect deterministically (cnt desc, w asc)") {
    val docs = Seq("cc cc cc bb bb aa bb aa dd").toDF("text")
    // counts: bb=3, cc=3, aa=2, dd=1; top-2 by (cnt desc, w asc) = bb, cc
    val (merges, vocab) = Bpe.train(docs, "text", 1, maxVocabRows = 2)
    assert(vocab.count() == 2L)
    // bb and cc tie at 3; (b,b) wins the pair tie-break over (c,c)
    assert(merges == Seq(("b", "b")))
    val segs = vocab.select(array_join(col("syms"), "|")).as[String]
      .collect().toSet
    assert(segs == Set("bb", "c|c"), s"got $segs")
  }
}
