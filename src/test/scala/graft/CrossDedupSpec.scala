package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Cross-batch MinHash-LSH dedup (daily-ingest-vs-corpus shape). */
class CrossDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long, seed: Int): (Long, String) = {
    val rnd = new scala.util.Random(seed)
    (i, Seq.fill(60)(('a' + rnd.nextInt(26)).toChar.toString * 2).mkString(" "))
  }

  // corpus ids < 1000, batch ids >= 1000; batch docs 1000/1001 are
  // near-copies of corpus docs 1/2, the rest unrelated
  private lazy val corpus = (1L to 40L).map(i => doc(i, i.toInt)).toDF("doc_id", "text")
  private lazy val batch = (
    Seq((1000L, doc(1, 1)._2 + " x"), (1001L, doc(2, 2)._2 + " y")) ++
      (1002L to 1020L).map(i => doc(i, i.toInt + 5000))
    ).toDF("doc_id", "text")

  test("planted cross-batch dups recalled; no within-batch or within-corpus pairs") {
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text", k = 5)
    val got = Dedup.minhashLshPairsAgainst(idx, batch, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 1000L)), "near-copy of corpus doc 1 must be caught")
    assert(got.contains((2L, 1001L)), "near-copy of corpus doc 2 must be caught")
    got.foreach { case (c, b) =>
      assert(c < 1000L && b >= 1000L, s"pair ($c,$b) is not corpus-vs-batch")
    }
  }

  test("cross pairs equal the self-join pairs restricted to cross edges") {
    val self = Dedup.minhashLshPairs(corpus.union(batch), "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a < 1000L && b >= 1000L }.toSet
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text", k = 5)
    val cross = Dedup.minhashLshPairsAgainst(idx, batch, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cross == self,
      s"cross-probe must match self-join cross edges: $cross vs $self")
  }

  test("replayed batch (ids already in the index) yields no self-pairs") {
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text", k = 5)
    val got = Dedup.minhashLshPairsAgainst(idx, corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!got.exists { case (a, b) => a == b },
      s"self-pairs leaked: ${got.filter(p => p._1 == p._2).take(5).toSeq}")
  }

  test("replay-duplicated index rows don't double-count n_bands") {
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text", k = 5)
    val clean = Dedup.minhashLshPairsAgainst(idx, batch, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a replayed append: every index row present twice
    val replayed = idx.union(idx)
    val got = Dedup.minhashLshPairsAgainst(replayed, batch, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == clean,
      s"dedupIndex must neutralize replayed index rows: $got vs $clean")
    // and the opt-out really is unsafe on a duplicated index — the
    // documented hazard, asserted so the contract stays honest
    val raw = Dedup.minhashLshPairsAgainst(replayed, batch, "doc_id", "text",
        k = 5, dedupIndex = false)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    clean.foreach { case (c, b, n) =>
      assert(raw((c, b)) == 2 * n, s"expected doubled bands for ($c,$b)")
    }
  }

  test("index survives a parquet round trip (the persisted-index contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    Dedup.minhashIndex(corpus, "doc_id", "text", k = 5)
      .write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val got = Dedup.minhashLshPairsAgainst(reread, batch, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 1000L)) && got.contains((2L, 1001L)))
  }
}
