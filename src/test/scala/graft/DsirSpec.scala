package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weighting (operators/Dsir.scala). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // the operator's fingerprint fold, reimplemented independently —
  // over Unicode CODE POINTS (the documented semantics), not UTF-16
  // code units, so supplementary-plane input would expose a mismatch
  private def fp(s: String): Long = {
    var a = 0L
    s.codePoints().forEach(cp => a = (a * 31 + cp.toLong) % 1000000007L)
    a
  }

  test("feature buckets: unigrams + bigrams, hashed mod nBuckets") {
    val df = Seq((1L, "ab cd ef")).toDF("id", "text")
    val got = Dsir.featureBuckets(df, "id", "text", lit(true), nBuckets = 4096)
      .select("b").as[Long].collect().sorted
    val want = Seq("ab", "cd", "ef", "ab cd", "cd ef")
      .map(fp(_) % 4096).sorted
    assert(got.toSeq == want)
  }

  test("single-word doc has no bigram; n_feat = 2*len-1 otherwise") {
    val df = Seq((1L, "solo"), (2L, "a b c d")).toDF("id", "text")
    val n = Dsir.importanceSelect(df, "id", "text", lit(true), topK = 1)
      .select("id", "n_feat").as[(Long, Long)].collect().toMap
    assert(n(1L) == 1L) // 1 unigram, 0 bigrams
    assert(n(2L) == 7L) // 4 unigrams + 3 bigrams
  }

  test("target-resembling doc outranks off-target doc; topK flags it") {
    // target slice speaks 'aa bb'; probe docs: one in-domain, one out
    val df = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb aa bb", true),
      (10L, "aa bb", false), (11L, "zz qq", false)
    ).toDF("id", "text", "is_t")
    val w = Dsir.importanceSelect(df, "id", "text", col("is_t"), topK = 3)
      .select("id", "weight_ppm", "selected")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(10L)._1 > w(11L)._1,
      s"in-domain doc should outweigh off-domain: $w")
    assert(w(10L)._2 && !w(11L)._2) // top-3 = the two targets + doc 10
  }

  test("hand-computed ppm weight on a minimal corpus") {
    // corpus: target doc "t", raw-only doc "r" — single-word docs, so
    // one unigram feature each; B=4096 keeps their buckets distinct
    val df = Seq((1L, "t", true), (2L, "r", false)).toDF("id", "text", "is_t")
    val B = 4096
    val (nR, nT) = (2L, 1L) // 2 feature occurrences total, 1 in target
    def ppm(ct: Long, cr: Long) =
      ((ct + 1) * (nR + B) * 1000000L) / ((cr + 1) * (nT + B))
    val got = Dsir.importanceSelect(df, "id", "text", col("is_t"),
        nBuckets = B, topK = 1)
      .select("id", "weight_ppm").as[(Long, Long)].collect().toMap
    assert(got(1L) == ppm(ct = 1, cr = 1))
    assert(got(2L) == ppm(ct = 0, cr = 1))
  }

  test("weights are partition-invariant (exact integer aggregation)") {
    val docs = (0L until 64L).map(i => (i, s"w$i common w${i % 7} common"))
    val a = Dsir.importanceSelect(
      docs.toDF("id", "text").repartition(1), "id", "text",
      col("id") % 3 === 0, topK = 5).orderBy("id").collect()
    val b = Dsir.importanceSelect(
      docs.toDF("id", "text").repartition(13), "id", "text",
      col("id") % 3 === 0, topK = 5).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
