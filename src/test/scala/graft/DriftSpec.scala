package graft

import graft.operators.Drift

/** Gates for the source-drift card (t36) beyond the catalog oracle:
  * a planted skewed source must show strictly larger TV distance than
  * a corpus-typical one and surface its planted token as the most
  * over-represented; the card is partition-invariant bit-for-bit
  * (decimal-summed TV). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  // two "normal" sources share a common vocabulary; the third is
  // dominated by a token the rest of the corpus barely has
  private def docs = (
    (1 to 20).map(i => (s"web text common alpha beta gamma $i", "a")) ++
    (1 to 20).map(i => (s"web text common alpha beta delta $i", "b")) ++
    (1 to 20).map(i => ("spamword spamword spamword spamword web", "c")))
    .toDF("text", "source")

  test("planted skew dominates TV and the ppm argmax finds the token") {
    val card = Drift.sourceDrift(docs, "source", "text").collect()
    val bySrc = card.map(r => r.getAs[String]("source") -> r).toMap
    assert(bySrc.keySet == Set("a", "b", "c"))
    val tvC = bySrc("c").getAs[Double]("tv")
    assert(tvC > bySrc("a").getAs[Double]("tv") &&
      tvC > bySrc("b").getAs[Double]("tv"),
      s"skewed source should drift most: $card")
    assert(bySrc("c").getAs[String]("top_token") == "spamword")
    // TV is a distance: in [0, 1]
    card.foreach(r => assert(r.getAs[Double]("tv") >= 0.0 &&
      r.getAs[Double]("tv") <= 1.0))
  }

  test("card is partition-invariant bit-for-bit") {
    val a = Drift.sourceDrift(docs, "source", "text")
      .collect().map(_.toString).toSeq
    val b = Drift.sourceDrift(docs.repartition(7), "source", "text")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
