package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, KMeans}

/** Gates for the per-topic corpus card (p15) beyond the catalog
  * oracle: planted-cluster assignment, zero-norm exclusion, the
  * share/coherence invariants, and partition invariance of the
  * decimal-summed fields. */
class TopicCardSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated planted topics on orthogonal axes: ids 0-9 on
  // +x (lang en), ids 10-19 on +y (lang de); id 99 is a zero vector
  private def emb = ((0 until 10).map(i =>
      (i.toLong, Seq(1.0f + i * 0.01f, 0.0f, 0.0f, 0.0f))) ++
    (10 until 20).map(i =>
      (i.toLong, Seq(0.0f, 1.0f + i * 0.01f, 0.0f, 0.0f))) :+
    (99L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")
  private def docs = ((0 until 10).map(i =>
      (i.toLong, s"alpha text $i", "en")) ++
    (10 until 20).map(i => (i.toLong, s"beta text $i", "de")) :+
    (99L, "orphan", "zh"))
    .toDF("doc_id", "text", "lang")

  private def card = {
    val quant = KMeans.fitLocal(emb, "vec_id", "embedding", k = 2, iters = 2)
    val model = quant.select(col("cell").cast("long"), col("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    CorpusStats.topicCard(docs, emb, "vec_id", "embedding", "doc_id", model)
  }

  test("planted topics split 10/10, zero-norm doc excluded, shares " +
      "and coherence behave") {
    val rows = card.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_docs")).toSeq == Seq(10L, 10L))
    // id 99 (zero vector) is in neither topic: shares are of the
    // ASSIGNED corpus and sum to exactly 1e6 here (20 divides evenly)
    assert(rows.map(_.getAs[Long]("share_ppm")).sum == 1000000L)
    // each topic is one tight direction: mean member-centroid cosine
    // is ~1 (6-dp rounding keeps it just below)
    rows.foreach(r =>
      assert(r.getAs[Double]("coherence") > 0.999,
        s"coherence ${r.getAs[Double]("coherence")}"))
    // dominant language is the planted one, count 10, in cell order
    assert(rows.map(_.getAs[String]("top_lang")).toSet == Set("en", "de"))
    assert(rows.forall(_.getAs[Long]("top_lang_cnt") == 10L))
  }

  test("card is partition-invariant (decimal-summed fields included)") {
    val a = card.collect().map(_.toString).toSeq
    val quant = KMeans.fitLocal(emb, "vec_id", "embedding", k = 2, iters = 2)
    val model = quant.select(col("cell").cast("long"), col("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val b = CorpusStats.topicCard(docs.repartition(7), emb.repartition(5),
      "vec_id", "embedding", "doc_id", model).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
