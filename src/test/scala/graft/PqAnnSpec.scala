package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantizer, SimilaritySearch}

/** Product-quantization ANN: recall vs the exact baseline, deterministic
  * encoding, and the fit/encode/query index split. */
class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  // 6 separated clusters in dim 32, 60 points each, with enough
  // within-cluster spread that members encode to DIFFERENT codes — PQ's
  // working regime. (Near-duplicate members all quantize to the same
  // codes, making ADC blind within a cluster by construction — that's
  // the near-dup problem, handled by embeddingNearDupsLsh, not ANN.)
  private lazy val clustered = {
    val rnd = new Random(43)
    val centers = (0 until 6).map(_ => Array.fill(32)(rnd.nextGaussian() * 5))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 60
    } yield ((ci * 60 + i).toLong, c.map(x => (x + rnd.nextGaussian() * 1.5).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  test("pqTopK recall vs exact baseline on planted clusters") {
    val queries = clustered.filter($"vec_id" % 60 === 0) // one per cluster
    val exact = SimilaritySearch.bruteForceTopK(queries, clustered,
        "vec_id", "embedding", 10)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // m=16 → 2-dim subspaces: finer ADC resolution; shortlist 6·k.
    // Recall rises with m and refine — the two PQ accuracy knobs.
    val pq = ProductQuantizer.pqTopK(queries, clustered,
        "vec_id", "embedding", k = 10, m = 16, ks = 16, refine = 6)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${pq.intersect(exact).size}/${exact.size})")
  }

  test("refined scores are the exact cosines (re-rank contract)") {
    val queries = clustered.filter($"vec_id" === 0)
    val exact = SimilaritySearch.bruteForceTopK(queries, clustered,
        "vec_id", "embedding", 5)
      .select("c_id", "cos").as[(Long, Double)].collect().toMap
    val pq = ProductQuantizer.pqTopK(queries, clustered,
        "vec_id", "embedding", k = 5, refine = 4)
      .select("c_id", "cos").as[(Long, Double)].collect()
    pq.foreach { case (c, cos) =>
      exact.get(c).foreach(e =>
        assert(cos == e, s"refined cosine for $c must equal exact: $cos vs $e"))
    }
  }

  test("encode is deterministic and partition-invariant; codes in range") {
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    val a = ProductQuantizer.encode(clustered, "vec_id", "embedding", model)
      .orderBy("c_id").as[(Long, Seq[Int])].collect().toSeq
    val b = ProductQuantizer.encode(clustered.repartition(13), "vec_id", "embedding", model)
      .orderBy("c_id").as[(Long, Seq[Int])].collect().toSeq
    assert(a == b, "codes must not depend on physical partitioning")
    assert(a.length == 360)
    a.foreach { case (id, codes) =>
      assert(codes.length == 8, s"doc $id: ${codes.length} codes")
      assert(codes.forall(c => c >= 0 && c < 16), s"doc $id: code out of range $codes")
    }
    // refit is bit-identical (deterministic sample + Lloyd order)
    val model2 = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    assert(model.codebooks.flatten.flatten.toSeq == model2.codebooks.flatten.flatten.toSeq,
      "refit must be bit-identical")
  }

  test("pre-encoded parquet index reproduces the inline result (index split)") {
    val queries = clustered.filter($"vec_id" % 60 === 0)
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-pqidx").toString
    ProductQuantizer.encode(clustered, "vec_id", "embedding", model)
      .write.mode("overwrite").parquet(dir)
    val applied = ProductQuantizer.pqTopK(queries, clustered, "vec_id", "embedding",
        k = 10, model = Some(model), index = Some(spark.read.parquet(dir)))
      .orderBy("q_id", "rk").collect().toSeq
    val inline = ProductQuantizer.pqTopK(queries, clustered, "vec_id", "embedding", k = 10)
      .orderBy("q_id", "rk").collect().toSeq
    assert(applied == inline,
      "a persisted index + model must reproduce the inline build")
  }

  test("ADC-only path (refine=0) still finds the planted neighborhood") {
    val queries = clustered.filter($"vec_id" === 0)
    // all of vec 0's top-10 live in its planted cluster (ids 0-59);
    // ADC without re-rank must keep the shortlist inside that cluster
    val pq = ProductQuantizer.pqTopK(queries, clustered,
        "vec_id", "embedding", k = 10, refine = 0)
      .select("c_id").as[Long].collect()
    val inCluster = pq.count(_ < 60L)
    assert(inCluster >= 9, s"ADC top-10 should stay in the planted cluster: $inCluster/10")
  }
}
