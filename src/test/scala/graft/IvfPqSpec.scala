package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, KMeans, ProductQuantizer, SimilaritySearch}

/** IVF-PQ composition: recall vs the exact baseline, cell pruning
  * actually prunes, and the fit/index/query split reproduces the
  * inline result bit-for-bit. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // same regime as PqAnnSpec: separated clusters with within-cluster
  // spread so members get distinct codes AND distinct cells
  private lazy val clustered = {
    val rnd = new Random(47)
    val centers = (0 until 6).map(_ => Array.fill(32)(rnd.nextGaussian() * 5))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 60
    } yield ((ci * 60 + i).toLong, c.map(x => (x + rnd.nextGaussian() * 1.5).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  test("topK recall vs exact baseline on planted clusters") {
    val queries = clustered.filter($"vec_id" % 60 === 0) // one per cluster
    val exact = SimilaritySearch.bruteForceTopK(queries, clustered,
        "vec_id", "embedding", 10)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val got = IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
        nCells = 6, nProbe = 2, m = 16, ks = 16, refine = 6)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${got.intersect(exact).size}/${exact.size})")
  }

  test("cell probing prunes: ADC touches only probed cells") {
    val coarse = KMeans.fitLocal(clustered, "vec_id", "embedding", 6, iters = 5)
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    val idx = IvfPq.buildIndex(clustered, "vec_id", "embedding", coarse, model)
    // index covers every vector, each in exactly one of the 6 cells
    val byCell = idx.groupBy("cell").count().as[(Long, Long)].collect().toMap
    assert(byCell.values.sum == 360)
    assert(byCell.keySet.subsetOf((0L until 6L).toSet))
    // nProbe=1, refine=0: every returned candidate must come from ONE
    // cell per query (the pruning contract — no full-corpus scoring)
    val got = IvfPq.topK(clustered.filter($"vec_id" === 0), clustered,
        "vec_id", "embedding", k = 360, nProbe = 1, refine = 0,
        quantizer = Some(coarse), model = Some(model), index = Some(idx))
    val cells = got.join(idx, "c_id").select("cell").distinct().as[Long].collect()
    assert(cells.length == 1, s"nProbe=1 must touch one cell, got ${cells.toSeq}")
    assert(got.count() < 360, "pruned search must not return the whole corpus")
  }

  test("persisted index + models reproduce the inline result (index split)") {
    val queries = clustered.filter($"vec_id" % 60 === 0)
    val coarse = KMeans.fitLocal(clustered, "vec_id", "embedding", 6, iters = 5)
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqidx").toString
    IvfPq.buildIndex(clustered, "vec_id", "embedding", coarse, model)
      .write.mode("overwrite").parquet(dir)
    val inline = IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
        nCells = 6, nProbe = 2, iters = 5,
        quantizer = Some(coarse), model = Some(model))
      .orderBy("q_id", "rk").as[(Long, Long, Double, Long)].collect().toSeq
    val applied = IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
        nProbe = 2, quantizer = Some(coarse), model = Some(model),
        index = Some(spark.read.parquet(dir)))
      .orderBy("q_id", "rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(inline == applied, "persisted index must reproduce the inline result")
    // and the whole path is partition-invariant
    val repart = IvfPq.topK(queries, clustered.repartition(13), "vec_id", "embedding",
        k = 10, nProbe = 2, quantizer = Some(coarse), model = Some(model),
        index = Some(spark.read.parquet(dir).repartition(7)))
      .orderBy("q_id", "rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(inline == repart, "results must not depend on physical partitioning")
  }

  test("clustered persisted index: probe scan prunes row groups, results identical (r17)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val queries = clustered.filter($"vec_id" % 60 === 0)
    val coarse = KMeans.fitLocal(clustered, "vec_id", "embedding", 6, iters = 5)
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    val idx = IvfPq.buildIndex(clustered, "vec_id", "embedding", coarse, model)
    val flat = java.nio.file.Files.createTempDirectory("graft-ivfflat").toString
    val clus = java.nio.file.Files.createTempDirectory("graft-ivfclus").toString
    // unclustered: shuffled so every file spans the full cell range
    idx.repartition(6).write.mode("overwrite").parquet(flat)
    IvfPq.writeIndex(idx, clus, nFiles = 6)

    def probe(dir: String) =
      IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
          nProbe = 2, quantizer = Some(coarse), model = Some(model),
          index = Some(spark.read.parquet(dir)))
        .orderBy("q_id", "rk").as[(Long, Long, Double, Long)].collect().toSeq
    // layout must not change a single bit of the result
    assert(probe(flat) == probe(clus),
      "clustered layout must reproduce the unclustered probe bit-for-bit")

    // the scan-level payoff, measured where the probe filter lands:
    // a 2-of-6-cell In filter against the clustered layout skips the
    // other cells' row groups; against the flat layout every row
    // group spans all cells and nothing can prune
    val total = idx.count()
    val someCells = Seq(0L, 1L)
    def scanRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("cell").isin(someCells.map(Long.box): _*))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val flatRows = scanRows(flat)
    val clusRows = scanRows(clus)
    assert(flatRows == total,
      s"flat layout cannot prune: scan read $flatRows of $total")
    assert(clusRows < total,
      s"clustered layout must prune row groups: scan read $clusRows of $total")
  }

  test("probe wider than the parquet In threshold still prunes (r18, ADVICE r17)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // 24 coarse cells, nProbe=12 per query: the probed-cell set (>10)
    // would fall off parquet's exact-In pushdown as one wide isin —
    // the chunked-In filter must keep skipping unprobed cells
    assert(spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold").toInt == 10)
    val queries = clustered.filter($"vec_id" === 0L)
    val coarse = KMeans.fitLocal(clustered, "vec_id", "embedding", 24, iters = 5)
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    val idx = IvfPq.buildIndex(clustered, "vec_id", "embedding", coarse, model)
    val clus = java.nio.file.Files.createTempDirectory("graft-ivfwide").toString
    // ~one cell per file so unprobed cells actually map to skippable
    // row groups at this fixture size
    IvfPq.writeIndex(idx, clus, nFiles = 24)
    val total = idx.count()

    val res = IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
      nProbe = 12, quantizer = Some(coarse), model = Some(model),
      index = Some(spark.read.parquet(clus)))
    val rows = res.collect() // executes THIS plan — metrics below
    assert(rows.nonEmpty)
    val codesRows = executedFileScans(res)
      .filter(_.schema.fieldNames.contains("cell"))
      .map(_.metrics("numOutputRows").value).sum
    assert(codesRows > 0 && codesRows < total,
      s"12-of-24-cell probe must skip unprobed cells: read $codesRows of $total")
    // identity: the pruned persisted probe == the same probe against
    // the index frame handed over inline (no layout, nothing pruned)
    val inline = IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
        nProbe = 12, quantizer = Some(coarse), model = Some(model),
        index = Some(idx))
      .orderBy("q_id", "rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3))).toSeq.sortBy(t => (t._1, t._4)) == inline)
  }

  test("incremental append ≡ full rebuild, probes included (r11)") {
    val coarse = KMeans.fitLocal(clustered, "vec_id", "embedding", 6, iters = 5)
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    val cm = IvfPq.collectCoarse(coarse)
    val old = clustered.filter($"vec_id" % 5 =!= 0)
    val batch = clustered.filter($"vec_id" % 5 === 0)
    val appended = IvfPq.appendBatch(
      IvfPq.buildIndex(old, "vec_id", "embedding", cm, model),
      batch, "vec_id", "embedding", cm, model)
    val rebuilt = IvfPq.buildIndex(clustered, "vec_id", "embedding", cm, model)
    val a = appended.select(col("c_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().sortBy(_._1).toSeq
    val b = rebuilt.select(col("c_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(a == b, "append must be bit-identical to rebuilding over the union")
    // a probe against the appended index ≡ against the rebuilt one
    val queries = clustered.filter($"vec_id" % 60 === 0)
    def probe(idx: org.apache.spark.sql.DataFrame) =
      IvfPq.topK(queries, clustered, "vec_id", "embedding", k = 10,
          nProbe = 2, quantizer = Some(coarse), model = Some(model),
          index = Some(idx))
        .orderBy("q_id", "rk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(probe(appended.localCheckpoint(true)) ==
      probe(rebuilt.localCheckpoint(true)))
  }

  test("quantization self-score flags drift before refit (r11)") {
    val model = ProductQuantizer.fit(clustered, "vec_id", "embedding", m = 8, ks = 16)
    def meanPpm(df: org.apache.spark.sql.DataFrame): Double =
      IvfPq.quantizationSelfScorePpm(df, "vec_id", "embedding", model)
        .agg(avg(col("self_adc_ppm"))).head().getDouble(0)
    val inDist = meanPpm(clustered)
    // drifted batch: a DIFFERENT cluster structure the codebooks never saw
    val rnd = new Random(91)
    val driftCenters = (0 until 6).map(_ => Array.fill(32)(rnd.nextGaussian() * 5))
    val drifted = driftCenters.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 60).map(i => ((10000 + ci * 60 + i).toLong,
        c.map(x => (x + rnd.nextGaussian() * 1.5).toFloat)))
    }.toDF("vec_id", "embedding")
    val outDist = meanPpm(drifted)
    // absolute self-scores sit well below 10⁶ for a coarse ks=16
    // codebook (measured ~469k here) — the refit signal is the
    // RELATIVE drop on a drifted batch (measured ~191k: a 2.5x fall)
    assert(inDist > 400000.0, s"training distribution self-score low: $inDist")
    assert(inDist - outDist > 150000.0,
      s"drift not visible: in-dist $inDist vs drifted $outDist")
  }
}
