package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.ql.spread

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.4).
  *
  * - `bruteForceTopK`: exact baseline — broadcast the (small) query
  *   set, scan candidates once, per-query top-k via window. O(|Q|·|C|)
  *   dot products but a single pass over the corpus: the right shape
  *   when |Q| is small even at 100 TB.
  * - `lshTopK`: random-hyperplane bucket join — candidates shrink to
  *   same-bucket rows; shuffle keyed by uniform bucket ids.
  * - `ivfKmeansTopK`: real IVF — trained spherical k-means quantizer
  *   (KMeans.fit), nProbe-cell probing.
  * - `ivfTopK`: IVF shape over a pre-existing partition column.
  */
object SimilaritySearch {

  /** doSpread only for the corpus side: spreading a query set that is
    * about to be broadcast would add a pointless shuffle stage. */
  private def prep(df: DataFrame, idCol: String, vecCol: String, as: String,
                   doSpread: Boolean = true) = {
    val base = if (doSpread) spread(df) else df
    base.select(col(idCol).as(s"${as}_id"), VectorOps.toDouble(col(vecCol)).as(s"${as}_v"))
      .withColumn(s"${as}_nrm", VectorOps.fastNorm(col(s"${as}_v")))
      // zero-norm vectors have no direction: cosine would be 0/0, and
      // Spark's NaN (ranks first DESC) vs DuckDB's NULL (ranks last)
      // diverge — excluded by contract
      .filter(col(s"${as}_nrm") > 0)
  }

  /** Exact cosine top-k per query. Scores rounded to 6dp before
    * ranking, ties broken by candidate id (deterministic output). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(prep(queries, idCol, vecCol, "q", doSpread = false))
    val c = prep(candidates, idCol, vecCol, "c")
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("c_id"))
    q.join(c)
      .withColumn("cos", round(
        VectorOps.cosinePre(col("q_v"), col("c_v"), col("q_nrm"), col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
  }

  /** LSH-bucketed ANN: only candidates in the query's hyperplane
    * bucket(s) are scored. Recall depends on nBits vs data geometry;
    * `nProbes` > 1 additionally probes the buckets with the query's
    * lowest-margin bits flipped (multi-probe LSH) — recall rises
    * without re-bucketing the corpus. Candidates always carry ONE
    * bucket; only the small query side fans out. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
              idCol: String, vecCol: String, k: Int, nBits: Int = 8,
              nProbes: Int = 1): DataFrame = {
    val q = prep(queries, idCol, vecCol, "q", doSpread = false)
      .withColumn("bucket",
        explode(VectorOps.lshProbeBuckets(col("q_v"), nBits, nProbes)))
    val c = prep(candidates, idCol, vecCol, "c")
      .withColumn("bucket", VectorOps.lshBucket(col("c_v"), nBits))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("c_id"))
    // no dedup needed: the probe buckets of one query are pairwise
    // distinct (each flips a different bit) and a candidate carries
    // exactly one bucket, so a (query, candidate) pair matches once
    q.join(c, "bucket")
      .withColumn("cos", round(
        VectorOps.cosinePre(col("q_v"), col("c_v"), col("q_nrm"), col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
  }

  /** IVF ANN with a TRAINED coarse quantizer: spherical k-means cells
    * (`KMeans.fit`), candidates assigned once to their nearest
    * centroid, each query probing its `nProbe` closest cells. The
    * 100 TB shape: fit on a hash-sample, one broadcast-join assignment
    * pass over the corpus, then every query touches ~nProbe/nCells of
    * the data. Recall governed by nProbe (spec: planted clusters,
    * recall vs the exact baseline).
    *
    * Plan note: the corpus × centroids scoring join is an intentional
    * unconditioned broadcast join with a k-row build side — O(n·k)
    * dot products IS the IVF assignment cost (every vector scores
    * every centroid); it shows as BroadcastNestedLoopJoin but never
    * broadcasts more than the k × dim model. */
  def ivfKmeansTopK(queries: DataFrame, candidates: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nCells: Int = 16, iters: Int = 3, nProbe: Int = 2,
                    sampleMod: Int = 1): DataFrame = {
    val cent = broadcast(
      KMeans.fit(candidates, idCol, vecCol, nCells, iters, sampleMod)
        .withColumn("cnrm", VectorOps.fastNorm(col("cv"))))
    val c = prep(candidates, idCol, vecCol, "c")
    // one assignment pass; max_by carries the payload so the argmax is
    // a single map-side-combining aggregation, no rejoin
    val assigned = c.join(cent)
      .withColumn("cc", VectorOps.cosinePre(col("c_v"), col("cv"), col("c_nrm"), col("cnrm")))
      .groupBy("c_id").agg(max_by(
        struct(col("cell"), col("c_v"), col("c_nrm")),
        struct(col("cc"), -col("cell"))).as("a"))
      .select(col("c_id"), col("a.cell").as("cell"),
        col("a.c_v").as("c_v"), col("a.c_nrm").as("c_nrm"))
    val q = prep(queries, idCol, vecCol, "q", doSpread = false)
    val wq = Window.partitionBy("q_id").orderBy(desc("qc_cos"), asc("cell"))
    val probes = q.join(cent)
      .withColumn("qc_cos",
        VectorOps.cosinePre(col("q_v"), col("cv"), col("q_nrm"), col("cnrm")))
      .withColumn("qr", row_number().over(wq))
      .filter(col("qr") <= nProbe)
      .select("q_id", "q_v", "q_nrm", "cell")
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("c_id"))
    probes.join(assigned, "cell")
      .withColumn("cos", round(
        VectorOps.cosinePre(col("q_v"), col("c_v"), col("q_nrm"), col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cell"), col("c_id"), col("cos"), col("rk"))
  }

  /** IVF-style ANN with per-cell centroids from an EXISTING partition
    * column. `cellCol` plays the role of a coarse quantizer cell
    * assignment when the data is already clustered (e.g. a class
    * label, a shard id); for a trained quantizer use ivfKmeansTopK. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
              idCol: String, vecCol: String, cellCol: String, k: Int): DataFrame = {
    val c = spread(candidates).select(col(idCol).as("c_id"),
        VectorOps.toDouble(col(vecCol)).as("c_v"), col(cellCol).as("cell"))
      .withColumn("c_nrm", VectorOps.fastNorm(col("c_v")))
      .filter(col("c_nrm") > 0)
    // centroid per cell: element-wise mean via posexplode + re-collect
    val cent = c.select(col("cell"), posexplode(col("c_v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("m"))
      .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("cent_v"))
      .withColumn("cent_nrm", VectorOps.fastNorm(col("cent_v")))
    // assign each query to its nearest centroid (broadcast centroids)
    val q = prep(queries, idCol, vecCol, "q", doSpread = false)
    val wq = Window.partitionBy("q_id").orderBy(desc("qc_cos"), asc("cell"))
    val assigned = q.join(broadcast(cent))
      .withColumn("qc_cos",
        VectorOps.cosinePre(col("q_v"), col("cent_v"), col("q_nrm"), col("cent_nrm")))
      .withColumn("qr", row_number().over(wq))
      .filter(col("qr") === 1)
      .select("q_id", "q_v", "q_nrm", "cell")
    // probe only the assigned cell
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("c_id"))
    assigned.join(c, "cell")
      .withColumn("cos", round(
        VectorOps.cosinePre(col("q_v"), col("c_v"), col("q_nrm"), col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cell"), col("c_id"), col("cos"), col("rk"))
  }
}
