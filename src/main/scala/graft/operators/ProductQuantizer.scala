package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.ql.spread

/** Product-quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compressed index
  * shape: each (unit-normalized) vector is split into `m` subvectors,
  * each subvector quantized to one of `ks` codebook centroids, so a
  * dim-float vector is stored as `m` small codes (m bytes for ks ≤
  * 256 — a 32× compression of a 64-dim float vector). Queries score
  * candidates with an Asymmetric Distance Computation (ADC): the query
  * precomputes an m × ks lookup table of subvector dot products ONCE,
  * and each candidate costs `m` table lookups instead of `dim`
  * multiplies.
  *
  * Spark-first shape, the 100 TB lens:
  * - The codebooks are the MODEL (m · ks · dim/m doubles = dim · ks —
  *   a few KB); they train driver-side on the same deterministic
  *   bounded sample rule as `KMeans.fitLocal` (one Spark job: smallest
  *   (xxhash64(id), id) TakeOrdered), then enter every plan as
  *   `typedlit` literals — codegen reference objects, no join, no
  *   shuffle, no recompile across refits.
  * - `encode` is a map-side codegen pass over the corpus scan (argmax
  *   of literal-centroid scores per subspace — the KMeans CASE-chain
  *   pattern). Its output (id, codes) IS the persistable index: write
  *   it as parquet and the original embeddings never need to be
  *   scanned again for candidate generation.
  * - `pqTopK` broadcasts the (tiny) query side with its precomputed
  *   flat LUT column, so the probe is a map-side broadcast join over
  *   the codes table; each pair costs m `element_at` lookups. Only the
  *   per-query top-k window shuffles, on shortlist-sized data.
  * - `refine` re-ranks the ADC shortlist (|Q| · refine·k rows,
  *   broadcast) against the original vectors with exact cosine — the
  *   standard PQ pipeline: approximate shortlist, exact order.
  *
  * Determinism: the sample order is fixed by (xxhash64(id), id), Lloyd
  * accumulates in that order, assignment ties break toward the lowest
  * code in BOTH the driver fit loop and the codegen CASE chain (same
  * left-to-right IEEE summation via graft_dot), so refits and
  * re-encodes are bit-identical under any partitioning. */
object ProductQuantizer {

  /** `codebooks(sub)(code)` = centroid (length dim/m) over
    * unit-normalized subvectors. */
  case class PqModel(m: Int, ks: Int, dim: Int,
                     codebooks: Array[Array[Array[Double]]]) {
    def subDim: Int = dim / m
  }

  /** Unit-normalize, widen, drop zero-norm rows (no direction — same
    * contract as SimilaritySearch). Shared with IvfPq. */
  private[operators] def unitPrep(df: DataFrame, idCol: String, vecCol: String, as: String,
                                  doSpread: Boolean) = {
    val base = if (doSpread) spread(df) else df
    base.select(col(idCol).as(s"${as}_id"),
        VectorOps.toDouble(col(vecCol)).as("__v"))
      .withColumn("__nrm", VectorOps.fastNorm(col("__v")))
      .filter(col("__nrm") > 0)
      .select(col(s"${as}_id"), transform(col("__v"), x => x / col("__nrm")).as(s"${as}_v"))
  }

  /** Train per-subspace codebooks on a bounded deterministic sample.
    * One Spark job (the TakeOrdered sample); Lloyd runs driver-side —
    * codebook training is model-scale work by construction. */
  def fit(candidates: DataFrame, idCol: String, vecCol: String,
          m: Int = 8, ks: Int = 16, iters: Int = 5,
          maxSample: Int = 65536): PqModel = {
    require(m >= 1 && ks >= 2, s"need m >= 1 and ks >= 2, got m=$m ks=$ks")
    require(ks <= 256, s"ks must fit a byte code (<= 256), got $ks")
    val s = candidates.sparkSession
    import s.implicits._
    val sampled = unitPrep(candidates, idCol, vecCol, "s", doSpread = true)
      .withColumn("__h", xxhash64(col("s_id")))
      .orderBy(col("__h"), col("s_id")).limit(maxSample)
      .select("s_v").as[Seq[Double]].collect().map(_.toArray)
    require(sampled.nonEmpty, "cannot fit a quantizer on an empty (or all-zero-norm) corpus")
    val dim = sampled.head.length
    require(dim % m == 0, s"m ($m) must divide the vector dim ($dim)")
    val sd = dim / m
    val books = Array.tabulate(m) { j =>
      val subs = sampled.map(v => java.util.Arrays.copyOfRange(v, j * sd, (j + 1) * sd))
      // init: first ks DISTINCT subvectors in sample order (duplicates
      // would pin duplicate codes); pad by repeating the first if the
      // sample has fewer distinct subvectors than codes
      val init = scala.collection.mutable.ArrayBuffer[Array[Double]]()
      val seen = scala.collection.mutable.HashSet[Seq[Double]]()
      subs.iterator.takeWhile(_ => init.length < ks).foreach { v =>
        if (seen.add(v.toSeq)) init += v.clone()
      }
      while (init.length < ks) init += init.head.clone()
      var cents: Array[Array[Double]] = init.toArray
      for (_ <- 1 to iters) {
        val sums = Array.fill(ks)(new Array[Double](sd))
        val counts = new Array[Long](ks)
        subs.foreach { v =>
          var best = 0; var bestSc = Double.NegativeInfinity
          var c = 0
          while (c < ks) {
            // argmin L2 as argmax(<v,c> - |c|²/2): the same score the
            // codegen encode computes, same left-to-right summation
            var dot = 0.0; var n2 = 0.0; var i = 0
            while (i < sd) { dot += v(i) * cents(c)(i); n2 += cents(c)(i) * cents(c)(i); i += 1 }
            val sc = dot - n2 / 2
            if (sc > bestSc) { best = c; bestSc = sc } // strict: ties keep lowest code
            c += 1
          }
          var i = 0
          while (i < sd) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0L) old else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
    PqModel(m, ks, dim, books)
  }

  /** Per-subspace scores (code, score) of slice attrs `__s$j` against
    * literal centroids — score = <v_sub, c> − |c|²/2, argmax ≡ argmin
    * L2. Centroids enter as single-array typedlits (codegen cache
    * discipline, cf. KMeans.centroidScores). */
  private[operators] def subScores(model: PqModel, j: Int, sub: Column): Seq[(Long, Column)] =
    model.codebooks(j).zipWithIndex.map { case (c, code) =>
      val n2 = c.foldLeft(0.0)((acc, x) => acc + x * x)
      code.toLong -> (VectorOps.fastDot(sub, typedlit(c.toSeq)) - lit(n2 / 2))
    }.toSeq

  /** Encode a corpus against a trained model: (id, codes array<int>) —
    * the persistable PQ index. Map-side only: slices, literal-centroid
    * scores, and per-subspace argmax CASE chains in one codegen pass. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame = {
    val sd = model.subDim
    val sliced = unitPrep(df, idCol, vecCol, "c", doSpread = true)
      .select(col("c_id") +: (0 until model.m).map(j =>
        slice(col("c_v"), j * sd + 1, sd).as(s"__s$j")): _*)
    // scores land in attributes first so the argmax CASE references
    // cheap attrs and Catalyst won't re-inline the dot calls per branch
    val scoreCols = (0 until model.m).flatMap { j =>
      subScores(model, j, col(s"__s$j")).map { case (code, sc) =>
        sc.as(s"__sc${j}_$code")
      }
    }
    val scored = sliced.select(col("c_id") +: scoreCols: _*)
    val codes = (0 until model.m).map { j =>
      val attrs = model.codebooks(j).indices.map(c => c.toLong -> col(s"__sc${j}_$c"))
      KMeans.argmaxCell(attrs).cast("int")
    }
    scored.select(col("c_id"), array(codes: _*).as("codes"))
  }

  /** Flat m·ks LUT column for a (query) unit-vector: entry j·ks + c =
    * <q_sub_j, codebook_j(c)> — computed once per query row, before
    * the probe join. */
  private[operators] def lutCol(model: PqModel, v: Column): Column = {
    val sd = model.subDim
    array((0 until model.m).flatMap { j =>
      val sub = slice(v, j * sd + 1, sd)
      model.codebooks(j).map(c => VectorOps.fastDot(sub, typedlit(c.toSeq)))
    }: _*)
  }

  /** PQ ANN top-k: ADC over the codes index, then (refine > 0) exact
    * cosine re-rank of the top refine·k ADC candidates. Returns
    * (q_id, c_id, cos, rk) like the other ANN operators (cos is the
    * ADC approximation when refine == 0). Pass a pre-trained `model`
    * and/or pre-encoded `index` to reuse a persisted PQ index — the
    * fit/encode/query split is the production shape; without them both
    * are built inline. */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
             idCol: String, vecCol: String, k: Int,
             m: Int = 8, ks: Int = 16, iters: Int = 5,
             maxSample: Int = 65536, refine: Int = 4,
             model: Option[PqModel] = None,
             index: Option[DataFrame] = None): DataFrame = {
    val mdl = model.getOrElse(fit(candidates, idCol, vecCol, m, ks, iters, maxSample))
    val enc = index.getOrElse(encode(candidates, idCol, vecCol, mdl))
    val q = broadcast(unitPrep(queries, idCol, vecCol, "q", doSpread = false)
      .select(col("q_id"), col("q_v"), lutCol(mdl, col("q_v")).as("__lut")))
    adcRank(q.join(enc), candidates, idCol, vecCol, k, refine, mdl)
  }

  /** Shared ADC + top-k + optional exact-re-rank tail of the PQ family
    * (pqTopK and IvfPq.topK): `joined` carries (q_id, q_v, __lut,
    * c_id, codes). ONE home for the determinism contract — round(6)
    * scores, (desc score, asc c_id) ties, refine·k shortlist — so the
    * two operators can't drift apart. */
  private[operators] def adcRank(joined: DataFrame, candidates: DataFrame,
                                 idCol: String, vecCol: String,
                                 k: Int, refine: Int, mdl: PqModel): DataFrame = {
    val adc = joined
      .withColumn("adc", round(
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(mdl.m - 1)),
            (cd, j) => element_at(col("__lut"), j * mdl.ks + cd + 1)),
          lit(0.0), (acc, x) => acc + x), 6))
    val wAdc = Window.partitionBy("q_id").orderBy(desc("adc"), asc("c_id"))
    if (refine <= 0) {
      adc.withColumn("rk", row_number().over(wAdc).cast("long"))
        .filter(col("rk") <= k)
        .select(col("q_id"), col("c_id"), col("adc").as("cos"), col("rk"))
    } else {
      val shortlist = adc
        .withColumn("rk", row_number().over(wAdc))
        .filter(col("rk") <= k.toLong * refine)
        .select("q_id", "q_v", "c_id")
      // exact re-rank: the broadcast shortlist joins the corpus scan
      // map-side; unit vectors, so cosine is a plain dot
      val c = unitPrep(candidates, idCol, vecCol, "c", doSpread = true)
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("c_id"))
      broadcast(shortlist).join(c, "c_id")
        .withColumn("cos", round(VectorOps.fastDot(col("q_v"), col("c_v")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
    }
  }
}
