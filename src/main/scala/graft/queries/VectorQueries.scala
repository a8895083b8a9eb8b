package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ql._
import graft.operators.{IvfPq, KMeans, ProductQuantizer, SimilaritySearch}

/** Similarity-search suite over `embeddings` (SURVEY §2.4): exact
  * brute-force baseline (oracle-checked) + LSH and IVF scale paths
  * (hash/centroid-dependent → rows-only). Query set: vec_id < 5. */
object VectorQueries {

  private def emb(s: SparkSession, d: String) = t(s, d, "embeddings")
  private def qs(s: SparkSession, d: String) = emb(s, d).filter(col("vec_id") < 5)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_cosine_topk" -> { (s, d) =>
      SimilaritySearch.bruteForceTopK(qs(s, d), emb(s, d), "vec_id", "embedding", 10)
        .orderBy("q_id", "rk")
    },

    "s2_lsh_ann" -> { (s, d) =>
      SimilaritySearch.lshTopK(qs(s, d), emb(s, d), "vec_id", "embedding", 3, nBits = 8)
        .orderBy("q_id", "rk")
    },

    // fit/apply split (VERDICT r2 item 1): the coarse quantizer trains
    // driver-side on a bounded 1/8 hash-sample (KMeans.fitLocal — the
    // FAISS shape, one Spark job) and is passed in; the timed query is
    // index-build + one assignment pass + nProbe probing. Production
    // callers train once and reuse `quant` across every query.
    "s3_ivf_ann" -> { (s, d) =>
      val e = emb(s, d)
      val quant = KMeans.fitLocal(e, "vec_id", "embedding", k = 8,
        iters = 3, sampleMod = 8)
      SimilaritySearch.ivfKmeansTopK(qs(s, d), e, "vec_id", "embedding",
          k = 3, nCells = 8, nProbe = 2, quantizer = Some(quant))
        .orderBy("q_id", "rk")
    },

    // multi-probe LSH: same corpus bucketing as s2, recall raised by
    // probing the query's 3 lowest-margin neighbor buckets
    "s5_lsh_multiprobe" -> { (s, d) =>
      SimilaritySearch.lshTopK(qs(s, d), emb(s, d), "vec_id", "embedding", 3,
          nBits = 8, nProbes = 4)
        .orderBy("q_id", "rk")
    },

    // the partition-column IVF shape stays covered (pre-clustered data)
    "s4_ivf_label" -> { (s, d) =>
      SimilaritySearch.ivfTopK(qs(s, d), emb(s, d), "vec_id", "embedding", "label", 3)
        .orderBy("q_id", "rk")
    },

    // product quantization (r5): 8 subspaces × 16 codes — each 64-dim
    // float vector stored as 8 codes (32× compression); ADC shortlist
    // (4·k) + exact cosine re-rank. Codebook-dependent scores →
    // rows-only; PqAnnSpec pins recall vs the exact baseline,
    // encode determinism, and the fit/encode/query index split.
    "s6_pq_ann" -> { (s, d) =>
      ProductQuantizer.pqTopK(qs(s, d), emb(s, d), "vec_id", "embedding",
          k = 5, m = 8, ks = 16, refine = 4)
        .orderBy("q_id", "rk")
    },

    // IVF-PQ (r6): the composed FAISS IVFADC shape — coarse cells
    // bound candidates touched, PQ codes bound bytes/FLOPs per
    // candidate, exact re-rank restores ordering. Both models +
    // the codes index are reusable artifacts (fit/index/query split);
    // codebook- and centroid-dependent → rows-only; IvfPqSpec pins
    // recall vs the exact baseline and index-split identity.
    "s7_ivfpq" -> { (s, d) =>
      val e = emb(s, d)
      IvfPq.topK(qs(s, d), e, "vec_id", "embedding",
          k = 5, nCells = 8, nProbe = 3, m = 8, ks = 8, iters = 3, refine = 4)
        .orderBy("q_id", "rk")
    },

    // BM25 lexical retrieval (rational-idf, log-free — Bm25 scaladoc)
    // over documents: one rare + three common terms so the idf spread
    // does real ranking work. Exact oracle: every double op mirrored.
    "s8_bm25" -> { (s, d) =>
      graft.operators.Bm25.topK(t(s, d, "documents"), "doc_id", "text",
          terms = Seq("dup", "spark", "window", "key"), k = 10)
        .orderBy("rk")
    },

    // hybrid-retrieval fusion (RRF, Cormack et al. 2009): three
    // rankers over the same corpus for query vec_id=0 — rounded
    // cosine (s1's exact machinery), raw dot product, raw L2 (via the
    // three-dot-products identity — no engine-specific sqrt/list
    // kernels) — each top-50, fused by integer-ppm reciprocal ranks.
    // In production the lists come from heterogeneous retrievers
    // (BM25 + ANN); the fusion stage is what this query gates.
    "s9_rrf_fusion" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorOps
      val e = emb(s, d)
      val q0 = qs(s, d).filter(col("vec_id") === 0)
      val cosL = SimilaritySearch
        .bruteForceTopK(q0, e, "vec_id", "embedding", 50)
        .select(col("c_id"), col("rk"))
      val qv = broadcast(q0.select(col("vec_id").as("q_id"),
        col("embedding").as("q_v")))
      val w = Window.partitionBy("q_id")
      def top50(sc: org.apache.spark.sql.Column, asc0: Boolean) = {
        spread(e).crossJoin(qv)
          .select(col("q_id"), col("vec_id").as("c_id"),
            sc.as("sc"))
          .withColumn("rk", row_number()
            .over(w.orderBy(if (asc0) col("sc").asc else col("sc").desc,
              col("c_id"))).cast("long"))
          .filter(col("rk") <= 50)
          .select(col("c_id"), col("rk"))
      }
      val dotL = top50(VectorOps.fastDot(col("q_v"), col("embedding")), asc0 = false)
      val l2L = top50(
        (VectorOps.fastDot(col("embedding"), col("embedding"))
          - lit(2.0) * VectorOps.fastDot(col("q_v"), col("embedding")))
          + VectorOps.fastDot(col("q_v"), col("q_v")), asc0 = true)
      graft.operators.RankFusion.rrf(Seq(cosL, dotL, l2L), "c_id", "rk",
          kappa = 60, topK = 10)
        .orderBy(desc("rrf_ppm"), col("c_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "s1_cosine_topk" ->
      """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        |   WHERE list_dot_product(v, v) > 0),
        | q AS (SELECT * FROM nn WHERE vec_id < 5),
        | scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    ROUND(list_dot_product(q.v, c.v)/(q.nrm*c.nrm), 6) AS cos
        |   FROM q CROSS JOIN nn c),
        | ranked AS (SELECT q_id, c_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
        |   FROM scored)
        |SELECT q_id, c_id, cos, rk FROM ranked WHERE rk <= 10
        |ORDER BY q_id, rk""".stripMargin,

    // mirrors Bm25.topK op-for-op: same tokenization, same rational
    // idf and k1/b saturation with literal-identical constants, same
    // fixed-order conditional-sum score assembly, same (score desc,
    // doc_id) top-10
    "s8_bm25" ->
      """WITH toks AS (SELECT doc_id, w FROM (SELECT doc_id,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |    FROM documents) WHERE length(w) > 0),
        | dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        |  FROM toks GROUP BY doc_id),
        | corp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
        | tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks WHERE w IN ('dup', 'spark', 'window', 'key')
        |  GROUP BY doc_id, w),
        | dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
        | c AS (SELECT tf.doc_id, dl.dl, tf.w,
        |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |      / (CAST(df AS DOUBLE) + 0.5))
        |    * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
        |      / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
        |         + 0.75 * (CAST(dl.dl AS DOUBLE) / (CAST(tot AS DOUBLE) / n_docs)))))
        |    AS c
        |  FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id) CROSS JOIN corp),
        | s AS (SELECT doc_id, dl,
        |    COALESCE(SUM(CASE WHEN w = 'dup' THEN c END), 0.0)
        |    + COALESCE(SUM(CASE WHEN w = 'spark' THEN c END), 0.0)
        |    + COALESCE(SUM(CASE WHEN w = 'window' THEN c END), 0.0)
        |    + COALESCE(SUM(CASE WHEN w = 'key' THEN c END), 0.0) AS score
        |  FROM c GROUP BY doc_id, dl),
        | top AS (SELECT doc_id, dl, score FROM s
        |  ORDER BY score DESC, doc_id LIMIT 10)
        |SELECT doc_id, dl, score,
        | CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
        |FROM top ORDER BY rk""".stripMargin,

    // mirrors s9: cosine list = s1's rounded-cosine ranking (zero-norm
    // rows excluded there only), dot/L2 lists raw doubles (L2 via the
    // same three-dot-products identity), ppm reciprocal ranks summed
    // as exact integers
    "s9_rrf_fusion" ->
      """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | q AS (SELECT * FROM emb WHERE vec_id = 0),
        | nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        |   WHERE list_dot_product(v, v) > 0),
        | qn AS (SELECT * FROM nn WHERE vec_id = 0),
        | cosS AS (SELECT c.vec_id AS c_id,
        |    ROUND(list_dot_product(q.v, c.v)/(q.nrm*c.nrm), 6) AS sc
        |  FROM qn q CROSS JOIN nn c),
        | cosR AS (SELECT c_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY sc DESC, c_id) AS BIGINT) AS rk FROM cosS),
        | dotS AS (SELECT c.vec_id AS c_id, list_dot_product(q.v, c.v) AS sc
        |  FROM q CROSS JOIN emb c),
        | dotR AS (SELECT c_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY sc DESC, c_id) AS BIGINT) AS rk FROM dotS),
        | l2S AS (SELECT c.vec_id AS c_id,
        |    (list_dot_product(c.v, c.v) - 2.0 * list_dot_product(q.v, c.v))
        |      + list_dot_product(q.v, q.v) AS sc
        |  FROM q CROSS JOIN emb c),
        | l2R AS (SELECT c_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY sc ASC, c_id) AS BIGINT) AS rk FROM l2S),
        | u AS (SELECT c_id, rk FROM cosR WHERE rk <= 50
        |  UNION ALL SELECT c_id, rk FROM dotR WHERE rk <= 50
        |  UNION ALL SELECT c_id, rk FROM l2R WHERE rk <= 50),
        | f AS (SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
        |    CAST(SUM(1000000 // (60 + rk)) AS BIGINT) AS rrf_ppm
        |  FROM u GROUP BY c_id)
        |SELECT c_id, n_lists, rrf_ppm FROM f
        |ORDER BY rrf_ppm DESC, c_id LIMIT 10""".stripMargin
  )
}
