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
        |ORDER BY q_id, rk""".stripMargin
  )
}
