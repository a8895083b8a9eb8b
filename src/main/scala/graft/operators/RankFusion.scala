package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * merge the ranked lists of heterogeneous retrievers —
  * fused(d) = Σ_lists 1/(κ + rank_d(list)) — the standard hybrid-
  * search combiner (lexical BM25 + vector ANN being the canonical
  * pair). Docs absent from a list simply contribute nothing for it
  * (the paper's convention over top-k lists).
  *
  * Fixed-point convention: 1/(κ+rank) is not a finite decimal, and
  * summing doubles is order-dependent — each reciprocal is quantized
  * to parts-per-million BIGINT, ⌊10⁶/(κ+rank)⌋, so the fused score is
  * an exact integer sum, order-independent and oracle-mirrorable
  * (same convention as Dsir). At κ = 60 adjacent ranks differ by
  * hundreds of ppm — the quantization never reorders; ties break on
  * doc id.
  *
  * Scale shape: inputs are already top-k lists (bounded — k rows per
  * retriever, not corpora); union + one tiny aggregation. The fusion
  * stage is never the scale problem; the retrievers are.
  */
object RankFusion {

  /** Fuse ranked lists. Each input must carry (idCol, rankCol) with
    * rank 1-based, and ids must be DISTINCT within each list — a
    * duplicated id would inflate its n_lists and double-count its
    * reciprocal (retriever top-k output is distinct by construction;
    * dedup on idCol per list first if yours is not).
    * Output: (idCol, n_lists, rrf_ppm) — the top `topK` by fused
    * score. */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
          kappa: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    lists.map(_.select(col(idCol), col(rankCol).cast("long").as("rk")))
      .reduce(_ unionByName _)
      .withColumn("rrf_ppm", expr(s"1000000 DIV ($kappa + rk)"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"), sum(col("rrf_ppm")).as("rrf_ppm"))
      .orderBy(desc("rrf_ppm"), col(idCol))
      .limit(topK)
  }
}
