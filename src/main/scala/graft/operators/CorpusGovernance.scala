package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-governance operators over the MinHash near-dup machinery:
  * the two questions every multi-source pretraining corpus has to
  * answer before training starts —
  *
  *  - WHICH SOURCES DUPLICATE EACH OTHER ([[sourceOverlap]]): the
  *    per-(source, source) near-dup matrix. Common-crawl derived sets
  *    overlap heavily with each other and with curated sets (C4 vs
  *    CC-news vs RefinedWeb); the matrix is what decides which source
  *    to drop, dedup against, or down-weight in the mix (cf. the
  *    cross-source contamination audits in Penedo et al. 2024 and the
  *    dataset-overlap appendix of Brown et al. 2020).
  *  - IS THE EVAL SPLIT LEAKED ([[leakageSafeSplit]]): a random
  *    train/test split leaks whenever a test document has a near-twin
  *    left in train — the model "memorizes" the twin and the eval
  *    overstates quality. The fix (Lee et al. 2021 §6, Brown et al.
  *    2020 appendix C) is to QUARANTINE train-side near-dups of test
  *    documents, not just exact matches.
  *
  * Spark-first / 100 TB shape: both operators reuse
  * [[Dedup.minhashLshPairs]] — candidate pairs come from the banded
  * (band, bucket) equi-join (never all-pairs), so cost scales with
  * collision count, not corpus². `sourceOverlap` joins pair ids back
  * to their source labels (two combinable equi-joins on doc id) and
  * aggregates to at most |sources|² rows. `leakageSafeSplit` needs NO
  * join against the test set at all: membership is a pure function of
  * the doc id hash, so the contaminated set is computed map-side from
  * the pair list itself, and only the final (tiny) quarantine id set
  * joins back. Split assignment is deterministic (seedless hash mod),
  * so the same corpus always yields the same split — re-runs and
  * incremental appends agree.
  */
object CorpusGovernance {

  /** Per-(source, source) near-dup matrix: for every unordered source
    * pair with at least one MinHash-LSH candidate pair, the number of
    * near-dup doc pairs and the number of distinct docs involved.
    * Intra-source duplication shows up on the diagonal (src_a ==
    * src_b). Sources are normalized so src_a <= src_b. */
  def sourceOverlap(df: DataFrame, idCol: String, textCol: String,
                    srcCol: String, k: Int = 3, numHashes: Int = 128,
                    bands: Int = 16): DataFrame = {
    val pairs = Dedup.minhashLshPairs(df, idCol, textCol, k, numHashes, bands)
    val src = df.select(col(idCol).as("__d"), col(srcCol).as("__s"))
    val labeled = pairs
      .join(src.select(col("__d").as("a_id"), col("__s").as("__sa")), "a_id")
      .join(src.select(col("__d").as("b_id"), col("__s").as("__sb")), "b_id")
      .select(least(col("__sa"), col("__sb")).as("src_a"),
        greatest(col("__sa"), col("__sb")).as("src_b"),
        col("a_id"), col("b_id"))
    val counts = labeled.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_dup_pairs"))
    val docs = labeled.select(col("src_a"), col("src_b"), col("a_id").as("d"))
      .unionAll(labeled.select(col("src_a"), col("src_b"), col("b_id").as("d")))
      .groupBy("src_a", "src_b")
      .agg(countDistinct(col("d")).as("n_docs"))
    counts.join(docs, Seq("src_a", "src_b"))
  }

  /** Deterministic split predicate: doc is TEST iff
    * xxhash64(id) mod testMod == 0 (pmod — non-negative). */
  private def isTest(id: Column, testMod: Int): Column =
    pmod(xxhash64(id), lit(testMod.toLong)) === 0L

  /** Leakage-safe train/test split: every doc labeled
    * 'test' (hash-selected ~1/testMod), 'quarantine' (a TRAIN doc
    * that is a MinHash-LSH near-dup of some test doc — excluded from
    * both sides), or 'train'. Test docs are never quarantined, even
    * when they near-dup each other. Output: (id, split).
    *
    * The contaminated set needs no join with the test set: split
    * membership is a function of the id itself, so each candidate
    * pair decides map-side which (if either) of its ends it
    * contaminates; only the distinct quarantine ids — a set bounded
    * by the near-dup pair count, not the corpus — join back. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       testMod: Int = 10, k: Int = 3, numHashes: Int = 128,
                       bands: Int = 16): DataFrame = {
    require(testMod >= 2, s"testMod must be >= 2, got $testMod")
    val pairs = Dedup.minhashLshPairs(df, idCol, textCol, k, numHashes, bands)
    val contaminated = pairs.select(explode(array(
        when(isTest(col("b_id"), testMod) && !isTest(col("a_id"), testMod),
          col("a_id")),
        when(isTest(col("a_id"), testMod) && !isTest(col("b_id"), testMod),
          col("b_id")))).as("__q"))
      .filter(col("__q").isNotNull).distinct()
    df.select(col(idCol))
      .join(contaminated, col(idCol) === col("__q"), "left")
      .select(col(idCol),
        when(isTest(col(idCol), testMod), lit("test"))
          .when(col("__q").isNotNull, lit("quarantine"))
          .otherwise(lit("train")).as("split"))
  }
}
