package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the learned companion to
  * the heuristic gates (t2 score, t33 Gopher rules): logistic
  * regression over hashed bag-of-words features, the fastText-style
  * linear filter the DCLM / FineWeb-Edu pipelines train to rank
  * pretraining documents (Li et al. 2024; Penedo et al. 2024 — both
  * train shallow linear/ngram models, not deep nets, exactly because
  * the filter must run over 10¹¹ documents).
  *
  * Spark-first, deterministic by construction:
  *   - features: `graft_fingerprint(word) % nBuckets` occurrence
  *     counts (the DSIR bucket convention) — one explode + one
  *     map-side-combinable (doc, bucket) count, localCheckpointed
  *     ONCE and reused by every epoch;
  *   - training: full-batch gradient descent, `epochs` rounds; each
  *     round scores every doc against the broadcast weight vector
  *     (array literal, model-sized) and aggregates the gradient
  *     per bucket with DECIMAL sums — every floating sum (dot
  *     products included) goes through decimal, so it is
  *     order-independent and the
  *     learned weights are bit-identical under any partitioning
  *     (QualityClassifierSpec asserts 1-vs-7-partition equality);
  *     the per-round driver collect is the ≤ nBuckets+1 gradient —
  *     a bounded model artifact, the KMeans-codebook pattern;
  *   - scoring: map-side only (broadcast weights, no shuffle) — the
  *     shape that lets the trained filter run inside any ingest
  *     pipeline (CorpusIngest's gate, a streaming foreachBatch) at
  *     full scan speed.
  *
  * At 100 TB: per epoch, one shuffle over the (doc, bucket) feature
  * table (combinable sums) + one bucket-keyed aggregation whose
  * output is ≤ nBuckets rows. Train on a SAMPLE (the labeled set is
  * always tiny next to the corpus); score the corpus with the final
  * broadcast weights.
  */
object QualityClassifier {

  /** (doc → bucket occurrence counts); one row per (id, bucket). */
  def features(df: DataFrame, idCol: String, textCol: String,
               nBuckets: Int): DataFrame = {
    val words = filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
    df.select(col(idCol), explode(words).as("f"))
      .select(col(idCol),
        (call_function("graft_fingerprint", col("f")) % nBuckets).as("b"))
      .groupBy(idCol, "b").agg(count(lit(1)).cast("double").as("x"))
  }

  /** Train logistic weights on (idCol, textCol, labelCol ∈ {0,1}).
    * Returns (bias, weights[nBuckets]). Deterministic: decimal
    * gradient sums + a fixed epoch count (no early stop on a
    * float comparison). */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            nBuckets: Int = 1024, epochs: Int = 20,
            lr: Double = 0.5): (Double, Array[Double]) = {
    val labels = df.select(col(idCol), col(labelCol).cast("double").as("y"))
    val feats = features(df, idCol, textCol, nBuckets)
      .join(labels, idCol).localCheckpoint(true)
    val n = labels.count().toDouble
    require(n > 0, "empty training set")
    val docs = labels.localCheckpoint(true)

    var bias = 0.0
    val w = Array.fill(nBuckets)(0.0)
    for (_ <- 1 to epochs) {
      // score each doc: Σ w[b]·x + bias (one combinable agg);
      // docs with no features score bias alone via the left join
      val wLit = lit(w)
      val scored = docs.join(
          feats.groupBy(idCol)
            .agg(sum((element_at(wLit, col("b").cast("int") + 1) * col("x"))
                .cast("decimal(28,16)")).cast("double")
              .as("dot")),
          Seq(idCol), "left")
        .select(col(idCol), col("y"),
          (lit(1.0) / (lit(1.0) +
            exp(-(coalesce(col("dot"), lit(0.0)) + bias)))).as("p"))
      // gradient: per-bucket Σ (p−y)·x and the bias term, decimal-
      // summed (order-independent ⇒ partition-invariant training)
      val err = scored.select(col(idCol), (col("p") - col("y")).as("e"))
      val gradRows = feats.join(err, idCol)
        .groupBy("b")
        .agg(sum((col("e") * col("x")).cast("decimal(28,16)")).as("g"))
        .collect()
      val gBias = err.agg(sum(col("e").cast("decimal(28,16)")))
        .head().getDecimal(0).doubleValue()
      val g = Array.fill(nBuckets)(0.0)
      gradRows.foreach(r => g(r.getLong(0).toInt) =
        r.getDecimal(1).doubleValue())
      var j = 0
      while (j < nBuckets) { w(j) -= lr * g(j) / n; j += 1 }
      bias -= lr * gBias / n
    }
    feats.unpersist(); docs.unpersist()
    (bias, w)
  }

  /** Map-side scoring: adds `scoreCol` (the sigmoid probability) —
    * broadcast weights, no shuffle beyond the feature aggregation. */
  def score(df: DataFrame, idCol: String, textCol: String,
            bias: Double, w: Array[Double], scoreCol: String): DataFrame = {
    val dots = features(df, idCol, textCol, w.length)
      .groupBy(idCol)
      .agg(sum((element_at(lit(w), col("b").cast("int") + 1) * col("x"))
          .cast("decimal(28,16)")).cast("double")
        .as("__dot"))
    df.join(dots, Seq(idCol), "left")
      .withColumn(scoreCol,
        lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__dot"), lit(0.0)) + bias))))
      .drop("__dot")
  }
}
