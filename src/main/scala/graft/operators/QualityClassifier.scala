package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The two link functions mapping the linear score to (0, 1):
    *   - `"logistic"` — the textbook sigmoid 1/(1+e^−s). exp() is NOT
    *     ulp-identical across engines (measured: DuckDB's libm exp
    *     disagrees with the JVM intrinsic on ~0.3 % of inputs), so a
    *     logistic-trained model is deterministic WITHIN Spark
    *     (partition-invariant) but not exactly replayable outside it;
    *   - `"algebraic"` — σ̃(s) = 0.5 + 0.5·s/(1+|s|), the same
    *     monotone squash built from +,×,÷,|·| only, every one of
    *     which is a correctly-rounded IEEE op in any engine. The
    *     catalog query (t35) trains with this link so the ENTIRE
    *     gradient-descent loop replays bit-for-bit in DuckDB SQL. */
  private def linkCol(s: Column, link: String): Column = link match {
    case "logistic" => lit(1.0) / (lit(1.0) + exp(-s))
    case "algebraic" => lit(0.5) + lit(0.5) * s / (lit(1.0) + abs(s))
    case other => throw new IllegalArgumentException(
      s"unknown link '$other' (logistic | algebraic)")
  }

  /** Driver-side mirror of [[linkCol]] for scoring scalars. */
  def linkScalar(s: Double, link: String): Double = link match {
    case "logistic" => 1.0 / (1.0 + math.exp(-s))
    case "algebraic" => 0.5 + 0.5 * s / (1.0 + math.abs(s))
    case other => throw new IllegalArgumentException(
      s"unknown link '$other' (logistic | algebraic)")
  }

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
            lr: Double = 0.5, link: String = "logistic"): (Double, Array[Double]) = {
    val labels = df.select(col(idCol), col(labelCol).cast("double").as("y"))
    val docs = labels.localCheckpoint(true)
    val n = docs.count().toDouble
    require(n > 0, "empty training set")
    // bucket −1 is the BIAS pseudo-feature (x = 1 for every doc): the
    // per-bucket gradient aggregation then yields the bias gradient in
    // the same single collect — e·1.0 ≡ e exactly in IEEE, so the
    // gradient values are identical to a separate global sum, and the
    // per-epoch action count halves (one job, not two)
    val featsAug = features(df, idCol, textCol, nBuckets)
      .unionByName(docs.select(col(idCol), lit(-1L).as("b"), lit(1.0).as("x")))
      .join(docs, idCol).localCheckpoint(true)
    val feats = featsAug.filter(col("b") >= 0)

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
          linkCol(coalesce(col("dot"), lit(0.0)) + bias, link).as("p"))
      // gradient: per-bucket Σ (p−y)·x, decimal-summed (order-
      // independent ⇒ partition-invariant training); bucket −1 IS the
      // bias gradient (its x is the constant 1)
      val err = scored.select(col(idCol), (col("p") - col("y")).as("e"))
      val gradRows = featsAug.join(err, idCol)
        .groupBy("b")
        .agg(sum((col("e") * col("x")).cast("decimal(28,16)")).as("g"))
        .collect()
      var gBias = 0.0
      val g = Array.fill(nBuckets)(0.0)
      gradRows.foreach { r =>
        val b = r.getLong(0).toInt
        if (b < 0) gBias = r.getDecimal(1).doubleValue()
        else g(b) = r.getDecimal(1).doubleValue()
      }
      var j = 0
      while (j < nBuckets) { w(j) -= lr * g(j) / n; j += 1 }
      bias -= lr * gBias / n
    }
    featsAug.unpersist(); docs.unpersist()
    (bias, w)
  }

  /** Map-side scoring: adds `scoreCol` (the sigmoid probability) —
    * broadcast weights, no shuffle beyond the feature aggregation. */
  def score(df: DataFrame, idCol: String, textCol: String,
            bias: Double, w: Array[Double], scoreCol: String,
            link: String = "logistic"): DataFrame = {
    val dots = features(df, idCol, textCol, w.length)
      .groupBy(idCol)
      .agg(sum((element_at(lit(w), col("b").cast("int") + 1) * col("x"))
          .cast("decimal(28,16)")).cast("double")
        .as("__dot"))
    df.join(dots, Seq(idCol), "left")
      .withColumn(scoreCol,
        linkCol(coalesce(col("__dot"), lit(0.0)) + bias, link))
      .drop("__dot")
  }
}
