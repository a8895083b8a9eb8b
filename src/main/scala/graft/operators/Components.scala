package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the cluster-resolution step
  * every dedup pipeline needs after candidate pairs: near-dup PAIRS
  * (minhashLshPairs, simhashPairs, embeddingNearDups...) only relate
  * documents two at a time, but "keep one copy" must hold per
  * transitive CLUSTER (a~b, b~c ⇒ keep exactly one of {a,b,c}).
  *
  * Algorithm: min-label propagation with pointer jumping (the
  * hash-to-min scheme of Rastogi et al., ICDE'13). Every node starts
  * labeled with itself; each round a node takes the minimum of its own
  * label, its neighbors' labels, and its LABEL's label (c(c(v)) — the
  * pointer jump that contracts label chains exponentially, so rounds
  * scale with log(diameter) rather than diameter). Fixpoint = every
  * node carries the minimum id of its component: a canonical,
  * deterministic cluster representative independent of partitioning
  * and iteration order.
  *
  * Scale shape: one round = one equi-join of the (undirected) edge
  * list against the label table + a map-side-combining min aggregate +
  * a label self-join (|V|-sized) — all equi-shuffles, no driver-side
  * graph. `maxIters` guards pathological inputs and the operator fails
  * loudly rather than return a non-converged (wrong) labeling. Labels
  * are checkpointed per round to sever the iterative lineage.
  */
object Components {

  /** (node, component) for every node in `edges` (+ optional isolated
    * `nodes`, which keep themselves as component). `component` is the
    * smallest node id of the connected component. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          nodes: Option[DataFrame] = None,
                          maxIters: Int = 50): DataFrame = {
    // checkpoint the forward edges BEFORE mirroring them: the pair
    // pipeline feeding this (often an expensive near-dup join) must
    // execute once, not once per union branch
    val fwd = edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .localCheckpoint(true)
    val sym = fwd
      .union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(true) // scanned once per round
    val endpoints = sym.select(col("u").as("node")).distinct()
    val nodeDf = nodes match {
      case Some(n) =>
        n.select(col(n.columns.head).cast("long").as("node"))
          .union(endpoints).distinct()
      case None => endpoints
    }
    var labels = nodeDf.select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)
    // labels only ever decrease, so an unchanged sum ⇔ a fixpoint
    var prevSum: java.math.BigDecimal = null
    var round = 0
    while (round < maxIters) {
      round += 1
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "__v"), col("v") === col("__v"))
        .groupBy("u").agg(min("comp").as("nmin"))
        .withColumnRenamed("u", "__u")
      val stepped = labels.join(nbrMin, col("node") === col("__u"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump: follow the label once (c(c(v))) — labels stay
      // inside the component (c(v) is reachable, so c(c(v)) is too)
      val next = stepped
        .join(stepped.select(col("node").as("__ln"), col("comp").as("__lc")),
          col("comp") === col("__ln"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("__lc"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val labelSum = next.agg(sum(col("comp").cast("decimal(38,0)")))
        .head().getDecimal(0)
      labels = next
      if (labelSum == prevSum) return labels
      prevSum = labelSum
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds — " +
        "component diameter exceeds maxIters; raise it (near-dup clusters " +
        "are dense/shallow; long chains are a sign the threshold is too loose)")
  }

  /** One row per duplicate cluster: canonical keeper (min id), member
    * count — the "which doc survives dedup" summary. */
  def clusterSummary(components: DataFrame): DataFrame =
    components.groupBy(col("comp").as("keep_id"))
      .agg(count(lit(1)).as("n_members"))
}
