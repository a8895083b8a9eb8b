package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the cluster-resolution step
  * every dedup pipeline needs after candidate pairs: near-dup PAIRS
  * (minhashLshPairs, simhashPairs, embeddingNearDups...) only relate
  * documents two at a time, but "keep one copy" must hold per
  * transitive CLUSTER (a~b, b~c ⇒ keep exactly one of {a,b,c}).
  *
  * Algorithm: min-label propagation with pointer jumping (the
  * hash-to-min family, Rastogi et al., ICDE'13). Every edge-endpoint
  * starts labeled with itself; each round a node takes the minimum
  * label over its graph neighbors PLUS one "label edge" per node —
  * (v, c(v)), giving the pointer jump c(c(v)) — folded into ONE
  * equi-join + min-aggregate. Fixpoint =
  * every endpoint carries the minimum id of its component: a
  * canonical, deterministic representative independent of partitioning
  * and iteration order.
  *
  * Scale shape, the 100 TB lens:
  * - The iteration runs over EDGE ENDPOINTS only. In a real corpus
  *   near-dup edges touch a small fraction of documents; isolated
  *   nodes (the overwhelming majority) are unioned in as their own
  *   component at the END, never shuffled through the rounds.
  * - One round = ONE Spark job: the convergence metric (label sum —
  *   labels only ever decrease, so an unchanged sum ⇔ a fixpoint) is
  *   collected via `Dataset.observe` DURING the checkpoint
  *   materialization instead of a second aggregation job per round.
  * - Everything is equi-join/aggregate shaped — no driver-side graph;
  *   labels are checkpointed per round to sever the iterative lineage.
  * Rounds scale with log(diameter) on label chains via the pointer
  * jump; `maxIters` guards pathological inputs and the operator fails
  * loudly rather than return a non-converged (wrong) labeling.
  */
object Components {

  /** (node, component) for every node in `edges` (+ optional isolated
    * `nodes`, which keep themselves as component). `component` is the
    * smallest node id of the connected component. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          nodes: Option[DataFrame] = None,
                          maxIters: Int = 50): DataFrame = {
    // mirror each edge in ONE pass over the (often expensive) pair
    // pipeline feeding this: explode to (u,v) and (v,u) rather than a
    // self-union that would execute the pipeline once per branch, then
    // checkpoint the deduped symmetric list (scanned once per round)
    val sym = edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var round = 0
    // empty edge set: nothing to propagate (the convergence probe sums
    // labels, and a sum over zero rows is null every round — without
    // this short-circuit an all-singleton corpus would spin maxIters
    // empty jobs and then throw). isEmpty is one cheap action on the
    // checkpointed label frame.
    var converged = labels.isEmpty
    // Observation wiring is dropped for the rest of the run after a
    // single miss: each .observe registers a QueryExecutionListener
    // that only unregisters when its metric is consumed, so re-arming
    // it after a timeout would leak one listener + one 30 s stall per
    // remaining round (ADVICE r4).
    var useObserve = true
    while (!converged && round < maxIters) {
      round += 1
      // label edges (v, c(v)): v sees labels[c(v)] = c(c(v)) — the
      // pointer jump that contracts label chains; c(v)=v degenerates
      // to a self-loop, which keeps every node in the aggregation's
      // key set. (A reverse (c(v), v) edge would only deliver
      // labels[v] = c(v) — the recipient's own id — so it is omitted:
      // min propagation toward the root happens through the mirrored
      // graph edges in sym.)
      val aug = sym
        .union(labels.select(col("node").as("u"), col("comp").as("v")))
      val merged = aug
        .join(labels.withColumnRenamed("node", "__v"), col("v") === col("__v"))
        .groupBy("u").agg(min("comp").as("comp"))
        .select(col("u").as("node"), col("comp"))
      val obs = if (useObserve) Some(Observation()) else None
      val next = obs.fold(merged)(o =>
          merged.observe(o, sum(col("comp").cast("decimal(38,0)")).as("s")))
        .localCheckpoint(true)
      // the checkpoint materialization IS the round's only job; observe
      // collected the label sum during it. Defensive timeout: if the
      // metric ever failed to fire (obs.get would block forever), fall
      // back to an explicit aggregation over the checkpointed blocks —
      // and stop observing for the rest of the run (see useObserve).
      // Only the TIMEOUT falls back: a real failure inside the metric
      // computation (ExecutionException) propagates rather than being
      // silently converted into a second job. A dedicated daemon
      // thread is interrupted on timeout — parking the wait on the
      // shared global pool would leak one blocked worker per round in
      // exactly the scenario the timeout defends against.
      val checkpointSum = () => next.agg(sum(col("comp").cast("decimal(38,0)")))
        .head().getDecimal(0)
      val labelSum = obs match {
        case None => checkpointSum()
        case Some(o) =>
          val exec = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
            val t = new Thread(r, "graft-cc-observe"); t.setDaemon(true); t
          })
          try {
            val fut = exec.submit(new java.util.concurrent.Callable[java.math.BigDecimal] {
              override def call(): java.math.BigDecimal =
                o.get("s").asInstanceOf[java.math.BigDecimal]
            })
            try fut.get(30, java.util.concurrent.TimeUnit.SECONDS)
            catch {
              case _: java.util.concurrent.TimeoutException =>
                System.err.println(
                  s"connectedComponents: observe metric missed in round $round; " +
                    "falling back to explicit aggregation for remaining rounds")
                useObserve = false
                checkpointSum()
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          } finally exec.shutdownNow()
      }
      labels = next
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"connectedComponents round $round labelSum=$labelSum")
      // value compare, not object equals: BigDecimal.equals is
      // scale-sensitive (2 != 2.0), and the observe vs fallback paths
      // could legally disagree on result scale (ADVICE r4)
      converged = prevSum != null && labelSum != null &&
        labelSum.compareTo(prevSum) == 0
      prevSum = labelSum
    }
    if (!converged && round == maxIters)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — " +
          "component diameter exceeds maxIters; raise it (near-dup clusters " +
          "are dense/shallow; long chains are a sign the threshold is too loose)")
    // isolated nodes never entered the iteration; attach them as their
    // own singleton components
    nodes match {
      case Some(n) =>
        val all = n.select(col(n.columns.head).cast("long").as("node")).distinct()
        val isolated = all.join(labels, Seq("node"), "left_anti")
          .select(col("node"), col("node").as("comp"))
        labels.union(isolated)
      case None => labels
    }
  }

  /** One row per duplicate cluster: canonical keeper (min id), member
    * count — the "which doc survives dedup" summary. */
  /** Exact triangle count of an undirected pair graph — the standard
    * graph-shape statistic of a near-dup pair pipeline (triangles ≈
    * transitively-consistent duplicate groups; wedges that DON'T close
    * flag borderline-threshold pairs worth auditing).
    *
    * Algorithm: degree-ordered node-iterator (the MapReduce-classic
    * compact-forward form). Edges are oriented from the (degree, id)-
    * smaller endpoint to the larger, so every wedge is enumerated at
    * its lowest-degree vertex: the per-vertex wedge fan-out is bounded
    * by min-degree and the hub-vertex quadratic blowup of the naive
    * node-iterator never happens. Wedge generation and wedge closing
    * are both equi-joins (on the pivot vertex / on the closing pair) —
    * no cartesian anywhere, scales with Σ_e min-deg(e), the best known
    * join-based bound.
    *
    * Input must be canonical candidate pairs (a < b, distinct — what
    * every `*Pairs` operator here emits). Output: one row
    * (n_nodes, n_edges, n_triangles). */
  def triangleCount(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // eager localCheckpoint: the edge list feeds degree counting, both
    // wedge sides, the closing join AND the edge count — without it a
    // costly upstream pair pipeline (e.g. the d5 grid join) re-executes
    // once per reference; blocks free when the plan drops out of scope
    val ed = pairs.select(
      least(col(aCol), col(bCol)).cast("long").as("u"),
      greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)

    val deg = ed.select(col("u").as("n")).unionAll(ed.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))

    // orient each edge low -> high in the total (degree, id) order
    val du = deg.select(col("n").as("u"), col("deg").as("du"))
    val dv = deg.select(col("n").as("v"), col("deg").as("dv"))
    val dir = ed.join(du, "u").join(dv, "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("id"), col("du").as("d")))
          .otherwise(struct(col("v").as("id"), col("dv").as("d"))).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("v").as("id"), col("dv").as("d")))
          .otherwise(struct(col("u").as("id"), col("du").as("d"))).as("dst"))

    // wedges at the pivot (one equi-join on src), ordered so the
    // closing edge is oriented x -> y; close with a second equi-join
    val e1 = dir.select(col("src.id").as("p"), col("dst").as("x"))
    val e2 = dir.select(col("src.id").as("p"), col("dst").as("y"))
    val wedges = e1.join(e2, "p")
      .filter(struct(col("x.d"), col("x.id")) < struct(col("y.d"), col("y.id")))
      .select(col("x.id").as("wx"), col("y.id").as("wy"))
    val closing = dir.select(col("src.id").as("wx"), col("dst.id").as("wy"))
    val nTri = wedges.join(closing, Seq("wx", "wy"))
      .agg(count(lit(1)).as("n_triangles"))

    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = ed.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  def clusterSummary(components: DataFrame): DataFrame =
    components.groupBy(col("comp").as("keep_id"))
      .agg(count(lit(1)).as("n_members"))
}
