package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape golden tests (VERDICT r8 item 8 / r10 item 4): pin the
  * physical-plan shape — shuffle count, broadcast count, WindowExec
  * count, parquet scan count — of the catalog's heaviest queries plus
  * the keep-first family fixed in r11. A future edit that adds a
  * shuffle, turns a broadcast into a shuffle join, or reintroduces a
  * corpus-keyed window (the r10 `weak` finding: windows have no
  * map-side partials, so a hub key lands in ONE task) fails here, at
  * test time, not in the round bench.
  *
  * Counts are over the STATIC plan (built, not executed — AQE may
  * still collapse exchanges at runtime, which only improves on the
  * pinned shape). sf0.001 keeps plan construction cheap; join
  * strategy choices are size-driven only through these same files, so
  * the pin is deterministic for the committed testdata. */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    self ++ p.subqueries.flatMap(flatten)
  }

  /** (shuffles, broadcasts, windows, parquet scans) of the built plan. */
  private def shape(df: DataFrame): (Int, Int, Int, Int) = {
    val nodes = flatten(df.queryExecution.executedPlan)
    (nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      nodes.count(_.isInstanceOf[WindowExec]),
      nodes.count(_.isInstanceOf[FileSourceScanExec]))
  }

  // name -> (shuffles, broadcasts, windows, scans). The golden values
  // ARE the audit: e.g. t30's 4 shuffles = segment agg + join-back +
  // doc reassembly + output sort, 0 windows by construction.
  private val golden: Map[String, (Int, Int, Int, Int)] = Map(
    // ---- the five r11 keep-first fixes: windows MUST stay 0.
    // (broadcast joins here are sf0.001 size decisions on the agg
    // side; at scale AQE plans the same joins as shuffle joins)
    "t30_paragraph_dedup" -> (5, 1, 0, 2),
    "t25_novelty" -> (6, 1, 0, 2),
    "p1_corpus_pipeline" -> (3, 0, 0, 1),
    "p7_crawl_pipeline" -> (4, 1, 0, 2),
    // r11/r14 fixes. t15/t17/t18: bigrams are formed map-side on the
    // split array (zip_with against its own tail, TextQueries
    // .bigramPairs) — 0 WindowExec; the former per-doc lead window
    // and its sort are gone (VERDICT r13 item 5). t15's 3 shuffles =
    // bigram-count agg + w1 denominator agg + output TakeOrdered
    // prep. t10: two-level bucketed cumsum —
    // all 3 windows are BOUNDED (the within-(stratum,bucket) cumsum
    // over stratum/numBuckets-sized groups appears in BOTH the offsets
    // and join branches of the static plan — column pruning defeats
    // static exchange reuse, the t15 pattern — plus the per-stratum
    // offset prefix over ≤ numBuckets tiny rows); the lang-keyed
    // mega-stratum window is gone.
    "t15_bigram_lm" -> (3, 1, 0, 2),
    // t17: 7 = spread repartition ×2 (token + bigram branch) +
    // (doc,w) and (doc,w1,w2) count aggs + the two per-doc rollups +
    // output sort; windows 0. t18: bigram-count agg feeds both the LM
    // table (broadcast) and the per-doc probe branch; windows 0.
    "t17_repetition" -> (7, 1, 0, 2),
    "t18_lm_score" -> (5, 2, 0, 3),
    // t10 (r12): autoBuckets picks numBuckets=1 at spec SF (50 docs),
    // so the plan IS the cheap single per-lang prefix window + the
    // report agg — the bucketed (6,1,3,2) shape only engages past
    // targetRows (65k docs/bucket), where every stratum window is
    // capped; PipelineOpsSpec pins the two paths row-identical and
    // the 1M-doc mega-stratum evidence covers the bucketed branch
    "t10_mix_budget" -> (2, 0, 1, 1),
    // ---- the 10 heaviest catalog queries (BENCH_r10 ranking).
    // Iterative operators (d7/d10/d12) run their rounds during plan
    // CONSTRUCTION and read localCheckpointed blocks, so their scan
    // count reflects the final assembly stage, not the per-round
    // scans; the pin still catches added shuffles/windows there.
    "d15_exact_substr" -> (5, 2, 0, 3),
    "d16_substr_remove" -> (7, 3, 0, 5),
    // r18: probe narrowing re-pinned this DOWN from (7,3,0,4) — the
    // candidate localCheckpoint feeds the verify join from cached
    // blocks (2 fewer exchanges) and the semi-narrowed text fetch
    // drops 2 corpus re-scans. r19: DOWN again (5 -> 4 shuffles) —
    // the chunked-In candidate-id pushdown narrows the corpus text
    // fetch AT THE SCAN, and the filtered side no longer exchanges
    "d17_cross_substr" -> (4, 3, 0, 2),
    "d7_dup_clusters" -> (3, 0, 0, 1),
    "d12_pagerank" -> (1, 0, 0, 0),
    "p6_cluster_keep_best" -> (4, 1, 0, 2),
    "m5_image_pipeline" -> (1, 1, 0, 2),
    "q20_excess_suppliers" -> (4, 1, 1, 2),
    "d10_triangles" -> (20, 2, 0, 0),
    "s11_hybrid_fusion" -> (16, 5, 2, 7),
    // ---- r12: the last two hub-keyed windows, converted. q_cdc:
    // latest-wins is a combinable max-struct agg — 0 windows (3
    // shuffles = latest agg + anti-join side + output sort; the
    // reduced changelog broadcasts). q_asof (r14, adaptive; r15
    // detection column-pruned): the catalog's balanced keys take the
    // FAST path — the key-only detection agg saw no hub, so the plan
    // is the single per-key running-last window + an extra repartition
    // + output sort (3 shuffles, 1 BOUNDED window: largest key ≤
    // 2× fair share by the switch rule); the bucketed two-window
    // carry engages only on detected hubs (AsOfJoinPropSpec pins
    // both branches and the switch itself); 2 scans because the fast
    // path consumes the tagged union LAZILY straight off the parquet
    // reads — r14's 0-scan shape was the full union materialized into
    // checkpoint blocks before the window, a write+read of every
    // payload byte the r15 shape no longer pays.
    "q_cdc_upsert" -> (3, 1, 0, 3),
    "q_asof_join" -> (3, 0, 1, 2),
    // ---- r13 additions. t33: one map-side pass + the output sort —
    // a second shuffle/scan would mean the struct got recomputed per
    // field. t34: bucket-count agg + lang re-partition + pick agg +
    // output sort; the 2 windows are the ordered cumsum and the
    // unordered per-group total, BOTH over the ≤ ~2k-row bucket table
    // (bounded by the sketch's size cap, never by group row count)
    // and sharing one exchange; one scan, no broadcast.
    "t33_gopher_rules" -> (1, 0, 0, 1),
    "t34_sketch_quantiles" -> (3, 0, 2, 1),
    // p11: 7 shuffles = base agg's two-phase distinct (2) + sketch
    // bucket agg + source re-agg + token counts + token argmax +
    // output sort; the 2 windows are t34's bounded bucket-table pair;
    // the two per-source sub-reports broadcast into the final join.
    "p11_corpus_stats" -> (7, 2, 2, 3),
    // ---- r12 governance additions. p12: the banded pair agg + the
    // two pair/doc-count aggs + final sort (7 shuffles); at sf0.001
    // every label/count join broadcasts (9) — size decisions that
    // become shuffle joins at scale; 0 windows. p13: band index +
    // pair agg + quarantine distinct + the (tiny) quarantine set
    // broadcast back + output sort; 0 windows. p14: ONE shuffle +
    // one window over k-pruned input (WindowGroupLimitExec asserted
    // below) + the output sort.
    "p12_source_overlap" -> (7, 9, 0, 6),
    "p13_leakage_split" -> (4, 1, 0, 1),
    "p14_source_topk" -> (2, 0, 1, 1),
    // p15: broadcast-model map-side assignment + ONE narrow
    // checkpointed pass (0 scans in the static plan — the fit and the
    // checkpoint run at build time) feeding three combinable
    // aggregations; tiny-frame joins + the documented scalar BNLJ; no
    // windows, no corpus-keyed shuffles beyond the aggs
    "p15_topic_card" -> (5, 1, 0, 0),
    // t36: checkpointed explode + checkpointed bounded count tables
    // (0 static scans — corpus work happens once at build); the 10
    // remaining shuffles all move bucket-/vocab-/source-bounded
    // tables; corpus tables re-join by broadcast; scalar totals via
    // the documented BNLJ
    "t36_source_drift" -> (10, 7, 0, 0)
  )

  test("heavy-query plan shapes stay pinned (shuffles/broadcasts/windows/scans)") {
    val actuals = golden.keys.toSeq.sorted.map { name =>
      name -> shape(SparkEntry.queries(name)(spark, sfDir))
    }
    val diffs = actuals.filter { case (n, s) => s != golden(n) }
    assert(diffs.isEmpty,
      "plan shape drift (actual vs golden):\n" + diffs.map { case (n, s) =>
        s"  $n: actual $s vs golden ${golden(n)}"
      }.mkString("\n") +
        "\nfull actuals:\n" + actuals.map { case (n, s) => s"  $n -> $s" }
        .mkString("\n"))
  }

  test("corpus-mix BUCKETED branch keeps its two-level shape") {
    // the golden map pins t10's small-corpus N=1 path; this pins the
    // SCALE path (explicit numBuckets) so the two-level cumsum can't
    // silently regress to a stratum-keyed window while autoBuckets
    // hides it at spec SF. 3 windows = within-(stratum,bucket) cumsum
    // (appears in both the offsets and join branches — column pruning
    // defeats static exchange reuse) + the tiny per-stratum offset
    // prefix; every one bounded.
    import org.apache.spark.sql.functions.col
    import graft.operators.CorpusMix
    import graft.functions.TextOps
    val docs = graft.ql.t(spark, sfDir, "documents")
      .withColumn("toks", TextOps.wsTokenCount(col("text")))
    val bucketed = CorpusMix.tokenBudgetSample(docs, "lang", "doc_id",
      "toks", Map("en" -> 4000L), defaultBudget = 500L, numBuckets = 1024)
    assert(shape(bucketed) === ((4, 1, 3, 2)) ||
      shape(bucketed) === ((5, 1, 3, 2)),
      s"bucketed corpus-mix shape drifted: ${shape(bucketed)}")
    val nodes = flatten(bucketed.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[WindowExec]) === 3)
  }

  test("keep-first family plans contain no WindowExec at all") {
    for (name <- Seq("t30_paragraph_dedup", "t25_novelty",
        "p1_corpus_pipeline", "p7_crawl_pipeline", "q_cdc_upsert")) {
      val nodes = flatten(
        SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[WindowExec]),
        s"$name regained a window — hub keys would serialize into one task")
    }
  }

  test("p14's rank window is WindowGroupLimit-pruned (k rows per task, not |source|)") {
    val nodes = flatten(
      SparkEntry.queries("p14_source_topk")(spark, sfDir)
        .queryExecution.executedPlan)
    assert(nodes.exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      "rank<=k filter no longer pushes into WindowGroupLimitExec — " +
        "the per-source window would buffer whole groups again")
  }

  test("ParaDedup.cleanAgainstIndex plan has no WindowExec") {
    import spark.implicits._
    val batch = Seq((1L, "a b c d e f g h i j k l"), (2L, "a b"))
      .toDF("doc_id", "text")
    val idx = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "seg")
    val nodes = flatten(
      graft.operators.ParaDedup.cleanAgainstIndex(idx, batch, "doc_id", "text")
        .queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[WindowExec]))
  }
}
