package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ql._
import graft.functions.TextOps
import graft.operators.{Components, CorpusMix, Decontaminate, Dedup, Packing, PrefixSum}

/** LLM-training-data pipeline compositions over `documents`
  * (SURVEY §2.8): benchmark decontamination, token-budget corpus
  * mixing, and the end-to-end corpus-cleanse pipeline a user of this
  * library would actually run. All three have exact DuckDB oracles —
  * every step (quality, langid, dedup, sampling, ranking) is
  * deterministic arithmetic both engines reproduce bit-for-bit. */
object PipelineQueries {

  private val mixBudgets = Map(
    "en" -> 4000L, "de" -> 1500L, "fr" -> 1500L, "es" -> 1500L, "zh" -> 1000L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the dedup END-GAME (what a pipeline actually emits): near-dup
    // clusters resolved over exact n-gram-Jaccard pairs, then ONE
    // representative kept per cluster — the HIGHEST-QUALITY member
    // (min doc_id on ties), not the arbitrary min-id keeper d1/d7 use.
    // Every stage is deterministic arithmetic (d4 pairs + connected
    // components + t2 quality), so the full composition stays
    // oracle-exact. One keep decision row per cluster; singletons
    // keep themselves.
    "p6_cluster_keep_best" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 5, threshold = 0.6, maxDf = 50L, minCommon = 5L)
      val comps = Components.connectedComponents(pairs, "a_id", "b_id",
          nodes = Some(docs.select("doc_id")))
        .select(col("node").as("doc_id"), col("comp").as("component"))
      val scored = docs.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("q"))
      // argmax via max-of-struct: (q desc, then min doc_id via negation)
      comps.join(scored, "doc_id")
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("q"), (-col("doc_id")).as("nid"))).as("best"))
        .select(col("component"), col("n_members"),
          (-col("best.nid")).as("keep_doc"), col("best.q").as("keep_q"))
        .orderBy("component")
    },

    // benchmark decontamination: corpus docs sharing >= 3 distinct
    // 8-grams with the (broadcast) eval split; eval = doc_id % 50 == 0
    "t9_contamination" -> { (s, d) =>
      val docs = t(s, d, "documents")
      Decontaminate.overlap(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", k = 8, minShared = 3L)
        .orderBy("doc_id")
    },

    // data mixture under per-language token budgets: deterministic
    // multiplicative-hash prefix per language (CorpusMix), reported as
    // per-language yield
    "t10_mix_budget" -> { (s, d) =>
      val docs = t(s, d, "documents")
        .withColumn("toks", TextOps.wsTokenCount(col("text")))
      val budget = mixBudgets.foldRight(lit(500L)) { case ((l, b), els) =>
        when(col("lang") === l, lit(b)).otherwise(els)
      }
      // adaptive bucket count (r12): sf-scale corpora take the plain
      // per-language prefix window (every stratum fits one task);
      // production corpora grow buckets linearly and keep the
      // two-level cap. Same rows either way.
      CorpusMix.tokenBudgetSample(docs, "lang", "doc_id", "toks",
          mixBudgets, defaultBudget = 500L,
          numBuckets = CorpusMix.autoBuckets(docs))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("tokens"))
        .withColumn("budget", budget)
        .withColumn("utilization", col("tokens").cast("double") / col("budget"))
        .orderBy("lang")
    },

    // the end-to-end cleanse a training-data user runs: quality gate →
    // exact dedup (keep min doc_id per content hash) → deterministic
    // 1-in-3 sample → per-predicted-language yield report
    // the raw-web ingest chain end to end (what a crawl-fed corpus
    // actually runs, in order): synthetic page (t28's construction) →
    // HTML extraction (t28) → canonical normalization (t24's cascade)
    // → exact dedup on the normalized hash → per-language yield.
    // Keep-first is ONE combinable groupBy(hash).min(struct) — the
    // min struct leads with the unique doc_id, so the winner row IS
    // row_number()=1, but a duplicate hub page collapses map-side
    // instead of filling one window task (VERDICT r10 item 1); the
    // per-lang report then joins two lang-cardinality aggregates.
    // Every stage is deterministic arithmetic, so the COMPOSITION
    // stays oracle-exact.
    "p7_crawl_pipeline" -> { (s, d) =>
      val body = TextOps.htmlExtract(TextQueries.htmlPage, minWords = 5)
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("body")), "[^a-z0-9 ]", " "), " +", " "))
      val pages = t(s, d, "documents")
        .withColumn("body", body)
        .withColumn("norm", norm)
        .select(col("doc_id"), col("lang"), col("norm"))
      val winners = pages
        .groupBy(md5(col("norm")).as("h"))
        .agg(min(struct(col("doc_id"), col("lang"),
          length(col("norm")).cast("long").as("len"))).as("w"))
        .select(col("w.lang").as("lang"), col("w.len").as("len"))
      val perLang = pages.groupBy("lang").agg(count(lit(1)).as("n_pages"))
      val keptLang = winners.groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("len")).cast("long").as("chars_kept"))
      perLang.join(keptLang, Seq("lang"), "left")
        .select(col("lang"), col("n_pages"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("chars_kept"), lit(0L)).as("chars_kept"))
        .orderBy("lang")
    },

    // quality gate → exact dedup → deterministic sample → yield.
    // Same keep-first shape as p7: groupBy(md5(text)).min(struct
    // (doc_id, …)) replaces the keyed window — identical survivors
    // (min doc_id per hash group), but partial-agg combinable so the
    // corpus's hottest duplicate cannot pin one task (VERDICT r10
    // item 1).
    "p1_corpus_pipeline" -> { (s, d) =>
      val kept = t(s, d, "documents")
        .withColumn("q", TextOps.qualityScore(col("text")))
        .filter(col("q") >= 0.45)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(struct(col("doc_id"), col("q"), col("text"))).as("w"))
        .select(col("w.doc_id").as("doc_id"), col("w.q").as("q"),
          col("w.text").as("text"))
      kept
        .filter(col("doc_id") % 3 === 0)
        .select(TextOps.langId(col("text")).as("lang_pred"),
          TextOps.wsTokenCount(col("text")).as("toks"), col("q"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("tokens"),
          (sum(col("q").cast("decimal(10,6)")).cast("double") / count(lit(1)))
            .as("avg_q"))
        .orderBy("lang_pred")
    },

    // sequence packing for pretraining (GPT-style concat-and-split):
    // documents concatenated in doc_id order and cut into fixed
    // 2048-token training sequences; a doc whose tokens straddle a cut
    // spans two sequences. The global token offset is the scale-correct
    // PrefixSum.runningSumLong — NOT an unpartitioned window (which
    // would drag the corpus through one task); everything after the
    // offset is integer arithmetic + one groupBy. Reported per
    // sequence: docs starting in it, their token mass, boundary
    // spans, and the head doc.
    "p4_pack_sequences" -> { (s, d) =>
      val budget = 2048L
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.wsTokenCount(col("text")).cast("long").as("toks"))
      PrefixSum.runningSumLong(docs, Seq("doc_id"), "toks", "cum")
        .withColumn("cum_before", col("cum") - col("toks"))
        .withColumn("seq_id", expr(s"cum_before DIV $budget"))
        .withColumn("offset", pmod(col("cum_before"), lit(budget)))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens"),
          sum((col("offset") + col("toks") > budget).cast("long")).as("n_spanning"),
          min(col("doc_id")).as("head_doc"))
        .orderBy("seq_id")
    },

    // whole-document training-shard packing (no document splits —
    // instruction-tuning corpora): deterministic per-shard next-fit
    // via Packing.packNextFit — one hash-partition shuffle + one
    // imperative pass, shards pack in parallel. Shard here is
    // doc_id % 8 so the oracle (a per-shard recursive CTE replaying
    // the same next-fit scan) is hash-free; production uses
    // xxhash64 % S, same operator.
    "p5_pack_bins" -> { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8L)).as("shard"),
          TextOps.wsTokenCount(col("text")).cast("long").as("toks"))
      Packing.packNextFit(docs, "shard", Seq("doc_id"), "toks", budget = 2048L)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("fill"),
          min(col("doc_id")).as("head_doc"))
        .orderBy("shard", "bin")
    },

    // first-fit-decreasing shard packing (r11): p5's corpus and budget
    // under the BETTER heuristic — FFD's 11/9·OPT+6/9 vs next-fit's
    // 2×OPT. Same operator skeleton (shard shuffle + imperative pass,
    // bins pack in parallel per shard); the oracle replays the exact
    // first-fit scan with a recursive CTE carrying the open-bin fill
    // LIST as state (list_position over a fits-mask finds the bin).
    "p8_pack_ffd" -> { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8L)).as("shard"),
          TextOps.wsTokenCount(col("text")).cast("long").as("toks"))
      Packing.packFirstFitDecreasing(docs, "shard", Seq("doc_id"), "toks",
          budget = 2048L)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("fill"),
          min(col("doc_id")).as("head_doc"))
        .orderBy("shard", "bin")
    },

    // deterministic training-order shuffle + sharding (the WRITE-side
    // final step every pretraining corpus runs: a seeded global
    // permutation cut into shard files): the t10 Knuth-rank
    // permutation orders the corpus, shard = rank % 16, within-shard
    // order = (rank, doc_id) — in production this is
    // `.repartition(shard)` + `sortWithinPartitions(rank)` + write;
    // here the per-shard MANIFEST the writer would emit. Every column
    // is a combinable aggregate — head doc via min(struct(rank, id)),
    // integrity checksum as an order-independent modular sum over
    // (rank, id) pairs (the permutation CONTENT, collect-free: a
    // per-shard ordered collect_list would be corpus/16 rows in one
    // task at scale). Integer arithmetic end to end → exact oracle.
    "p9_shuffle_shards" -> { (s, d) =>
      val p = 1000000007L
      val rank = ((col("doc_id") % lit(p)) * lit(2654435761L)) % lit(p)
      t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.wsTokenCount(col("text")).cast("long").as("toks"),
          rank.as("rk"))
        .withColumn("shard", pmod(col("rk"), lit(16L)))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens"),
          min(struct(col("rk"), col("doc_id"))).getField("doc_id")
            .as("head_doc"),
          sum(pmod(col("rk") * 31L + col("doc_id"), lit(p))).as("checksum"))
        .orderBy("shard")
    },

    // the corpus DATA CARD (r13): the per-source report a pipeline
    // publishes with every corpus drop — volume, exact dup rate,
    // token mass, sketch length percentiles, quality posture, top
    // token. Every field deterministic → the whole card is
    // oracle-exact (see CorpusStats scaladoc for the 100 TB shape).
    "p11_corpus_stats" -> { (s, d) =>
      graft.operators.CorpusStats.report(t(s, d, "documents"))
    },

    // cross-source duplication matrix (r12): which sources near-dup
    // each other (and themselves — the diagonal), via the d2 banded
    // MinHash join. The governance view that decides what to drop,
    // dedup against, or down-weight in the mix.
    "p12_source_overlap" -> { (s, d) =>
      graft.operators.CorpusGovernance.sourceOverlap(
          t(s, d, "documents"), "doc_id", "text", "source", k = 5)
        .orderBy("src_a", "src_b")
    },

    // leakage-safe train/test split (r12, Lee et al. 2021 §6): hash
    // mod selects test; train-side near-twins of test docs are
    // QUARANTINED so the eval can't be inflated by memorized twins.
    "p13_leakage_split" -> { (s, d) =>
      graft.operators.CorpusGovernance.leakageSafeSplit(
          t(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id")
    },

    // per-source quality quota (r12): keep the 5 highest-quality docs
    // per source — crawl-budget enforcement / the curation step that
    // caps any one domain's contribution. A rank<=k window IS the
    // scale-safe shape here, deliberately: Spark rewrites it to
    // WindowGroupLimit, which prunes every map partition to k rows
    // per group BEFORE the shuffle, so per-task state is k — unlike
    // the unbounded keep-first windows r11 removed (PlanShapeSpec
    // asserts the WindowGroupLimitExec is present).
    "p14_source_topk" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy(desc("q"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("q"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .orderBy("source", "rk")
    },

    // per-TOPIC corpus card (r12): the semantic balance view — d11's
    // deterministic coarse quantizer assigns every doc an embedding-
    // space topic; the card reports volume/share, topic coherence
    // (mean member-to-centroid cosine), dominant language, quality
    // posture and token mass per topic. Exact oracle: the Lloyd fit
    // replays via OracleVec.fitLocalCtes, everything after it is the
    // p11 card arithmetic.
    "p15_topic_card" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val quant = graft.operators.KMeans.fitLocal(
        emb, "vec_id", "embedding", k = 8, iters = 2)
      val model = quant.select(col("cell").cast("long"), col("cv"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
      graft.operators.CorpusStats.topicCard(
        t(s, d, "documents"), emb, "vec_id", "embedding", "doc_id", model)
    }
  )

  val oracle: Map[String, String] = Map(
    // t2's quality formula + a per-source rank window
    "p14_source_topk" ->
      s"""WITH q AS (SELECT doc_id, source,
         |    ${TextQueries.qualitySql} AS q
         |  FROM documents),
         | r AS (SELECT doc_id, source, q,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY q DESC, doc_id) AS BIGINT) AS rk FROM q)
         |SELECT doc_id, source, q, rk FROM r WHERE rk <= 5
         |ORDER BY source, rk""".stripMargin,

    // d11's Lloyd-fit replay (OracleVec.fitLocalCtes, same k=8/iters=2
    // model) + the winning-cosine assignment, then p11's card
    // arithmetic per topic cell; argmax lang replayed as a
    // (cnt DESC, lang DESC) window, integer DIV share
    "p15_topic_card" ->
      ("WITH " + OracleVec.fitLocalCtes(8, 2, 1, 65536, 64,
        "embeddings", "vec_id", "embedding") + s""",
         |tc_u AS MATERIALIZED (SELECT cell,
         |  CASE WHEN sqrt(list_dot_product(cv, cv)) > 0
         |       THEN list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
         |       ELSE list_transform(cv, x -> 0.0) END AS unit FROM fl_c2),
         |tc_asg AS MATERIALIZED (SELECT n.id, u.cell,
         |  list_dot_product(n.v, u.unit) / n.nrm AS cc
         |  FROM fl_nn n CROSS JOIN tc_u u
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY n.id ORDER BY cc DESC, u.cell) = 1),
         |tc_j AS MATERIALIZED (SELECT d.doc_id, d.text, d.lang, a.cell,
         |  ROUND(a.cc, 6) AS cos
         |  FROM documents d JOIN tc_asg a ON d.doc_id = a.id),
         |tc_base AS (SELECT cell, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(cos AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS coherence,
         |  CAST(SUM(CAST(${TextQueries.qualitySql} AS DECIMAL(10,6)))
         |    AS DOUBLE) / COUNT(*) AS avg_quality,
         |  CAST(SUM(len(regexp_split_to_array(trim(text), ' +'))) AS BIGINT)
         |    AS tokens
         |  FROM tc_j GROUP BY cell),
         |tc_lang AS (SELECT cell, lang, COUNT(*) AS cnt FROM tc_j GROUP BY 1, 2),
         |tc_top AS (SELECT cell, lang AS top_lang, cnt AS top_lang_cnt,
         |  ROW_NUMBER() OVER (PARTITION BY cell
         |    ORDER BY cnt DESC, lang DESC) AS rn FROM tc_lang),
         |tc_tot AS (SELECT COUNT(*) AS tot FROM tc_j)
         |SELECT b.cell, n_docs,
         |  CAST(n_docs * 1000000 // tot AS BIGINT) AS share_ppm,
         |  coherence, top_lang, top_lang_cnt, avg_quality, tokens
         |FROM tc_base b
         |JOIN (SELECT * FROM tc_top WHERE rn = 1) t USING (cell)
         |CROSS JOIN tc_tot
         |ORDER BY b.cell""").stripMargin,

    // d2's band machinery + source labels: distinct candidate pairs,
    // (least, greatest)-normalized source keys, pair + distinct-doc
    // counts per cell
    "p12_source_overlap" -> (DedupQueries.minhashBandsCte + """
        |, prs AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bs = b.bs AND a.doc_id < b.doc_id),
        | lab AS MATERIALIZED (SELECT
        |    least(sa.source, sb.source) AS src_a,
        |    greatest(sa.source, sb.source) AS src_b, p.a_id, p.b_id
        |  FROM prs p JOIN documents sa ON p.a_id = sa.doc_id
        |  JOIN documents sb ON p.b_id = sb.doc_id),
        | cnts AS (SELECT src_a, src_b, COUNT(*)::BIGINT AS n_dup_pairs
        |  FROM lab GROUP BY 1, 2),
        | dcs AS (SELECT src_a, src_b, COUNT(DISTINCT d)::BIGINT AS n_docs
        |  FROM (SELECT src_a, src_b, a_id AS d FROM lab
        |        UNION ALL SELECT src_a, src_b, b_id FROM lab) GROUP BY 1, 2)
        |SELECT src_a, src_b, n_dup_pairs, n_docs
        |FROM cnts JOIN dcs USING (src_a, src_b)
        |ORDER BY src_a, src_b""".stripMargin),

    // d2's band machinery for the near-dup pairs + OracleVec's
    // xxhash64(BIGINT) replay for the split hash (signed pmod);
    // quarantine = train-side end of any test-adjacent pair
    "p13_leakage_split" -> (DedupQueries.minhashBandsCte + ",\n" +
      OracleVec.hashLongCtes("spx", "documents", "doc_id") + """
        |, prs AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bs = b.bs AND a.doc_id < b.doc_id),
        | splt AS MATERIALIZED (SELECT id, ((hs % 10) + 10) % 10 = 0 AS is_test
        |  FROM spxfh),
        | cont AS MATERIALIZED (SELECT DISTINCT q FROM (
        |    SELECT CASE WHEN tb.is_test AND NOT ta.is_test THEN p.a_id
        |                WHEN ta.is_test AND NOT tb.is_test THEN p.b_id END AS q
        |    FROM prs p JOIN splt ta ON p.a_id = ta.id
        |    JOIN splt tb ON p.b_id = tb.id) WHERE q IS NOT NULL)
        |SELECT d.doc_id,
        |  CASE WHEN s.is_test THEN 'test'
        |       WHEN c.q IS NOT NULL THEN 'quarantine'
        |       ELSE 'train' END AS split
        |FROM documents d JOIN splt s ON d.doc_id = s.id
        |LEFT JOIN cont c ON d.doc_id = c.q
        |ORDER BY d.doc_id""".stripMargin),

    // every card field mirrored: t3's token convention, t2's quality
    // decimal-sum, t33's keep predicate, t34's sketch replay (keyed by
    // source), argmax as a (cnt DESC, tok DESC) window == Spark's
    // max(struct(cnt, tok))
    "p11_corpus_stats" ->
      s"""WITH base AS (
         |  SELECT source,
         |    COUNT(*) AS n_docs,
         |    COUNT(DISTINCT md5(text)) AS n_distinct,
         |    CAST(SUM(len(regexp_split_to_array(trim(text), ' +'))) AS BIGINT)
         |      AS tokens,
         |    CAST(SUM(CAST(${TextQueries.qualitySql} AS DECIMAL(10,6)))
         |      AS DOUBLE) / COUNT(*) AS avg_quality,
         |    CAST(SUM(CASE WHEN ${TextQueries.gopherKeepSql}
         |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS gopher_keep_frac
         |  FROM documents GROUP BY source),
         | lens AS (SELECT * FROM (
         |  ${TextQueries.sketchQuantilesSql("source", "n_chars", "documents",
              Seq(0.5 -> "p50_chars", 0.9 -> "p90_chars"))})),
         | tok AS (SELECT source, u.t AS tok FROM documents,
         |    UNNEST(regexp_split_to_array(trim(text), ' +')) AS u(t)
         |  WHERE len(u.t) > 0),
         | tc AS (SELECT source, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
         | top AS (SELECT source, tok AS top_token, cnt AS top_token_cnt,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, tok DESC) AS rn FROM tc)
         |SELECT b.source, n_docs, n_distinct,
         |  CAST(n_docs - n_distinct AS DOUBLE) / n_docs AS dup_frac,
         |  tokens, p50_chars, p90_chars, avg_quality, gopher_keep_frac,
         |  top_token, top_token_cnt
         |FROM base b
         |JOIN lens l ON b.source = l.source
         |JOIN (SELECT * FROM top WHERE rn = 1) t ON b.source = t.source
         |ORDER BY b.source""".stripMargin,

    // d4's pair pipeline + recursive-CTE closure + t2's quality
    // formula; argmax replayed as a (q DESC, doc_id) window
    "p6_cluster_keep_best" ->
      s"""WITH RECURSIVE
        | shall AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS s
        |  FROM documents CROSS JOIN generate_series(1, 50000) AS g(i)
        |  WHERE i <= length(text) - 4),
        | keep5 AS (SELECT s FROM shall GROUP BY s HAVING COUNT(*) <= 50),
        | sh AS (SELECT doc_id, shall.s FROM shall JOIN keep5 USING (s)),
        | sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        | com AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | pairs AS (SELECT a_id, b_id FROM com
        |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        |   WHERE c >= 5 AND CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= 0.6),
        | edges AS (SELECT a_id AS u, b_id AS w FROM pairs
        |   UNION SELECT b_id, a_id FROM pairs),
        | reach(node, r) AS (
        |   SELECT doc_id, doc_id FROM documents
        |   UNION
        |   SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.node),
        | comp AS (SELECT node AS doc_id, MIN(r) AS component
        |   FROM reach GROUP BY node),
        | q AS (SELECT doc_id, (${TextQueries.qualitySql}) AS q FROM documents),
        | rk AS (SELECT component, comp.doc_id, q.q,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY q.q DESC, comp.doc_id) AS rn
        |   FROM comp JOIN q ON q.doc_id = comp.doc_id),
        | cnt AS (SELECT component, COUNT(*) AS n_members
        |   FROM comp GROUP BY component)
        |SELECT component, n_members, rk.doc_id AS keep_doc, rk.q AS keep_q
        |FROM cnt JOIN rk USING (component) WHERE rn = 1
        |ORDER BY component""".stripMargin,

    "t9_contamination" ->
      """WITH ev AS (SELECT DISTINCT substr(text, CAST(i AS INT), 8) AS g
        |  FROM (SELECT text, unnest(range(1, length(text) - 6)) AS i
        |        FROM documents WHERE doc_id % 50 = 0)),
        | corp AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS i
        |        FROM documents WHERE doc_id % 50 <> 0)),
        | st AS (SELECT c.doc_id, COUNT(*) AS n_grams,
        |   COUNT(ev.g) AS n_shared
        |  FROM corp c LEFT JOIN ev ON c.g = ev.g GROUP BY c.doc_id)
        |SELECT doc_id, n_shared, n_grams,
        |  CAST(n_shared AS DOUBLE)/n_grams AS contam
        |FROM st WHERE n_shared >= 3 ORDER BY doc_id""".stripMargin,

    "t10_mix_budget" ->
      """WITH tok AS (SELECT doc_id, lang,
        |   CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS toks
        |  FROM documents),
        | r AS (SELECT *, ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rk FROM tok),
        | c AS (SELECT *, COALESCE(SUM(toks) OVER (PARTITION BY lang
        |     ORDER BY rk, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |   0) AS cumb FROM r),
        | b AS (SELECT *, CAST(CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 1500
        |     WHEN 'fr' THEN 1500 WHEN 'es' THEN 1500 WHEN 'zh' THEN 1000
        |     ELSE 500 END AS BIGINT) AS budget FROM c),
        | kept AS (SELECT * FROM b WHERE cumb < budget)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
        |  MAX(budget) AS budget,
        |  CAST(CAST(SUM(toks) AS BIGINT) AS DOUBLE) / MAX(budget) AS utilization
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    // the same chain in DuckDB: page → extract → normalize → dedup →
    // yield; built from the shared t28 SQL mirrors
    "p7_crawl_pipeline" ->
      s"""WITH h AS (SELECT doc_id, lang, ${TextQueries.htmlPageSql} AS html
        |  FROM documents),
        | b AS (SELECT doc_id, lang, ${TextQueries.htmlExtractSql("html")} AS body
        |  FROM h),
        | n AS (SELECT doc_id, lang,
        |   trim(regexp_replace(regexp_replace(lower(body), '[^a-z0-9 ]', ' ', 'g'),
        |     ' +', ' ', 'g')) AS norm
        |  FROM b),
        | dd AS (SELECT doc_id, lang, norm,
        |   ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
        |  FROM n)
        |SELECT lang, COUNT(*) AS n_pages,
        | CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(SUM(CASE WHEN rn = 1 THEN length(norm) ELSE 0 END) AS BIGINT)
        |   AS chars_kept
        |FROM dd GROUP BY lang ORDER BY lang""".stripMargin,

    "p1_corpus_pipeline" ->
      s"""WITH q AS (SELECT doc_id, text, (${TextQueries.qualitySql}) AS q
        |   FROM documents),
        | f AS (SELECT * FROM q WHERE q >= 0.45),
        | dd AS (SELECT * FROM f QUALIFY
        |   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        | samp AS (SELECT * FROM dd WHERE doc_id % 3 = 0),
        | l AS (SELECT doc_id, q, (${TextQueries.langPredSql}) AS lang_pred,
        |   CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS toks
        |  FROM samp)
        |SELECT lang_pred, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
        |  CAST(SUM(CAST(q AS DECIMAL(10,6))) AS DOUBLE)/COUNT(*) AS avg_q
        |FROM l GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,

    // the oracle may use the plain window cumsum — it runs at oracle
    // scale; the Spark side must not (see the query comment)
    "p4_pack_sequences" ->
      """WITH tok AS (SELECT doc_id,
        |   CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS toks
        |  FROM documents),
        | c AS (SELECT *, COALESCE(SUM(toks) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |   FROM tok)
        |SELECT CAST(cum_before // 2048 AS BIGINT) AS seq_id, COUNT(*) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS tokens,
        |  CAST(SUM(CASE WHEN cum_before % 2048 + toks > 2048 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_spanning,
        |  MIN(doc_id) AS head_doc
        |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin,

    // the recursive CTE replays packNextFit's per-shard scan: one row
    // per document, stepping rn -> rn+1 within each shard
    "p5_pack_bins" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, doc_id % 8 AS shard,
        |   CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS toks
        |  FROM documents),
        | ord AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
        |     ORDER BY doc_id) AS rn FROM tok),
        | st AS (
        |   SELECT shard, rn, doc_id, toks, CAST(0 AS BIGINT) AS bin,
        |     toks AS fill
        |   FROM ord WHERE rn = 1
        |   UNION ALL
        |   SELECT o.shard, o.rn, o.doc_id, o.toks,
        |     CASE WHEN s.fill > 0 AND s.fill + o.toks > 2048
        |       THEN s.bin + 1 ELSE s.bin END,
        |     CASE WHEN s.fill > 0 AND s.fill + o.toks > 2048
        |       THEN o.toks ELSE s.fill + o.toks END
        |   FROM st s JOIN ord o ON o.shard = s.shard AND o.rn = s.rn + 1)
        |SELECT shard, bin, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS fill,
        |  MIN(doc_id) AS head_doc
        |FROM st GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,

    // the recursive CTE carries each shard's open-bin fill list as
    // STATE: a fits-mask (list_transform) + list_position finds the
    // first open bin with room (this DuckDB returns 0, not NULL, on a
    // missing element — hence the `< 1` guard), slicing rebuilds the
    // list with the chosen bin's fill bumped, append opens a new bin
    "p8_pack_ffd" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, doc_id % 8 AS shard,
        |   CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS toks
        |  FROM documents),
        | ord AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
        |     ORDER BY toks DESC, doc_id) AS rn FROM tok),
        | st AS (
        |   SELECT shard, rn, doc_id, toks, CAST(0 AS BIGINT) AS bin,
        |     [toks] AS fills
        |   FROM ord WHERE rn = 1
        |   UNION ALL
        |   SELECT o.shard, o.rn, o.doc_id, o.toks,
        |     CASE WHEN COALESCE(list_position(
        |         list_transform(s.fills, f -> f + o.toks <= 2048), true), 0) < 1
        |       THEN CAST(len(s.fills) AS BIGINT)
        |       ELSE CAST(list_position(
        |         list_transform(s.fills, f -> f + o.toks <= 2048), true) - 1 AS BIGINT) END,
        |     CASE WHEN COALESCE(list_position(
        |         list_transform(s.fills, f -> f + o.toks <= 2048), true), 0) < 1
        |       THEN list_append(s.fills, o.toks)
        |       ELSE list_concat(list_concat(
        |         s.fills[:list_position(
        |           list_transform(s.fills, f -> f + o.toks <= 2048), true) - 1],
        |         [s.fills[list_position(
        |           list_transform(s.fills, f -> f + o.toks <= 2048), true)] + o.toks]),
        |         s.fills[list_position(
        |           list_transform(s.fills, f -> f + o.toks <= 2048), true) + 1:]) END
        |   FROM st s JOIN ord o ON o.shard = s.shard AND o.rn = s.rn + 1)
        |SELECT shard, bin, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS fill,
        |  MIN(doc_id) AS head_doc
        |FROM st GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,

    // same Knuth permutation / modular checksum integers; head doc via
    // the (rk, doc_id) argmin window
    "p9_shuffle_shards" ->
      """WITH r AS (SELECT doc_id,
        |   CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS toks,
        |   ((doc_id % 1000000007) * 2654435761) % 1000000007 AS rk
        |  FROM documents),
        | s AS (SELECT *, rk % 16 AS shard,
        |   ROW_NUMBER() OVER (PARTITION BY rk % 16 ORDER BY rk, doc_id) AS rn
        |  FROM r)
        |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
        |  CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS head_doc,
        |  CAST(SUM((rk * 31 + doc_id) % 1000000007) AS BIGINT) AS checksum
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin
  )
}
