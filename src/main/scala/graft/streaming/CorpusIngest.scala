package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextOps
import graft.operators.{BloomMembership, Dedup, Drift, QualityClassifier}
import graft.sources.ShardSink

/** The production ingest loop end to end (p10): every stage the
  * corpus suite ships, composed into ONE streaming pipeline —
  *
  *   crawl batch (url, doc_id, text)
  *     → URL canonicalization           (TextOps.canonicalizeUrl, t32)
  *     → cross-batch URL frontier gate  (BloomMembership, D14/t32×D14)
  *     → encoding repair                (TextOps.repairMojibake, t39 —
  *                                       optional; before every gate
  *                                       and hash, after the url-only
  *                                       frontier so dropped docs
  *                                       never pay it)
  *     → Gopher document-shape gate     (TextOps.gopherShape, t33)
  *     → trained quality-filter gate    (QualityClassifier, t35 — optional)
  *     → exact-text dedup, in-batch + cross-batch   (D1's hash key)
  *     → MinHash-LSH near-dup, in-batch + cross-batch against the
  *       persisted (doc, band, bucket) index   (D2/D9 — optional)
  *     → deterministic training shards  (ShardSink, p9)
  *     → per-source drift-store fold    (Drift, t36 — optional)
  *
  * The two optional stages close the heuristics-only gap (VERDICT r13
  * item 1): the classifier gate scores each Gopher survivor against a
  * broadcast weight vector (map-side per partition; the one shuffle
  * is the doc-keyed feature aggregation) and keeps score ≥ threshold;
  * the drift stage folds the SHIPPED docs' (source, bucket) and
  * (source, token) count increments into a persisted bounded store —
  * counts are a commutative monoid, so the card read off the store at
  * any point equals the one-shot batch card over everything shipped
  * so far ([[driftCard]]).
  *
  * The batch body is a PURE DataFrame function ([[ingestBatch]]), so
  * the streaming pipeline and its batch twin are the same code — the
  * differential CorpusIngestSpec runs both over identical rows and
  * asserts identical survivors and identical shard content.
  *
  * State between batches is two mergeable bloom sketches persisted as
  * epoched 1-row-per-epoch parquet stores (seen URLs, seen text
  * hashes) — O(bits), not O(corpus); no batch ever rescans the
  * corpus. The trade is the
  * documented bloom one: a false positive drops a genuinely-new doc
  * at fpp (bounded, measured in the r11 frontier evidence at 45 ppm);
  * false negatives cannot happen, so no duplicate ever ships to a
  * shard. Within a batch, survivors-per-key are chosen by MIN doc_id
  * (combinable min-struct — deterministic under any partitioning,
  * unlike dropDuplicates).
  *
  * BLOOM CAPACITY (VERDICT r14 item 2; rollover wired r15): a sketch
  * sized once (`expectedItems`) and merged forever saturates when the
  * stream outlives its sizing — fpp rises quietly and every false
  * positive is a genuinely-new doc silently dropped. The frontier
  * store is therefore EPOCHED (`<path>/epoch=N/`, one immutable
  * sketch per epoch dir): each fold merges the batch's keys into the
  * ACTIVE (max) epoch, and when the merged filter's set-bit fraction
  * ([[graft.operators.BloomMembership.fillRatio]]) would pass
  * `rolloverAt` (default [[BloomMembership.FillWarnAt]] = 0.5, the
  * optimal-k design point where the filter holds exactly its design
  * capacity), the active epoch is FROZEN as-is and the increment
  * starts epoch N+1 — no key is ever dropped and no epoch ever
  * exceeds its design fpp. The probe is "seen in ANY epoch"
  * ([[BloomMembership.flagSeenAny]]: the key hashes once, k epochs =
  * k map-side codegen'd predicates in the same scan); chained probes
  * flag a SUBSET of the OR-merged filter (containment pinned in
  * BloomMembershipSpec) and overall fpp grows ≤ linearly in the epoch
  * count — visible in `stageLog` as `fill:*` (active-epoch fill) and
  * `epochs:*` (chain length). Per-fold I/O stays one epoch-dir write:
  * frozen epochs are immutable, so rollover costs nothing extra. The
  * only remaining silent-degradation case — ONE batch alone
  * overfilling a fresh epoch (sizing too small for a single batch) —
  * logs a warning; fix `expectedItems`, which bounds epoch count as
  * totalKeys / expectedItems.
  *
  * At 100 TB: canonicalize/gate/hash are map-side codegen; BOTH
  * dedup stages shuffle only their (key, doc_id) pair tables — the
  * text payload (~all the bytes at crawl scale) stays put behind
  * broadcast winner joins and crosses the network exactly ONCE per
  * batch, in the shard write, where clustering requires it. Bloom
  * probe/build are map-side + a driver-sized byte-array merge; the
  * drift fold is a batch-bounded append. Per batch the loop runs a
  * FIXED job inventory (r15, after folding the cheap driver actions:
  * the shipped-row count rides the shard write as an observed
  * metric, each bloom store is read once and its bytes reused for
  * probe + merge): 2 bloom loads, 2 winner-table checkpoints, 2
  * payload materializations (the frontier join, the kept survivors;
  * +1 with a classifier gate — all node-local, no network), the
  * shard write, 2 sketch-agg + 2 bloom writes, 1 drift append, plus
  * 3 near-dup jobs when that gate is on — none of whose input grows
  * with the corpus.
  *
  * MAINTENANCE: appendShards leaves one file per touched shard per
  * micro-batch, the near-dup gate and drift monitor each append one
  * increment file set per batch, and the frontier blooms grow an
  * epoch per fill rollover; [[start]] runs the maintenance quartet
  * ([[graft.sources.ShardSink.compactShards]],
  * [[compactNearDupIndex]], [[Drift.compactStore]],
  * [[compactFrontierBlooms]]) automatically on the `compactEvery`
  * cadence when set (VERDICT r14 item 3; bloom chain r15 item 2),
  * STAGGERED one phase per firing batch so the inline pause is capped
  * at the largest single pass, not the quartet's sum (r16 item 2; see
  * [[start]]'s LATENCY note) — manifests, resume order, rank
  * pushdown, gate semantics, and the drift card are invariant
  * (ShardSinkSpec, CorpusIngestSpec, StreamingDriftSpec), and the
  * bloom rebuild's one documented narrowing is analyzed in
  * [[compactFrontierBlooms]]. Batch callers compact on their own
  * cadence via [[runMaintenance]].
  */
object CorpusIngest {

  /** Stage-timer shape threaded from [[ingestBatch]] into its body
    * (polymorphic, so a plain function value can't carry it). */
  private trait TimedFn { def apply[A](name: String)(f: => A): A }

  /** Trained-filter gate config: keep docs whose
    * [[QualityClassifier.score]] probability is ≥ `threshold`.
    * Weights come from an offline `QualityClassifier.train` run on a
    * labeled sample — the model is broadcast per batch (≤ nBuckets+1
    * doubles), never retrained inside the loop. */
  final case class QualityGate(bias: Double, weights: Array[Double],
                               threshold: Double = 0.5,
                               link: String = "logistic")

  /** Near-dup stage config: the batch's MinHash signatures are banded
    * once ([[Dedup.minhashIndex]]'s layout); docs colliding with a
    * smaller-id batch doc or ANY doc in the persisted index on ≥
    * `minBands` bands are dropped, and the SHIPPED docs' band rows
    * append to the index after the shard write (step 4b) — so the
    * store at `indexDir` always holds exactly the shipped corpus's
    * index, even when a later gate drops a near-dup survivor (D9's
    * daily-ingest shape: the corpus is only ever touched through its
    * index; no text rescan). */
  final case class NearDupGate(indexDir: String, minBands: Int = 8,
                               k: Int = 3, numHashes: Int = 128,
                               bands: Int = 16)

  /** Exact-substring gate config (r19, VERDICT r18 item 7 — the
    * VERBATIM-overlap twin of [[NearDupGate]]): batch docs sharing a
    * ≥ `minLen`-char run with the SHIPPED corpus are dropped — the
    * corpus is touched only through its persisted winnow anchor index
    * at `indexDir` (generation-tiered like the band index;
    * [[graft.operators.Dedup.exactSubstrPairsAgainstDir]]) plus a
    * candidate-narrowed text fetch from the shard store for
    * verification. In-batch verbatim overlap gates keep-first by
    * doc_id. Shipped docs' anchors append after the shard write
    * (step 4b), so the index always holds exactly the shipped
    * corpus's anchors. `maxDf` df-caps
    * boilerplate fingerprints; the anchor compaction (maintenance
    * phase 4) persists the hot-hash table so the cap costs the probe
    * nothing once built. The near-dup gate catches mostly-similar
    * docs; this one catches a long doc quoting one ≥ minLen block
    * verbatim — disjoint drop classes (CorpusIngestSpec plants a doc
    * only THIS gate drops). */
  final case class SubstrGate(indexDir: String, minLen: Int = 50,
                              k: Int = 16, maxDf: Long = 0L)

  /** Source id for the drift stage: the canonical URL's host — the
    * granularity a crawl monitor acts on (re-balance / quarantine a
    * DOMAIN, not a page). canonicalizeUrl lowercases and strips the
    * default port, so the regex sees one form per host. */
  private def hostOf(canonUrl: org.apache.spark.sql.Column) =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/]+)", 1)

  /** One batch through the full pipeline. Returns the number of rows
    * appended to the shard store. Pure function of (batch, persisted
    * bloom + drift state) — called by the streaming sink and the
    * batch twin alike. `expectedItems` sizes NEW bloom increments;
    * merge requires the same sizing across a store's lifetime (a new
    * epoch restarts the sizing clock — see BLOOM CAPACITY).
    * `stageLog`, when supplied, receives (stage, seconds) wall-time
    * rows per driver-side action plus the `fill:*_bloom` /
    * `epochs:*_bloom` gauge readings — the per-stage profile the
    * ingest evidence prints. */
  def ingestBatch(batch: DataFrame, urlBloomPath: String,
                  textBloomPath: String, shardDir: String,
                  numShards: Int = 8,
                  expectedItems: Long = 100000L,
                  qualityGate: Option[QualityGate] = None,
                  driftDir: Option[String] = None,
                  repairEncoding: Boolean = false,
                  nearDup: Option[NearDupGate] = None,
                  substr: Option[SubstrGate] = None,
                  stageLog: Option[scala.collection.mutable.Buffer[(String, Double)]] = None,
                  rolloverAt: Double = BloomMembership.FillWarnAt,
                  maxBroadcastUrlRows: Long = MaxBroadcastUrlRows,
                  maxBroadcastKeyRows: Long = MaxBroadcastKeyRows,
                  payloadStorage: Option[org.apache.spark.storage.StorageLevel] = None): Long = {
    val ss = batch.sparkSession
    val timed = new TimedFn {
      def apply[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        stageLog.foreach(_ += name -> (System.nanoTime() - t0) / 1e9); a
      }
    }
    // PAYLOAD-bearing checkpoints take the caller's storage level
    // (VERDICT r16 item 4): the default memory-first level is right
    // for the ~hundreds-of-bytes catalog shape; a wide-payload crawl
    // can pass DISK_ONLY so multi-GB payload blocks never contend for
    // the unified memory region. Key-table checkpoints (winners, band
    // rows) stay memory-first: they are payload-free and hot.
    def ckptPayload(df: DataFrame): DataFrame =
      payloadStorage.fold(df.localCheckpoint(true))(
        lvl => df.localCheckpoint(true, lvl))
    // Every checkpoint this batch creates is INTERNAL — all consumers
    // (gates, winner joins, shard write, bloom folds, drift fold) run
    // inside this call — so the blocks are released DETERMINISTICALLY
    // on the way out instead of waiting on a driver GC to trigger the
    // ContextCleaner (r17: the 20 KB width study measured the gate
    // inflating 3→13 s/batch from exactly this residue — each wide
    // batch leaves ~2 GB of dead checkpoint blocks that an idle
    // driver heap reclaims far slower than the loop re-allocates).
    // The caller's own persisted frames (e.g. a checkpointed source
    // batch) predate the snapshot and are spared.
    val rddsBefore = ss.sparkContext.getPersistentRDDs.keySet
    try {
      ingestBatchBody(batch, urlBloomPath, textBloomPath, shardDir,
        numShards, expectedItems, qualityGate, driftDir, repairEncoding,
        nearDup, substr, stageLog, rolloverAt, maxBroadcastUrlRows,
        maxBroadcastKeyRows, ckptPayload, timed)
    } finally {
      ss.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!rddsBefore.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }

  private def ingestBatchBody(batch: DataFrame, urlBloomPath: String,
      textBloomPath: String, shardDir: String, numShards: Int,
      expectedItems: Long, qualityGate: Option[QualityGate],
      driftDir: Option[String], repairEncoding: Boolean,
      nearDup: Option[NearDupGate],
      substr: Option[SubstrGate],
      stageLog: Option[scala.collection.mutable.Buffer[(String, Double)]],
      rolloverAt: Double, maxBroadcastUrlRows: Long,
      maxBroadcastKeyRows: Long,
      ckptPayload: DataFrame => DataFrame,
      timed: TimedFn): Long = {
    val ss = batch.sparkSession

    // persisted frontier state is read ONCE per batch; the epoch
    // bytes feed both the probes and the end-of-batch merges (r15 —
    // previously each artifact was read twice)
    val (urlPrev, textPrev) = timed("state_load")(
      (loadBloomEpochs(ss, urlBloomPath), loadBloomEpochs(ss, textBloomPath)))

    // 1. within-batch URL dedup (min doc_id per canonical url) + the
    //    cross-batch frontier, computed on (canon_url, doc_id) ALONE:
    //    the wide text column never enters the dedup shuffle or the
    //    bloom probe — at crawl scale the payload is ~all the bytes,
    //    and the old min(struct(id, text)) aggregation shuffled every
    //    one of them (r15b). The tiny post-probe winner table then
    //    joins back BROADCAST when batch-sized (shuffled-join
    //    fallback past the cap = the old full-payload cost), and the
    //    optional t38 encoding repair runs on the JOINED survivors —
    //    frontier-dropped docs never pay the repair regex. Repair
    //    stays ahead of every gate and hash (its ordering contract:
    //    a mojibake variant of a shipped page must repair to the
    //    same bytes and fall to the exact-text dedup); canonical
    //    urls never depended on the text. The post-join rows are the
    //    stage's one payload materialization; everything downstream
    //    derives from those blocks map-side.
    val urlFresh = timed("canon_frontier") {
      // the winner also carries how many VERBATIM COPIES of its row
      // the batch holds (a retried crawl record lands twice): copies
      // are invisible to a key-equality join, so the duplicate slice
      // — normally empty — is collapsed by a payload aggregation
      // scoped to exactly those rows, and the unique bulk passes the
      // join untouched
      val flagged = BloomMembership.flagSeenAny(
          batch.select(
              TextOps.canonicalizeUrl(col("url")).as("canon_url"),
              col("doc_id"))
            .groupBy("canon_url", "doc_id")
            .agg(count(lit(1)).as("__copies"))
            .groupBy("canon_url")
            .agg(min(struct(col("doc_id"), col("__copies"))).as("__w"))
            .select(col("canon_url"), col("__w.doc_id").as("doc_id"),
              col("__w.__copies").as("__copies")),
          urlPrev.map(_._2), "canon_url", "__seen")
        .localCheckpoint(true) // consumers: size guard, join, drop gauge
      recordBloomDrops(flagged, urlBloomPath, "canon_url", "url", stageLog)
      val winners = flagged.filter(!col("__seen")).drop("__seen")
      val wj =
        if (winners.count() <= maxBroadcastUrlRows)
          broadcast(winners.alias("w"))
        else winners.alias("w")
      val text =
        if (repairEncoding) TextOps.repairMojibake(col("b.text"))
        else col("b.text")
      // THE stage's single payload materialization; the copies split
      // below stays lazy — both its branches, and both downstream
      // consumers (gates chain, url-bloom fold), derive map-side off
      // these checkpoint blocks
      val joined = ckptPayload(batch
        .withColumn("canon_url", TextOps.canonicalizeUrl(col("url")))
        .alias("b")
        .join(wj, col("b.canon_url") <=> col("w.canon_url") &&
          col("b.doc_id") === col("w.doc_id"))
        .select(col("b.canon_url"), col("b.doc_id"), text.as("text"),
          col("w.__copies").as("__copies")))
      joined.filter(col("__copies") === 1).drop("__copies")
        .unionByName(joined.filter(col("__copies") > 1)
          .groupBy("canon_url", "doc_id").agg(min(col("text")).as("text"))
          .select(col("canon_url"), col("doc_id"), col("text")))
    }

    // 2. quality gates — the t33 heuristic composite, then (when a
    //    model is supplied) the t35 trained filter: broadcast-weights
    //    scoring, keep P(keep) ≥ threshold
    val shaped = urlFresh
      .filter(TextOps.gopherShape(col("text")).getField("keep"))
    val gated = qualityGate.fold(shaped) { g =>
      QualityClassifier
        .score(shaped, "doc_id", "text", g.bias, g.weights, "__q", g.link)
        .filter(col("__q") >= g.threshold).drop("__q")
    }

    // 3. exact-text dedup: in-batch keep-first (min doc_id per text
    //    hash), then cross-batch via the text bloom — both computed
    //    on (text_hash, doc_id) ALONE, the same no-payload-shuffle
    //    shape as the frontier (r15b): the winner aggregation moves a
    //    tiny pair table, the bloom probes it, survivors join back
    //    broadcast (size-guarded). With this the payload crosses the
    //    network exactly ONCE per batch — in the shard write, where
    //    clustering requires it. Without a classifier gate the chain
    //    feeding the winners is map-side codegen off the urlFresh
    //    checkpoint (gopher + hash) and simply re-runs for the join
    //    pass; WITH one, the gated rows checkpoint once so the
    //    feature aggregation isn't paid twice (a local
    //    materialization still moves no bytes across the network).
    val fresh = timed("gates_exact_dedup") {
      val hashed0 = gated.withColumn("text_hash", xxhash64(col("text")))
      val hashed =
        if (qualityGate.isDefined) ckptPayload(hashed0) else hashed0
      // winner per text hash, carrying how many rows share its
      // (hash, doc_id) — the frontier's verbatim-copy defense again:
      // the same doc_id under two canonical urls with identical text
      // passes the URL stage as two rows that a key-equality join
      // would BOTH keep (the old groupBy shipped exactly one)
      val flagged = BloomMembership.flagSeenAny(
          hashed.select("text_hash", "doc_id")
            .groupBy("text_hash", "doc_id")
            .agg(count(lit(1)).as("__copies"))
            .groupBy("text_hash")
            .agg(min(struct(col("doc_id"), col("__copies"))).as("__w"))
            .select(col("text_hash"), col("__w.doc_id").as("doc_id"),
              col("__w.__copies").as("__copies")),
          textPrev.map(_._2), "text_hash", "__seen")
        .localCheckpoint(true) // consumers: size guard, join, drop gauge
      recordBloomDrops(flagged, textBloomPath, "text_hash", "text", stageLog)
      val winners = flagged.filter(!col("__seen")).drop("__seen")
      val wj =
        if (winners.count() <= maxBroadcastKeyRows)
          broadcast(winners.alias("w"))
        else winners.alias("w")
      val joined = hashed.alias("h").join(wj,
          col("h.text_hash") <=> col("w.text_hash") &&
          col("h.doc_id") === col("w.doc_id"))
        .select(col("h.text_hash"), col("h.doc_id"), col("h.canon_url"),
          col("h.text"), col("w.__copies").as("__copies"))
      ckptPayload( // one execution feeds sink + both blooms
        joined.filter(col("__copies") === 1).drop("__copies")
          .unionByName(joined.filter(col("__copies") > 1)
            .groupBy("text_hash", "doc_id")
            .agg(min(struct(col("canon_url"), col("text"))).as("__r"))
            .select(col("text_hash"), col("doc_id"), col("__r.canon_url"),
              col("__r.text"))))
    }

    // 3b. optional near-dup stage: band the batch ONCE, then
    //     (a) in-batch greedy keep-first — any doc colliding with a
    //         smaller doc_id on >= minBands bands drops;
    //     (b) cross-batch — any doc colliding with the persisted
    //         index drops (the corpus side is touched only through
    //         its (band, bucket) rows — no text rescan).
    // The band append happens AFTER the substring gate and the shard
    // write (step 4b) so the index holds exactly the SHIPPED corpus's
    // rows (ADVICE r19: appending the near-dup survivors here would
    // persist band rows for docs 3c then drops — never-shipped
    // content that silently gates genuinely novel future docs).
    val bandIdx = nearDup.map { nd =>
      timed("neardup_band") {
        Dedup.minhashIndex(fresh, "doc_id", "text",
          nd.k, nd.numHashes, nd.bands).localCheckpoint(true)
      }
    }
    val survivors = nearDup.fold(fresh) { nd =>
      timed("neardup_gate") {
        ckptPayload(fresh.join(
          nearDupDrops(bandIdx.get,
            narrowedCorpusIndex(ss, nd.indexDir, bandIdx.get, nd.minBands,
              stageLog, maxBroadcastKeyRows),
            nd.minBands, maxBroadcastKeyRows),
          Seq("doc_id"), "left_anti"))
      }
    }

    // 3c. optional exact-substring gate (r19): drop any doc sharing a
    //     >= minLen VERBATIM run with (a) the shipped corpus — probed
    //     through the tiered anchor index, text fetched candidate-
    //     narrowed from the shard store — or (b) a smaller-id doc in
    //     this batch (keep-first, like every other gate). Shipped
    //     docs' anchors append in step 4b so the index tracks exactly
    //     the shipped corpus. Runs AFTER the near-dup gate: its
    //     probes then only pay for docs every cheaper gate already
    //     passed.
    // The batch is winnowed ONCE (VERDICT r19 item 2 — the near-dup
    // gate's "banded ONCE" discipline): this one checkpointed anchor
    // table drives the cross-corpus probe, the in-batch self-pair
    // check, and (after the shard write) the index append. Pre-r20
    // each of the three re-ran the winnow kernel over the batch —
    // measured as ≥¾ of the gate's 12.7-15.3 s/batch steady cost.
    val batchAnchors = substr.map { sg =>
      timed("substr_winnow") {
        Dedup.winnowIndex(survivors, "doc_id", "text", sg.minLen, sg.k)
          .localCheckpoint(true)
      }
    }
    val shipping = substr.fold(survivors) { sg =>
      val dropIds = timed("substr_gate") {
        // the cross probe needs BOTH the anchor index (candidates)
        // and the shipped text (verification), and each store needs
        // its OWN data check: an all-dropped opening batch appends an
        // EMPTY anchor frame — whose zero-row part files still carry
        // a schema — while the shard store's dynamic-partition write
        // leaves no files at all, so reading it would die in schema
        // inference. No shipped text ⇒ no cross-batch dup is
        // possible ⇒ skipping is exact.
        def shardHasData: Boolean = {
          val (sfs, sroot) = fsOf(ss, shardDir)
          sfs.exists(sroot) && sfs.listStatus(sroot).exists(st =>
            st.isDirectory && sfs.listStatus(st.getPath).exists(f =>
              f.isFile && f.getPath.getName.endsWith(".parquet")))
        }
        // the cross-corpus probe and the in-batch self-pair check are
        // INDEPENDENT reads of the same checkpointed anchor table, so
        // they run as concurrent Spark actions (r20): the self check
        // rides the probe's scheduling gaps instead of serializing
        // ~3 s/batch behind it. Each future logs into its OWN buffer,
        // merged into the caller's after both complete (the shared
        // buffer is not thread-safe).
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        def privateLog() = stageLog.map(_ =>
          scala.collection.mutable.Buffer.empty[(String, Double)])
        def timedInto(log: Option[scala.collection.mutable.Buffer[(String, Double)]],
                      name: String)(f: => DataFrame): DataFrame = {
          val t0 = System.nanoTime(); val a = f
          log.foreach(_ += name -> (System.nanoTime() - t0) / 1e9); a
        }
        val crossLog = privateLog(); val selfLog = privateLog()
        val crossF = Future(timedInto(crossLog, "substr_cross") {
          (if (graft.sources.TieredIndex.liveNames(ss, sg.indexDir).nonEmpty
              && shardHasData)
            Dedup.exactSubstrPairsAgainstDir(ss, sg.indexDir,
                ss.read.parquet(shardDir).select("doc_id", "text"),
                survivors, "doc_id", "text", sg.minLen, sg.k, sg.maxDf,
                stageLog = crossLog, batchAnchors = batchAnchors)
              .select(col("batch_id").as("doc_id"))
          else survivors.select("doc_id").limit(0))
            .localCheckpoint(true)
        })
        val selfF = Future(timedInto(selfLog, "substr_self") {
          Dedup.exactSubstrPairsFromAnchors(survivors,
              batchAnchors.get, "doc_id", "text", sg.minLen, sg.k, sg.maxDf)
            .select(col("b_id").as("doc_id"))
            .localCheckpoint(true)
        })
        val cross = Await.result(crossF, Duration.Inf)
        val inBatch = Await.result(selfF, Duration.Inf)
        stageLog.foreach(buf =>
          Seq(crossLog, selfLog).flatten.foreach(buf ++= _))
        cross.unionByName(inBatch).distinct().localCheckpoint(true)
      }
      timed("substr_filter") {
        ckptPayload(survivors.join(dropIds, Seq("doc_id"), "left_anti"))
      }
    }

    // 4. shard append (per-batch files keep ShardSink's (rank, id)
    //    in-file training order; resume/manifest read the union).
    //    The shipped-row count rides the SAME job as an observed
    //    metric — no separate count action (r15, VERDICT item 5)
    val obs = org.apache.spark.sql.Observation()
    val n = timed("shard_write") {
      ShardSink.appendShards(
        shipping.select("doc_id", "canon_url", "text")
          .observe(obs, count(lit(1)).as("n")),
        "doc_id", shardDir, numShards)
      // a zero-row batch folds to an empty write whose plan never
      // executes, so the metric key is simply absent — that IS n = 0
      obs.get.get("n").fold(0L)(_.asInstanceOf[Long])
    }

    // 4b. dedup-index appends, AFTER the shard write succeeds and
    //     semi-joined to the final shipping set (ADVICE r19, both
    //     findings): each persisted index holds exactly the SHIPPED
    //     corpus's rows. Appending pre-gate (the r19 shape) persisted
    //     band rows for substring-gate drops — content that never
    //     shipped silently gating novel future docs — and a crash
    //     between an append and the shard write left orphan rows the
    //     replay could never reconcile. A crash in the remaining
    //     window (shard write done, append pending) under-represents
    //     the last batch until its at-least-once replay, whose
    //     re-appended rows the probes' replay-defense distinct
    //     already absorbs — the same window the text bloom accepts.
    val shipIds = shipping.select("doc_id")
    bandIdx.zip(nearDup).foreach { case (idx, nd) =>
      timed("neardup_append") {
        idx.join(shipIds, idx("doc") === shipIds("doc_id"), "left_semi")
          .write.mode("append").parquet(nd.indexDir)
      }
    }
    batchAnchors.zip(substr).foreach { case (anchors, sg) =>
      timed("substr_append") {
        // coalesced: the anchor table is 32 checkpoint partitions,
        // and 32 small files per batch made the tail's per-probe
        // footer cost 8x what the band index pays (measured 224 tail
        // files by batch 7 in the gate-on endurance); tail files are
        // read IN FULL per probe until the anchor phase folds them,
        // so fewer, bigger appends are strictly better
        anchors.join(shipIds, anchors("doc") === shipIds("doc_id"),
            "left_semi")
          .coalesce(4)
          .write.mode("append").parquet(sg.indexDir)
      }
    }

    // 5. fold this batch's keys into the persisted frontier state.
    //    URL bloom learns every canonical url SEEN (kept or dropped
    //    by quality/text-dedup — a crawled url is spent either way);
    //    text bloom learns the hashes that actually shipped. Each
    //    save reports the active epoch's fill ratio and the epoch
    //    count, rolling onto a fresh epoch past `rolloverAt` (the
    //    object scaladoc's BLOOM CAPACITY section)
    timed("bloom_fold") {
      val gauges = Seq(
        "url_bloom" -> saveBloom(ss, urlBloomPath, urlPrev,
          urlFresh.select("canon_url"), "canon_url", expectedItems,
          rolloverAt),
        "text_bloom" -> saveBloom(ss, textBloomPath, textPrev,
          shipping.select("text_hash"), "text_hash", expectedItems,
          rolloverAt))
      stageLog.foreach { buf =>
        gauges.foreach { case (name, g) =>
          g.foreach { case (fill, epochs) =>
            buf += s"fill:$name" -> fill
            buf += s"epochs:$name" -> epochs.toDouble
          }
        }
      }
    }

    // 6. drift monitor fold: count increments of what actually
    //    SHIPPED (per source host) — the t36 card stays readable at
    //    any point via [[driftCard]]. Both count tables move as ONE
    //    kind-tagged, batch-bounded APPEND (O(batch) per fold; the
    //    accumulated store is only ever touched by compaction)
    timed("drift_fold") {
      driftDir.foreach { dd =>
        val src = shipping.select(hostOf(col("canon_url")).as("source"),
          col("text"))
        Drift.foldDocsIntoStore(dd, src, "source", "text")
      }
    }
    n
  }

  /** Near-dup drop set: batch docs colliding with a smaller-id batch
    * doc (keep-first) or ANY corpus doc on ≥ `minBands` bands.
    * Collisions are counted PER PARTNER PAIR (the minhashLshPairs
    * contract) and only then reduced to a doc set — summing bands
    * across all partners would let many sub-threshold overlaps
    * (shared boilerplate with several docs) add up to a false drop
    * (CorpusIngestSpec pins both directions).
    *
    * The corpus side is NARROWED before anything shuffles it
    * (VERDICT r14 item 1): a broadcast semi-join on the batch's
    * distinct (band, bucket) keys filters the persisted index
    * map-side — the batch key set is batch-sized (≤ |batch| × bands
    * rows), the index is corpus-sized, and only rows in a bucket the
    * batch actually touches can ever collide. The replay-defense
    * distinct (foreachBatch is at-least-once; a retried batch's
    * re-appended band rows would otherwise double-count and halve the
    * effective threshold) then runs on the collision-sized slice, not
    * the corpus — per-batch shuffle work no longer grows with the
    * index; the index contributes one filtered columnar scan. */
  /** Broadcast cap for NARROW key tables — the near-dup (band,
    * bucket) pairs and the (text_hash, doc_id) winners, ~16-20 bytes
    * a row: 2M rows ≈ 40 MB serialized, comfortably under Spark's
    * broadcast limits; larger batches fall back to a shuffled
    * semi-join. */
  private[graft] val MaxBroadcastKeyRows = 2000000L

  /** Broadcast cap for the URL winner table, which carries full
    * canonical-url STRINGS (~100-200 bytes a row, plus JVM string
    * overhead once deserialized): 250k rows ≈ 25-50 MB serialized —
    * the row-count cap must be width-aware or a 2M-row URL broadcast
    * would build a multi-hundred-MB relation on the driver (r15
    * review finding). */
  private[graft] val MaxBroadcastUrlRows = 250000L

  private[graft] def nearDupDrops(batchIdx: DataFrame,
                                  corpusIdx: DataFrame,
                                  minBands: Int,
                                  maxBroadcastKeys: Long = MaxBroadcastKeyRows): DataFrame = {
    val a = batchIdx.alias("a"); val b = batchIdx.alias("b")
    val dropIn = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("__a"), col("b.doc").as("doc_id"))
      .agg(count(lit(1)).as("__nb")).filter(col("__nb") >= minBands)
      .select("doc_id")
    // The broadcast is size-guarded (r15 review finding): a backfill
    // batch of 10M docs × 16 bands is a multi-GB key set no driver
    // should collect. batchIdx is localCheckpointed, so the count is
    // a cheap cached-block pass; past the cap the semi-join runs as a
    // plain shuffle — the narrowing survives, only its physical form
    // changes (and a batch that big is corpus-scale anyway).
    val batchKeys = batchIdx.select("band", "bucket").distinct()
    val narrowKeys =
      if (batchIdx.count() <= maxBroadcastKeys) broadcast(batchKeys)
      else batchKeys
    val dropCross = corpusIdx
      .join(narrowKeys, Seq("band", "bucket"), "left_semi")
      .distinct().alias("c")
      .join(batchIdx.alias("p"), col("c.band") === col("p.band") &&
        col("c.bucket") === col("p.bucket") && col("c.doc") =!= col("p.doc"))
      .groupBy(col("c.doc").as("__c"), col("p.doc").as("doc_id"))
      .agg(count(lit(1)).as("__nb")).filter(col("__nb") >= minBands)
      .select("doc_id")
    dropIn.unionByName(dropCross).distinct()
  }

  /** Side-store suffix where each batch's bloom-POSITIVE-dropped
    * frontier keys accumulate (see [[recordBloomDrops]]). */
  private[graft] val DropsSuffix = "_drops"

  /** Record this batch's bloom-positive-DROPPED frontier keys: the
    * gauge for the frontier's one-sided error (VERDICT r17 item 3 —
    * a bloom false positive silently drops a genuinely-NEW doc, and
    * without a record of what was dropped the loss rate is
    * unmeasurable). Appends the dropped keys to `<bloom>_drops`
    * (O(positives) per batch — true cross-batch dups plus ≤ design-fpp
    * false positives) and gauges the raw positive count as
    * `bloomdrop:url|text`. [[frontierFpDrops]] later splits the
    * record into true dups vs false-positive losses against the
    * shipped store — exact for the text frontier (its bloom learns
    * only shipped hashes), an upper bound for the url frontier (its
    * bloom learns every url SEEN, so a quality-dropped recrawl is a
    * true positive that never shipped). `flagged` is a localCheckpoint,
    * so the count and the (skipped-when-empty) append are local-block
    * passes, not plan re-executions. */
  private def recordBloomDrops(flagged: DataFrame, bloomPath: String,
      keyCol: String, name: String,
      stageLog: Option[scala.collection.mutable.Buffer[(String, Double)]])
      : Unit = {
    val drops = flagged.filter(col("__seen")).select(keyCol)
    val n = drops.count()
    stageLog.foreach(_ += s"bloomdrop:$name" -> n.toDouble)
    if (n > 0)
      drops.coalesce(1).write.mode("append").parquet(bloomPath + DropsSuffix)
  }

  /** Split the accumulated frontier-bloom drops ([[recordBloomDrops]])
    * into losses: keys dropped as bloom-positive that the shipped
    * store does NOT contain. For the TEXT frontier this is an EXACT
    * false-positive-drop count (the text bloom folds only shipped
    * hashes, and the store write precedes the fold in every batch);
    * for the URL frontier it is an UPPER BOUND (a recrawl of a
    * quality- or dedup-dropped url is a true positive that never
    * shipped). Returns ("url" -> n, "text" -> n); `clearUrl` /
    * `clearText` truncate THAT frontier's drop store after reading
    * (the rebuild path sets the flag for the frontier it actually
    * rebuilt — a rebuilt bloom contains exactly the shipped keys, so
    * every prior fp is healed and the next window starts clean). The
    * flags are per-frontier because the two chains roll over at
    * different rates (ADVICE r18): a url-only rebuild must not
    * discard the text frontier's fp records while the text bloom is
    * still unhealed. One column-pruned store scan per frontier, off
    * the batch path — run it on the maintenance/evidence cadence,
    * never inline. */
  def frontierFpDrops(ss: SparkSession, urlBloomPath: String,
                      textBloomPath: String, shardDir: String,
                      clearUrl: Boolean = false,
                      clearText: Boolean = false): Map[String, Long] = {
    import ss.implicits._
    val (sfs, sroot) = fsOf(ss, shardDir)
    def store = ss.read.parquet(shardDir)
    def gauge(bloomPath: String, storeKeys: => DataFrame,
              keyCol: String, clear: Boolean): Long = {
      val (fs, droot) = fsOf(ss, bloomPath + DropsSuffix)
      graft.sources.DirSwap.recover(fs, droot, "__compact")
      if (!fs.exists(droot)) return 0L
      val dropped = ss.read.parquet(droot.toString).select(keyCol).distinct()
      val lost =
        if (!sfs.exists(sroot)) dropped.count()
        else dropped.join(storeKeys, Seq(keyCol), "left_anti").count()
      if (clear) fs.delete(droot, true)
      lost
    }
    Map(
      "url" -> gauge(urlBloomPath,
        store.select(col("canon_url")).distinct(), "canon_url", clearUrl),
      "text" -> gauge(textBloomPath,
        store.select(xxhash64(col("text")).as("text_hash")).distinct(),
        "text_hash", clearText))
  }

  /** Bound the fp-drop side store between rebuilds (ADVICE r18):
    * [[recordBloomDrops]] appends ONE file per batch with any bloom
    * positive, and a true cross-batch dup (the common case in
    * recrawl-heavy workloads) re-records EVERY batch it reappears in
    * — so rows and file count grow linearly in batches until a chain
    * rebuild clears the window, and grow forever if the >2-epoch
    * rebuild trigger never fires. On the bloom-maintenance cadence
    * this folds the store to its DISTINCT keys in one file behind a
    * rename-only twin swap: rows become O(distinct dropped keys) —
    * the information [[frontierFpDrops]] actually consumes (it reads
    * through `distinct()`) — and the file count resets to 1, so the
    * gauge's scan stays flat on any cadence regardless of rebuild
    * frequency. Crash-safe via [[graft.sources.DirSwap]]. */
  private def compactDropsStore(ss: SparkSession, bloomPath: String,
                                keyCol: String): Unit = {
    val (fs, droot) = fsOf(ss, bloomPath + DropsSuffix)
    graft.sources.DirSwap.recover(fs, droot, "__compact")
    if (!fs.exists(droot)) return
    val twin = new org.apache.hadoop.fs.Path(droot.toString + "__compact")
    ss.read.parquet(droot.toString).select(keyCol).distinct()
      .coalesce(1).write.mode("overwrite").parquet(twin.toString)
    graft.sources.DirSwap.swap(fs, droot, twin)
  }

  /** The t36 drift card over everything shipped so far — exactly the
    * batch card of the shipped corpus (the counts-monoid contract,
    * differentially pinned in CorpusIngestSpec). */
  def driftCard(spark: SparkSession, driftDir: String): DataFrame =
    Drift.cardFromStore(spark, driftDir)

  /** Start the streaming form: a (url, doc_id, text) stream through
    * [[ingestBatch]] per micro-batch. `compactEvery` > 0 runs the
    * maintenance quartet (shard compaction, near-dup index compaction,
    * drift-store compaction, frontier-bloom chain compaction) on that
    * cadence (VERDICT r14 item 3 — the loop owns its own maintenance;
    * manifests/resume/pushdown/gate semantics invariant,
    * CorpusIngestSpec exercises it through the loop), STAGGERED one
    * phase per firing batch (VERDICT r16 item 2): phase k of
    * [[runMaintenancePhase]] fires on batches where
    * `(batchId + 1 - k) % compactEvery == 0` — shards first at batch
    * `compactEvery`, then the index / drift / bloom passes on the
    * next three batches, each phase repeating every `compactEvery`
    * batches thereafter. Default off: operators who compact off-peak
    * pass 0 and keep the old contract.
    *
    * LATENCY: a firing batch pays its phase INLINE in foreachBatch
    * before the next batch starts — each compaction rewrites its
    * whole store, so the spike scales with corpus size, not batch
    * size. Staggering caps any single pause at the LARGEST SINGLE
    * pass instead of the quartet's sum (r16 measured the monolithic
    * block at 26.5 s on a 708k-doc store; the shard pass dominates) —
    * sound because each store's swap is independent and crash-safe
    * ([[graft.sources.DirSwap]]), and no pass reads a store another
    * pass writes mid-flight (the bloom rebuild reads the SHARD store,
    * whose content is identical before and after its own compaction).
    * With compactEvery < 4 the offsets wrap and phases share firing
    * batches (compactEvery = 1 degenerates to the full quartet per
    * batch). Exactly-once-per-cadence still rides the checkpointed
    * batchId: monotonic across restarts, so a loop that restarts
    * every few hundred batches still compacts on schedule. Operators
    * who cannot absorb even the single-pass spike should leave
    * compactEvery = 0 and run [[runMaintenance]] off-peak while the
    * stream is stopped.
    *
    * `payloadStorage` forwards to [[ingestBatch]]'s wide-payload
    * checkpoint knob. */
  def start(stream: DataFrame, urlBloomPath: String, textBloomPath: String,
            shardDir: String, numShards: Int = 8,
            expectedItems: Long = 100000L,
            qualityGate: Option[QualityGate] = None,
            driftDir: Option[String] = None,
            repairEncoding: Boolean = false,
            nearDup: Option[NearDupGate] = None,
            substrGate: Option[SubstrGate] = None,
            compactEvery: Int = 0,
            rolloverAt: Double = BloomMembership.FillWarnAt,
            payloadStorage: Option[org.apache.spark.storage.StorageLevel] = None): StreamingQuery = {
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, urlBloomPath, textBloomPath, shardDir,
          numShards, expectedItems, qualityGate, driftDir, repairEncoding,
          nearDup, substrGate, rolloverAt = rolloverAt,
          payloadStorage = payloadStorage)
        if (compactEvery > 0)
          maintenancePhasesDue(batchId, compactEvery).foreach(k =>
            runMaintenancePhase(batch.sparkSession, k, urlBloomPath,
              textBloomPath, shardDir, nearDup, driftDir, substrGate))
        ()
      }
      .start()
  }

  /** Number of maintenance phases (see [[runMaintenancePhase]]). */
  val MaintenancePhases = 5

  /** The phases due after `batchId` on a `compactEvery` cadence —
    * phase k's first firing is batch `compactEvery + k - 1`
    * (0-indexed), repeating every `compactEvery` batches; the
    * staggering contract [[start]] documents. */
  private[graft] def maintenancePhasesDue(batchId: Long,
                                          compactEvery: Int): Seq[Int] =
    (0 until MaintenancePhases).filter { k =>
      val n = batchId + 1 - k
      n > 0 && n % compactEvery == 0
    }

  /** One maintenance PHASE over the stores the loop owns: 0 = shard
    * compaction ([[graft.sources.ShardSink.compactShards]]), 1 =
    * near-dup index compaction ([[compactNearDupIndex]]), 2 =
    * drift-store compaction ([[Drift.compactStore]]), 3 =
    * frontier-bloom chain compaction ([[compactFrontierBlooms]]),
    * 4 = anchor-index compaction + hot-hash metadata rebuild
    * ([[graft.operators.Dedup.compactAnchorIndex]], when the
    * exact-substring gate is on). [[start]] staggers these across
    * consecutive firing batches; [[runMaintenance]] runs all five for
    * off-peak callers. NEVER call concurrently with an in-flight
    * [[ingestBatch]] (every store swap assumes the single-writer
    * loop). */
  def runMaintenancePhase(ss: SparkSession, phase: Int,
                          urlBloomPath: String, textBloomPath: String,
                          shardDir: String,
                          nearDup: Option[NearDupGate] = None,
                          driftDir: Option[String] = None,
                          substr: Option[SubstrGate] = None): Unit =
    phase match {
      case 0 =>
        val (fs, root) = fsOf(ss, shardDir)
        if (fs.exists(root)) // every batch so far may have shipped 0
          ShardSink.compactShards(ss, shardDir, "doc_id")
      case 1 => nearDup.foreach(nd => compactNearDupIndex(ss, nd.indexDir))
      case 2 => driftDir.foreach(dd => Drift.compactStore(ss, dd))
      case 3 => compactFrontierBlooms(ss, urlBloomPath, textBloomPath,
        shardDir)
      case 4 => substr.foreach(sg =>
        Dedup.compactAnchorIndex(ss, sg.indexDir, sg.maxDf))
      case other => throw new IllegalArgumentException(
        s"maintenance phase must be in [0, $MaintenancePhases), got $other")
    }

  /** One FULL maintenance pass — all [[MaintenancePhases]] phases of
    * [[runMaintenancePhase]] in order — for batch/off-peak callers
    * compacting on their own schedule while the stream is stopped.
    * [[start]] staggers the phases instead (one per firing batch) to
    * cap the inline pause. */
  def runMaintenance(ss: SparkSession, urlBloomPath: String,
                     textBloomPath: String, shardDir: String,
                     nearDup: Option[NearDupGate] = None,
                     driftDir: Option[String] = None,
                     substr: Option[SubstrGate] = None): Unit =
    (0 until MaintenancePhases).foreach(k =>
      runMaintenancePhase(ss, k, urlBloomPath, textBloomPath, shardDir,
        nearDup, driftDir, substr))

  /** Maintenance for the near-dup band index: the ingest loop APPENDS
    * survivors' band rows every micro-batch (one file per batch), so
    * a long-running stream accumulates small files and the per-batch
    * probe scan pays file-open/footer cost per file.
    *
    * GENERATION-TIERED (r19, [[graft.sources.TieredIndex]] — VERDICT
    * r18 item 1): each pass clusters ONLY the tail — files appended
    * since the last pass — into a new immutable generation carrying
    * its own right-sized (band, bucket) key bloom and per-file
    * clustered ranges, and merges the two SMALLEST generations when
    * the count passes the cap (size-tiered LSM). Because generations
    * are immutable there is no shared bloom to exhaust, so the r18
    * design's capacity-triggered FULL rewrite — the loop's one
    * remaining store-scaling inline pause (88.2 s measured at a
    * 22.7M-row store; ~45 min at a 10⁹-row production index) — no
    * longer exists as a code path: EVERY inline pause is tail- or
    * merged-pair-bounded, and merge cost amortizes geometrically
    * (each band row is rewritten O(log n) times over the index's
    * life). Crash safety (staged files + atomic manifest + the
    * sidecar swap as commit pivot), the self-healing upgrade path (a
    * pre-r19 single-bloom sidecar parses as absent → its files
    * recluster as ordinary tail, byte-capped per pass so even the
    * migration never full-rewrites inline), and the probe contract
    * are [[graft.sources.TieredIndex]]'s. [[start]] runs this on the
    * `compactEvery` cadence when the near-dup gate is on; batch
    * callers compact on their own schedule. */
  def compactNearDupIndex(ss: SparkSession, indexDir: String,
                          targetFileBytes: Long = 128L * 1024 * 1024,
                          maxGenerations: Int =
                            graft.sources.TieredIndex.DefaultMaxGenerations): Unit =
    graft.sources.TieredIndex.compact(ss, indexDir,
      bandIndexSpec(targetFileBytes, maxGenerations))

  /** The band index's tiered-maintenance shape: (doc, band, bucket)
    * rows clustered and summarized on (band, bucket). */
  private[graft] def bandIndexSpec(
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxGenerations: Int = graft.sources.TieredIndex.DefaultMaxGenerations)
      : graft.sources.TieredIndex.Spec =
    graft.sources.TieredIndex.Spec(
      rowCols = Seq("doc", "band", "bucket"),
      keyCols = Seq("band", "bucket"),
      maxGenerations = maxGenerations,
      targetFileBytes = targetFileBytes)

  /** The tiered per-batch view of the persisted near-dup index
    * (VERDICT r16 item 1): the r15 semi-join moved the per-batch
    * SHUFFLE off the index but still paid one full columnar scan per
    * batch — linear in the corpus (~0.13 s per million index rows in
    * the r16 endurance run; minutes per micro-batch at a 10⁹-row
    * production index). With the compaction-built generation sidecar
    * the scan is bounded by the BATCH instead:
    *
    *   - BASE (files some generation describes): batch keys are
    *     flagged map-side against the generations' key blooms (one
    *     predicate per generation, same scan — a key is hot if ANY
    *     generation may hold it), then reduced to SUSPECT DOCS —
    *     batch docs with ≥ `minBands` hot bands. A doc with fewer hot
    *     bands cannot reach the drop threshold against ANY corpus
    *     partner (each counted pair band needs its key in the corpus,
    *     and blooms have no false negatives), so its keys never need
    *     the base. This filter is what makes the tier bite on real
    *     corpora: shared vocabulary keeps per-KEY hits in the
    *     thousands per batch (sub-threshold 1–3-band matches —
    *     measured live in the r17 endurance run), but per-DOC
    *     threshold crossings are exactly the true cross-batch
    *     near-dups. No suspects → the base is not read at all;
    *     otherwise only base files whose clustered key range contains
    *     a suspect key are read ([[graft.sources.TieredIndex.pruneFiles]])
    *     and immediately semi-joined down to those keys.
    *   - TAIL (files appended since the last compaction): scanned in
    *     full — bounded by compactEvery batches of survivor keys,
    *     corpus-independent.
    *
    * A missing, stale (file set no longer a subset of the live dir)
    * or unparsable sidecar degrades every file to TAIL — exactly the
    * pre-r17 full scan, same semantics. Gate decisions are invariant
    * either way: every index row that can pair with a batch key TO A
    * DROP survives the narrowing (CorpusIngestSpec pins the
    * with/without differential).
    *
    * Gauges (when `stageLog` is on): `ndidx:base_files` /
    * `ndidx:base_files_read` / `ndidx:hot_keys` (suspect docs' keys)
    * / `ndidx:tail_files` / `ndidx:generations` — the bounded-scan
    * evidence the ingest log prints. */
  private[graft] def narrowedCorpusIndex(ss: SparkSession, indexDir: String,
      batchIdx: DataFrame, minBands: Int,
      stageLog: Option[scala.collection.mutable.Buffer[(String, Double)]] = None,
      maxBroadcastKeys: Long = MaxBroadcastKeyRows): DataFrame = {
    import ss.implicits._
    import graft.sources.TieredIndex
    val (fs, target) = fsOf(ss, indexDir)
    graft.sources.DirSwap.recover(fs, target, "__compact")
    TieredIndex.recover(ss, indexDir)
    def emptyIdx = Seq.empty[(Long, Int, Long)].toDF("doc", "band", "bucket")
    if (!fs.exists(target)) return emptyIdx
    val live = fs.listStatus(target).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    if (live.isEmpty) return emptyIdx
    def gauge(name: String, v: Double): Unit =
      stageLog.foreach(_ += s"ndidx:$name" -> v)
    val liveNames = live.map(_.getName).toSet
    TieredIndex.load(ss, indexDir, liveNames).getOrElse(Seq.empty) match {
      case Seq() =>
        // no usable summary: every live file is tail (the pre-r17 scan)
        gauge("base_files", 0); gauge("base_files_read", 0)
        gauge("generations", 0)
        gauge("tail_files", live.length.toDouble)
        ss.read.parquet(live.map(_.toString).toIndexedSeq: _*)
          .select("doc", "band", "bucket")
      case gens =>
        val baseFiles = gens.flatMap(_.files)
        val baseNames = baseFiles.map(_.name).toSet
        val tail = live.filter(p => !baseNames.contains(p.getName))
        gauge("base_files", baseFiles.length.toDouble)
        gauge("generations", gens.length.toDouble)
        gauge("tail_files", tail.length.toDouble)
        val tailDf =
          if (tail.isEmpty) emptyIdx
          else ss.read.parquet(tail.map(_.toString).toIndexedSeq: _*)
            .select("doc", "band", "bucket")
        // hot rows = batch (doc, band, bucket) rows whose key ANY
        // generation's bloom claims to contain (map-side off the
        // batchIdx checkpoint — one predicate per generation in the
        // same scan), reduced to SUSPECT docs — ≥ minBands hot bands
        // (one row per (doc, band), so the per-doc row count IS the
        // hot band count); only their keys can contribute to a drop
        val hotRows = BloomMembership
          .flagSeenAny(batchIdx
              .withColumn("__k", xxhash64(col("band"), col("bucket"))),
            gens.map(_.bloom), "__k", "__hot")
          .filter(col("__hot"))
        val hot = hotRows
          .join(hotRows.groupBy("doc").agg(count(lit(1)).as("__nb"))
              .filter(col("__nb") >= minBands).select("doc"),
            Seq("doc"), "left_semi")
          .select("band", "bucket").distinct()
          .localCheckpoint(true)
        val nHot = hot.count()
        gauge("hot_keys", nHot.toDouble)
        if (nHot == 0) { gauge("base_files_read", 0); return tailDf }
        val toRead =
          if (nHot <= TieredIndex.MaxHotKeysForFilePrune)
            TieredIndex.pruneFiles(baseFiles,
              hot.select(col("band").cast("long"), col("bucket"))
                .as[(Long, Long)].collect()
                .map(t => Seq(t._1, t._2)).toIndexedSeq)
          else baseFiles.map(_.name)
        gauge("base_files_read", toRead.length.toDouble)
        // same size guard as every other key-table broadcast in the
        // loop: a corpus-scale backfill batch's hot set falls back to
        // a shuffled semi-join, never a multi-GB driver relation
        val hotJoin = if (nHot <= maxBroadcastKeys) broadcast(hot) else hot
        val baseDf =
          if (toRead.isEmpty) emptyIdx
          else ss.read.parquet(toRead.map(n =>
              new org.apache.hadoop.fs.Path(target, n).toString): _*)
            .select("doc", "band", "bucket")
            .join(hotJoin, Seq("band", "bucket"), "left_semi")
        tailDf.unionByName(baseDf)
    }
  }

  /** Maintenance for the frontier blooms (VERDICT r15 item 2): over an
    * infinite stream the epoch chain GROWS — each epoch stays within
    * its design fpp, but the probe pays k predicates and overall fpp
    * sums per-epoch, linear in k. The shard store already holds every
    * SHIPPED key, so on the maintenance cadence this rebuilds ONE
    * filter per frontier, right-sized from the shipped count
    * (`headroom`× so the rebuilt epoch has room before its own fill
    * rollover), and swaps it for the whole chain behind a rename-only
    * root twin swap ([[graft.sources.DirSwap]] — crash at any point
    * leaves a complete chain or a complete rebuild, never neither;
    * [[loadBloomEpochs]] recovers before every read).
    *
    * Contract after compaction: no SHIPPED key is ever lost (the
    * rebuilt filter contains exactly the store's keys — replaying any
    * shipped doc still ships nothing), and the next fold starts a
    * fresh expectedItems-sized epoch on top (the rebuilt epoch's
    * sizing differs, so [[saveBloom]]'s sizing-mismatch rollover
    * freezes it — chain length resets to 1 here and then grows only
    * with post-compaction rollovers).
    *
    * The ONE semantic narrowing, documented and deliberate: the URL
    * frontier historically learns every canonical url SEEN (kept or
    * dropped), but the store only holds SHIPPED urls — after
    * compaction a re-crawl of a previously-dropped url re-pays the
    * gate compute ONCE (and re-enters the bloom). No duplicate can
    * ship: a quality-dropped doc re-drops deterministically, an
    * exact-dup's hash is in the rebuilt TEXT bloom (which narrows
    * nothing — the text frontier always held exactly the shipped
    * hashes), and a near-dup still collides with the persisted band
    * index (never narrowed). CorpusIngestSpec replays every drop
    * class against the compacted frontier.
    *
    * Cost shape at 100 TB: one column-pruned store scan per frontier
    * (urls; text for the hash) + a map-side-combining sketch agg —
    * the same order as the shard compaction that shares the cadence,
    * which rewrites the store outright. */
  def compactFrontierBlooms(ss: SparkSession, urlBloomPath: String,
                            textBloomPath: String, shardDir: String,
                            headroom: Double = 2.0): Unit = {
    val (fs, root) = fsOf(ss, shardDir)
    if (!fs.exists(root)) return
    val store = ss.read.parquet(shardDir)
    // trigger at chain length > 2, not > 1 (r16 review finding): the
    // fold immediately after a compaction always sizing-rolls the
    // chain back to 2 (compacted epoch + fresh expectedItems-sized
    // increment — that IS the post-compaction steady state), so a > 1
    // trigger would pay a full-store scan on EVERY subsequent cadence
    // with no probe-count or fpp benefit. At > 2 the rebuild runs
    // only once the active increments have themselves rolled — chain
    // length stays bounded in [1, 3] at any cadence that fires at
    // least once per rollover period.
    // the trigger counts committed epoch DIRS (listing only — ADVICE
    // r16: loading the chain's bytes here paid ~150 MB × length per
    // frontier per cadence even when no rebuild fires); a legacy
    // pre-epoch store lists no epoch dirs and counts 0 — below any
    // trigger, same outcome as the old byte-loading count of 1
    val urlDue = committedEpochs(ss, urlBloomPath).size > 2
    val textDue = committedEpochs(ss, textBloomPath).size > 2
    var urlRebuilt = false
    var textRebuilt = false
    if (urlDue || textDue) {
      // the phase's store I/O is bounded by ONE full scan no matter
      // how many frontiers rebuild (r19, VERDICT r18 item 5: the
      // measured b32 rebuild paid TWO full-store scans — count +
      // text-hash sketch — 11.2 s and growing with the store): one
      // pass materializes the NARROW key projection (canonical url +
      // 8-byte text hash — the text payload is read once and reduced
      // map-side), and the count plus both sketch aggregations run
      // over the cached keys. MEMORY_AND_DISK: the key projection is
      // orders of magnitude smaller than the store; spill keeps the
      // one-scan bound honest at any size.
      val keys = store
        .select(col("canon_url"), xxhash64(col("text")).as("text_hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val shipped = keys.count()
        def rebuild(path: String, keyCol: String): Boolean =
          if (shipped > 0) {
            val expected = math.max(1L, math.ceil(shipped * headroom).toLong)
            val (bfs, broot) = fsOf(ss, path)
            BloomMembership.sketch(keys.select(keyCol), keyCol, expected)
              .write.mode("overwrite").parquet(s"${path}__compact/epoch=0")
            graft.sources.DirSwap.swap(bfs, broot,
              new org.apache.hadoop.fs.Path(s"${path}__compact"))
            log.info(s"bloom $path: chain compacted to one epoch sized " +
              s"$expected (${headroom}x $shipped shipped keys)")
            true
          } else false
        urlRebuilt = urlDue && rebuild(urlBloomPath, "canon_url")
        textRebuilt = textDue && rebuild(textBloomPath, "text_hash")
      } finally { keys.unpersist(); () }
    }
    // the rebuild HEALS every accumulated false-positive drop (the
    // fresh filter holds exactly the shipped keys), so this is the
    // moment to price the loss window and reset it (VERDICT r17
    // item 3): exact for text, upper bound for url. The reset is
    // PER-FRONTIER (ADVICE r18): the chains roll over at different
    // rates, and a url-only rebuild must not discard the text
    // frontier's fp records while its bloom is still unhealed —
    // see [[frontierFpDrops]]
    if (urlRebuilt || textRebuilt) {
      val fp = frontierFpDrops(ss, urlBloomPath, textBloomPath, shardDir,
        clearUrl = urlRebuilt, clearText = textRebuilt)
      log.info(s"frontier fp-drop gauge at rebuild " +
        s"(url healed=$urlRebuilt, text healed=$textRebuilt): " +
        s"text=${fp("text")} exact, url<=${fp("url")} upper bound")
    }
    // whichever window SURVIVES this cadence gets folded to distinct
    // keys so the drops store stays bounded between rebuilds
    // (ADVICE r18 — see [[compactDropsStore]])
    if (!urlRebuilt) compactDropsStore(ss, urlBloomPath, "canon_url")
    if (!textRebuilt) compactDropsStore(ss, textBloomPath, "text_hash")
  }

  /** The persisted frontier's per-epoch sketch bytes, oldest first
    * (empty before the first fold). Store layout: `<path>/epoch=N/`,
    * one 1-row parquet per epoch — frozen epochs are immutable, only
    * the max epoch ever rewrites. Runs the twin-swap recovery on
    * every epoch dir first, so a crash inside a previous [[saveBloom]]
    * never loses the frontier.
    *
    * A PRE-EPOCH store (the single 1-row parquet the previous layout
    * wrote directly at `path`) is read as epoch 0 — silently ignoring
    * it would discard the whole seen-URL / seen-text frontier and
    * re-ship every already-crawled doc as a duplicate (r15 review
    * finding). The first [[saveBloom]] merges it into the real
    * `epoch=0` dir and deletes the legacy files; until then epoch
    * dirs, when present, take precedence (legacy files left by a
    * crash mid-migration are already-merged garbage). */
  private def loadBloomEpochs(ss: SparkSession,
                              path: String): Seq[(Int, Array[Byte])] = {
    val epochs = committedEpochs(ss, path)
    val (fs, root) = fsOf(ss, path)
    if (epochs.isEmpty && fs.exists(root) && legacyFiles(fs, root).nonEmpty)
      return ss.read.parquet(path).take(1).headOption
        .flatMap(r => Option(r.getAs[Array[Byte]](0)))
        .map(0 -> _).toSeq
    epochs.flatMap { e =>
      ss.read.parquet(s"$path/epoch=$e").take(1).headOption
        .flatMap(r => Option(r.getAs[Array[Byte]](0)))
        .map(e -> _)
    }
  }

  /** Committed epoch ids (sorted), after the full recovery pass —
    * the driver-side LISTING half of [[loadBloomEpochs]], split out so
    * the compaction TRIGGER can count the chain without deserializing
    * every epoch's sketch bytes (ADVICE r16: the >2 check loaded
    * potentially ~150 MB × chain length per frontier per cadence even
    * when no rebuild fires). */
  private def committedEpochs(ss: SparkSession, path: String): Seq[Int] = {
    val (fs, root) = fsOf(ss, path)
    // a crashed whole-store compaction swap first ([[compactFrontierBlooms]]
    // twin-swaps the ROOT), then pre-epoch fold swaps
    graft.sources.DirSwap.recover(fs, root, "__compact")
    graft.sources.DirSwap.recover(fs, root, "__fold") // pre-epoch swaps
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .map(graft.sources.DirSwap.baseOf(_, "__fold"))
      .distinct
      .foreach(base => graft.sources.DirSwap.recover(
        fs, new org.apache.hadoop.fs.Path(root, base), "__fold"))
    // prune crash leftovers: an epoch dir with no committed data file
    // is a write that died before its parquet commit (possibly a
    // partial first twin the recover promoted — DirSwap.hasData doc);
    // it cannot be a real epoch and must not shadow the legacy branch
    fs.listStatus(root).map(_.getPath).filter(p =>
        p.getName.matches("epoch=\\d+") &&
        !graft.sources.DirSwap.hasData(fs, p))
      .foreach(p => fs.delete(p, true))
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.matches("epoch=\\d+"))
      .map(_.stripPrefix("epoch=").toInt).sorted.toSeq
  }

  private def fsOf(ss: SparkSession, path: String) =
    graft.sources.DirSwap.fsOf(ss, path)

  /** Data files of a pre-epoch bloom artifact sitting directly under
    * the store root. */
  private def legacyFiles(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path) =
    fs.listStatus(root).filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet"))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Fold this batch's keys into the epoched frontier store: sketch
    * the keys, OR-merge into the ACTIVE (max) epoch — or, when the
    * merged filter would pass `rolloverAt`, freeze the active epoch
    * as-is and start the next epoch with the increment alone (the
    * BLOOM CAPACITY contract: no epoch past design fpp, no key ever
    * dropped). The touched epoch dir is written to a `__fold` twin
    * and rename-swapped, so a crash at any point leaves a complete
    * copy. Returns (active-epoch fill ratio, epoch count); None when
    * there is no state yet (empty batch onto no store). */
  private def saveBloom(ss: SparkSession, path: String,
                        prevEpochs: Seq[(Int, Array[Byte])], keys: DataFrame,
                        keyCol: String, expectedItems: Long,
                        rolloverAt: Double): Option[(Double, Int)] = {
    import ss.implicits._
    val inc = BloomMembership.sketch(keys, keyCol, expectedItems)
      .take(1).headOption.flatMap(r => Option(r.getAs[Array[Byte]](0)))
    val (fs, root) = fsOf(ss, path)
    def writeEpoch(e: Int, bytes: Array[Byte]): Unit = {
      val target = new org.apache.hadoop.fs.Path(root, s"epoch=$e")
      if (!graft.sources.DirSwap.hasData(fs, target)) {
        // brand-new epoch (or commit-less crash debris): write the
        // target directly — parquet's commit keeps a crashed write
        // invisible, and a first-write twin would have no complete
        // old copy for recover's twin-alone rule to rely on (r15
        // review finding: that rule promoted a PARTIAL first twin)
        Seq(Option(bytes)).toDF("bloom")
          .write.mode("overwrite").parquet(s"$path/epoch=$e")
      } else {
        Seq(Option(bytes)).toDF("bloom")
          .write.mode("overwrite").parquet(s"$path/epoch=${e}__fold")
        graft.sources.DirSwap.swap(fs, target,
          new org.apache.hadoop.fs.Path(root, s"epoch=${e}__fold"))
      }
      // a pre-epoch artifact read as epoch 0 is now merged into a real
      // epoch dir — its root files are garbage (and are ignored by the
      // reader once committed epoch dirs exist, so a crash right here
      // is safe)
      legacyFiles(fs, root).foreach(s => fs.delete(s.getPath, false))
    }
    def warnIfOverfull(fill: Double): Double = {
      if (fill > rolloverAt)
        log.warn(f"bloom $path: a SINGLE batch fills a fresh epoch to " +
          f"$fill%.2f (> $rolloverAt%.2f) — expectedItems is undersized " +
          "for the batch rate; raise it or shrink batches (BLOOM " +
          "CAPACITY scaladoc)")
      fill
    }
    (prevEpochs.lastOption, inc) match {
      case (None, None) => None
      case (None, Some(b)) =>
        writeEpoch(0, b)
        Some((warnIfOverfull(BloomMembership.fillRatio(b)), 1))
      case (Some((_, act)), None) =>
        Some((BloomMembership.fillRatio(act), prevEpochs.size))
      case (Some((e, act)), Some(b)) if !BloomMembership.sameSizing(act, b) =>
        // the active epoch's sizing differs from the increment's — the
        // state a frontier compaction (one right-sized rebuilt epoch,
        // [[compactFrontierBlooms]]) or a mid-stream expectedItems
        // change leaves behind. OR-merge is impossible across sizings
        // (Spark's checkCompatibilityForMerge throws), so this is a
        // rollover by construction: freeze the differently-sized epoch
        // as-is, start the next with the increment alone — the same
        // no-key-lost contract as the fill-triggered roll
        if (!fs.exists(new org.apache.hadoop.fs.Path(root, s"epoch=$e")))
          writeEpoch(e, act)
        writeEpoch(e + 1, b)
        log.info(s"bloom $path: epoch $e sizing " +
          s"${BloomMembership.sizingOf(act)} != increment " +
          s"${BloomMembership.sizingOf(b)}; frozen, epoch ${e + 1} started")
        Some((warnIfOverfull(BloomMembership.fillRatio(b)),
          prevEpochs.size + 1))
      case (Some((e, act)), Some(b)) =>
        val merged = BloomMembership.merge(act, b)
        val mFill = BloomMembership.fillRatio(merged)
        if (mFill > rolloverAt) {
          // freezing assumes epoch e is a dir on disk — a legacy
          // pre-epoch artifact read as epoch 0 isn't yet; persist it
          // first or its bytes would vanish with the legacy files
          if (!fs.exists(new org.apache.hadoop.fs.Path(root, s"epoch=$e")))
            writeEpoch(e, act)
          writeEpoch(e + 1, b)
          log.info(f"bloom $path: epoch $e frozen at " +
            f"${BloomMembership.fillRatio(act)}%.2f fill (merge would hit " +
            f"$mFill%.2f > $rolloverAt%.2f); epoch ${e + 1} started")
          Some((warnIfOverfull(BloomMembership.fillRatio(b)),
            prevEpochs.size + 1))
        } else {
          writeEpoch(e, merged)
          Some((mFill, prevEpochs.size))
        }
    }
  }
}
