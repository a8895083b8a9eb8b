package graft.streaming

import java.io.File

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
  *     → encoding repair                (TextOps.fixMojibake, t38 — optional)
  *     → URL canonicalization           (TextOps.canonicalizeUrl, t32)
  *     → cross-batch URL frontier gate  (BloomMembership, D14/t32×D14)
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
  * 1-row parquet artifacts (seen URLs, seen text hashes) — O(bits),
  * not O(corpus); no batch ever rescans the corpus. The trade is the
  * documented bloom one: a false positive drops a genuinely-new doc
  * at fpp (bounded, measured in the r11 frontier evidence at 45 ppm);
  * false negatives cannot happen, so no duplicate ever ships to a
  * shard. Within a batch, survivors-per-key are chosen by MIN doc_id
  * (combinable min-struct — deterministic under any partitioning,
  * unlike dropDuplicates).
  *
  * At 100 TB: canonicalize/gate/hash are map-side codegen; the two
  * dedup aggregations shuffle once each on their key; the shard write
  * is ShardSink's one hash shuffle. Bloom probe/build are map-side +
  * a driver-sized byte-array merge.
  *
  * MAINTENANCE: appendShards leaves one file per touched shard per
  * micro-batch; run [[graft.sources.ShardSink.compactShards]]
  * periodically (e.g. every 10^3 batches, or off-peak) to rewrite
  * each shard dir back to one rk-clustered file — manifests, resume
  * order, and rank pushdown are invariant (ShardSinkSpec).
  */
object CorpusIngest {

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
    * `minBands` bands are dropped, and survivors' band rows APPEND to
    * the index — so the store at `indexDir` always holds exactly the
    * shipped corpus's index (D9's daily-ingest shape: the corpus is
    * only ever touched through its index; no text rescan). */
  final case class NearDupGate(indexDir: String, minBands: Int = 8,
                               k: Int = 3, numHashes: Int = 128,
                               bands: Int = 16)

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
    * merge requires the same sizing across a store's lifetime. */
  def ingestBatch(batch: DataFrame, urlBloomPath: String,
                  textBloomPath: String, shardDir: String,
                  numShards: Int = 8,
                  expectedItems: Long = 100000L,
                  qualityGate: Option[QualityGate] = None,
                  driftDir: Option[String] = None,
                  repairEncoding: Boolean = false,
                  nearDup: Option[NearDupGate] = None): Long = {
    val ss = batch.sparkSession

    // 0. optional encoding repair (t38) — FIRST, before any gate or
    //    hash: a mojibake variant of an already-shipped page must
    //    repair to the same bytes and fall to the exact-text dedup,
    //    and the quality gates must judge the repaired text
    val input =
      if (repairEncoding)
        batch.withColumn("text", TextOps.fixMojibake(col("text")))
      else batch

    // 1. canonicalize; within-batch URL dedup by min doc_id
    val canon = input
      .withColumn("canon_url", TextOps.canonicalizeUrl(col("url")))
      .groupBy("canon_url")
      .agg(min(struct(col("doc_id"), col("text"))).as("__r"))
      .select(col("canon_url"), col("__r.doc_id"), col("__r.text"))

    // 2. cross-batch frontier: drop URLs any earlier batch shipped
    val urlFresh = BloomMembership.definitelyNew(
      canon, loadBloom(ss, urlBloomPath), "canon_url")

    // 3. quality gates — the t33 heuristic composite, then (when a
    //    model is supplied) the t35 trained filter: broadcast-weights
    //    scoring, keep P(keep) ≥ threshold
    val shaped = urlFresh
      .filter(TextOps.gopherShape(col("text")).getField("keep"))
    val gated = qualityGate.fold(shaped) { g =>
      QualityClassifier
        .score(shaped, "doc_id", "text", g.bias, g.weights, "__q", g.link)
        .filter(col("__q") >= g.threshold).drop("__q")
    }

    // 4. exact-text dedup: in-batch (min doc_id per hash), then
    //    cross-batch via the text bloom
    val hashed = gated
      .withColumn("text_hash", xxhash64(col("text")))
      .groupBy("text_hash")
      .agg(min(struct(col("doc_id"), col("canon_url"), col("text"))).as("__r"))
      .select(col("text_hash"), col("__r.doc_id"), col("__r.canon_url"),
        col("__r.text"))
    val fresh = BloomMembership.definitelyNew(
        hashed, loadBloom(ss, textBloomPath), "text_hash")
      .localCheckpoint(true) // one execution feeds sink + both blooms

    // 4b. optional near-dup stage: band the batch ONCE, then
    //     (a) in-batch greedy keep-first — any doc colliding with a
    //         smaller doc_id on >= minBands bands drops;
    //     (b) cross-batch — any doc colliding with the persisted
    //         index drops (the corpus side is touched only through
    //         its (band, bucket) rows — no text rescan);
    //     survivors' band rows append to the index, so the store
    //     stays exactly the shipped corpus's index.
    val survivors = nearDup.fold(fresh) { nd =>
      val batchIdx = Dedup.minhashIndex(fresh, "doc_id", "text",
        nd.k, nd.numHashes, nd.bands).localCheckpoint(true)
      val kept = fresh.join(
          nearDupDrops(batchIdx, loadIndex(ss, nd.indexDir), nd.minBands),
          Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      batchIdx.join(kept.select("doc_id"),
          batchIdx("doc") === kept("doc_id"), "left_semi")
        .write.mode("append").parquet(nd.indexDir)
      kept
    }

    // 5. shard append (per-batch files keep ShardSink's (rank, id)
    //    in-file training order; resume/manifest read the union)
    val n = survivors.count()
    if (n > 0)
      ShardSink.appendShards(
        survivors.select("doc_id", "canon_url", "text"), "doc_id",
        shardDir, numShards)

    // 6. fold this batch's keys into the persisted frontier state.
    //    URL bloom learns every canonical url SEEN (kept or dropped
    //    by quality/text-dedup — a crawled url is spent either way);
    //    text bloom learns the hashes that actually shipped.
    saveBloom(ss, urlBloomPath, urlFresh.select("canon_url"),
      "canon_url", expectedItems)
    saveBloom(ss, textBloomPath, survivors.select("text_hash"),
      "text_hash", expectedItems)

    // 7. drift monitor fold: count increments of what actually
    //    SHIPPED (per source host) into the persisted bounded store —
    //    the t36 card stays readable at any point via [[driftCard]]
    driftDir.foreach { dd =>
      val src = survivors.select(hostOf(col("canon_url")).as("source"),
        col("text"))
      Drift.foldIntoStore(s"$dd/buckets",
        Drift.bucketCounts(src, "source", "text"), Seq("source", "b"), "cnt")
      Drift.foldIntoStore(s"$dd/tokens",
        Drift.tokenCounts(src, "source", "text"), Seq("source", "w"), "c")
    }
    n
  }

  /** Near-dup drop set: batch docs colliding with a smaller-id batch
    * doc (keep-first) or ANY corpus doc on ≥ `minBands` bands.
    * Collisions are counted PER PARTNER PAIR (the minhashLshPairs
    * contract) and only then reduced to a doc set — summing bands
    * across all partners would let many sub-threshold overlaps
    * (shared boilerplate with several docs) add up to a false drop
    * (CorpusIngestSpec pins both directions). The corpus index is
    * distincted before the probe — the dedupIndex=true replay defense
    * of minhashLshPairsAgainst: foreachBatch is at-least-once, and a
    * retried batch would otherwise double every band row and halve
    * the effective threshold for all future batches. */
  private[graft] def nearDupDrops(batchIdx: DataFrame,
                                  corpusIdx: DataFrame,
                                  minBands: Int): DataFrame = {
    val a = batchIdx.alias("a"); val b = batchIdx.alias("b")
    val dropIn = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("__a"), col("b.doc").as("doc_id"))
      .agg(count(lit(1)).as("__nb")).filter(col("__nb") >= minBands)
      .select("doc_id")
    val dropCross = corpusIdx.distinct().alias("c")
      .join(batchIdx.alias("p"), col("c.band") === col("p.band") &&
        col("c.bucket") === col("p.bucket") && col("c.doc") =!= col("p.doc"))
      .groupBy(col("c.doc").as("__c"), col("p.doc").as("doc_id"))
      .agg(count(lit(1)).as("__nb")).filter(col("__nb") >= minBands)
      .select("doc_id")
    dropIn.unionByName(dropCross).distinct()
  }

  /** The t36 drift card over everything shipped so far — exactly the
    * batch card of the shipped corpus (the counts-monoid contract,
    * differentially pinned in CorpusIngestSpec). */
  def driftCard(spark: SparkSession, driftDir: String): DataFrame =
    Drift.cardFromStore(spark, driftDir)

  /** Start the streaming form: a (url, doc_id, text) stream through
    * [[ingestBatch]] per micro-batch. */
  def start(stream: DataFrame, urlBloomPath: String, textBloomPath: String,
            shardDir: String, numShards: Int = 8,
            expectedItems: Long = 100000L,
            qualityGate: Option[QualityGate] = None,
            driftDir: Option[String] = None,
            repairEncoding: Boolean = false,
            nearDup: Option[NearDupGate] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, urlBloomPath, textBloomPath, shardDir,
          numShards, expectedItems, qualityGate, driftDir, repairEncoding,
          nearDup)
        ()
      }
      .start()

  private def loadIndex(ss: SparkSession, path: String): DataFrame = {
    import ss.implicits._
    if (new File(path).exists()) ss.read.parquet(path)
    else Seq.empty[(Long, Int, Long)].toDF("doc", "band", "bucket")
  }

  private def loadBloom(ss: SparkSession, path: String): DataFrame = {
    import ss.implicits._
    if (new File(path).exists()) ss.read.parquet(path)
    else Seq.empty[Option[Array[Byte]]].toDF("bloom")
  }

  private def saveBloom(ss: SparkSession, path: String, keys: DataFrame,
                        keyCol: String, expectedItems: Long): Unit = {
    import ss.implicits._
    val prev = loadBloom(ss, path).take(1).headOption
      .flatMap(r => Option(r.getAs[Array[Byte]](0)))
    val inc = BloomMembership.sketch(keys, keyCol, expectedItems)
      .take(1).headOption.flatMap(r => Option(r.getAs[Array[Byte]](0)))
    val merged = (prev, inc) match {
      case (Some(a), Some(b)) => Some(BloomMembership.merge(a, b))
      case (a, b) => a.orElse(b)
    }
    merged.foreach { m =>
      Seq(Option(m)).toDF("bloom").write.mode("overwrite").parquet(path)
    }
  }
}
