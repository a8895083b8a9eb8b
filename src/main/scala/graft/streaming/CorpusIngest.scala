package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextOps
import graft.operators.BloomMembership
import graft.sources.ShardSink

/** The production ingest loop end to end (p10): every stage the
  * corpus suite ships, composed into ONE streaming pipeline —
  *
  *   crawl batch (url, doc_id, text)
  *     → URL canonicalization           (TextOps.canonicalizeUrl, t32)
  *     → cross-batch URL frontier gate  (BloomMembership, D14/t32×D14)
  *     → Gopher document-shape gate     (TextOps.gopherShape, t33)
  *     → exact-text dedup, in-batch + cross-batch   (D1's hash key)
  *     → deterministic training shards  (ShardSink, p9)
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
  */
object CorpusIngest {

  /** One batch through the full pipeline. Returns the number of rows
    * appended to the shard store. Pure function of (batch, persisted
    * bloom state) — called by the streaming sink and the batch twin
    * alike. `expectedItems` sizes NEW bloom increments; merge requires
    * the same sizing across a store's lifetime. */
  def ingestBatch(batch: DataFrame, urlBloomPath: String,
                  textBloomPath: String, shardDir: String,
                  numShards: Int = 8,
                  expectedItems: Long = 100000L): Long = {
    val ss = batch.sparkSession

    // 1. canonicalize; within-batch URL dedup by min doc_id
    val canon = batch
      .withColumn("canon_url", TextOps.canonicalizeUrl(col("url")))
      .groupBy("canon_url")
      .agg(min(struct(col("doc_id"), col("text"))).as("__r"))
      .select(col("canon_url"), col("__r.doc_id"), col("__r.text"))

    // 2. cross-batch frontier: drop URLs any earlier batch shipped
    val urlFresh = BloomMembership.definitelyNew(
      canon, loadBloom(ss, urlBloomPath), "canon_url")

    // 3. quality gate — the t33 composite
    val gated = urlFresh
      .filter(TextOps.gopherShape(col("text")).getField("keep"))

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

    // 5. shard append (per-batch files keep ShardSink's (rank, id)
    //    in-file training order; resume/manifest read the union)
    val n = fresh.count()
    if (n > 0)
      ShardSink.appendShards(
        fresh.select("doc_id", "canon_url", "text"), "doc_id",
        shardDir, numShards)

    // 6. fold this batch's keys into the persisted frontier state.
    //    URL bloom learns every canonical url SEEN (kept or dropped
    //    by quality/text-dedup — a crawled url is spent either way);
    //    text bloom learns the hashes that actually shipped.
    saveBloom(ss, urlBloomPath, urlFresh.select("canon_url"),
      "canon_url", expectedItems)
    saveBloom(ss, textBloomPath, fresh.select("text_hash"),
      "text_hash", expectedItems)
    n
  }

  /** Start the streaming form: a (url, doc_id, text) stream through
    * [[ingestBatch]] per micro-batch. */
  def start(stream: DataFrame, urlBloomPath: String, textBloomPath: String,
            shardDir: String, numShards: Int = 8,
            expectedItems: Long = 100000L): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, urlBloomPath, textBloomPath, shardDir,
          numShards, expectedItems)
        ()
      }
      .start()

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
