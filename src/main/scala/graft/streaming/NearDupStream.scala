package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming MinHash-LSH near-duplicate detection: the batch LSH
  * pipeline's candidate generation, incrementally.
  *
  * Shape: signatures and band buckets are computed map-side with the
  * same native expressions as the batch path (`graft_minhash`), so a
  * document's bucket keys are IDENTICAL to the batch pipeline's —
  * a corpus can be bootstrapped in batch and tailed in streaming.
  * State lives per (band, bucket) key: the last `maxPerBucket`
  * (doc_id, signature) pairs seen in that bucket. Each arriving
  * document emits a candidate against every stored neighbor, with the
  * signature-agreement Jaccard estimate attached. State is bounded by
  * construction (maxPerBucket × active buckets); the recall contract
  * is "within the last maxPerBucket docs per bucket" — the streaming
  * analogue of a dedup window.
  *
  * A pair colliding in several bands is emitted once per collision;
  * dedup downstream (`dropDuplicatesWithinWatermark` on (a_id, b_id)
  * in streaming, `distinct` in batch — the same contract as the batch
  * `minhashLshPairs` groupBy).
  *
  * Production state backend: apply [[StreamConfs.applyRocksDb]]
  * before starting the query — RocksDB keeps the bucket state off
  * the heap, and changelog checkpointing keeps the per-batch commit
  * cost batch-sized instead of state-sized (the full-snapshot
  * default's cost doubles as state grows to millions of keys —
  * see StreamConfs).
  */
object NearDupStream {

  case class Banded(doc_id: Long, sig: Array[Long], bk: Long)
  case class Candidate(a_id: Long, b_id: Long, est_jaccard: Double)

  /** Works on a streaming OR batch frame with (doc_id: long,
    * text: string) columns. */
  def nearDupCandidates(docs: DataFrame, k: Int = 5, numHashes: Int = 128,
                        bands: Int = 16,
                        maxPerBucket: Int = 64): Dataset[Candidate] = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val s = docs.sparkSession
    import s.implicits._
    val r = numHashes / bands
    val banded = docs.filter(length(col("text")) >= k)
      .select(col("doc_id"),
        Dedup.minhashSignature(col("text"), k, numHashes).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(Dedup.lshBands(col("sig"), bands, r)).as("b"))
      .select(col("doc_id"), col("sig"),
        xxhash64(col("b.band"), col("b.bucket")).as("bk"))
      .as[Banded]
    banded.groupByKey(_.bk)
      .flatMapGroupsWithState[List[(Long, Array[Long])], Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[Banded], state: GroupState[List[(Long, Array[Long])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[Candidate]
          rows.foreach { row =>
            seen.foreach { case (oid, osig) =>
              if (oid != row.doc_id) {
                var eq = 0
                var i = 0
                while (i < osig.length && i < row.sig.length) {
                  if (osig(i) == row.sig(i)) eq += 1
                  i += 1
                }
                out += Candidate(math.min(oid, row.doc_id),
                  math.max(oid, row.doc_id), eq.toDouble / numHashes)
              }
            }
            seen = ((row.doc_id, row.sig) :: seen).take(maxPerBucket)
          }
          state.update(seen)
          out.result().iterator
      }
  }
}
