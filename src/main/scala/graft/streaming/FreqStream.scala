package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming heavy-hitter candidates: sharded Misra-Gries over an
  * unbounded token stream with `mapGroupsWithState`.
  *
  * Tokens are hash-sharded (token → shard = hash mod S); each shard
  * group maintains ONE Misra-Gries map of k counters as its state —
  * total state is S·k counters no matter how many distinct tokens
  * stream past. Because a token lives in exactly ONE shard, its shard
  * count IS its global count, so the per-shard MG guarantee applies
  * globally: after any prefix of the stream, the union of shard
  * candidates is a superset of every token with global count >
  * n/(k+1) (n = total tokens so far). Exactness is restored the same
  * way as batch `t12_heavy_hitters`: re-count the ≤ S·k candidates.
  *
  * Emits, per shard per touched micro-batch: the shard's current
  * candidate items and its processed-token count.
  *
  * Production state backend: apply [[StreamConfs.applyRocksDb]]
  * before starting the query (RocksDB provider + changelog
  * checkpointing — per-batch commit cost stays batch-sized; see
  * StreamConfs).
  */
object FreqStream {

  case class Tok(token: String)
  case class ShardState(counts: Map[String, Long], n: Long)
  case class ShardCandidates(shard: Int, candidates: Seq[String], n_tokens: Long)

  /** One MG update pass over a batch of tokens (classic stream form:
    * increment / insert-if-room / decrement-all). */
  private def mgUpdate(state: Map[String, Long], toks: Iterator[String],
                       k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map.from(state)
    toks.foreach { t =>
      m.get(t) match {
        case Some(c) => m(t) = c + 1L
        case None if m.size < k => m(t) = 1L
        case None =>
          m.keys.toSeq.foreach { key =>
            val c = m(key)
            if (c == 1L) m.remove(key) else m(key) = c - 1L
          }
      }
    }
    m.toMap
  }

  def heavyHitterCandidates(tokens: Dataset[Tok], shards: Int = 16,
                            k: Int = 32): Dataset[ShardCandidates] = {
    import tokens.sparkSession.implicits._
    val grouped: KeyValueGroupedDataset[Int, Tok] =
      tokens.groupByKey(t => math.floorMod(t.token.hashCode, shards))
    grouped.mapGroupsWithState[ShardState, ShardCandidates](
      GroupStateTimeout.NoTimeout) {
      (shard: Int, it: Iterator[Tok], state: GroupState[ShardState]) =>
        val prev = state.getOption.getOrElse(ShardState(Map.empty, 0L))
        var seen = 0L
        val counted = it.map { t => seen += 1; t.token }
        val next = mgUpdate(prev.counts, counted, k)
        val s = ShardState(next, prev.n + seen)
        state.update(s)
        ShardCandidates(shard, s.counts.keys.toSeq.sorted, s.n)
    }
  }
}
