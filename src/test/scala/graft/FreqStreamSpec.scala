package graft

import scala.util.Random
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.FreqStream
import graft.streaming.FreqStream.{ShardCandidates, Tok}

/** Streaming sharded Misra-Gries: across micro-batches the union of
  * shard candidates stays a superset of the exact heavy-hitter set,
  * with bounded state. */
class FreqStreamSpec extends SparkSpec {
  import spark.implicits._

  test("shard-candidate union covers exact heavy hitters across batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(61)
    // skewed stream: tok_i ~ n/i occurrences, shuffled, split in 3 batches
    val all = rnd.shuffle(
      (for (i <- 1 to 30; _ <- 1 to (3000 / i)) yield s"tok$i").toList)
    val batches = all.grouped((all.size + 2) / 3).toSeq
    val k = 8
    val shards = 4

    val mem = MemoryStream[Tok]
    val q = FreqStream.heavyHitterCandidates(mem.toDS(), shards, k)
      .writeStream.format("memory").queryName("hh_shards")
      .outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b.map(Tok)); q.processAllAvailable() }
      // latest state per shard
      val updates = spark.table("hh_shards").as[ShardCandidates].collect()
      val latest = updates.groupBy(_.shard).map { case (_, us) => us.maxBy(_.n_tokens) }
      val candidates = latest.flatMap(_.candidates).toSet
      assert(latest.map(_.n_tokens).sum == all.size)
      assert(candidates.size <= shards * k)

      val n = all.size
      val exactHeavy = all.groupBy(identity).view.mapValues(_.size)
        .filter { case (_, c) => c.toLong * (k + 1) > n }.keys.toSet
      assert(exactHeavy.nonEmpty, "fixture needs heavy hitters")
      assert(exactHeavy.subsetOf(candidates),
        s"missing ${exactHeavy -- candidates}")
    } finally q.stop()
  }
}
