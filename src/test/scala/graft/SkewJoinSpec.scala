package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 fact rows, 90% on one hot key
  private def skewed = {
    val fact = (1 to 1000).map(i => (i.toLong, if (i <= 900) 1L else (i % 10).toLong))
      .toDF("row_id", "k")
    val dim = (0L to 9L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    (fact, dim)
  }

  test("saltedJoin (all keys) equals plain join") {
    val (fact, dim) = skewed
    val salted = SkewJoin.saltedJoin(fact, "k", Seq("row_id"), dim, "dk", salts = 4)
      .select("row_id", "k", "name")
    val plain = fact.join(dim, col("k") === col("dk")).select("row_id", "k", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("hot-key-only saltedJoin equals plain join (detected and explicit)") {
    val (fact, dim) = skewed
    val plain = fact.join(dim, col("k") === col("dk")).select("row_id", "k", "name")
    val detected = SkewJoin.saltedJoin(fact, "k", Seq("row_id"), dim, "dk",
        salts = 4, hotKeyThreshold = 500L)
      .select("row_id", "k", "name")
    assert(detected.except(plain).isEmpty && plain.except(detected).isEmpty)
    assert(detected.count() == plain.count())
    val explicit = SkewJoin.saltedJoin(fact, "k", Seq("row_id"), dim, "dk",
        salts = 4, hotKeys = Some(Seq(1L).toDF("__hot_key")))
      .select("row_id", "k", "name")
    assert(explicit.except(plain).isEmpty && plain.except(explicit).isEmpty)
  }

  test("dim side is replicated only for hot keys") {
    val (fact, dim) = skewed
    val hot = SkewJoin.detectHotKeys(fact, "k", 500L)
    assert(hot.as[Long].collect().toSeq == Seq(1L)) // only the 900-row key
    val salts = 4
    val replicated = SkewJoin.saltedDim(dim, "dk", salts, hot)
    // 1 hot key x 4 salts + 9 cold keys x 1 = 13 rows, not 10 x 4 = 40
    assert(replicated.count() == salts + 9)
    val coldSalts = replicated.filter(col("dk") =!= 1L)
      .groupBy("dk").count().select("count").as[Long].collect()
    assert(coldSalts.forall(_ == 1L), "cold dim keys must not be replicated")
  }

  test("salt fan-out bounds per-task rows for the hot key") {
    val fact = (1 to 100).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val salts = 4
    val l = fact.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(salts)))
    val counts = l.groupBy("__salt").count().select("count").as[Long].collect()
    assert(counts.length > 1, "salt must split the hot key across sub-keys")
  }
}
