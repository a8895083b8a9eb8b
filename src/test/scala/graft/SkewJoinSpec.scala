package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals plain join (skewed key)") {
    // 1000 fact rows, 90% on one hot key
    val fact = (1 to 1000).map(i => (i.toLong, if (i <= 900) 1L else (i % 10).toLong))
      .toDF("row_id", "k")
    val dim = (0L to 9L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val salted = SkewJoin.saltedJoin(fact, "k", Seq("row_id"), dim, "dk", salts = 4)
      .select("row_id", "k", "name")
    val plain = fact.join(dim, col("k") === col("dk")).select("row_id", "k", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt fan-out bounds per-task rows for the hot key") {
    val fact = (1 to 100).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val salts = 4
    val l = fact.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(salts)))
    val counts = l.groupBy("__salt").count().select("count").as[Long].collect()
    assert(counts.length > 1, "salt must split the hot key across sub-keys")
  }
}
