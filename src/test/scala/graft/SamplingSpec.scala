package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Sampling

/** Weighted priority sampling (A-ES) contracts: for k=1 the selection
  * probability is exactly w_i/Σw — measured empirically across many
  * salts in ONE Spark query over the (item × salt) grid; plus
  * determinism/partitioning invariance and the positive-weight
  * domain rule. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("k=1 inclusion frequency tracks weights (2000 salts, one query)") {
    // items 1..8 with weight = id (sum 36): P(i wins) = i/36
    val items = (1L to 8L).map(i => (i, i.toDouble))
    val nSalts = 2000
    val wins = items.toDF("id", "w")
      .crossJoin((0L until nSalts.toLong).toDF("salt"))
      .withColumn("key", Sampling.esKey(col("id"), col("w"), col("salt")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("salt").orderBy(desc("key"), asc("id"))))
      .filter(col("rk") === 1)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    for (i <- 1L to 8L) {
      val expect = nSalts * i.toDouble / 36.0
      val got = wins.getOrElse(i, 0L).toDouble
      // binomial sd at the smallest cell (i=1, p=1/36) is ~7.3 on
      // expect 55.6; 4 sd ≈ 29 -> 55% relative. Use a generous 50%
      // band everywhere (larger cells are relatively much tighter).
      assert(math.abs(got - expect) <= 0.5 * expect + 10,
        s"item $i: got $got, expect $expect")
    }
  }

  test("deterministic and partitioning-invariant") {
    val df = (1L to 500L).map(i => (i, 1.0 + (i % 13))).toDF("id", "w")
    def ids(parts: Int) =
      Sampling.weightedSample(df.repartition(parts), "id", "w", k = 20, salt = 7L)
        .select("id").as[Long].collect().toSeq.sorted
    val a = ids(1); val b = ids(11)
    assert(a === b)
    assert(a.size === 20)
    assert(ids(1) === ids(1)) // rerun identical
  }

  test("non-positive and null weights are excluded") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0)).toDF("id", "w")
      .unionAll(Seq((4L, Option.empty[Double])).toDF("id", "w"))
    val got = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L))
  }
}
