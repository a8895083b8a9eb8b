package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactQuantile

/** Bounded-memory exact quantiles: bit-agreement with Spark's exact
  * `percentile` on awkward distributions, partition invariance, and
  * edge ranks. */
class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def direct(df: org.apache.spark.sql.DataFrame, p: Double): Double =
    df.agg(percentile(col("x").cast("double"), lit(p))).head().getDouble(0)

  test("agrees bit-for-bit with percentile() across ps and distributions") {
    val skewed = (1L to 3000L).map(i => (i * i) % 997L) ++ Seq.fill(500)(7L)
    val dfs = Seq(
      skewed.toDF("x"),
      (1L to 100L).toDF("x"),
      Seq(-5L, -2L, 0L, 0L, 3L).toDF("x"),
      Seq(42L, 43L).toDF("x"))
    for (df <- dfs; p <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
      val got = ExactQuantile.quantileAt(df, "x", p, accuracy = 50)
      val want = direct(df, p)
      assert(got == want, s"p=$p rows=${df.count()}: $got != $want")
    }
  }

  test("partition-invariant even though the bracket sketch is not") {
    val df = (1L to 5000L).map(i => (i * 2654435761L) % 10007L).toDF("x")
    val a = ExactQuantile.quantileAt(df, "x", 0.9, accuracy = 100)
    val b = ExactQuantile.quantileAt(df.repartition(17), "x", 0.9, accuracy = 100)
    val c = ExactQuantile.quantileAt(df.repartition(3), "x", 0.9, accuracy = 100)
    assert(a == b && b == c, s"result must not depend on partitioning: $a $b $c")
    assert(a == direct(df, 0.9))
  }

  test("single row, duplicates-only, and null handling") {
    assert(ExactQuantile.quantileAt(Seq(9L).toDF("x"), "x", 0.5) == 9.0)
    assert(ExactQuantile.quantileAt(Seq.fill(100)(4L).toDF("x"), "x", 0.73) == 4.0)
    val withNulls = Seq[java.lang.Long](1L, null, 3L, null, 5L).toDF("x")
    assert(ExactQuantile.quantileAt(withNulls, "x", 0.5) == direct(withNulls, 0.5))
  }
}
