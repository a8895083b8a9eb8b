package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.RangeCuts

/** RangeCuts.bucketOf ≡ the linear Σ when(key >= cut) chain it
  * replaced — on random keys, duplicate cut values (skewed samples
  * repeat), null key fields (must land in bucket 0, the PrefixSum
  * contract), and the empty/single-cut edges. */
class RangeCutsSpec extends SparkSpec {
  import spark.implicits._

  private def linear(key: org.apache.spark.sql.Column,
                     cuts: Seq[org.apache.spark.sql.Column]) =
    if (cuts.isEmpty) lit(0)
    else cuts.map(b => when(key >= b, 1).otherwise(0)).reduce(_ + _)

  test("binary tree equals the linear chain on random struct keys") {
    val rnd = new Random(7)
    val rows = (1 to 500).map { i =>
      (if (i % 41 == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong),
        rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("a", "b")
    val key = struct(col("a"), col("b"))
    // sorted cuts WITH duplicates, like a skewed sample would produce
    val cutVals = Seq((10L, 5L), (10L, 5L), (30L, 0L), (55L, 999L),
      (55L, 999L), (80L, 4L)).sorted
    val cuts = cutVals.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }
    val got = df.select(RangeCuts.bucketOf(key, cuts.toIndexedSeq).as("x"),
        linear(key, cuts).as("y"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), s"diverged on $r")
    }
    // null key fields land in bucket 0 in both forms
    val nullRows = df.filter(col("a").isNull)
      .select(RangeCuts.bucketOf(key, cuts.toIndexedSeq)).as[Int].collect()
    assert(nullRows.nonEmpty && nullRows.forall(_ == 0))
  }

  test("edges: empty cuts, single cut, all-equal cuts") {
    val df = Seq(1L, 5L, 9L).toDF("k")
    assert(df.select(RangeCuts.bucketOf(col("k"), IndexedSeq.empty))
      .as[Int].collect().toSeq == Seq(0, 0, 0))
    assert(df.select(RangeCuts.bucketOf(col("k"), IndexedSeq(lit(5L))))
      .as[Int].collect().toSeq == Seq(0, 1, 1))
    val eq = IndexedSeq(lit(5L), lit(5L), lit(5L))
    assert(df.select(RangeCuts.bucketOf(col("k"), eq))
      .as[Int].collect().toSeq == Seq(0, 3, 3))
  }
}
