package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC merge semantics: latest-version-wins, deletes remove, inserts
  * of unseen keys appear, equal-timestamp changes resolve by seq, and
  * the result is partitioning-invariant. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    .toDF("k", "bal")

  // key 1: update; key 2: update then delete; key 3: untouched;
  // key 4: delete then re-insert; key 5: brand new; key 6: two
  // changes at the SAME ts — seq must break the tie
  private val changelog = Seq(
    (1L, ts(10), 1L, "U", 11.0),
    (2L, ts(10), 2L, "U", 21.0),
    (2L, ts(20), 3L, "D", 0.0),
    (4L, ts(10), 4L, "D", 0.0),
    (4L, ts(20), 5L, "U", 44.0),
    (5L, ts(10), 6L, "U", 55.0),
    (6L, ts(30), 7L, "U", 66.0),
    (6L, ts(30), 8L, "U", 67.0)
  ).toDF("k", "ts", "seq", "op", "value")

  test("applyChanges: upsert, delete, reinsert, insert, tie by seq") {
    val got = Cdc.applyChanges(base, changelog, "k", "ts", "seq", "op",
        Seq("bal" -> col("value")))
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got == Seq(1L -> 11.0, 3L -> 30.0, 4L -> 44.0, 5L -> 55.0, 6L -> 67.0))
  }

  test("latestState drops deleted keys and keeps the winning payload") {
    val got = Cdc.latestState(changelog, "k", "ts", "seq", "op")
      .select($"k", $"value").orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got == Seq(1L -> 11.0, 4L -> 44.0, 5L -> 55.0, 6L -> 67.0))
  }

  test("partitioning-invariant") {
    val a = Cdc.applyChanges(base.repartition(1), changelog.repartition(7),
        "k", "ts", "seq", "op", Seq("bal" -> col("value")))
      .orderBy("k").as[(Long, Double)].collect().toSeq
    val b = Cdc.applyChanges(base.repartition(5), changelog.repartition(2),
        "k", "ts", "seq", "op", Seq("bal" -> col("value")))
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
