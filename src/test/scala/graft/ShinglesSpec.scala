package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Differential test: native graft_shingles must equal the HOF form
  * element-for-element (same first-occurrence order), including
  * multi-byte chars (char windows, not byte windows) and the short-
  * text edge. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("native shingles equals HOF on random ascii text") {
    val rnd = new Random(13)
    val alpha = "abcdef gh"
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(200))(alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("id", "text")
    for (k <- Seq(1, 3, 5)) {
      val n = docs.select(TextOps.shingles($"text", k).as("a"),
          TextOps.shinglesHof($"text", k).as("b"))
        .filter($"a" =!= $"b").count()
      assert(n == 0, s"k=$k: $n rows diverge")
    }
  }

  test("multi-byte chars shingle by character, short text empty") {
    val docs = Seq((1L, "héllo wörld"), (2L, "日本語のテキスト"), (3L, "ab"))
      .toDF("id", "text")
    val rows = docs.select($"id", TextOps.shingles($"text", 3).as("a"),
        TextOps.shinglesHof($"text", 3).as("b")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)}")
    }
    val short = rows.find(_.getLong(0) == 3L).get
    assert(short.getSeq[String](1).isEmpty)
  }
}
