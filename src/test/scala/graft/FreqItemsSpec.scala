package graft

import scala.util.Random
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items aggregate: the superset guarantee
  * (every item above the n/(k+1) frequency threshold is in the
  * candidate set, under ANY partitioning), the exactness-restoring
  * two-pass pipeline, and the SQL surface. */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def mg(c: org.apache.spark.sql.Column, k: Int) =
    call_function("graft_freq_items", c, lit(k))

  /** Zipf-ish skewed token stream: item i appears ~ n/i times. */
  private def skewed(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val out = Seq.newBuilder[String]
    for (i <- 1 to 40; _ <- 1 to (n / i)) out += s"tok$i"
    rnd.shuffle(out.result())
  }

  test("candidates are a superset of true heavy hitters under any partitioning") {
    val data = skewed(2000, 31)
    val n = data.size
    val k = 8
    val df = data.toDF("t").cache()
    val exactHeavy = df.groupBy("t").count()
      .filter(col("count") * (k + 1) > n)
      .as[(String, Long)].collect().map(_._1).toSet
    assert(exactHeavy.nonEmpty, "fixture must have heavy hitters")
    for (parts <- Seq(1, 3, 17)) {
      val cand = df.repartition(parts).agg(mg($"t", k))
        .head().getSeq[String](0).toSet
      assert(cand.size <= k, s"sketch overflow: ${cand.size} > $k")
      assert(exactHeavy.subsetOf(cand),
        s"parts=$parts missing ${exactHeavy -- cand}")
    }
    df.unpersist()
  }

  test("two-pass exact heavy hitters: deterministic across partitionings") {
    val data = skewed(5000, 37)
    val k = 6
    def run(parts: Int): Seq[(String, Long)] = {
      val toks = data.toDF("token").repartition(parts)
      val sk = toks.agg(mg($"token", k).as("cand"), count(lit(1)).as("n"))
      val cand = sk.select(explode($"cand").as("token"), $"n")
      toks.join(broadcast(cand), "token")
        .groupBy("token", "n").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * (k + 1) > $"n")
        .select($"token", $"cnt")
        .orderBy(desc("cnt"), $"token")
        .as[(String, Long)].collect().toSeq
    }
    val a = run(2)
    val b = run(23)
    assert(a == b, s"$a vs $b")
    assert(a.nonEmpty)
    // and it IS the exact answer
    val n = data.size
    val exact = data.toDF("token").groupBy("token").count()
      .filter(col("count") * (k + 1) > n)
      .select($"token", $"count".as("cnt"))
      .orderBy(desc("cnt"), $"token").as[(String, Long)].collect().toSeq
    assert(a == exact)
  }

  test("single-counter stream behavior matches Misra-Gries by hand") {
    // stream a a b c with k=2: a survives with its count lower bound
    val df = Seq("a", "a", "b", "c").toDF("t").coalesce(1)
    val cand = df.agg(mg($"t", 2)).head().getSeq[String](0)
    assert(cand.contains("a"))
  }

  test("non-string input fails at analysis, not at runtime") {
    val df = Seq(1L, 2L).toDF("v")
    val e = intercept[Exception] { df.agg(mg($"v", 4)).collect() }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }

  test("callable from SQL text") {
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("mg_in")
    val got = spark.sql("SELECT graft_freq_items(t, 4) FROM mg_in")
      .head().getSeq[String](0).toSet
    assert(got == Set("x", "y"))
  }
}
