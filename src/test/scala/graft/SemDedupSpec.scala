package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, KMeans, SemDedup}

/** SemDeDup contracts: (1) the within-cell pair search is EXACTLY the
  * global exact near-dup search restricted to same-cell pairs — the
  * cluster confinement loses only cross-cell pairs, by construction;
  * (2) planted near-identical vectors land in one cell and the greater
  * id is dropped; (3) reruns are bit-identical (deterministic fit +
  * assignment + keep policy); (4) no BroadcastNestedLoopJoin in the
  * pair-join plan. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int) = {
    val rnd = new Random(seed)
    (1 to n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
  }

  test("within-cell pairs equal the exact search restricted to same-cell pairs") {
    val df = corpus(400, 12, seed = 11).cache()
    val model = KMeans.fit(df, "id", "v", k = 6, iters = 2)
      .select(col("cell").cast("long"), col("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val assigned = SemDedup.assignCells(df, "id", "v", model).cache()

    val got = SemDedup.pairs(assigned, threshold = 0.3, blocks = 3)
      .select("a_id", "b_id", "cos").as[(Long, Long, Double)].collect().toSet

    val cellOf = assigned.select("id", "cell").as[(Long, Long)].collect().toMap
    val want = Dedup.embeddingNearDups(df, "id", "v", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => cellOf(a) == cellOf(b) }.toSet

    assert(want.nonEmpty, "fixture produced no same-cell pairs")
    assert(got === want)
    df.unpersist(); assigned.unpersist()
  }

  test("planted near-dups are caught and the min id survives") {
    val rnd = new Random(7)
    val base = (1 to 300).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    // twins: copy of vector i at id 1000+i with tiny jitter -> cosine ~1
    val twins = base.take(20).map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.001f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ twins).toDF("id", "v")
    val out = SemDedup.dedup(df, "id", "v", threshold = 0.95,
        nCells = 5, iters = 2, blocks = 3)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    // every twin (the greater id of its pair) must be dropped, its
    // base kept — near-identical vectors score ~equally against every
    // centroid, so the argmax assigns them to the same cell
    for (i <- 1L to 20L) {
      assert(out(1000L + i) === false, s"twin of $i survived")
      assert(out(i) === true, s"base $i was dropped")
    }
    // untouched vectors all survive
    assert(out.count(!_._2) === 20)
  }

  test("dedup output is bit-identical across reruns") {
    val df = corpus(250, 8, seed = 23)
    def run() = SemDedup.dedup(df, "id", "v", threshold = 0.3,
        nCells = 4, iters = 2, blocks = 2)
      .orderBy("id").collect().toSeq
    assert(run() === run())
  }

  test("pair join plan has no BroadcastNestedLoopJoin") {
    val df = corpus(100, 8, seed = 5)
    val model = KMeans.fit(df, "id", "v", k = 3, iters = 1)
      .select(col("cell").cast("long"), col("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val plan = SemDedup.pairs(SemDedup.assignCells(df, "id", "v", model), 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
