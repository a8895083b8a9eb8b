package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** The RewriteDotProduct optimizer rule: fires on the HOF dot pattern,
  * is numerically a no-op (incl. null-element and length-mismatch
  * edges, where VecDot now mirrors zip_with's null propagation), and
  * leaves non-matching aggregates alone. */
class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  // non-foldable arrays (functions of id) — a local Seq would be
  // constant-folded into a LocalRelation before the plan is inspectable
  private def rangeVecs = spark.range(1, 50).select($"id",
    array(($"id" + 1).cast("double"), ($"id" + 2).cast("double")).as("a"),
    array(($"id" + 3).cast("double"), ($"id" + 4).cast("double")).as("b"))

  test("HOF dot pattern is rewritten to graft_dot in the optimized plan") {
    val q = rangeVecs.select($"id", VectorOps.dot($"a", $"b").as("d"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_dot"), s"rule did not fire:\n$plan")
    // id=1: (2,3)·(4,5) = 23
    assert(q.orderBy("id").head().getDouble(1) == 23.0)
  }

  test("rewrite preserves HOF semantics on nulls and mismatches") {
    val rows = Seq(
      (1L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)),
      (2L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)),
      (3L, Array[java.lang.Double](1.0), Array[java.lang.Double](3.0, 4.0)))
    val df = rows.toDF("id", "a", "b")
      .select($"id", $"a".cast("array<double>").as("a"), $"b".cast("array<double>").as("b"))
    val got = df.select($"id", VectorOps.dot($"a", $"b").as("d"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(1L -> Some(11.0), 2L -> None, 3L -> None))
    // native call agrees on the same frame
    val nat = df.select($"id", VectorOps.fastDot($"a", $"b").as("d"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(nat.toSeq == got.toSeq)
  }

  test("rewrite is bit-identical to the interpreted HOF on random vectors") {
    val rnd = new Random(19)
    val df = (1 to 100).map(i => (i.toLong,
        Array.fill(33)(rnd.nextGaussian()), Array.fill(33)(rnd.nextGaussian())))
      .toDF("id", "a", "b").cache()
    // exclude the rule so the genuine interpreted HOF runs
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.optimizer.excludedRules")
    val hof = try {
      conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteDotProduct")
      val q = df.select($"id", VectorOps.dot($"a", $"b").as("d"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        "exclusion did not disable the rule; test needs another lever")
      q.orderBy("id").collect().map(_.getDouble(1)).toSeq
    } finally saved match {
      case Some(v) => conf.set("spark.sql.optimizer.excludedRules", v)
      case None => conf.unset("spark.sql.optimizer.excludedRules")
    }
    val nat = df.select($"id", VectorOps.dot($"a", $"b").as("d"))
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(hof == nat)
    df.unpersist()
  }

  test("non-matching aggregate shapes are not rewritten") {
    // NON-zero seed: must stay a HOF
    val q = rangeVecs.select($"id", aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(q.orderBy("id").head().getDouble(1) == 24.0)
  }
}
