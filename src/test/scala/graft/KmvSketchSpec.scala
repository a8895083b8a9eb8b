package graft

import scala.util.Random
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, bounded relative error above
  * it, bit-identical under any partitioning (min-sets are order-free),
  * and callable from SQL text. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def kmv(c: org.apache.spark.sql.Column, k: Int) =
    call_function("graft_kmv_distinct", c, lit(k))

  test("exact when distinct count is below k") {
    val df = (1 to 5000).map(i => i.toLong % 100).toDF("v")
    val est = df.agg(kmv($"v", 256)).head().getDouble(0)
    assert(est == 100.0)
  }

  test("bounded relative error above k") {
    val rnd = new Random(53)
    val n = 20000
    val df = (1 to n).map(_ => rnd.nextLong()).distinct.toDF("v").cache()
    val exact = df.distinct().count()
    val est = df.agg(kmv($"v", 512)).head().getDouble(0)
    val err = math.abs(est - exact) / exact
    assert(err < 0.15, s"relative error $err (est $est vs $exact)")
    df.unpersist()
  }

  test("estimate is invariant under repartitioning") {
    val rnd = new Random(59)
    val df = (1 to 8000).map(_ => rnd.nextLong()).toDF("v").cache()
    val a = df.repartition(3).agg(kmv($"v", 128)).head().getDouble(0)
    val b = df.repartition(29).agg(kmv($"v", 128)).head().getDouble(0)
    assert(a == b, s"$a vs $b")
    df.unpersist()
  }

  test("sketch set operations: union/intersection/jaccard estimates") {
    import graft.functions.SketchOps
    // A = [0, 30k), B = [20k, 50k): |A|=|B|=30k, |A∩B|=10k, |A∪B|=50k,
    // true Jaccard = 0.2
    val k = 512
    val a = (0 until 30000).map(_.toLong).toDF("v")
      .agg(SketchOps.kmvSketch($"v", k).as("s"))
    val b = (20000 until 50000).map(_.toLong).toDF("v")
      .agg(SketchOps.kmvSketch($"v", k).as("s"))
    val row = a.crossJoin(b.withColumnRenamed("s", "t")).select(
      SketchOps.kmvUnionEstimate($"s", $"t", k).as("u"),
      SketchOps.kmvJaccardEstimate($"s", $"t", k).as("j"),
      SketchOps.kmvIntersectEstimate($"s", $"t", k).as("i")).head()
    assert(math.abs(row.getDouble(0) - 50000) / 50000 < 0.15, s"union ${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 0.2) < 0.06, s"jaccard ${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - 10000) / 10000 < 0.35, s"inter ${row.getDouble(2)}")
  }

  test("usable from SQL and groupBy") {
    (1 to 1000).map(i => (i % 4, i.toLong % 300)).toDF("g", "v")
      .createOrReplaceTempView("kmv_t")
    val rows = spark.sql(
      "SELECT g, graft_kmv_distinct(v, 64) AS d FROM kmv_t GROUP BY g ORDER BY g")
      .collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
  }
}
