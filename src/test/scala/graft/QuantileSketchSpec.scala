package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** Gates for the power-of-2 log-linear quantile sketch:
  *   - bucket math matches a plain-Scala reference over the full
  *     domain shape (powers, boundaries, random longs);
  *   - merge(build(A), build(B)) ≡ build(A ∪ B) row-for-row (the
  *     mergeability contract that makes it the 100 TB quantile path);
  *   - estimates within the 2^-(s+1) relative-error guarantee of the
  *     exact nearest-lower-rank order statistic;
  *   - partition invariance (shuffle/parallelism can't move results).
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bucket math in plain Scala longs. */
  private def refBucket(x: Long, sub: Int): Int =
    if (x <= 0) -1
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val m = ((x << sub) >> e) - (1L << sub)
      (e * (1L << sub) + m).toInt
    }

  private def refValue(id: Int, sub: Int): Double =
    if (id < 0) 0.0
    else {
      val s2 = 1L << sub
      val e = id / s2
      val m = id % s2
      math.pow(2.0, e.toDouble) * (1.0 + (m + 0.5) / s2)
    }

  test("bucket id and representative match the Scala reference") {
    val rnd = new scala.util.Random(7)
    val xs = (Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 31L, 32L, 33L, 1023L, 1024L) ++
      (1 to 500).map(_ => rnd.nextLong(1L << 50) + 1)).distinct
    for (sub <- Seq(0, 3, 5)) {
      val got = xs.toDF("v")
        .select(col("v"), QuantileSketch.bucketId(col("v"), sub).as("b"))
        .select(col("v"), col("b"),
          QuantileSketch.bucketValue(col("b"), sub).as("rep"))
        .collect()
      got.foreach { r =>
        val (v, b, rep) = (r.getLong(0), r.getInt(1), r.getDouble(2))
        assert(b == refBucket(v, sub), s"bucket($v, sub=$sub)")
        assert(rep == refValue(b, sub), s"rep($v, sub=$sub)")
        // the relative-error contract the quantile estimates inherit
        if (v > 0) assert(math.abs(rep - v) / v.toDouble <=
          1.0 / (1L << (sub + 1)), s"relerr($v, sub=$sub)")
      }
    }
  }

  test("merge of shard sketches equals the single-pass sketch") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map(i =>
      (s"g${i % 3}", math.abs(rnd.nextLong()) % 100000))
    val df = rows.toDF("g", "v")
    val (a, b) = (df.filter(col("v") % 2 === 0), df.filter(col("v") % 2 =!= 0))
    val whole = QuantileSketch.build(df, Seq("g"), "v")
      .orderBy("g", "__bucket").collect()
    val merged = QuantileSketch.merge(
        QuantileSketch.build(a, Seq("g"), "v"),
        QuantileSketch.build(b, Seq("g"), "v"), Seq("g"))
      .orderBy("g", "__bucket").collect()
    assert(whole.map(_.toSeq).toSeq == merged.map(_.toSeq).toSeq)
  }

  test("estimates hit the guaranteed relative error vs exact ranks") {
    val rnd = new scala.util.Random(13)
    // mixed shapes: uniform, zipf-ish, constants, zeros
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 4}"
      val v = (i % 4) match {
        case 0 => rnd.nextInt(1000000).toLong
        case 1 => (1000000.0 / (1 + rnd.nextInt(1000))).toLong
        case 2 => 42L
        case _ => if (rnd.nextBoolean()) 0L else rnd.nextInt(100).toLong
      }
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val est = QuantileSketch.groupQuantiles(df, Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byG; ((_, q), i) <- qs.zipWithIndex) {
      val exact = vs(((q * (vs.length - 1))).toLong.toInt)
      val got = i match {
        case 0 => est(g)._1; case 1 => est(g)._2; case _ => est(g)._3
      }
      if (exact == 0L) assert(got == 0.0, s"$g q=$q zero")
      else assert(math.abs(got - exact) / exact.toDouble <= 1.0 / 64 + 1e-12,
        s"$g q=$q exact=$exact got=$got")
    }
  }

  test("weighted build == build over weight-replicated rows") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 800).map(i =>
      (s"g${i % 2}", rnd.nextInt(10000).toLong + 1, rnd.nextInt(5).toLong))
    val df = rows.toDF("g", "v", "w")
    val weighted = QuantileSketch
      .buildWeighted(df, Seq("g"), "v", "w")
      .orderBy("g", "__bucket").collect().map(_.toSeq).toSeq
    val replicated = QuantileSketch.build(
        rows.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
          .toDF("g", "v"), Seq("g"), "v")
      .orderBy("g", "__bucket").collect().map(_.toSeq).toSeq
    assert(weighted == replicated)
    // and the quantiles over them agree (token-mass percentiles)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val a = QuantileSketch.quantiles(
        QuantileSketch.buildWeighted(df, Seq("g"), "v", "w"), Seq("g"), qs)
      .orderBy("g").collect().map(_.toSeq).toSeq
    val b = QuantileSketch.groupQuantiles(
        rows.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
          .toDF("g", "v"), Seq("g"), "v", qs)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("partition invariance: 1 vs 7 partitions, identical output") {
    val rows = (1 to 3000).map(i => (s"g${i % 2}", (i * 31 % 7919).toLong))
    val df = rows.toDF("g", "v")
    val qs = Seq("p50" -> 0.5, "p95" -> 0.95)
    def run(parts: Int) =
      QuantileSketch.groupQuantiles(df.repartition(parts), Seq("g"), "v", qs)
        .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }
}
