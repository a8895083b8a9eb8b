package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** PageRank contracts: probability mass conservation, exact decimal
  * determinism (bit-identical under different input partitioning;
  * symmetric nodes get EXACTLY equal ranks), agreement with a
  * driver-side double-precision reference on a fixture graph, and
  * centrality ordering on a star. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("ranks sum to 1 and symmetric nodes tie exactly") {
    // path graph 1-2-3-4-5: (1,5) and (2,4) are symmetric pairs
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = PageRank.run(edges, "a", "b", iters = 12)
      .select(col("node"), col("rank"))
      .collect().map(x => x.getLong(0) -> x.getDecimal(1)).toMap
    val total = r.values.map(BigDecimal(_)).sum
    assert((total - 1).abs < BigDecimal("1e-12"), s"mass sum $total")
    assert(r(1L) === r(5L)) // exact decimal equality, not within-epsilon
    assert(r(2L) === r(4L))
    assert(BigDecimal(r(3L)) > BigDecimal(r(1L)))
  }

  test("star center dominates and leaves tie exactly") {
    val edges = (1L to 8L).map(i => (0L, i)).toDF("a", "b")
    val r = PageRank.run(edges, "a", "b", iters = 10)
      .collect().map(x => x.getLong(0) -> x.getDecimal(1)).toMap
    assert((1L to 8L).map(r).toSet.size === 1, "leaves must tie exactly")
    assert(BigDecimal(r(0L)) > 4 * BigDecimal(r(1L)))
  }

  test("self-loops are dropped from BOTH mirror legs; empty graph yields empty frame") {
    // (5,5) must not survive via the reversed leg: graph is 1-2 plus
    // the loop, so ranks must be the exact 2-node symmetric split
    val edges = Seq((1L, 2L), (5L, 5L)).toDF("a", "b")
    val r = PageRank.run(edges, "a", "b", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDecimal(1)).toMap
    assert(r.keySet === Set(1L, 2L), s"self-loop node leaked: ${r.keySet}")
    assert(r(1L) === r(2L))
    // all-self-loop input -> no usable edges -> empty, not an error
    assert(PageRank.run(Seq((7L, 7L)).toDF("a", "b"), "a", "b").count() === 0)
  }

  test("bit-identical under input partitioning") {
    val edges = (0L until 60L).map(i => (i % 17, (i * 7 + 3) % 17))
      .filter { case (a, b) => a != b }.toDF("a", "b")
    def run(parts: Int) = PageRank.run(edges.repartition(parts), "a", "b", iters = 8)
      .collect().map(x => x.getLong(0) -> x.getDecimal(1)).toMap
    assert(run(1) === run(7))
  }

  test("matches a double-precision reference within 1e-9") {
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val d = 0.85; val iters = 15
    // driver reference on the symmetrized graph
    val adj = (raw ++ raw.map(_.swap)).distinct.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val n = nodes.size
    var ref = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      // .keys yields a Set — map over an iterator so equal
      // contributions from different sources don't collapse
      val in = nodes.map { v =>
        v -> adj.filter(_._2.contains(v)).keysIterator
          .map(u => ref(u) / adj(u).size).sum
      }.toMap
      ref = nodes.map(v => v -> ((1 - d) / n + d * in(v))).toMap
    }
    val got = PageRank.run(raw.toDF("a", "b"), "a", "b", iters, d)
      .collect().map(x => x.getLong(0) -> x.getDecimal(1).doubleValue()).toMap
    nodes.foreach { v =>
      assert(math.abs(got(v) - ref(v)) < 1e-9, s"node $v: ${got(v)} vs ${ref(v)}")
    }
  }

  test("matches the exact scale-18 half-up fixed-point reference " +
      "DIGIT FOR DIGIT (r19: the damping multiply used to round at " +
      "scale 16 through Spark's precision adjustment — invisible at " +
      "12 output decimals until a rank lands on a half-boundary)") {
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 1L), (2L, 6L))
    val d = 0.85; val iters = 10
    val adj = (raw ++ raw.map(_.swap)).distinct.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val n = nodes.size
    def r18(x: JBD): JBD = x.setScale(18, RoundingMode.HALF_UP)
    val damp = new JBD(d).setScale(6, RoundingMode.HALF_UP)
    val one = JBD.ONE
    val invN = r18(one.divide(new JBD(n), 18, RoundingMode.HALF_UP))
    val teleport = r18(one.subtract(damp).multiply(invN))
    var ref = nodes.map(_ -> invN).toMap
    for (_ <- 1 to iters) {
      val in = nodes.map { v =>
        v -> adj.filter(_._2.contains(v)).keysIterator
          .map(u => ref(u).divide(new JBD(adj(u).size), 18,
            RoundingMode.HALF_UP))
          .foldLeft(JBD.ZERO)(_.add(_))
      }.toMap
      ref = nodes.map(v => v -> r18(teleport.add(damp.multiply(in(v))))).toMap
    }
    val got = PageRank.run(raw.toDF("a", "b"), "a", "b", iters, d)
      .collect().map(x => x.getLong(0) -> x.getDecimal(1)).toMap
    nodes.foreach { v =>
      assert(got(v).compareTo(ref(v)) == 0,
        s"node $v: ${got(v)} vs exact ${ref(v)}")
    }
  }

  test("damping outside 6-decimal representability is rejected, not " +
      "silently quantized to an endpoint (ADVICE r19)") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD}
    val edges = Seq((1L, 2L)).toDF("a", "b")
    // quantizes to 0 -> teleport-only ranks would run with no warning
    intercept[IllegalArgumentException] {
      PageRank.run(edges, "a", "b", iters = 1, damping = 1e-7)
    }
    // quantizes to 1 -> no teleport at all
    intercept[IllegalArgumentException] {
      PageRank.run(edges, "a", "b", iters = 1, damping = 0.9999999)
    }
    // a representable 6-decimal value passes and sums to 1 exactly
    val s = PageRank.run(edges, "a", "b", iters = 2, damping = 0.851235)
      .agg(org.apache.spark.sql.functions.sum("rank")).collect()(0)
      .getDecimal(0)
    assert(s.compareTo(new JBD(1).setScale(s.scale)) == 0, s"sum $s")
  }
}
