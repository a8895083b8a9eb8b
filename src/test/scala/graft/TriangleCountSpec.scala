package graft

import scala.util.Random
import graft.operators.Components

/** Triangle counting: closed-form fixtures, a brute-force
  * differential on random graphs, and hub-robustness (the star graph
  * that kills the naive node-iterator). */
class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val df = edges.toDF("a", "b")
    val r = Components.triangleCount(df, "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("complete graph K5: C(5,3) = 10 triangles") {
    val edges = for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j)
    assert(count(edges) == ((5L, 10L, 10L)))
  }

  test("star graph: hub with 50 spokes, zero triangles") {
    val edges = (1L to 50L).map(i => (0L, i))
    assert(count(edges) == ((51L, 50L, 0L)))
  }

  test("star plus one closing edge: exactly one triangle") {
    val edges = (1L to 50L).map(i => (0L, i)) :+ (1L, 2L)
    assert(count(edges) == ((51L, 51L, 1L)))
  }

  test("uncanonical input (reversed, duplicate edges) is normalized") {
    val edges = Seq((1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L), (2L, 0L))
    assert(count(edges) == ((3L, 3L, 1L)))
  }

  test("random graph differential vs brute-force enumeration") {
    val rnd = new Random(47)
    val n = 60
    val edges = (for {
      i <- 0L until n; j <- (i + 1) until n if rnd.nextDouble() < 0.08
    } yield (i, j)).toSeq
    val es = edges.toSet
    var brute = 0L
    for (x <- 0L until n; y <- (x + 1) until n; z <- (y + 1) until n)
      if (es((x, y)) && es((x, z)) && es((y, z))) brute += 1
    val (_, nEdges, nTri) = count(edges)
    assert(nEdges == edges.size)
    assert(nTri == brute, s"got $nTri, brute force says $brute")
  }
}
