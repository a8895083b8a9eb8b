package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Randomized consistency properties of the BPE trainer: the per-step
  * token trajectory must agree with what `encode` actually produces,
  * the trajectory must be strictly decreasing (every merge applies at
  * least once — it was counted from live adjacencies), and a driver
  * reference trainer on the collected word table must agree with the
  * distributed one, merge for merge. */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[String] = {
    // small alphabet + short words force merge-worthy repetition
    def word() = Seq.fill(2 + rnd.nextInt(4))("abcd" (rnd.nextInt(4))).mkString
    Seq.fill(nDocs)(Seq.fill(5 + rnd.nextInt(10))(word()).mkString(" "))
  }

  test("final trajectory token mass equals the encoded corpus total") {
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val corpus = randomCorpus(rnd, 20 + trial * 10).toDF("text")
      val (steps, _) = Bpe.trainDetailed(corpus, "text", 6)
      assert(steps.nonEmpty)
      val enc = Bpe.encode(corpus, "text", steps.map(s => (s.a, s.b)))
        .agg(sum(col("bpe_tokens"))).as[Long].head()
      assert(enc == steps.last.toksAfter,
        s"trial $trial: encode total $enc != trajectory ${steps.last.toksAfter}")
    }
  }

  test("trajectory is strictly decreasing and counts are positive") {
    val rnd = new Random(37)
    val corpus = randomCorpus(rnd, 40).toDF("text")
    val (steps, _) = Bpe.trainDetailed(corpus, "text", 8)
    val initial = corpus
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")).cast("long"))).as[Long].head()
    val masses = initial +: steps.map(_.toksAfter)
    masses.sliding(2).foreach { case Seq(prev, next) =>
      assert(next < prev, s"merge must reduce token mass: $masses")
    }
    steps.foreach(s => assert(s.n > 0))
  }

  test("distributed trainer agrees with a driver reference, merge for merge") {
    val rnd = new Random(41)
    val corpus = randomCorpus(rnd, 30)
    val (steps, _) = Bpe.trainDetailed(corpus.toDF("text"), "text", 6)
    // driver reference: word table -> iterate (count pairs, argmax
    // with (n desc, a, b), greedy left-to-right re-segment)
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong
      }
    val ref = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to 6) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, cnt) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + cnt)
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        ref += ((a, b, n))
        vocab = vocab.map { case (syms, cnt) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> cnt
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    assert(steps.map(s => (s.a, s.b, s.n)) == ref.result(),
      s"distributed ${steps.map(s => (s.a, s.b, s.n))} vs reference ${ref.result()}")
  }
}
