package graft

import scala.util.Random
import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** packNextFit contracts: bit-equal to a sequential reference scan,
  * bin-capacity invariants (no bin over budget except an oversized
  * document sitting alone), and partitioning invariance — several
  * shards sharing one partition (shuffle.partitions=4 < shards) must
  * reset state at every shard boundary. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      // mix of tiny docs, mid docs, and a few oversized (> budget)
      val toks = rnd.nextInt(10) match {
        case 0 => 3000L + rnd.nextInt(2000)
        case 1 | 2 => 1L + rnd.nextInt(20)
        case _ => 50L + rnd.nextInt(900)
      }
      (i.toLong, i.toLong % 7, toks)
    }
  }

  /** Sequential reference: the operator's contract, one shard at a time. */
  private def reference(rows: Seq[(Long, Long, Long)], budget: Long)
      : Map[Long, Long] = {
    val out = mutable.Map.empty[Long, Long]
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var bin = 0L; var fill = 0L
      docs.sortBy(_._1).foreach { case (id, _, toks) =>
        if (fill > 0L && fill + toks > budget) { bin += 1L; fill = 0L }
        fill += toks
        out(id) = bin
      }
    }
    out.toMap
  }

  test("matches the sequential reference scan exactly") {
    val data = corpus(400, seed = 17)
    val want = reference(data, budget = 2048L)
    val got = Packing.packNextFit(
        data.toDF("id", "shard", "toks"), "shard", Seq("id"), "toks", 2048L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("no bin over budget unless a single oversized doc sits alone") {
    val data = corpus(400, seed = 29)
    val bins = Packing.packNextFit(
        data.toDF("id", "shard", "toks"), "shard", Seq("id"), "toks", 2048L)
      .groupBy("shard", "bin")
      .agg(sum("toks").as("fill"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    bins.foreach { case (shard, bin, fill, n) =>
      assert(fill <= 2048L || n == 1L, s"shard $shard bin $bin: fill=$fill n=$n")
    }
    assert(bins.exists(_._4 == 1L), "fixture should produce oversized-alone bins")
  }

  test("bin ids are invariant under input partitioning") {
    val data = corpus(300, seed = 41)
    def run(parts: Int) = Packing.packNextFit(
        data.toDF("id", "shard", "toks").repartition(parts),
        "shard", Seq("id"), "toks", 2048L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(run(1) === run(13))
  }

  /** FFD reference: per shard, (toks desc, id) order, first open bin
    * with room else a new one. */
  private def referenceFfd(rows: Seq[(Long, Long, Long)], budget: Long)
      : Map[Long, Long] = {
    val out = mutable.Map.empty[Long, Long]
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val fills = mutable.ArrayBuffer.empty[Long]
      docs.sortBy(d => (-d._3, d._1)).foreach { case (id, _, toks) =>
        var i = 0
        while (i < fills.length && fills(i) + toks > budget) i += 1
        if (i == fills.length) fills += toks else fills(i) += toks
        out(id) = i.toLong
      }
    }
    out.toMap
  }

  test("FFD matches the sequential reference scan exactly (r11)") {
    val data = corpus(400, seed = 53)
    val want = referenceFfd(data, budget = 2048L)
    val got = Packing.packFirstFitDecreasing(
        data.toDF("id", "shard", "toks"), "shard", Seq("id"), "toks", 2048L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("FFD: no bin over budget unless oversized-alone; invariant to partitioning") {
    val data = corpus(400, seed = 59)
    def run(parts: Int) = Packing.packFirstFitDecreasing(
        data.toDF("id", "shard", "toks").repartition(parts),
        "shard", Seq("id"), "toks", 2048L)
    run(1).groupBy("shard", "bin")
      .agg(sum("toks").as("fill"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
      .foreach { case (shard, bin, fill, n) =>
        assert(fill <= 2048L || n == 1L, s"shard $shard bin $bin: fill=$fill n=$n")
      }
    def bins(parts: Int) = run(parts)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(bins(1) === bins(17))
  }

  test("FFD uses no more bins than next-fit (the heuristic's point)") {
    val data = corpus(600, seed = 61)
    def nBins(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "bin").distinct().count()
    val nf = nBins(Packing.packNextFit(
      data.toDF("id", "shard", "toks"), "shard", Seq("id"), "toks", 2048L))
    val ffd = nBins(Packing.packFirstFitDecreasing(
      data.toDF("id", "shard", "toks"), "shard", Seq("id"), "toks", 2048L))
    assert(ffd <= nf, s"FFD $ffd bins vs next-fit $nf")
    assert(ffd < nf, s"fixture should show a strict improvement ($ffd vs $nf)")
  }
}
