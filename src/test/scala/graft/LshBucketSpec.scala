package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Differential test: the native graft_lsh_bucket expression must be
  * bit-identical to the portable HOF formulation it replaces (same
  * xxhash64-derived hyperplane family), across dims, nBits, offsets,
  * and the null-element / empty-vector edge cases. */
class LshBucketSpec extends SparkSpec {
  import spark.implicits._

  test("native lshBucket equals HOF formulation on random vectors") {
    val rnd = new Random(7)
    val dims = Seq(1, 3, 64)
    for (dim <- dims) {
      val vecs = (1 to 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
      val df = vecs.toDF("id", "v").cache()
      for ((nBits, off) <- Seq((8, 0), (16, 0), (12, 48), (1, 63))) {
        val got = df.select(col("id"),
            VectorOps.lshBucket(col("v"), nBits, off).as("n"),
            VectorOps.lshBucketHof(col("v"), nBits, off).as("h"))
          .filter(col("n") =!= col("h")).count()
        assert(got == 0, s"dim=$dim nBits=$nBits off=$off: $got rows diverge")
      }
      df.unpersist()
    }
  }

  test("tables at different bitOffsets are distinct hyperplane families") {
    val rnd = new Random(11)
    val df = (1 to 300).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian())))
      .toDF("id", "v")
    val n = df.select(VectorOps.lshBucket(col("v"), 8, 0).as("t0"),
        VectorOps.lshBucket(col("v"), 8, 8).as("t1"))
      .filter(col("t0") =!= col("t1")).count()
    assert(n > 0, "offset tables produced identical buckets for all rows")
  }

  test("multi-probe raises candidate coverage; probes are distinct and include the primary") {
    val rnd = new Random(61)
    val dim = 24
    val corpus = (1 to 600).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").cache()
    val queries = corpus.filter(col("vec_id") <= 8)
    // probe arrays: primary first, all pairwise distinct
    val probes = queries.select(
        graft.functions.VectorOps.lshBucket(
          graft.functions.VectorOps.toDouble(col("embedding")), 8).as("primary"),
        graft.functions.VectorOps.lshProbeBuckets(
          graft.functions.VectorOps.toDouble(col("embedding")), 8, 4).as("ps"))
      .collect()
    probes.foreach { r =>
      val ps = r.getSeq[Long](1)
      assert(ps.head == r.getLong(0) && ps.distinct.size == ps.size)
    }
    import graft.operators.SimilaritySearch
    val single = SimilaritySearch.lshTopK(queries, corpus, "vec_id", "embedding",
      k = 10, nBits = 8, nProbes = 1).count()
    val multi = SimilaritySearch.lshTopK(queries, corpus, "vec_id", "embedding",
      k = 10, nBits = 8, nProbes = 4).count()
    assert(multi >= single, s"multi-probe returned fewer rows: $multi < $single")
    // on random gaussians with 256 buckets, 4x probes must find more
    assert(multi > single, s"probing added nothing ($single rows)")
    corpus.unpersist()
  }

  test("null element and empty vector match HOF (bucket 0)") {
    val df = Seq(
      (1L, Array[java.lang.Double](1.0, null, 2.0)),
      (2L, Array[java.lang.Double]())
    ).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val rows = df.select(col("id"),
        VectorOps.lshBucket(col("v"), 8).as("n"),
        VectorOps.lshBucketHof(col("v"), 8).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L,
        s"id=${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }
}
