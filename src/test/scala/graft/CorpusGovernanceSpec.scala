package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusGovernance

/** Corpus-governance contracts: (1) the source-overlap matrix counts
  * planted cross- and intra-source near-dup pairs in the right cells
  * and nowhere else; (2) the leakage-safe split quarantines exactly
  * the train-side near-twins of test docs, keeps test docs test, and
  * covers every doc; (3) both are bit-identical across reruns and
  * partitioning (hash-seeded determinism end to end). */
class CorpusGovernanceSpec extends SparkSpec {
  import spark.implicits._

  // near-identical long texts (one token differs) collide in most
  // MinHash bands; the "solo" docs share nothing
  private val twinA = ("the quick brown fox jumps over the lazy dog " * 8) + "alpha end"
  private val twinB = ("the quick brown fox jumps over the lazy dog " * 8) + "omega end"
  private def solo(i: Int) =
    s"completely unrelated document number $i with its own words " +
      (1 to 30).map(j => s"tok${i}_$j").mkString(" ")

  test("sourceOverlap counts planted pairs per source cell") {
    // ids 1/2: cross-source twins (s1 x s2); ids 3/4: intra-source
    // twins (both s1); ids 10-14: unrelated singles in s3
    val docs = (Seq(
      (1L, twinA, "s1"), (2L, twinB, "s2"),
      (3L, twinA + " x", "s1"), (4L, twinB + " x", "s1")) ++
      (10 to 14).map(i => (i.toLong, solo(i), "s3")))
      .toDF("doc_id", "text", "source")
    val m = CorpusGovernance.sourceOverlap(docs, "doc_id", "text", "source", k = 5)
      .orderBy("src_a", "src_b")
      .as[(String, String, Long, Long)].collect()

    val cells = m.map { case (a, b, p, d) => (a, b) -> (p, d) }.toMap
    // the (s1, s1) diagonal holds the intra-source pair 3-4 (and
    // whatever of 1/3, 1x4... the twins are all near-identical, so
    // pairs among {1,3,4} restricted to s1xs1 = (3,4) plus (1,3),(1,4)
    assert(cells.contains(("s1", "s1")), s"missing diagonal: ${m.mkString(";")}")
    assert(cells.contains(("s1", "s2")), s"missing cross cell: ${m.mkString(";")}")
    // no cell may involve s3 (solo docs share no shingles)
    assert(!m.exists { case (a, b, _, _) => a == "s3" || b == "s3" })
    // doc counts are distinct-doc counts: the cross cell has exactly
    // the docs of its pairs
    val (crossPairs, crossDocs) = cells(("s1", "s2"))
    assert(crossPairs >= 1L && crossDocs >= 2L && crossDocs <= crossPairs * 2)
  }

  test("leakageSafeSplit quarantines train twins of test docs, covers all docs") {
    // find a doc id whose xxhash64 lands in the test bucket
    val ids = spark.range(1, 2000)
      .select(col("id"), pmod(xxhash64(col("id")), lit(10L)).as("m"))
      .as[(Long, Long)].collect()
    val testId = ids.find(_._2 == 0L).get._1
    val trainId = ids.find(_._2 != 0L).get._1
    val soloTrainId = ids.filter(t => t._2 != 0L && t._1 != trainId).head._1

    val docs = Seq(
      (testId, twinA), // test doc
      (trainId, twinB), // its train-side twin -> quarantine
      (soloTrainId, solo(99))) // unrelated -> train
      .toDF("doc_id", "text")
    val split = CorpusGovernance.leakageSafeSplit(docs, "doc_id", "text", k = 5)
      .as[(Long, String)].collect().toMap

    assert(split.size === 3)
    assert(split(testId) === "test")
    assert(split(trainId) === "quarantine")
    assert(split(soloTrainId) === "train")
  }

  test("split is invariant under repartitioning and rerun") {
    val docs = (Seq((1L, twinA), (2L, twinB)) ++
      (10 to 40).map(i => (i.toLong, solo(i)))).toDF("doc_id", "text")
    val a = CorpusGovernance.leakageSafeSplit(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    val b = CorpusGovernance.leakageSafeSplit(docs.repartition(7), "doc_id", "text", k = 5)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
