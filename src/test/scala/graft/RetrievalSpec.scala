package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, RankFusion}

/** BM25 retrieval + reciprocal-rank fusion (operators/Bm25.scala,
  * operators/RankFusion.scala). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "x x y"),     // dl 3: both terms
    (2L, "x z"),       // dl 2: one term
    (3L, "w w w w")    // dl 4: no query term
  ).toDF("doc_id", "text")

  // the operator's arithmetic, mirrored op-for-op in plain doubles
  private def tfn(tf: Double, dl: Double, avgdl: Double,
                  k1: Double = 1.2, b: Double = 0.75): Double =
    tf * (k1 + 1) / (tf + k1 * ((1 - b) + b * (dl / avgdl)))
  private def idf(n: Double, df: Double): Double = (n - df + 0.5) / (df + 0.5)

  test("bm25: hand-computed scores, term-absent doc excluded, ranked") {
    val got = Bm25.topK(corpus, "doc_id", "text", Seq("x", "y"), k = 10)
      .select("doc_id", "dl", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val avgdl = 9.0 / 3
    val s1 = idf(3, 2) * tfn(2, 3, avgdl) + idf(3, 1) * tfn(1, 3, avgdl)
    val s2 = idf(3, 2) * tfn(1, 2, avgdl) + 0.0
    assert(got.map(_._1) == Seq(1L, 2L)) // doc 3 never scores
    assert(got == Seq((1L, 3L, s1, 1L), (2L, 2L, s2, 2L)))
  }

  test("bm25: rarer term dominates at equal tf") {
    // 'rare' in 1 doc, 'common' in 3 — doc with only the rare term
    // must outrank docs with only the common term (equal tf, dl)
    val df = Seq((1L, "rare pad"), (2L, "common pad"), (3L, "common x"),
      (4L, "common y")).toDF("doc_id", "text")
    val top = Bm25.topK(df, "doc_id", "text", Seq("rare", "common"), k = 4)
      .select("doc_id").as[Long].collect()
    assert(top.head == 1L)
  }

  test("bm25: length normalization favors the shorter doc at equal tf") {
    val df = Seq((1L, "q a"), (2L, "q a a a a a a a")).toDF("doc_id", "text")
    val got = Bm25.topK(df, "doc_id", "text", Seq("q"), k = 2)
      .select("doc_id", "rk").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 2L)
  }

  test("topKQueries: hand-computed ppm scores, one corpus pass, per-query ranks") {
    val queries = Seq((0L, "x y"), (1L, "z"), (2L, "absent")).toDF("q_id", "qtext")
    val got = Bm25.topKQueries(corpus, "doc_id", "text", queries, "q_id", "qtext")
      .select("q_id", "doc_id", "dl", "score_ppm", "rk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val avgdl = 9.0 / 3
    def ppm(c: Double): Long = math.floor(c * 1e6).toLong
    // q0 mirrors the topK test, but each term contribution quantized
    // to ppm BEFORE the sum (order-independent integer convention)
    val s1 = ppm(idf(3, 2) * tfn(2, 3, avgdl)) + ppm(idf(3, 1) * tfn(1, 3, avgdl))
    val s2 = ppm(idf(3, 2) * tfn(1, 2, avgdl))
    val z2 = ppm(idf(3, 1) * tfn(1, 2, avgdl))
    assert(got == Seq(
      (0L, 1L, 3L, s1, 1L), (0L, 2L, 2L, s2, 2L), // doc 3 never scores
      (1L, 2L, 2L, z2, 1L))) // q1 matches only doc 2; q2 matches nothing
  }

  test("topKQueries: duplicate terms in the query text collapse to a set") {
    val q1 = Seq((0L, "x x x y")).toDF("q_id", "qtext")
    val q2 = Seq((0L, "x y")).toDF("q_id", "qtext")
    val a = Bm25.topKQueries(corpus, "doc_id", "text", q1, "q_id", "qtext")
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toSeq.sorted
    val b = Bm25.topKQueries(corpus, "doc_id", "text", q2, "q_id", "qtext")
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toSeq.sorted
    assert(a == b)
  }

  test("topKQueries: per-query ranking agrees with single-query topK") {
    val queries = Seq((7L, "x y")).toDF("q_id", "qtext")
    val batched = Bm25.topKQueries(corpus, "doc_id", "text", queries, "q_id", "qtext")
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    val single = Bm25.topK(corpus, "doc_id", "text", Seq("x", "y"))
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(batched == single)
  }

  test("inverted index: parquet round trip, probe bit-identical to inline topK") {
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    idx.postings.write.mode("overwrite").parquet(s"$dir/postings")
    idx.stats.write.mode("overwrite").parquet(s"$dir/stats")
    val persisted = Bm25.Bm25Index(
      spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/stats"))
    val probe = Bm25.topKFromIndex(persisted, Seq("x", "y"))
      .select("doc_id", "dl", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val inline = Bm25.topK(corpus, "doc_id", "text", Seq("x", "y"))
      .select("doc_id", "dl", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(probe == inline) // doubles included: shared scoring tail
  }

  test("inverted index: empty-text docs carry no postings and no stats weight") {
    val df = Seq((1L, "x y"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val idx = Bm25.buildIndex(df, "doc_id", "text")
    assert(idx.postings.filter(col("doc_id") =!= 1L).count() == 0)
    val st = idx.stats.as[(Long, Long)].head()
    assert(st == ((1L, 2L))) // n_docs=1, tot=2 — same convention as topK
  }

  test("batched probe from index == topKQueries from raw corpus") {
    val queries = Seq((0L, "x y"), (1L, "z w")).toDF("q_id", "qtext")
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    val fromIdx = Bm25.topKQueriesFromIndex(idx, queries, "q_id", "qtext")
      .select("q_id", "doc_id", "dl", "score_ppm", "rk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val direct = Bm25.topKQueries(corpus, "doc_id", "text", queries, "q_id", "qtext")
      .select("q_id", "doc_id", "dl", "score_ppm", "rk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(fromIdx == direct && fromIdx.nonEmpty)
  }

  test("w-clustered persisted index: probe scan prunes, batched probe identical (r17)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // 800 docs over a 97-word synthetic vocab so posting lists are
    // wide enough for multi-file clustering to mean something
    val docs = spark.range(800).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(97)))): _*)
        .as("text"))
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val flat = java.nio.file.Files.createTempDirectory("bm25flat").toString
    val clus = java.nio.file.Files.createTempDirectory("bm25clus").toString
    idx.postings.repartition(8).write.mode("overwrite").parquet(s"$flat/postings")
    idx.stats.coalesce(1).write.mode("overwrite").parquet(s"$flat/stats")
    Bm25.writeIndex(idx, clus, nFiles = 8)

    val queries = spark.range(4).select(col("id").as("q_id"),
      concat(lit("w"), pmod(xxhash64(lit("q"), col("id")), lit(97)),
        lit(" w"), pmod(xxhash64(lit("r"), col("id")), lit(97))).as("qtext"))
    def probe(path: String) =
      Bm25.topKQueriesFromIndex(Bm25.readIndex(spark, path), queries,
          "q_id", "qtext", k = 5)
        .select("q_id", "doc_id", "dl", "score_ppm", "rk")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val flatGot = probe(flat)
    assert(flatGot == probe(clus) && flatGot.nonEmpty,
      "postings layout must not change the probe result")

    // scan-level payoff: the probed-term In filter skips the other
    // terms' posting-list row groups only under the clustered layout
    val total = idx.postings.count()
    val someTerms = Seq("w1", "w2", "w3")
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(s"$path/postings")
        .filter(col("w").isin(someTerms: _*))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val flatRows = scanRows(flat)
    val clusRows = scanRows(clus)
    assert(clusRows < flatRows && clusRows < total,
      s"clustered postings must prune: read $clusRows vs flat $flatRows of $total")
  }

  test("probe wider than the parquet In threshold still prunes (r18, ADVICE r17)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // parquet keeps an In exact only up to inFilterThreshold (10);
    // a realistic multi-term batch (24 terms spread across the vocab
    // — the worst case for the min/max range fallback) must still
    // skip unqueried posting lists via the chunked-In pushdown
    assert(spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold").toInt == 10)
    val docs = spark.range(800).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(97)))): _*)
        .as("text"))
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val clus = java.nio.file.Files.createTempDirectory("bm25wide").toString
    Bm25.writeIndex(idx, clus, nFiles = 8)
    val total = idx.postings.count()

    // one query carrying 24 distinct terms: 12 from each END of the
    // clustered (lexicographic) key order. Their min/max RANGE spans
    // the whole vocab — the shape a wide `isin`'s range fallback
    // cannot prune at all — while the exact values live only in the
    // edge files, so this passes ONLY if the >10-literal filter still
    // reaches parquet as exact values (the chunked-In contract)
    val vocab = (0 until 97).map(i => s"w$i").sorted
    val wide = (vocab.take(12) ++ vocab.takeRight(12)).mkString(" ")
    val queries = Seq((0L, wide)).toDF("q_id", "qtext")
    val probe = Bm25.topKQueriesFromIndex(Bm25.readIndex(spark, clus),
      queries, "q_id", "qtext", k = 5)
    val got = probe.collect().toSeq // executes THIS plan — metrics below
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_ppm"), r.getAs[Long]("rk"))).sorted
    val postingsRows = executedFileScans(probe)
      .filter(_.schema.fieldNames.contains("w"))
      .map(_.metrics("numOutputRows").value).sum
    // the plan scans postings twice (df + score); both pruned scans
    // TOGETHER must read fewer rows than ONE full pass — the range
    // fallback this term set defeats would read 2·total
    assert(postingsRows > 0 && postingsRows < total,
      s"24-term probe must read only its posting lists: $postingsRows of 2x$total")
    // and the pruned scan is semantically invisible: identical to the
    // no-index batched scorer over the same corpus
    val direct = Bm25.topKQueries(docs, "doc_id", "text",
        queries, "q_id", "qtext", k = 5)
      .select("q_id", "doc_id", "score_ppm", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == direct && got.nonEmpty)
  }

  test("empty probe batch: zero queries / all-whitespace queries " +
      "return empty, not throw (ADVICE r18 — chunkedIn on [] is " +
      "isin()'s empty semantics)") {
    import graft.operators.ScanPrune
    // the primitive: [] must behave like isin() with no values
    assert(corpus.filter(
      ScanPrune.chunkedIn(col("doc_id"), Seq.empty[Long], 10)).count() == 0)
    // both index-probe call sites that can reach it with zero literals
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    val none = Seq.empty[(Long, String)].toDF("q_id", "qtext")
    assert(Bm25.topKQueriesFromIndex(idx, none, "q_id", "qtext").count() == 0)
    val blank = Seq((0L, "   "), (1L, "")).toDF("q_id", "qtext")
    assert(Bm25.topKQueriesFromIndex(idx, blank, "q_id", "qtext").count() == 0)
  }

  test("incremental merge of disjoint batches == index of the union corpus") {
    val batch1 = corpus.filter(col("doc_id") <= 2L)
    val batch2 = corpus.filter(col("doc_id") > 2L)
    val merged = Bm25.mergeIndexes(
      Bm25.buildIndex(batch1, "doc_id", "text"),
      Bm25.buildIndex(batch2, "doc_id", "text"))
    val full = Bm25.buildIndex(corpus, "doc_id", "text")
    def canonP(i: Bm25.Bm25Index) = i.postings
      .select("w", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(canonP(merged) == canonP(full))
    assert(merged.stats.as[(Long, Long)].head() ==
      full.stats.as[(Long, Long)].head())
    // and probing the merged index is identical to probing the full one
    val q = Seq((0L, "x y z")).toDF("q_id", "qtext")
    assert(Bm25.topKQueriesFromIndex(merged, q, "q_id", "qtext").collect().toSeq ==
      Bm25.topKQueriesFromIndex(full, q, "q_id", "qtext").collect().toSeq)
  }

  test("rrf: exact ppm fusion, doc missing from one list, tie-break") {
    val l1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rk")
    val l2 = Seq((20L, 1L), (10L, 2L)).toDF("id", "rk")
    val got = RankFusion.rrf(Seq(l1, l2), "id", "rk", kappa = 60, topK = 10)
      .select("id", "n_lists", "rrf_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    def p(r: Long) = 1000000L / (60 + r)
    // 10: 16393+16129=32522; 20: 16129+16393=32522 — tie, id order
    assert(got == Seq(
      (10L, 2L, p(1) + p(2)),
      (20L, 2L, p(2) + p(1)),
      (30L, 1L, p(3))))
  }

  test("rrf: topK truncates after fusion") {
    val l1 = (1L to 5L).map(i => (i, i)).toDF("id", "rk")
    val got = RankFusion.rrf(Seq(l1), "id", "rk", topK = 2)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }
}
