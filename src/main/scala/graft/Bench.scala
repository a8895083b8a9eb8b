package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb session init (parquet reader, codegen
    // infra, JIT of common paths) so per-query timings reflect steady
    // state; each query still pays its own plan/codegen cost. One
    // representative per table family (lineitem / documents /
    // embeddings / events) — with the name-sorted run order the first
    // catalog queries would otherwise absorb every table's first-read
    // cost and their times would measure run position, not the query.
    for (w <- Seq("q1_pricing_summary", "t2_quality_score",
        "s1_cosine_topk", "e1_tumbling_window", "t7_vocab_topk"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the catalog (the
    // driver sets no filter and always times everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val catalog = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    // deterministic name-sorted run order: Map iteration order is
    // hash-arbitrary and changes as the catalog grows, which makes
    // per-query times incomparable across rounds (a query's cost
    // depends on which queries warmed the JVM before it)
    val results = catalog.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // failed queries report -1 so breakage is visible, not a fast time
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // release leftover blocks (localCheckpoints inside operators are
      // otherwise only freed by the ContextCleaner after GC) so earlier
      // queries don't tax later ones — measurement hygiene, VERDICT r2
      // item 4; done outside the timed span. Blocking unpersist, then a
      // forced GC: broadcast blocks and shuffle files are reclaimed by
      // the ContextCleaner only after their references are collected,
      // so without the GC the 52-query session still accumulates them
      // and late queries pay the memory/GC tax (the BENCH_r02/r03
      // late-run slowdown cluster).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      Thread.sleep(50) // let the async ContextCleaner drain its queue
      name -> sec
    }
    // ms-rounded per-query times and a duplicate total at the END of
    // the object: the driver keeps only the last ~2000 chars of output,
    // and with a 70+-query catalog the line's head (where "value" sits)
    // can fall outside that window — the trailing "total_sec" keeps the
    // headline number visible even if the head is truncated.
    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // comma-decimal locale would emit invalid JSON ("value":1,234)
    def r3(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","n_queries":${results.size},"total_sec":${r3(total)}}""")
    spark.stop()
  }
}
