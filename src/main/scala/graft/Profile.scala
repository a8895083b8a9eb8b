package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool (r21 optimization round): run named catalog queries once
  * (after a shared warmup) under a listener that attributes wall time
  * to jobs and sums task/shuffle metrics per job — the "where does
  * the time actually go" view the Spark UI would give, in text form
  * (`runMain graft.Profile <name>[,<name>...] [sfDir] [cpus]`). */
object Profile {
  private class Acc extends SparkListener {
    case class JobRow(id: Int, var desc: String, var t0: Long = 0L,
                      var t1: Long = 0L, var nTasks: Int = 0,
                      var taskTimeMs: Long = 0L, var shRead: Long = 0L,
                      var shWrite: Long = 0L, var input: Long = 0L,
                      var nStages: Int = 0, var gcMs: Long = 0L,
                      var cpuMs: Long = 0L, var deserMs: Long = 0L,
                      var fetchWaitMs: Long = 0L, var shWriteMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, JobRow]()
    val stageToJob = mutable.HashMap[Int, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val r = JobRow(e.jobId, Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
      r.t0 = e.time; r.nStages = e.stageIds.size
      jobs(e.jobId) = r
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      for (j <- stageToJob.get(e.stageId); r <- jobs.get(j);
           m <- Option(e.taskMetrics)) {
        r.nTasks += 1
        r.taskTimeMs += m.executorRunTime
        r.gcMs += m.jvmGCTime
        r.cpuMs += m.executorCpuTime / 1000000L
        r.deserMs += m.executorDeserializeTime
        r.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        r.shWriteMs += m.shuffleWriteMetrics.writeTime / 1000000L
        r.shRead += m.shuffleReadMetrics.totalBytesRead
        r.shWrite += m.shuffleWriteMetrics.bytesWritten
        r.input += m.inputMetrics.bytesRead
      }
    }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
    def report(): String = synchronized {
      val rows = jobs.values.toSeq
      val hdr = f"${"job"}%4s ${"wall_ms"}%8s ${"stages"}%6s ${"tasks"}%6s " +
        f"${"taskTime"}%9s ${"cpu_ms"}%7s ${"deser"}%6s ${"gc_ms"}%6s ${"fetchW"}%6s ${"shWrMs"}%6s ${"input"}%9s ${"shRead"}%9s ${"shWrite"}%9s  desc"
      val body = rows.map { r =>
        f"${r.id}%4d ${r.t1 - r.t0}%8d ${r.nStages}%6d ${r.nTasks}%6d " +
          f"${r.taskTimeMs}%9d ${r.cpuMs}%7d ${r.deserMs}%6d ${r.gcMs}%6d ${r.fetchWaitMs}%6d ${r.shWriteMs}%6d ${r.input}%9d ${r.shRead}%9d ${r.shWrite}%9d  ${r.desc.take(60)}"
      }
      (hdr +: body).mkString("\n") +
        f"\nTOTAL jobs=${rows.size} wall=${rows.map(r => r.t1 - r.t0).sum}%d ms " +
        f"tasks=${rows.map(_.nTasks).sum} taskTime=${rows.map(_.taskTimeMs).sum} ms " +
        f"shRead=${rows.map(_.shRead).sum} shWrite=${rows.map(_.shWrite).sum}"
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: Profile <name>[,<name>...] [sfDir] [cpus]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // keep Profile's session identical to Bench's (same writer choice
      // + same AQE coalescing floor)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "2"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
    // ad-hoc A/B knobs for the optimization loop:
    // GRAFT_CONF="k1=v1;k2=v2" lands in the session conf before start
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder = builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    for (w <- Seq("q1_pricing_summary", "t2_quality_score",
        "s1_cosine_topk", "e1_tumbling_window", "t7_vocab_topk"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); Thread.sleep(50)
    }
    hygiene()
    names.foreach { n =>
      // one untimed run to JIT the query's own codegen, then the profiled run
      try { SparkEntry.queries(n)(spark, sfDir).count() } catch { case _: Throwable => () }
      hygiene()
      acc.reset()
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(s"===== $n rows=$cnt wall=${f"$sec%.3f"}s =====")
      println(acc.report())
      hygiene()
    }
    spark.stop()
  }
}
