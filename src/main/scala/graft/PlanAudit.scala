package graft

import org.apache.spark.sql.SparkSession

/** Whole-catalog plan audit (dev tool, SURVEY §5): prints every query
  * whose physical plan contains a BroadcastNestedLoopJoin or
  * CartesianProduct — each hit must be an intentional, documented
  * tiny-broadcast case. Plans are built, not executed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hits = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN-ERROR ${e.getMessage}" }
      val flags = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .filter(plan.contains)
      if (flags.nonEmpty || plan.startsWith("PLAN-ERROR")) {
        hits += 1
        println(s"AUDIT $name: ${if (flags.nonEmpty) flags.mkString("+") else plan.take(120)}")
      }
    }
    println(s"AUDIT done: $hits flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
