package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-catalog plan audit (dev tool, SURVEY §5): prints every query
  * whose physical plan contains a BroadcastNestedLoopJoin or
  * CartesianProduct — each hit must be an intentional, documented
  * tiny-broadcast case — or (r11) an UNPARTITIONED WindowExec — the
  * single-task trap: every row through one task's sort buffer; each
  * hit must be over a bounded (top-k shortlist / aggregate-sized)
  * frame. A global window fed by a TakeOrderedAndProject / limit
  * (rank over an ALREADY top-k'd shortlist — Bm25.scoreRank's shape)
  * is bounded by construction and not flagged. Plans are built, not
  * executed. */
object PlanAudit {
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    self ++ p.subqueries.flatMap(flatten)
  }

  /** An unpartitioned window whose input is already limit-bounded
    * (top-k'd) sorts k rows, not the corpus. The limit must sit on the
    * window's DIRECT input chain (walked through unary row-preserving
    * nodes only, ADVICE r11): a deep limit on one input of a join
    * below the window bounds that input, not the window's frame — the
    * old anywhere-in-subtree scan would have passed a corpus-sized
    * join as "bounded". */
  private def limitBounded(w: WindowExec): Boolean = {
    @annotation.tailrec
    def walk(p: SparkPlan): Boolean = {
      val c = p.getClass.getSimpleName
      if (c.contains("TakeOrderedAndProject") || c.contains("GlobalLimit") ||
          c.contains("CollectLimit")) true
      else p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        // unary nodes can't widen their input (joins/unions can);
        // exchanges/sorts/projects/filters preserve the bound
        case u if u.children.length == 1 => walk(u.children.head)
        case _ => false
      }
    }
    walk(w.child)
  }

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
      val (planStr, globalWindows) =
        try {
          val p = fn(spark, sfDir).queryExecution.executedPlan
          (p.toString,
            flatten(p).count {
              case w: WindowExec => w.partitionSpec.isEmpty && !limitBounded(w)
              case _ => false
            })
        } catch { case e: Throwable => (s"PLAN-ERROR ${e.getMessage}", 0) }
      val flags = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .filter(planStr.contains) ++
        (if (globalWindows > 0) Seq(s"GlobalWindow x$globalWindows") else Nil)
      if (flags.nonEmpty || planStr.startsWith("PLAN-ERROR")) {
        hits += 1
        println(s"AUDIT $name: ${if (flags.nonEmpty) flags.mkString("+") else planStr.take(120)}")
      }
    }
    println(s"AUDIT done: $hits flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
