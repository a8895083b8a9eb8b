package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named catalog
  * queries (`runMain graft.Explain <name>[,<name>...] [sfDir]`) —
  * the `.explain("formatted")` loop the scale audit runs per operator
  * (scan counts, exchange reuse, pushed filters, codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: Explain <name>[,<name>...] [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
