package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing entry point: register every driver-generated table as a
  * temp view so the whole engine is usable from `spark.sql(...)` —
  * including the extension functions (`graft_dot`, `graft_minhash`)
  * when the session is built with GraftExtensions.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Create (or replace) one temp view per parquet table in `dir`.
    * `events` is registered with its ns timestamp converted, so SQL
    * users get a proper timestamp column. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    names.foreach {
      case "events" => ql.events(spark, dir).createOrReplaceTempView("events")
      case n => ql.t(spark, dir, n).createOrReplaceTempView(n)
    }
  }
}
