package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    q.Relational.queries ++ q.Kitti.queries ++ q.TextQueries.queries ++
      q.DedupQueries.queries ++ q.VectorQueries.queries ++
      q.EventQueries.queries ++ q.PipelineQueries.queries ++
      q.RelationalExt.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    q.Relational.oracle ++ q.Kitti.oracle ++ q.TextQueries.oracle ++
      q.DedupQueries.oracle ++ q.VectorQueries.oracle ++
      q.EventQueries.oracle ++ q.PipelineQueries.oracle ++
      q.RelationalExt.oracle
}
