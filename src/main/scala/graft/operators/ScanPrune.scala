package graft.operators

import org.apache.spark.sql.{Column, SparkSession}

/** Scan-level literal pruning helpers.
  *
  * Spark pushes an `In` filter to parquet as EXACT values only up to
  * `spark.sql.parquet.pushdown.inFilterThreshold` (default 10); past
  * that it degrades to a min/max RANGE predicate — which prunes
  * nothing for a value set spread across the key domain, and that IS
  * the realistic probe shape (a 300-term BM25 query batch, a 64-cell
  * IVF probe set). [[chunkedIn]] keeps the pushdown exact at any
  * probe width by OR-ing threshold-sized `In` predicates over the
  * SORTED value list: each chunk converts to an exact parquet
  * predicate, an OR of convertible filters converts, and sorting
  * makes each chunk contiguous in the clustered key order so its
  * row-group hits stay local. Semantically identical to one wide
  * `isin` (a pure disjunction over the same values). */
private[graft] object ScanPrune {

  /** The session's exact-`In` parquet pushdown width. */
  def inThreshold(ss: SparkSession): Int =
    scala.util.Try(
      ss.conf.get("spark.sql.parquet.pushdown.inFilterThreshold").toInt)
      .getOrElse(10).max(1)

  /** `c IN (values)` as an OR of at-most-`chunk`-sized `In`
    * predicates over the sorted values — exact-pushdown-safe at any
    * width (see object doc). An empty value list yields `lit(false)`,
    * matching `isin()`-with-no-values semantics (empty result), so
    * callers with an empty probe batch (zero queries, or every query
    * tokenizing to nothing) get the pre-r18 empty scan instead of a
    * throw. */
  def chunkedIn[T](c: Column, values: Seq[T], chunk: Int)(
      implicit ord: Ordering[T]): Column =
    if (values.isEmpty) org.apache.spark.sql.functions.lit(false)
    else values.sorted.grouped(math.max(chunk, 1))
      .map(g => c.isin(g.map(_.asInstanceOf[Any]): _*))
      .reduce(_ || _)
}
