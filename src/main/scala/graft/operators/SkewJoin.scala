package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY §5): when a few hot keys
  * dominate, a plain hash join routes them to single tasks. Salting
  * splits each hot key into `salts` sub-keys: the fact side gets a
  * deterministic salt from a row-unique column, the dim side is
  * replicated `salts` times — result set is identical to the plain
  * join (verified by the q_salted_join oracle), wall-clock is bounded
  * by hotKeyCount/salts instead of hotKeyCount.
  *
  * (AQE's skewJoin handles sort-merge skew automatically at runtime;
  * explicit salting remains the tool for broadcast-ineligible dims and
  * for aggregations over skewed keys.)
  */
object SkewJoin {

  /** `uniqueCols` must be row-unique on `left` (e.g. its primary key)
    * so the salt is deterministic — keeps results reproducible and
    * oracle-comparable, unlike rand()-based salting. */
  def saltedJoin(left: DataFrame, leftKey: String, uniqueCols: Seq[String],
                 right: DataFrame, rightKey: String,
                 salts: Int = 8): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(uniqueCols.map(col): _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
