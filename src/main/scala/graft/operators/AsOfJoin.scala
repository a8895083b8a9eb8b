package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent
  * right row with `right.time <= left.time` for the same key.
  *
  * Spark-first plan: tagged union + one hash-partition sort + running
  * `last(_, ignoreNulls=true)` window — a single shuffle on the key,
  * linear in |L|+|R|, instead of the O(|L|·|R|) non-equi range join a
  * naive join+filter+row_number would plan. At 100 TB both sides
  * shuffle once by key and sort within partitions; a skewed key can be
  * pre-salted upstream without changing this operator.
  *
  * Ties: a right row at exactly left.time is visible to that left row
  * (right sorts before left at equal timestamps).
  */
object AsOfJoin {
  /** Column names of `left` and `right` payloads must be disjoint. */
  def asofBackward(left: DataFrame, leftKey: String, leftTime: String,
                   right: DataFrame, rightKey: String, rightTime: String,
                   inner: Boolean = true): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)).toIndexedSeq: _*)
    val rStruct = struct(right.columns.map(right(_)).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("s")).schema.head.dataType
    val rType = right.select(rStruct.as("s")).schema.head.dataType
    // keys keep their own type: a numeric cast here would null out
    // string keys and silently collapse them into one window partition
    val lT = left.select(left(leftKey).as("__k"),
      left(leftTime).as("__t"), lit(1).as("__src"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rT = right.select(right(rightKey).as("__k"),
      right(rightTime).as("__t"), lit(0).as("__src"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lT.unionByName(rT)
      .withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    val kept = if (inner) joined.filter(col("__rlast").isNotNull) else joined
    kept.select(col("__l.*"), col("__rlast.*"))
  }
}
