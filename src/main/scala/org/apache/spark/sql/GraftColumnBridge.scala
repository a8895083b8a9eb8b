package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column ↔ catalyst Expression conversion
  * (`private[sql]` in Spark 4) for graft expressions that cannot ride
  * the session function registry: a registered builder is a static
  * (Seq[Expression] → Expression) factory and cannot close over a
  * per-call runtime handle like the `Broadcast[BloomFilter]` inside
  * [[graft.plans.BloomContainsBc]]. This is the documented
  * extension-point escape hatch (the same package-placement trick
  * every Spark connector uses for `private[sql]` seams) — two
  * one-line delegations, no behavior. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
