package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` helpers: Column <-> catalyst Expression.
  * Spark 4 hides the classic Column(expr) constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; extension libraries
  * conventionally expose it via a small shim in this package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the executor blocks behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` only covers CacheManager entries; a local
    * checkpoint lives as cached blocks of the `LogicalRDD`'s backing RDD,
    * so iterative operators that checkpoint per round must release the
    * superseded round through the RDD handle or executor storage grows
    * linearly with iterations. No-op for non-checkpoint plans. The caller
    * must guarantee nothing lazy still references the checkpoint — a
    * local checkpoint cannot be recomputed once its blocks are gone.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit = df match {
    case d: classic.Dataset[_] => d.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
    case _ => ()
  }
}
