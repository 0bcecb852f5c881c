package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Expression<->Column conversion behind private[sql]
  * (`classic.ExpressionUtils`). This shim lives inside the sql package
  * namespace purely to re-export those two conversions to graft's custom
  * Catalyst expressions — the standard technique for Spark extension
  * libraries; no Spark internals are modified. */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-BUILT session (the
    * `spark.sql.extensions` config path only applies at session build).
    * `sessionState` is private[sql], hence routed through this shim. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
