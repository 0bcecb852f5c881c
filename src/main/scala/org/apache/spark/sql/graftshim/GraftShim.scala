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
}
