package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`, so libraries adding native expressions host this one-file
  * shim inside the `org.apache.spark.sql` package tree — the established
  * pattern for Spark extension libraries building typed Column APIs on
  * custom Catalyst expressions. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
