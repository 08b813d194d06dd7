package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4 moved these converters to
  * `classic.ExpressionUtils` and scoped them `private[sql]`, so a library
  * registering custom Catalyst expressions for the COLUMN API (not just the
  * SQL-text surface, which `FunctionRegistry` covers) needs this one-file
  * shim inside an `org.apache.spark.sql` subpackage — the same interop
  * pattern third-party Spark libraries use for typed-column machinery.
  * Nothing else in the engine lives outside the `graft` namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
