package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the sql package so the engine can wrap its native
  * Catalyst expressions as Columns (the Column(Expression) constructor is
  * sql-private since the Spark 4 column-node refactor). */
package object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
