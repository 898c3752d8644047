package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge: Column <-> catalyst Expression converters are
  * `private[sql]` in Spark 4 (org.apache.spark.sql.classic.ExpressionUtils),
  * so custom native expressions need this one-hop re-export. Standard
  * pattern for libraries extending Catalyst; no Spark internals are
  * modified. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
