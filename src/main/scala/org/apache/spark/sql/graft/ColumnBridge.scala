package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters. Spark 4 routes
  * the public Column API through ColumnNodes (Connect compatibility); a
  * library contributing native Catalyst expressions needs this one hop.
  * Lives in the org.apache.spark.sql namespace solely for access — the
  * standard pattern for Catalyst-extending libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
