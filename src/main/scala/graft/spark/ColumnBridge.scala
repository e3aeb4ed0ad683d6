package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark 4's `private[sql]` Column ⇄ Expression converters, needed
 * to expose custom Catalyst expressions (e.g. graft.functions.Fingerprint32)
 * as user-facing `Column`s. Lives in the org.apache.spark.sql package purely
 * for access; contains no Spark-internal logic of its own.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
