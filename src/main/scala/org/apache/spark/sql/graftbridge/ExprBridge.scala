package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Two-way Column ⟷ Catalyst Expression bridge. Spark 4 hid the
  * classic `Column(expr)` constructor behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); graft needs both
  * directions — reading a user predicate's expression tree for
  * manifest-stats pruning ([[graft.sources.SnapshotStats]]) and
  * wrapping native expressions (the q122 edge-Bloom screen) into
  * Columns without registering a SQL function per call site. This
  * object lives under `org.apache.spark.sql` solely to satisfy that
  * access qualifier; it adds no behavior.
  */
object ExprBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
