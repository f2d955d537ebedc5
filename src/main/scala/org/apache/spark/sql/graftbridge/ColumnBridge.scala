package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression conversions for the classic (non-Connect) API.
  *
  * Spark 4 made `Column` a thin wrapper over a `ColumnNode`, and the
  * conversion helpers (`ExpressionUtils`) are `private[sql]` — the
  * sanctioned pattern for libraries that define native Catalyst
  * expressions (as this one does: Md5iExpr, SimHashExpr, MinHashSigExpr)
  * is a bridge object inside the `org.apache.spark.sql` package. Only
  * these two one-line forwarders live here; everything else stays in
  * `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Collision-free session identity (`sessionUUID` is `private[sql]`);
    * used to key per-session cache slots (DedupOps.persistSlot).
    */
  def sessionUuid(s: org.apache.spark.sql.SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => System.identityHashCode(other).toHexString
  }
}
