package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ⇄ catalyst Expression bridge. Spark 4 made these
  * conversions `private[sql]` (columnNodeSupport.scala); custom native
  * expressions still need them, hence this shim inside the sql package
  * namespace — the same technique spark-packages (e.g. sedona,
  * spark-nlp) use for Spark 4 compatibility.
  */
object Bridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; custom
    * expressions outside the sql package need it to declare
    * `ExpectsInputTypes.inputTypes` for clean analysis-time errors.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
