package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) package-private; extensions that define
  * native expressions conventionally expose them via a small shim in the
  * `org.apache.spark.sql` package.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** `types.AbstractDataType` is private[sql]; expressions outside this
    * package need it to declare `ExpectsInputTypes.inputTypes`.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** `types.TypeCollection` is private[sql] too; needed to declare an
    * integral-only input contract (MinKLongs — ADVICE r8).
    */
  def typeCollection(types: AbstractType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(types: _*)
}
