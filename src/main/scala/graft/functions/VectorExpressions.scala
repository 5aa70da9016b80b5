package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product over two double arrays in one tight JVM
  * loop per row.
  *
  * Semantically IDENTICAL to the HOF formulation
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` — the fold runs
  * left-to-right from 0.0 (same IEEE operation order, so results stay
  * bit-identical to the DuckDB oracle's list_reduce), a length mismatch
  * or null element yields null (zip_with pads the shorter side with
  * null, which nulls the sum) — but without materializing the zipped
  * array or walking an expression tree per element. The similarity
  * operators evaluate this N×C or N×Q times over 64-dim vectors, where
  * per-element interpretation dominates; the one virtual call per row
  * of CodegenFallback is noise next to that.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch too

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product_d expects (array<double>, array<double>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_d"
}

object VectorExpressions {
  def dotProductD(a: Column, b: Column): Column =
    GraftShims.column(DotProductD(
      GraftShims.expression(a), GraftShims.expression(b)))
}
