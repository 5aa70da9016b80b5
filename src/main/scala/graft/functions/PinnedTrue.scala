package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Always-true boolean that DECLARES itself non-deterministic.
  *
  * Purpose: pin a filter where it was written. Catalyst treats
  * deterministic predicates as freely movable — pushdown can relocate a
  * side-effecting `raise_error` constraint guard below row-dropping
  * filters (e.g. MERGE's clause-index filters over an outer join), where
  * it fires on rows that were never part of the write. Conjoining this
  * expression makes the predicate immovable while costing a literal
  * `true` per row in codegen. A plain `rand() <= 1.0` does not survive:
  * Spark 4 constant-folds trivially-true rand comparisons.
  */
case class PinnedTrue() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any = true
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock,
      value = JavaCode.literal("true", BooleanType), isNull = FalseLiteral)
}
