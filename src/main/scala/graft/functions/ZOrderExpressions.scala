package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: interleaves the low `bitsPerCol` bits of each
  * child (a pre-normalized long in [0, 2^bitsPerCol)) so that sorting by
  * the result clusters rows that are close in EVERY dimension — the
  * multi-column locality that makes per-file min/max stats selective on
  * all Z-ordered columns at once. One tight loop per row; null
  * normalizes to 0 (nulls cluster first).
  */
case class InterleaveBits(children: Seq[Expression], bitsPerCol: Int)
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.size * bitsPerCol <= 63,
    s"interleave of ${children.size} x $bitsPerCol bits exceeds a long")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val n = children.length
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val e = children(i).eval(input)
      vs(i) = if (e == null) 0L else e.asInstanceOf[Long]
      i += 1
    }
    var z = 0L
    var b = 0
    while (b < bitsPerCol) {
      var c = 0
      while (c < n) {
        z |= ((vs(c) >> b) & 1L) << (b * n + c)
        c += 1
      }
      b += 1
    }
    z
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}
