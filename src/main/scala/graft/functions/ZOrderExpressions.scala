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

/** Hilbert-curve key over `children` (pre-normalized longs in
  * [0, 2^bitsPerCol), same contract as [[InterleaveBits]]): the curve
  * delta-spark's liquid clustering uses instead of Morton, because a
  * Hilbert walk moves ONE grid step at a time — no Z-shaped diagonal
  * jumps — so consecutive key ranges map to genuinely adjacent regions
  * in every dimension and per-file min/max boxes come out tighter at
  * the same file size. Encoding is Skilling's public-domain transform
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
  * axes → transposed Hilbert coordinates in O(n·b) bit ops per row,
  * then an MSB-first interleave packs the transposed form into one
  * long. Unit-step locality and bijectivity are pinned by spec.
  */
case class HilbertIndex(children: Seq[Expression], bitsPerCol: Int)
    extends Expression with CodegenFallback {
  require(children.size >= 2 && children.size * bitsPerCol <= 63,
    s"hilbert of ${children.size} x $bitsPerCol bits needs 2+ dims and <= 63 bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val n = children.length
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      val e = children(i).eval(input)
      x(i) = if (e == null) 0L else e.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.encode(x, bitsPerCol)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Skilling AxestoTranspose + MSB-first pack; mutates `x`. */
  def encode(x: Array[Long], b: Int): Long = {
    val n = x.length
    val m = 1L << (b - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transposed form -> single index, MSB-first across dimensions
    var h = 0L
    var bit = b - 1
    while (bit >= 0) {
      i = 0
      while (i < n) { h = (h << 1) | ((x(i) >> bit) & 1L); i += 1 }
      bit -= 1
    }
    h
  }
}
