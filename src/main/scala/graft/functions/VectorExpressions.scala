package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData

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

/** Element-wise sum of fixed-length long vectors as a native
  * TypedImperativeAggregate: each map task ships ONE len×8-byte buffer
  * per group across the shuffle regardless of row count — the 100 TB
  * shape for moment/covariance accumulation (vs exploding len values
  * per row into the shuffle, len× the traffic). Merging is element-wise
  * addition: associative and partitioning-invariant, and the sums are
  * exact integers, so any engine replays them bit-identically.
  */
case class LongVectorSumAgg(
    child: Expression, len: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(len, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(long2Long(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](len)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVectorSumAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "long_vector_sum"
}

object LongVectorSumAgg {
  def apply(c: Column, len: Int): Column =
    GraftShims.column(LongVectorSumAgg(GraftShims.expression(c), len)
      .toAggregateExpression())
}

/** Per-row micro-unit moment vector for covariance estimation over an
  * array<double> embedding of dimension `dim`: the first `dim` entries
  * are u_i = round(e_i·10^6) (exact integer micro-units, the SURVEY §4
  * cross-engine convention), followed by the dim·(dim−1)/2 strict
  * upper-triangle products u_i·u_j in (i, j) row-major order. One tight
  * loop per row; feeding [[LongVectorSumAgg]] gives exact integer
  * Σu_i / Σu_iu_j in a single partial-aggregated pass.
  */
case class MomentVector(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  private val outLen = dim + dim * (dim - 1) / 2
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val u = new Array[Long](dim)
    var i = 0
    while (i < dim) { u(i) = math.round(arr.getDouble(i) * 1000000.0); i += 1 }
    val out = new Array[Any](outLen)
    i = 0
    while (i < dim) { out(i) = long2Long(u(i)); i += 1 }
    var k = dim
    i = 0
    while (i < dim) {
      var j = i + 1
      while (j < dim) { out(k) = long2Long(u(i) * u(j)); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MomentVector =
    copy(child = c)
}

/** Per-document adjacent-character-pair count vector over the [a-z0-9]
  * token alphabet (1296 = 36² cells): the first step of BPE tokenizer
  * training — global pair frequencies decide the first merge — shaped
  * for 100 TB. Pairs are counted WITHIN words of the shared tokenizer
  * regex (BPE merges never cross word boundaries), one tight loop per
  * row; feeding [[LongVectorSumAgg]] means the corpus-wide counts cost
  * a shuffle of ONE 1296-long vector per map task, versus exploding
  * every adjacent pair of every word (≈ the corpus's character count)
  * through a groupBy.
  */
case class CharPairVector(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokenize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toLowerCase.toString)
    val counts = new Array[Long](1296)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var i = 0
      while (i + 1 < w.length) {
        val a = CharPairVector.sym(w.charAt(i))
        val b = CharPairVector.sym(w.charAt(i + 1))
        counts(a * 36 + b) += 1
        i += 1
      }
      t += 1
    }
    new GenericArrayData(counts.map(long2Long(_): Any))
  }
  override protected def withNewChildInternal(c: Expression): CharPairVector =
    copy(child = c)
}

object CharPairVector {
  /** a-z -> 0..25, 0-9 -> 26..35 (tokens contain nothing else). */
  def sym(c: Char): Int = if (c <= '9') 26 + (c - '0') else c - 'a'
  def pairOf(k: Int): String = {
    def ch(s: Int): Char = if (s >= 26) ('0' + (s - 26)).toChar else ('a' + s).toChar
    "" + ch(k / 36) + ch(k % 36)
  }
}

/** Adjacent-pair counts AFTER a merge chain — the per-round statistic of
  * ITERATIVE BPE training (Sennrich et al. 2016: recount after every
  * merge, because a merge changes the pair distribution — 'abab' counts
  * 'ÀÀ' only once 'ab'→'À' has been applied). Tokenizes lower(text) on
  * the base [a-z0-9] alphabet, applies `merges` sequentially inside the
  * expression (merge i rewrites to chr(0xC0+i) — the same
  * all-occurrences left-to-right `replace` Spark SQL and DuckDB share),
  * then counts adjacent pairs over the GROWN (36+K)-symbol alphabet as
  * one (36+K)²-long vector per row — map-only; one [[LongVectorSumAgg]]
  * pass reduces the corpus per training round. The alphabet is SIZED BY
  * the merge chain, so training is bounded only by where the dense
  * count vector stays buffer-sane ([[BpePairVector.MaxK]] = 1024), not
  * by any symbol-block width.
  */
case class BpePairVector(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(merges.length <= BpePairVector.MaxK,
    s"BpePairVector supports at most ${BpePairVector.MaxK} merges, " +
      s"got ${merges.length} (the dense pair-count vector would exceed " +
      "a sane aggregation buffer; use a sparse pair count past this)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val alphabet = BpePairVector.alphabetFor(merges.length)
    val toks = TextExpressions.tokenize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toLowerCase.toString)
    val counts = new Array[Long](alphabet * alphabet)
    var t = 0
    while (t < toks.length) {
      var w = toks(t)
      var m = 0
      while (m < merges.length) {
        w = w.replace(merges(m), BpePairVector.mergeSymbol(m).toString)
        m += 1
      }
      var i = 0
      while (i + 1 < w.length) {
        val a = BpePairVector.sym(w.charAt(i), merges.length)
        val b = BpePairVector.sym(w.charAt(i + 1), merges.length)
        counts(a * alphabet + b) += 1
        i += 1
      }
      t += 1
    }
    new GenericArrayData(counts.map(long2Long(_): Any))
  }
  override protected def withNewChildInternal(c: Expression): BpePairVector =
    copy(child = c)
}

object BpePairVector {
  /** a-z -> 0..25, 0-9 -> 26..35, merge symbol i -> 36+i. Merge symbols
    * are the contiguous BMP block starting at 0xC0 ('À', 'Á', …, past
    * 0xFF into 'Ā'…): single UTF-16 chars, all below the surrogate
    * range, disjoint from the [a-z0-9] word alphabet, with identical
    * `replace`/`length` semantics in Spark SQL and DuckDB (chr(192+i) —
    * both count codepoints, and every symbol is one codepoint). K is
    * capped where the DENSE (36+K)² pair-count vector stays a sane
    * aggregation buffer (1024 -> ~1.1M cells = ~9 MB); past that the
    * right statistic is a sparse groupBy-pair count, not a wider block
    * — the representation (char vs int symbols) is isomorphic and NOT
    * the binding constraint.
    */
  val Base = 36
  val SymbolBase = 0xc0
  val MaxK = 1024
  def mergeSymbol(i: Int): Char = (SymbolBase + i).toChar
  def alphabetFor(nMerges: Int): Int = Base + nMerges
  def cellsFor(nMerges: Int): Int = {
    val a = alphabetFor(nMerges); a * a
  }
  def sym(c: Char, nMerges: Int): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= '0' && c <= '9') 26 + (c - '0')
    else {
      val i = c - SymbolBase
      require(i >= 0 && i < nMerges,
        s"char '$c' (U+${c.toInt.toHexString}) outside the BPE alphabet " +
          s"of $nMerges merges")
      Base + i
    }
  def pairOf(k: Int, nMerges: Int): String = {
    def ch(s: Int): Char =
      if (s < 26) ('a' + s).toChar
      else if (s < Base) ('0' + (s - 26)).toChar
      else mergeSymbol(s - Base)
    val a = alphabetFor(nMerges)
    "" + ch(k / a) + ch(k % a)
  }
}

/** Shared int-symbol BPE coder for the PRODUCTION-VOCAB trainer/encoder
  * (C68). Symbol ids ARE codepoints: a base symbol's id is its char
  * ('0'..'9' = 48..57, 'a'..'z' = 97..122) and merge rank r mints id
  * 192 + r — for r < 1024 that coincides with [[BpePairVector]]'s
  * chr(0xC0+r) symbol block, so `(id1, id2)` lexicographic order IS the
  * 2-char pair-string codepoint order the K<=1024 trainer (and the
  * DuckDB oracle's `ORDER BY n DESC, pair`) tie-breaks on, and the two
  * trainers are provably the SAME algorithm wherever both are defined.
  * Past 1024 the int ids simply keep counting — no block width, no
  * dense vector, no cap.
  */
object BpeCoder {
  val MergeBase = 192

  /** Greedy rank-based BPE encode of one word (Sennrich et al. 2016
    * apply step): repeatedly find the LOWEST-RANK adjacent pair present
    * and merge its occurrences left-to-right non-overlapping, until no
    * merge applies. Equivalent to applying the merge table sequentially
    * by rank (a later merge's symbol cannot appear inside an earlier
    * merge's pair, so rank order never re-opens an earlier merge) —
    * the exact semantics of the K<=1024 `replace` chain, pinned by the
    * shared oracle. `rank` maps packed pair -> merge rank.
    */
  def encode(word: Array[Int], rank: java.util.HashMap[Long, Integer]): Array[Int] = {
    var arr = word
    var done = false
    while (!done && arr.length >= 2) {
      // lowest-rank pair present in the word
      var best = -1
      var i = 0
      while (i + 1 < arr.length) {
        val r = rank.get(pack(arr(i), arr(i + 1)))
        if (r != null && (best == -1 || r < best)) best = r
        i += 1
      }
      if (best == -1) done = true
      else {
        arr = mergeOnce(arr, best, rank)
      }
    }
    arr
  }

  /** One exhaustive left-to-right non-overlapping application of merge
    * `r` (found by scanning for the pair whose rank is `r`).
    */
  private def mergeOnce(arr: Array[Int], r: Int,
      rank: java.util.HashMap[Long, Integer]): Array[Int] = {
    val out = new Array[Int](arr.length)
    var o = 0
    var i = 0
    while (i < arr.length) {
      if (i + 1 < arr.length) {
        val rr = rank.get(pack(arr(i), arr(i + 1)))
        if (rr != null && rr.intValue() == r) {
          out(o) = MergeBase + r; o += 1; i += 2
        } else { out(o) = arr(i); o += 1; i += 1 }
      } else { out(o) = arr(i); o += 1; i += 1 }
    }
    java.util.Arrays.copyOf(out, o)
  }

  @inline def pack(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
  @inline def unpackA(k: Long): Int = (k >>> 32).toInt
  @inline def unpackB(k: Long): Int = (k & 0xffffffffL).toInt

  def rankMap(merges: Seq[(Int, Int)]): java.util.HashMap[Long, Integer] = {
    val m = new java.util.HashMap[Long, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(pack(a, b), Integer.valueOf(r)) }
    m
  }

  /** Expand a symbol id to its base-character string. */
  def tokenString(id: Int, merges: Seq[(Int, Int)]): String =
    if (id < MergeBase) String.valueOf(id.toChar)
    else {
      val (a, b) = merges(id - MergeBase)
      tokenString(a, merges) + tokenString(b, merges)
    }
}

/** Per-row token count under a trained BPE merge table (the C68 encode
  * leg): tokenizes lower(text) on [a-z0-9]+, greedy-rank encodes each
  * word via [[BpeCoder.encode]], returns the total token count. The
  * merge table rides the serialized plan as an O(K) model artifact
  * (~16 B/merge — a 32k vocab is ~0.5 MB, shipped once per stage, the
  * same contract as the IVF centroid arrays); the per-word loop is
  * O(len · merges-applied), no shuffle, no UDF registry.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(Int, Int)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  @transient private lazy val rank = BpeCoder.rankMap(merges)

  override def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokenize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toLowerCase.toString)
    var total = 0L
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      val cps = new Array[Int](w.length)
      var i = 0
      while (i < w.length) { cps(i) = w.charAt(i); i += 1 }
      total += BpeCoder.encode(cps, rank).length
      t += 1
    }
    total
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}
