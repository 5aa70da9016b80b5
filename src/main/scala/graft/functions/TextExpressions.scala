package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot text paths.
  *
  * Spark's array higher-order functions (transform / filter / aggregate)
  * are interpreted per element — a tokenize→shingle→minhash pipeline built
  * from them walks an expression tree hundreds of times per row. These
  * expressions do the same work in one tight JVM loop per row (semantics
  * kept bit-identical to the HOF/DuckDB formulation so the oracle SQL is
  * unchanged). CodegenFallback costs one virtual call per row, which is
  * noise next to the per-element interpretation it replaces.
  */
object TextExpressions {
  private[functions] val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  private[functions] def md5Hex(s: String): String = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private val TokenRe = Pattern.compile("[a-z0-9]+")

  /** Tokens exactly as `regexp_extract_all(lower(text), '[a-z0-9]+')`. */
  private[functions] def tokenize(text: String): Array[String] = {
    val m = TokenRe.matcher(text)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += m.group()
    buf.toArray
  }
}

/** array of distinct word n-gram shingles of lower(text), first-occurrence
  * order (mirrors `list_distinct` over the generated n-grams).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokenize(input.asInstanceOf[UTF8String].toLowerCase.toString)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** MinHash signature over a shingle array: per shingle one md5, 15 hex
  * chars -> 60-bit value mod 2^30; sig(j) = min over shingles of
  * (a_j*v + b_j) mod p. Bit-identical to the DuckDB oracle formulation.
  */
case class MinHashSig(child: Expression, ab: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nH = ab.length
    val mins = Array.fill[Long](nH)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val hex = TextExpressions.md5Hex(arr.getUTF8String(i).toString)
      val v = java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1073741824L
      var j = 0
      while (j < nH) {
        val h = (ab(j)._1 * v + ab(j)._2) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(long2Long(_): Any))
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Count of elements of `left` present in `right` (both array<string>).
  * Replaces size(filter(a, x -> array_contains(b, x))) — O(n+m) with a
  * hash set instead of O(n*m) interpreted per-element evaluation; value
  * identical, so the DuckDB oracle formulation is unchanged.
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[UTF8String](bb.numElements() * 2)
    var i = 0
    while (i < bb.numElements()) { set.add(bb.getUTF8String(i)); i += 1 }
    var n = 0
    i = 0
    while (i < aa.numElements()) {
      if (set.contains(aa.getUTF8String(i))) n += 1
      i += 1
    }
    java.lang.Integer.valueOf(n)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayIntersectCount =
    copy(left = l, right = r)
}

/** 60-bit SimHash over the md5s of the token array (one md5 per token,
  * bit b from hex nibble b/4, position b%4; majority vote per bit).
  */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val score = new Array[Long](60)
    var i = 0
    while (i < nTok) {
      val hex = TextExpressions.md5Hex(arr.getUTF8String(i).toString)
      var b = 0
      while (b < 60) {
        val c = hex.charAt(b / 4)
        val dig = if (c <= '9') c - '0' else c - 'a' + 10
        score(b) += (dig >> (b % 4)) & 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (2 * score(b) >= nTok) sim |= (1L << b)
      b += 1
    }
    long2Long(sim)
  }
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** Rabin–Karp rolling hash over the UTF-8 BYTES of `child`, window `w`
  * bytes, one emitted fingerprint per `s`-byte stride (1-based offsets,
  * matching SQL substr): the ExactSubstr primitive — verbatim byte-run
  * detection that tokenized shingles (C25) miss across whitespace /
  * punctuation variance. ONE O(n) pass per document regardless of w:
  * the hash rolls byte-by-byte (drop leading term, multiply, add) and
  * is sampled at strided offsets, vs the O(n·w) of hashing each window
  * from scratch — at 100 TB the difference is the whole scan budget.
  * h = Σ byte[i]·B^(w-1-i) mod M with B=256, M=10^12+39 (prime): the
  * polynomial form the DuckDB oracle replays per strided window with
  * list_reduce over ord(); 41-bit space keeps cross-doc collisions
  * ~O(1) per 10^6 windows, and a collision is DETERMINISTIC — both
  * engines group by the same key — so the compare stays exact.
  */
case class RollingHashWindows(child: Expression, w: Int, s: Int)
    extends UnaryExpression with CodegenFallback {
  private val M = 1000000000039L
  private val B = 256L
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("off", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // B^(w-1) mod M, for dropping the leading byte while rolling
    var powW1 = 1L
    var i = 0
    while (i < w - 1) { powW1 = (powW1 * B) % M; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0 // 0-based window start; emitted as 1-based
    if (off % s == 0)
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](off + 1, h))
    while (off + w < n) {
      // roll: drop bytes[off], shift, append bytes[off + w]
      var hh = (h - ((bytes(off) & 0xff) * powW1) % M) % M
      if (hh < 0) hh += M
      h = (hh * B + (bytes(off + w) & 0xff)) % M
      off += 1
      if (off % s == 0)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](off + 1, h))
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): RollingHashWindows =
    copy(child = c)
}
