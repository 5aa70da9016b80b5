package graft.delta

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import scala.collection.mutable

/** 64-bit roaring bitmap in the open Delta deletion-vector format.
  *
  * A value `v` is split as `high32 = v >>> 32` (the index of a 32-bit
  * roaring bitmap) and `low32 = v.toInt` (the member inside it); each
  * 32-bit bitmap is further split into 2^16-value containers keyed by
  * the upper 16 bits of `low32`. Serialization is the "portable" layout
  * the Delta protocol mandates for DV payloads:
  *
  * {{{
  *   magic   : Int  = 1681511377                 (little-endian)
  *   n       : Long = number of 32-bit bitmaps   (little-endian)
  *   then n standard portable roaring bitmaps back-to-back, the i-th
  *   holding the low words of values with high32 == i (empty bitmaps
  *   are serialized too — position IS the key).
  * }}}
  *
  * The 32-bit serialization follows the public RoaringFormatSpec
  * (github.com/RoaringBitmap/RoaringFormatSpec, little-endian): cookie
  * 12346 (no run containers — what this writer emits) or 12347 (with a
  * run-presence bitset — accepted on read), a descriptive header of
  * (key, cardinality-1) pairs, an offset header, then array containers
  * (≤4096 sorted shorts), bitmap containers (1024 longs), or run
  * containers (count + (start, length-1) pairs).
  *
  * Containers are built on `java.util.BitSet`s (8 KiB ceiling each) and
  * converted to the cardinality-appropriate representation at
  * serialization time; the write path never emits run containers, like
  * most standard writers, but the read path accepts all three kinds so
  * DV files produced by stock Delta writers deserialize.
  */
final class RoaringBitmapArray private (
    private val containers: mutable.TreeMap[Long, java.util.BitSet]) {

  // container slot = (high32 << 16) | key16, totally ordered by value
  private def slotOf(v: Long): Long = {
    require(v >= 0, s"negative value $v")
    (v >>> 16) // high 48 bits: high32 * 2^16 + key16
  }

  def add(v: Long): Unit =
    containers.getOrElseUpdate(slotOf(v), new java.util.BitSet(1 << 16))
      .set((v & 0xFFFF).toInt)

  def contains(v: Long): Boolean =
    v >= 0 && containers.get(v >>> 16).exists(_.get((v & 0xFFFF).toInt))

  def cardinality: Long = containers.valuesIterator.map(_.cardinality().toLong).sum

  def isEmpty: Boolean = containers.isEmpty

  /** Ascending members. */
  def values: Iterator[Long] = containers.iterator.flatMap { case (slot, bits) =>
    val base = slot << 16
    Iterator.unfold(bits.nextSetBit(0)) { i =>
      if (i < 0) None else Some((base | i, bits.nextSetBit(i + 1)))
    }
  }

  /** Portable bytes (magic + bitmap count + 32-bit bitmaps). */
  def serialize(): Array[Byte] = {
    val byHigh = containers.groupBy { case (slot, _) => (slot >>> 16).toInt }
    val numBitmaps = if (byHigh.isEmpty) 0 else byHigh.keys.max + 1
    val perBitmap = (0 until numBitmaps).map { h =>
      byHigh.getOrElse(h, mutable.TreeMap.empty[Long, java.util.BitSet])
    }
    val sizes = perBitmap.map(bitmap32Size)
    val buf = ByteBuffer.allocate(4 + 8 + sizes.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(RoaringBitmapArray.Magic)
    buf.putLong(numBitmaps.toLong)
    perBitmap.foreach(writeBitmap32(buf, _))
    buf.array()
  }

  private def bitmap32Size(cs: collection.Map[Long, java.util.BitSet]): Int =
    8 + cs.valuesIterator.map { bits =>
      val card = bits.cardinality()
      8 + (if (card <= RoaringBitmapArray.ArrayMax) 2 * card else 8192)
    }.sum

  private def writeBitmap32(buf: ByteBuffer, cs: collection.Map[Long, java.util.BitSet]): Unit = {
    val start = buf.position()
    val ordered = cs.toSeq.sortBy(_._1)
    buf.putInt(RoaringBitmapArray.CookieNoRun)
    buf.putInt(ordered.size)
    ordered.foreach { case (slot, bits) =>
      buf.putShort((slot & 0xFFFF).toShort)
      buf.putShort((bits.cardinality() - 1).toShort)
    }
    // offset header: container start relative to this bitmap's first byte
    var off = 4 + 4 + 8 * ordered.size
    ordered.foreach { case (_, bits) =>
      buf.putInt(off)
      val card = bits.cardinality()
      off += (if (card <= RoaringBitmapArray.ArrayMax) 2 * card else 8192)
    }
    ordered.foreach { case (_, bits) =>
      if (bits.cardinality() <= RoaringBitmapArray.ArrayMax) {
        var i = bits.nextSetBit(0)
        while (i >= 0) { buf.putShort(i.toShort); i = bits.nextSetBit(i + 1) }
      } else {
        val words = bits.toLongArray
        var w = 0
        while (w < 1024) {
          buf.putLong(if (w < words.length) words(w) else 0L)
          w += 1
        }
      }
    }
    assert(buf.position() - start == bitmap32Size(cs), "size accounting drift")
  }
}

object RoaringBitmapArray {
  val Magic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val ArrayMax = 4096

  def apply(values: Long*): RoaringBitmapArray = fromValues(values.iterator)

  def empty(): RoaringBitmapArray =
    new RoaringBitmapArray(mutable.TreeMap.empty)

  def fromValues(it: Iterator[Long]): RoaringBitmapArray = {
    val r = empty()
    it.foreach(r.add)
    r
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmapArray = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val n = buf.getLong()
    require(n >= 0 && n <= Int.MaxValue, s"bad bitmap count $n")
    val out = empty()
    var h = 0L
    while (h < n) { readBitmap32(buf, h, out); h += 1 }
    out
  }

  /** One portable 32-bit roaring bitmap at the buffer position; `high`
    * is the 32-bit-bitmap index (the value's upper 32 bits).
    */
  private def readBitmap32(buf: ByteBuffer, high: Long, out: RoaringBitmapArray): Unit = {
    val cookie = buf.getInt()
    val (numContainers, runFlags) =
      if ((cookie & 0xFFFF) == CookieRun) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, flags)
      } else {
        require(cookie == CookieNoRun, s"bad roaring cookie $cookie")
        (buf.getInt(), null)
      }
    val keys = new Array[Int](numContainers)
    val cards = new Array[Int](numContainers)
    var i = 0
    while (i < numContainers) {
      keys(i) = buf.getShort() & 0xFFFF
      cards(i) = (buf.getShort() & 0xFFFF) + 1
      i += 1
    }
    val hasOffsets = runFlags == null || numContainers >= 4
    if (hasOffsets) { var j = 0; while (j < numContainers) { buf.getInt(); j += 1 } }
    i = 0
    while (i < numContainers) {
      val bits = new java.util.BitSet(1 << 16)
      val isRun = runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val numRuns = buf.getShort() & 0xFFFF
        var r = 0
        while (r < numRuns) {
          val start = buf.getShort() & 0xFFFF
          val len = buf.getShort() & 0xFFFF
          bits.set(start, start + len + 1)
          r += 1
        }
      } else if (cards(i) > ArrayMax) {
        var w = 0
        while (w < 1024) {
          val word = buf.getLong()
          var b = 0
          while (b < 64) { if ((word & (1L << b)) != 0) bits.set(w * 64 + b); b += 1 }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { bits.set(buf.getShort() & 0xFFFF); v += 1 }
      }
      out.containers.put((high << 16) | keys(i), bits)
      i += 1
    }
  }

  // ------------------------------------------------ Delta DV file framing

  /** CRC-32 of `data` as the 4-byte big-endian int the DV file stores. */
  def checksum(data: Array[Byte]): Int = {
    val crc = new CRC32()
    crc.update(data)
    crc.getValue.toInt
  }
}

/** ZeroMQ Z85 base-85 codec — the encoding the Delta protocol uses for
  * DV file UUIDs (`storageType = "u"`) and inline bitmaps
  * (`storageType = "i"`). 4 input bytes → 5 output chars, big-endian
  * group order, most significant digit first.
  */
object Z85 {
  private val Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 input must be 4-aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Alphabet(((acc / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString()
  }

  def decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input must be 5-aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) Decode(c.toInt) else -1
        require(v >= 0, s"bad Z85 char '$c'")
        acc = acc * 85 + v
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (acc & 0xFF).toByte; acc >>= 8; k -= 1 }
      i += 5
      o += 4
    }
    out
  }

  def encodeUUID(u: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    encode(b.array())
  }

  def decodeUUID(s: String): java.util.UUID = {
    val b = ByteBuffer.wrap(decode(s))
    new java.util.UUID(b.getLong(), b.getLong())
  }
}
