package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV theta sketch for NDV statistics interchange, serialized in the
  * Apache DataSketches COMPACT ORDERED layout so the bytes can ride an
  * Iceberg Puffin `apache-datasketches-theta-v1` statistics blob
  * (Puffin spec §blob types; DataSketches "Theta Sketch Framework" +
  * the published compact serialization: preamble longs / serial
  * version 3 / family 3 / flags / seed hash, then the ordered retained
  * hashes). Inputs are hashed exactly like DataSketches'
  * `update(String)`: MurmurHash3 x64-128 (Appleby's public-domain
  * finalization constants) with the library's default update seed 9001
  * over the UTF-8 bytes, keeping `h[0] >>> 1` and discarding 0.
  *
  * The sketch itself is the classic KMV (k minimum values) bottom-k
  * construction — the set of the k smallest distinct hashes is a pure
  * FUNCTION of the value set, so the sketch is deterministic under any
  * partitioning and merge order (SURVEY §4), unlike the library's
  * buffered QuickSelect variant. Exact mode below k retained values
  * (theta = 1, estimate = count); above it theta is the k-th smallest
  * hash, the k−1 strictly-smaller hashes are retained, and the
  * estimate is the standard (k−1)/theta KMV estimator — which is
  * precisely DataSketches' `retained / theta` on the serialized form.
  *
  * SCALE: the aggregate partial-aggregates — at most k longs per map
  * task cross the shuffle, so per-table NDV over 100 TB costs one
  * bounded-width reduction, never a shuffle of distinct values.
  */
object ThetaSketch {
  val DefaultSeed = 9001L
  val DefaultLgK = 12
  val MaxTheta: Long = Long.MaxValue

  /** MurmurHash3 x64-128 (public domain reference algorithm); returns
    * (h1, h2). DataSketches hashes long inputs as their little-endian
    * bytes and strings as UTF-8 bytes — byte-level input keeps both
    * reachable from one implementation.
    */
  def murmur128(data: Array[Byte], seed: Long): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nblocks = data.length / 16
    var i = 0
    def getLong(off: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (data(off + j) & 0xffL); j -= 1 }
      v
    }
    while (i < nblocks) {
      var k1 = getLong(i * 16)
      var k2 = getLong(i * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    // tail
    val tailStart = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = data.length & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | (data(tailStart + j) & 0xffL); j -= 1 }
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (data(tailStart + j) & 0xffL); j -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length.toLong; h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** The sketch-update hash of a string value: `h[0] >>> 1`, in
    * [0, 2^63); 0 is reserved and discarded by callers.
    */
  def hashString(s: String): Long =
    murmur128(s.getBytes(StandardCharsets.UTF_8), DefaultSeed)._1 >>> 1

  /** DataSketches' seed hash: low 16 bits of murmur(seed-as-LE-bytes,
    * seed 0); the preamble carries it so mismatched-seed sketches refuse
    * to merge.
    */
  def seedHash(seed: Long): Short = {
    val b = new Array[Byte](8)
    var j = 0
    var v = seed
    while (j < 8) { b(j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
    val h = (murmur128(b, 0L)._1 & 0xffffL).toShort
    require(h != 0, s"seed $seed hashes to 0")
    h
  }

  /** Compact ORDERED serialization. `hashes` must be ascending and
    * strictly below `theta`.
    */
  def serializeCompact(theta: Long, hashes: Array[Long],
      seed: Long = DefaultSeed): Array[Byte] = {
    val empty = hashes.isEmpty && theta == MaxTheta
    val preLongs = if (empty) 1 else if (theta == MaxTheta) 2 else 3
    val bb = java.nio.ByteBuffer
      .allocate(preLongs * 8 + hashes.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(preLongs.toByte)
    bb.put(3.toByte) // serial version
    bb.put(3.toByte) // family: COMPACT
    bb.put(0.toByte); bb.put(0.toByte) // lgNom/lgArr unused in compact
    // flags: READ_ONLY(2) | COMPACT(8) | ORDERED(16) [| EMPTY(4)]
    bb.put((if (empty) 0x1e else 0x1a).toByte)
    bb.putShort(seedHash(seed))
    if (preLongs >= 2) { bb.putInt(hashes.length); bb.putInt(0) }
    if (preLongs == 3) bb.putLong(theta)
    hashes.foreach(bb.putLong)
    bb.array()
  }

  /** Parse a compact sketch → (thetaLong, retained hashes ascending). */
  def deserializeCompact(bytes: Array[Byte]): (Long, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val preLongs = bb.get() & 0xff
    val serVer = bb.get() & 0xff
    require(serVer == 3, s"theta sketch serial version $serVer (want 3)")
    bb.get() // family
    bb.get(); bb.get(); // unused
    val flags = bb.get() & 0xff
    bb.getShort() // seed hash
    if ((flags & 0x04) != 0 || preLongs == 1) return (MaxTheta, Array.empty)
    val count = bb.getInt(); bb.getInt()
    val theta = if (preLongs >= 3) bb.getLong() else MaxTheta
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) { hs(i) = bb.getLong(); i += 1 }
    (theta, hs)
  }

  /** `retained / (theta / 2^63−1)` — exact count in exact mode, the KMV
    * estimator in estimation mode.
    */
  def estimate(theta: Long, retained: Int): Double =
    if (theta == MaxTheta) retained.toDouble
    else retained.toDouble / (theta.toDouble / MaxTheta.toDouble)
}

/** `thetaSketch(col)` → `struct<sketch binary, ndv double>`: the
  * DataSketches-compact bytes (for Puffin export) plus the estimate.
  * Buffer = the bounded TreeSet of the k smallest distinct hashes.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaSketch.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val k = 1 << lgK

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (h != 0L) {
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last()) {
        if (buf.add(h)) { buf.pollLast(); () }
      }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, ThetaSketch.hashString(v.toString))
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    // the k smallest of (k smallest of A) ∪ (k smallest of B) ARE the k
    // smallest of A ∪ B — bulk add under the same cap
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    val (theta, retained) =
      if (buf.size < k) (ThetaSketch.MaxTheta,
        buf.iterator().asScala.map(_.longValue).toArray)
      else {
        val all = buf.iterator().asScala.map(_.longValue).toArray
        (all(k - 1), all.take(k - 1)) // k-th smallest excluded = theta
      }
    InternalRow(
      ThetaSketch.serializeCompact(theta, retained),
      ThetaSketch.estimate(theta, retained.length))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def dataType: DataType = new StructType()
    .add("sketch", BinaryType).add("ndv", DoubleType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "theta_sketch"
}

object ThetaSketchAgg {
  def thetaSketch(value: Column, lgK: Int = ThetaSketch.DefaultLgK): Column =
    GraftShims.column(ThetaSketchAgg(
      GraftShims.expression(value.cast("string")), lgK).toAggregateExpression())
}
