package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog-style distinct-count sketch as a native
  * TypedImperativeAggregate (Flajolet et al. 2007, the public HLL
  * construction). The SCALE property is the whole point: the aggregate
  * participates in partial aggregation, so each map task ships one
  * 256-byte register array per group across the shuffle — estimating
  * per-key cardinalities over 100 TB costs a shuffle of
  * O(groups × 256 B), not O(distinct values), and sketches merge
  * associatively across any partitioning (register-wise max).
  *
  * DETERMINISM (SURVEY §4): everything is derived from a cross-engine
  * reproducible hash — the top 60 bits of md5 of the value's string
  * form, the exact integer DuckDB computes as
  * `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)`. Register index = top
  * 8 of those 60 bits; rho = 53 − bitlength(low 52 bits) (53 for zero).
  * The estimate uses ONLY IEEE-deterministic operations: the register
  * sum Σ 2^(53−M_j) is an exact BIGINT, and the final value is one
  * constant-over-cast division — no `ln`, no float accumulation, so the
  * raw HLL estimate hashes identically in DuckDB. (The small-range
  * linear-counting correction needs `ln`, whose last ULP is
  * library-dependent; the sketch therefore reports the raw estimate
  * plus `n_empty_regs`, from which a caller — or a spec — can apply
  * the correction when it wants it.)
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketchAgg._

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash60(v.toString)
      val reg = (h >>> 52).toInt
      val w = h & ((1L << 52) - 1)
      val rho =
        if (w == 0L) 53
        else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var empty = 0L
    var j = 0
    while (j < M) {
      val m = buf(j).toInt
      s += (1L << (53 - m))
      if (m == 0) empty += 1
      j += 1
    }
    // ((alpha) * m^2) * 2^53 / S — left-associated exactly like the SQL
    // oracle's literal expression so the double is bit-identical
    val est = Alpha * 65536.0 * Pow53 / s.toDouble
    InternalRow(est, empty)
  }

  // clone both ways: Spark may slice/reuse the byte regions it hands in
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = new StructType()
    .add("estimate", DoubleType).add("n_empty_regs", LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "hll_sketch"
}

object HllSketchAgg {
  val M = 256
  // 0.7213/(1 + 1.079/m), the standard alpha_256 — written as the same
  // literal arithmetic the oracle uses so both engines fold identically
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 256.0)
  val Pow53: Double = 9007199254740992.0 // 2^53

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(value) as a non-negative Long — byte-identical
    * to DuckDB's `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)` (md5 hex
    * is the big-endian byte string, so 15 hex digits = the top 60 bits
    * of the first 8 bytes).
    */
  def hash60(s: String): Long = {
    val d = digests.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val top =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
        ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
        ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
        ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    top >>> 4
  }
}

object SketchExpressions {
  /** `hllSketch($"user_id".cast("string"))` →
    * `struct<estimate double, n_empty_regs bigint>`, partial-aggregated
    * (one 256-byte register array per map task per group crosses the
    * shuffle).
    */
  def hllSketch(value: Column): Column =
    GraftShims.column(HllSketchAgg(
      GraftShims.expression(value.cast("string"))).toAggregateExpression())
}
