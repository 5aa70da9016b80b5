package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RollingHashWindows: the O(n) rolled hash must equal the O(n·w)
  * from-scratch polynomial at every emitted offset (the roll step —
  * drop-lead, shift, append, with the negative-mod fixup — is the only
  * part that can silently drift), offsets must follow the 1-based
  * stride grid, and identical byte runs at different positions must
  * collide exactly.
  */
class RollingHashSuite extends AnyFunSuite {

  private val M = 1000000000039L

  private def scratch(bytes: Array[Byte], off0: Int, w: Int): Long = {
    var h = 0L
    var i = 0
    while (i < w) { h = (h * 256L + (bytes(off0 + i) & 0xff)) % M; i += 1 }
    h
  }

  private def eval(text: String, w: Int, s: Int): Seq[(Int, Long)] = {
    val e = RollingHashWindows(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(text), org.apache.spark.sql.types.StringType), w, s)
    val arr = e.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getInt(0), r.getLong(1))
    }
  }

  test("rolled hash equals from-scratch polynomial at every emitted offset") {
    val rnd = new scala.util.Random(42)
    val text = (0 until 500).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val bytes = text.getBytes("UTF-8")
    for ((w, s) <- Seq((48, 8), (64, 32), (5, 1))) {
      val got = eval(text, w, s)
      assert(got.nonEmpty)
      got.foreach { case (off, h) =>
        assert((off - 1) % s == 0, s"offset $off off the stride-$s grid")
        assert(off - 1 + w <= bytes.length)
        assert(h == scratch(bytes, off - 1, w), s"drift at off=$off w=$w")
      }
      // full expected grid, nothing skipped
      val expectedOffsets = 1.to(bytes.length - w + 1, s)
      assert(got.map(_._1) == expectedOffsets)
    }
  }

  test("identical byte runs collide; shorter-than-window text yields no windows") {
    val core = "the quick brown fox jumps over the lazy dog padding!"
    val a = "XXXX" + core + "YYYY"
    val b = "ZZ" + core + "WWWWWW"
    // stride 1 so the shared run is sampled in both strings
    val ha = eval(a, 48, 1).map(_._2).toSet
    val hb = eval(b, 48, 1).map(_._2).toSet
    assert((ha intersect hb).nonEmpty, "shared 48-byte run must fingerprint equal")
    assert(eval("short", 48, 8).isEmpty)
  }
}
