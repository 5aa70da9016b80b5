package graft.delta

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Portable roaring-bitmap-array codec (the Delta DV payload format). */
class RoaringBitmapArraySuite extends AnyFunSuite {

  private def roundtrip(values: Seq[Long]): Unit = {
    val bm = RoaringBitmapArray.fromValues(values.iterator)
    assert(bm.cardinality == values.distinct.size)
    val back = RoaringBitmapArray.deserialize(bm.serialize())
    assert(back.values.toSeq == values.distinct.sorted)
    values.foreach(v => assert(back.contains(v), s"missing $v"))
    assert(!back.contains(values.max + 1))
  }

  test("roundtrip: small array containers") {
    roundtrip(Seq(0L, 1L, 5L, 65535L, 65536L, 100000L))
  }

  test("roundtrip: bitmap container past the 4096 array threshold") {
    roundtrip((0L until 60000L by 3).toSeq) // 20000 values in one container
  }

  test("roundtrip: values above 2^32 use later bitmaps, empties serialized between") {
    roundtrip(Seq(7L, (1L << 32) + 3, (3L << 32) + 9))
  }

  test("empty bitmap serializes to magic + zero count") {
    val bytes = RoaringBitmapArray.empty().serialize()
    assert(bytes.length == 12)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt() == RoaringBitmapArray.Magic)
    assert(buf.getLong() == 0L)
  }

  test("portable layout golden bytes for {1, 3}") {
    val bytes = RoaringBitmapArray(1L, 3L).serialize()
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt() == 1681511377) // protocol magic
    assert(buf.getLong() == 1L) // one 32-bit bitmap
    assert(buf.getInt() == 12346) // SERIAL_COOKIE_NO_RUNCONTAINER
    assert(buf.getInt() == 1) // one container
    assert(buf.getShort() == 0) // key
    assert(buf.getShort() == 1) // cardinality - 1
    assert(buf.getInt() == 16) // container offset: 4+4+2+2+4
    assert(buf.getShort() == 1)
    assert(buf.getShort() == 3)
    assert(!buf.hasRemaining)
  }

  test("deserialize accepts the run-container cookie") {
    // hand-built: one 32-bit bitmap, run cookie, 1 container (run flag
    // set), key 0, card 5, runs [(10, len 3), (20, len 1)] = values
    // 10,11,12,13,20,21 — no offset header below 4 containers
    val buf = ByteBuffer.allocate(4 + 8 + (4 + 1 + 4 + 2 + 2 * 4))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(RoaringBitmapArray.Magic)
    buf.putLong(1L)
    buf.putInt(12347) // 1 container => (0 << 16) | 12347
    buf.put(1.toByte) // run flags: container 0 is a run
    buf.putShort(0.toShort) // key
    buf.putShort(5.toShort) // cardinality - 1 = 5 (6 values)
    buf.putShort(2.toShort) // numRuns
    buf.putShort(10.toShort); buf.putShort(3.toShort) // 10..13
    buf.putShort(20.toShort); buf.putShort(1.toShort) // 20..21
    val bm = RoaringBitmapArray.deserialize(buf.array())
    assert(bm.values.toSeq == Seq(10L, 11L, 12L, 13L, 20L, 21L))
  }

  test("Z85 codec matches the ZeroMQ reference vector") {
    // the canonical Z85 test vector: 0x86 4F D2 6F B5 59 F7 5B -> HelloWorld
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(Z85.encode(bytes) == "HelloWorld")
    assert(Z85.decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("Z85 UUID roundtrip is 20 chars") {
    val u = java.util.UUID.randomUUID()
    val enc = Z85.encodeUUID(u)
    assert(enc.length == 20)
    assert(Z85.decodeUUID(enc) == u)
  }

  test("checksum is CRC-32") {
    val crc = new java.util.zip.CRC32()
    crc.update("graft".getBytes)
    assert(RoaringBitmapArray.checksum("graft".getBytes) == crc.getValue.toInt)
  }
}
