package graft.delta

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Minimal Puffin file codec (the Apache Iceberg sidecar format,
  * public puffin-spec.md) — enough to carry format-version-3
  * `deletion-vector-v1` blobs in both directions.
  *
  * File layout:
  * {{{
  *   Magic  Blob₁ … Blobₙ  Magic FooterPayload FooterPayloadSize Flags Magic
  * }}}
  * where Magic = "PFA1", FooterPayloadSize is a 4-byte little-endian
  * int (length of the UTF-8 JSON FooterPayload), and Flags is 4 bytes
  * (bit 0 of byte 0 = footer payload compressed — this writer never
  * sets it, and the reader refuses it rather than guessing a codec).
  *
  * FooterPayload JSON: `{"blobs":[BlobMetadata…],"properties":{…}}`;
  * each BlobMetadata has `type`, `fields`, `snapshot-id`,
  * `sequence-number`, `offset`, `length`, optional `compression-codec`
  * and `properties`.
  *
  * The `deletion-vector-v1` blob body is
  * {{{
  *   len(magic+vector) : 4 bytes big-endian
  *   magic             : D1 D3 39 64
  *   vector            : portable 64-bit roaring bitmap
  *   crc-32(magic+vector) : 4 bytes big-endian
  * }}}
  * — byte-identical to one framed entry of a Delta packed DV `.bin`
  * payload (the Iceberg v3 spec chose Delta's exact serialization; the
  * magic sequence IS Delta's 1681511377 little-endian), which is what
  * makes zero-copy adoption and raw-copy export possible. Blob
  * properties must carry `referenced-data-file` and `cardinality`.
  */
object IcebergPuffin {

  val Magic: Array[Byte] = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  val DvBlobType = "deletion-vector-v1"

  private val mapper = new ObjectMapper()

  /** One blob to write: raw body bytes + the DV metadata that rides the
    * footer and the delete manifest entry.
    */
  final case class DvBlob(referencedDataFile: String, cardinality: Long,
      body: Array[Byte])

  /** A blob located in a written/read file: [offset, offset+length). */
  final case class BlobLocation(referencedDataFile: String, cardinality: Long,
      offset: Long, length: Long)

  /** Write one Puffin file holding the given DV blobs; returns the blob
    * locations (in input order) and the total file length. Pure
    * byte-level I/O — callable from executors with a serialized conf.
    */
  def writeDvFile(path: Path, conf: Configuration, snapshotId: Long,
      sequenceNumber: Long, blobs: Seq[DvBlob]): (Seq[BlobLocation], Long) = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    try {
      out.write(Magic)
      var pos = 4L
      val locs = blobs.map { b =>
        val loc = BlobLocation(b.referencedDataFile, b.cardinality, pos, b.body.length.toLong)
        out.write(b.body)
        pos += b.body.length
        loc
      }
      val payload = mapper.createObjectNode()
      val arr = payload.putArray("blobs")
      locs.foreach { l =>
        val o = arr.addObject()
        o.put("type", DvBlobType)
        o.putArray("fields")
        o.put("snapshot-id", snapshotId)
        o.put("sequence-number", sequenceNumber)
        o.put("offset", l.offset)
        o.put("length", l.length)
        val p = o.putObject("properties")
        p.put("referenced-data-file", l.referencedDataFile)
        p.put("cardinality", l.cardinality.toString)
      }
      payload.putObject("properties").put("created-by", "graft")
      val payloadBytes = mapper.writeValueAsBytes(payload)
      out.write(Magic)
      out.write(payloadBytes)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payloadBytes.length)
      tail.putInt(0) // flags: footer payload uncompressed
      out.write(tail.array())
      out.write(Magic)
      pos += 4 + payloadBytes.length + 8 + 4
      (locs, pos)
    } finally out.close()
  }

  /** Parse a Puffin footer; returns the `deletion-vector-v1` blob
    * locations. Refuses compressed footers/blobs loudly.
    */
  def readDvLocations(path: Path, conf: Configuration): Seq[BlobLocation] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len >= 4 + 4 + 8 + 4 + 4, s"$path too short to be a Puffin file")
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0, head)
      require(java.util.Arrays.equals(head, Magic), s"$path lacks Puffin magic")
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt()
      val flags = tb.getInt()
      require(java.util.Arrays.equals(tail.slice(8, 12), Magic),
        s"$path lacks trailing Puffin magic")
      require((flags & 1) == 0,
        s"$path has a compressed Puffin footer payload — not supported")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val root = mapper.readTree(new String(payload, StandardCharsets.UTF_8))
      Option(root.get("blobs")).toSeq
        .flatMap(_.elements().asScala)
        .filter(_.get("type").asText == DvBlobType)
        .map { b =>
          require(Option(b.get("compression-codec")).forall(_.isNull),
            s"compressed $DvBlobType blob in $path — the spec forbids it")
          val props = Option(b.get("properties")).getOrElse(
            throw new IllegalStateException(
              s"$DvBlobType blob in $path lacks properties"))
          BlobLocation(
            props.get("referenced-data-file").asText,
            Option(props.get("cardinality")).map(_.asText.toLong).getOrElse(0L),
            b.get("offset").asLong,
            b.get("length").asLong)
        }.toList
    } finally in.close()
  }

  /** One NDV statistics blob: the Puffin spec's
    * `apache-datasketches-theta-v1` type — `fields` names the schema
    * field id the sketch covers, `properties.ndv` carries the estimate
    * so planners can read cardinality without deserializing the sketch.
    */
  final case class StatsBlob(fieldId: Int, ndv: Long, body: Array[Byte])
  val ThetaBlobType = "apache-datasketches-theta-v1"

  /** Write one Puffin STATISTICS file (Iceberg table-statistics files;
    * referenced from table metadata's `statistics` list). Returns the
    * serialized blob-metadata JSON entries (for the `blob-metadata`
    * field), the footer payload size, and the total file length.
    */
  def writeStatsFile(path: Path, conf: Configuration, snapshotId: Long,
      sequenceNumber: Long, blobs: Seq[StatsBlob]): (Seq[String], Long, Long) = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    try {
      out.write(Magic)
      var pos = 4L
      val entries = blobs.map { b =>
        val o = mapper.createObjectNode()
        o.put("type", ThetaBlobType)
        o.putArray("fields").add(b.fieldId)
        o.put("snapshot-id", snapshotId)
        o.put("sequence-number", sequenceNumber)
        o.put("offset", pos)
        o.put("length", b.body.length.toLong)
        o.putObject("properties").put("ndv", b.ndv.toString)
        out.write(b.body)
        pos += b.body.length
        o
      }
      val payload = mapper.createObjectNode()
      val arr = payload.putArray("blobs")
      entries.foreach(arr.add)
      payload.putObject("properties").put("created-by", "graft")
      val payloadBytes = mapper.writeValueAsBytes(payload)
      out.write(Magic)
      out.write(payloadBytes)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payloadBytes.length)
      tail.putInt(0)
      out.write(tail.array())
      out.write(Magic)
      pos += 4 + payloadBytes.length + 8 + 4
      (entries.map(mapper.writeValueAsString), payloadBytes.length.toLong, pos)
    } finally out.close()
  }

  /** Read a statistics file's `apache-datasketches-theta-v1` blobs →
    * (field id, ndv, offset, length). The ndv property is
    * authoritative; bodies stay unread unless the caller wants the
    * sketch itself.
    */
  def readStatsBlobs(path: Path, conf: Configuration): Seq[(Int, Long, Long, Long)] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len >= 4 + 4 + 8 + 4 + 4, s"$path too short to be a Puffin file")
    val in = fs.open(path)
    try {
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt()
      val flags = tb.getInt()
      require(java.util.Arrays.equals(tail.slice(8, 12), Magic),
        s"$path lacks trailing Puffin magic")
      require((flags & 1) == 0,
        s"$path has a compressed Puffin footer payload — not supported")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val root = mapper.readTree(new String(payload, StandardCharsets.UTF_8))
      Option(root.get("blobs")).toSeq
        .flatMap(_.elements().asScala)
        .filter(_.get("type").asText == ThetaBlobType)
        .map { b =>
          val fid = b.get("fields").elements().asScala.next().asInt
          val ndv = Option(b.get("properties"))
            .flatMap(p => Option(p.get("ndv"))).map(_.asText.toLong)
            .getOrElse(-1L)
          (fid, ndv, b.get("offset").asLong, b.get("length").asLong)
        }.toList
    } finally in.close()
  }

  /** Read one raw blob body [offset, offset+length). */
  def readBlobBody(path: Path, conf: Configuration, offset: Long,
      length: Long): Array[Byte] = {
    val in = path.getFileSystem(conf).open(path)
    try {
      val bytes = new Array[Byte](length.toInt)
      in.readFully(offset, bytes)
      bytes
    } finally in.close()
  }

  /** Read one DV blob body and return the decoded bitmap. The body is
    * verified exactly like a Delta DV payload entry (length prefix,
    * magic via [[RoaringBitmapArray.deserialize]], trailing CRC-32).
    */
  def readDvBitmap(path: Path, conf: Configuration, offset: Long,
      length: Long): RoaringBitmapArray = {
    val in = path.getFileSystem(conf).open(path)
    try {
      in.seek(offset)
      val dis = new java.io.DataInputStream(in)
      val n = dis.readInt() // big-endian
      require(n.toLong == length - 8,
        s"DV blob length prefix $n != blob length - 8 (${length - 8}) in $path@$offset")
      val bytes = new Array[Byte](n)
      dis.readFully(bytes)
      val crc = dis.readInt()
      require(crc == RoaringBitmapArray.checksum(bytes),
        s"DV blob checksum mismatch in $path@$offset")
      RoaringBitmapArray.deserialize(bytes)
    } finally in.close()
  }

  /** Frame magic+vector bytes as a DV blob body (the Delta `.bin` entry
    * framing): 4-byte BE length, the bytes, 4-byte BE CRC-32.
    */
  def frame(bitmapBytes: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + bitmapBytes.length + 4)
    buf.putInt(bitmapBytes.length)
    buf.put(bitmapBytes)
    buf.putInt(RoaringBitmapArray.checksum(bitmapBytes))
    buf.array()
  }

  /** Raw-copy a Delta DV descriptor's framed payload into a blob body —
    * no decode: a `.bin` entry's `[len][magic+vector][crc]` bytes ARE a
    * valid `deletion-vector-v1` blob. Inline descriptors are framed
    * from their decoded Z85 bytes.
    */
  def blobBodyOf(dataPath: Path, d: DeletionVectorDescriptor,
      conf: Configuration): Array[Byte] = d.storageType match {
    case "i" =>
      frame(Z85.decode(d.pathOrInlineDv).take(d.sizeInBytes))
    case "u" | "p" =>
      val p = DeletionVectors.absolutePathOf(dataPath, d)
      val in = p.getFileSystem(conf).open(p)
      try {
        val bytes = new Array[Byte](4 + d.sizeInBytes + 4)
        in.readFully(d.offset.getOrElse(0).toLong, bytes)
        val bb = ByteBuffer.wrap(bytes)
        require(bb.getInt(0) == d.sizeInBytes,
          s"DV length prefix mismatch raw-copying $p@${d.offset.getOrElse(0)}")
        bytes
      } finally in.close()
    case other => throw new UnsupportedOperationException(
      s"cannot export DV storage type '$other' as a Puffin blob " +
        "(legacy-parquet DVs migrate on the next DELETE/OPTIMIZE)")
  }
}
