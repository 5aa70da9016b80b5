package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{GQ, QueryDefs}
import QueryDefs._

/** One opaque media payload with typed metadata (SURVEY §2 C11). */
final case class MediaRow(
    media_id: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    meta_source: String,
    meta_bytes: Long)

/** Decoded per-item features. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    byte_sum: Long,
    distinct_bytes: Int,
    entropy_proxy: Double,
    embedding: Array[Float])

/** Multimodal column plumbing: binary payload + typed metadata, batch
  * "decode" via mapPartitions (the Scala-native analogue of a batched
  * Pandas UDF: one iterator per partition, amortized setup per batch).
  *
  * The real image/audio decode is STUBBED with a deterministic
  * byte-statistics fake (no codec libraries in this environment) — the
  * Spark-side schema, partitioning, batch iteration and UDF signature are
  * real and tested. Swap `decodeOne` for a JNI/codec call in production.
  */
object Multimodal {

  /** Synthesize a media table from documents: payload = UTF-8 bytes. */
  def mediaFrom(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        $"text".cast("binary").as("payload"),
        $"source".as("meta_source"),
        length($"text".cast("binary")).cast("long").as("meta_bytes"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic byte statistics + an 8-dim fake embedding
    * folded from the payload. Replace with a real codec at deployment.
    */
  private[llm] def decodeOne(m: MediaRow): MediaFeatures = {
    val bytes = m.payload
    var sum = 0L
    val seen = new Array[Boolean](256)
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      seen(b) = true
      acc(i % 8) = acc(i % 8) * 31 + b
      i += 1
    }
    val distinct = seen.count(identity)
    val entropyProxy =
      if (bytes.isEmpty) 0.0 else distinct.toDouble / math.min(bytes.length, 256).toDouble
    val emb = acc.map(v => ((v % 1000003L).toFloat) / 1000003.0f)
    MediaFeatures(m.media_id, m.kind, bytes.length.toLong, sum, distinct, entropyProxy, emb)
  }

  /** Batched decode: one partition = one batch iterator (setup amortized). */
  def decode(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(decodeOne) }
  }

  /** Media table with structurally-valid PNG / JPEG headers: even doc_ids
    * carry a PNG signature + IHDR chunk, odd ones a JPEG SOI + APP0/JFIF +
    * SOF0 sequence, with width/height derived from doc_id (the pixel data
    * that would follow is the document text, standing in for an opaque
    * compressed stream). The headers are byte-exact per the public specs
    * (PNG: 8-byte signature, big-endian IHDR fields; JPEG: marker-segment
    * framing, big-endian SOF0 dimensions), so the parser below exercises
    * real offset/endianness logic rather than a toy layout.
    */
  def imagesFrom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        $"doc_id".as("media_id"),
        (lit(16) + pmod($"doc_id" * 31, lit(2048))).cast("int").as("w"),
        (lit(16) + pmod($"doc_id" * 7, lit(2048))).cast("int").as("h"),
        $"text")
      .withColumn("payload",
        when(pmod($"media_id", lit(2)) === 0,
          // PNG: signature | IHDR len=13 | "IHDR" | w | h | bit depth 8 |
          // color type 6 (RGBA) | compression 0 | filter 0 | interlace 0 |
          // chunk crc (not validated here)
          concat(unhex(concat(
            lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
            lpad(hex($"w"), 8, "0"), lpad(hex($"h"), 8, "0"),
            lit("0806000000"), lit("DEADBEEF"))), $"text".cast("binary")))
        .otherwise(
          // JPEG: SOI | APP0 len=16 "JFIF\0" v1.1 dpi 72x72 | SOF0 len=17
          // precision 8 | height | width | 3 components (YCbCr 4:2:0)
          concat(unhex(concat(
            lit("FFD8"), lit("FFE00010"), lit("4A46494600"), lit("010100"),
            lit("00480048"), lit("0000"),
            lit("FFC00011"), lit("08"),
            lpad(hex($"h"), 4, "0"), lpad(hex($"w"), 4, "0"),
            lit("03"), lit("012200"), lit("021101"), lit("031101"))),
            $"text".cast("binary"))))
      .select($"media_id", $"payload")
  }

  /** Header parse for (media_id, payload) rows: sniff the container from
    * magic bytes, then decode dimensions with pure byte expressions
    * (substring → hex → conv). All codegen'd, shuffle-free per-row work.
    *
    * JPEG finds SOF0 via a marker-segment WALK, not a byte-pair scan:
    * hop each segment by its big-endian length field (the length counts
    * its own 2 bytes, not the marker) starting after SOI. An FFC0 byte
    * pair inside an APPn/COM payload is data, not a marker — a locate()
    * scan bites on it (real files embed such bytes in EXIF/thumbnail
    * payloads). The walk stops at SOF0 (returning its 1-based hex-char
    * position), at SOS/EOI/any non-marker byte, or when the chain leaves
    * the sniffed head (conv of the short substring nulls out →
    * otherwise(0) = not found → format "unknown").
    */
  def parseImageDims(images: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    val hexHead = hex(substring(col("payload"), 1, 48))
    val isPng = substring(hexHead, 1, 16) === "89504E470D0A1A0A"
    val isJpeg = substring(hexHead, 1, 4) === "FFD8"
    // The walk is a bounded fold, NOT expression recursion: inlining the
    // next-position expression into each level duplicates the position
    // subtree per reference and the plan grows exponentially with depth
    // (codegen takes minutes at depth 11). The fold's state is
    // (p = next marker's 1-based hex-char pos, sof = found pos or 0);
    // 11 iterations are exhaustive — more minimal 4-byte segments cannot
    // precede a SOF0 that still ends inside the 48-byte head. The array
    // is 11 elements per row, so the interpreted HOF is not a hot path.
    val sof = aggregate(
      sequence(lit(1), lit(11)),
      struct(lit(5L).as("p"), lit(0L).as("sof")),
      (st, _) => {
        val p = st.getField("p")
        val found = st.getField("sof")
        val marker = hexHead.substr(p.cast("int"), lit(4))
        val len = conv(hexHead.substr((p + 4).cast("int"), lit(4)), 16, 10).cast("long")
        when(found > 0 || p === 0, st)
          .when(marker === "FFC0", struct(p.as("p"), p.as("sof")))
          .when(substring(marker, 1, 2) === "FF" &&
            marker =!= "FFD8" && marker =!= "FFD9" && marker =!= "FFDA" &&
            len >= 2,
            struct((p + lit(4) + len * lit(2)).as("p"), lit(0L).as("sof")))
          .otherwise(struct(lit(0L).as("p"), lit(0L).as("sof")))
      },
      st => st.getField("sof"))
    val jpegOk = isJpeg && sof > 0
    def hx(start: Column, len: Int): Column =
      conv(hexHead.substr(start.cast("int"), lit(len)), 16, 10).cast("long")
    val colorType = hx(lit(51), 2)
    images.select(
      col("media_id"),
      when(isPng, lit("png")).when(jpegOk, lit("jpeg"))
        .otherwise(lit("unknown")).as("format"),
      when(isPng, hx(lit(33), 8)).when(jpegOk, hx(sof + 14, 4)).as("width"),
      when(isPng, hx(lit(41), 8)).when(jpegOk, hx(sof + 10, 4)).as("height"),
      when(isPng, hx(lit(49), 2)).when(jpegOk, hx(sof + 8, 2)).as("bit_depth"),
      when(isPng,
        when(colorType === 6, lit(4L)).when(colorType === 2, lit(3L))
          .when(colorType === 0, lit(1L)))
        .when(jpegOk, hx(sof + 18, 2)).as("n_channels"),
      // payload minus header, header size from the length fields:
      // png 8 + (4 + 4 + ihdrLen + 4); jpeg = bytes before the SOF0
      // marker ((sof-1)/2, exact: sof is odd) + 2 (marker) + sofLen —
      // valid for ANY number of leading APPn/COM segments, not just a
      // single-APP0 layout
      (length(col("payload")).cast("long") -
        when(isPng, lit(20L) + hx(lit(17), 8))
          .when(jpegOk,
            ((sof - lit(1)) / lit(2)).cast("long") + lit(2L) + hx(sof + 4, 4)))
        .as("data_bytes"))
  }

  /** Media table with byte-exact WAV containers (RIFF little-endian
    * framing per the public format): channels / sample rate / bit depth
    * derived from doc_id, PCM payload = the document text. Every fifth
    * file additionally carries a LIST metadata chunk BETWEEN fmt and
    * data — the real-world wrinkle that breaks fixed-offset parsers
    * (same role the APPn segments play for C41's JPEG walk).
    */
  def wavsFrom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def u16le(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 4, "0")
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    def u32le(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 8, "0")
      concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2))
    }
    table(spark, dir, "documents")
      .filter(octet_length($"text") >= 8)
      .select($"doc_id".as("media_id"), $"text",
        (lit(1L) + pmod($"doc_id", lit(2))).as("ch"),
        element_at(array(lit(8000L), lit(16000L), lit(44100L)),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("sr"),
        when(pmod($"doc_id", lit(4)) < 2, 8L).otherwise(16L).as("bits"),
        (pmod($"doc_id", lit(5)) === 0).as("has_meta"))
      .withColumn("block_align", ($"ch" * $"bits" / lit(8)).cast("long"))
      .withColumn("data_len",
        (octet_length($"text").cast("long").divide($"block_align")).cast("long") * $"block_align")
      .withColumn("riff_size",
        lit(4L) + lit(24L) + when($"has_meta", 20L).otherwise(0L) +
          lit(8L) + $"data_len")
      .withColumn("payload", concat(
        unhex(concat(
          lit("52494646"), u32le($"riff_size"), lit("57415645"),
          // fmt chunk: id | size 16 | PCM | ch | rate | byteRate | align | bits
          lit("666D7420"), u32le(lit(16L)), u16le(lit(1L)), u16le($"ch"),
          u32le($"sr"), u32le($"sr" * $"block_align"), u16le($"block_align"),
          u16le($"bits"),
          when($"has_meta", concat(
            lit("4C495354"), u32le(lit(12L)), lit("494E464F"),
            substring(hex($"text".cast("binary")), 1, 16))).otherwise(lit("")),
          lit("64617461"), u32le($"data_len"))),
        substring($"text".cast("binary"), 1, 1000000).cast("binary")))
      .select($"media_id", $"payload")
  }

  /** RIFF chunk WALK for (media_id, payload) rows: hop chunks by their
    * little-endian size fields from the end of the WAVE tag, locating
    * `fmt ` and `data` wherever they sit — a LIST/unknown chunk between
    * them is skipped by its declared size, never mis-read as audio
    * parameters (fixed-offset parsers break exactly there). All pure
    * byte expressions over the 64-byte head, mirroring C41's JPEG
    * marker walk; the fold is bounded (3 hops cover any chain whose
    * data chunk still starts inside the head).
    */
  def parseWavDims(wavs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    val head = hex(substring(col("payload"), 1, 64))
    def ru16(p: Column): Column =
      conv(concat(head.substr((p + 2).cast("int"), lit(2)),
        head.substr(p.cast("int"), lit(2))), 16, 10).cast("long")
    def ru32(p: Column): Column =
      conv(concat(head.substr((p + 6).cast("int"), lit(2)),
        head.substr((p + 4).cast("int"), lit(2)),
        head.substr((p + 2).cast("int"), lit(2)),
        head.substr(p.cast("int"), lit(2))), 16, 10).cast("long")
    val isWav = substring(head, 1, 8) === "52494646" &&
      substring(head, 17, 8) === "57415645"
    // state: (p = current chunk's 1-based hex pos, fmt, dat, dsz)
    val walk = aggregate(
      sequence(lit(1), lit(3)),
      struct(lit(25L).as("p"), lit(0L).as("fmt"),
        lit(0L).as("dat"), lit(0L).as("dsz")),
      (st, _) => {
        val p = st.getField("p")
        val id = head.substr(p.cast("int"), lit(8))
        val size = ru32(p + 8)
        when(p === 0 || st.getField("dat") > 0, st)
          .when(id === "666D7420",
            struct((p + lit(16) + size * lit(2)).as("p"),
              (p + lit(16)).as("fmt"), st.getField("dat").as("dat"),
              st.getField("dsz").as("dsz")))
          .when(id === "64617461",
            struct(p.as("p"), st.getField("fmt").as("fmt"),
              (p + lit(16)).as("dat"), size.as("dsz")))
          .when(size.isNotNull,
            struct((p + lit(16) + size * lit(2)).as("p"),
              st.getField("fmt").as("fmt"), st.getField("dat").as("dat"),
              st.getField("dsz").as("dsz")))
          .otherwise(struct(lit(0L).as("p"), st.getField("fmt").as("fmt"),
            st.getField("dat").as("dat"), st.getField("dsz").as("dsz")))
      })
    val fmt = walk.getField("fmt")
    val dat = walk.getField("dat")
    val ok = isWav && fmt > 0 && dat > 0
    val ch = ru16(fmt + 4)
    val sr = ru32(fmt + 8)
    val bits = ru16(fmt + 28)
    val align = ru16(fmt + 24)
    val frames = (walk.getField("dsz").divide(align)).cast("long")
    wavs.select(
      col("media_id"),
      when(ok, lit("wav")).otherwise(lit("unknown")).as("format"),
      when(ok, ch).as("n_channels"),
      when(ok, sr).as("sample_rate"),
      when(ok, bits).as("bits_per_sample"),
      when(ok, frames).as("n_frames"),
      when(ok, (frames * lit(1000)).divide(sr).cast("long")).as("duration_ms"),
      // chunk-walk evidence: where the PCM bytes start ((dat-1)/2, exact)
      when(ok, ((dat - lit(1)) / lit(2)).cast("long")).as("data_offset"))
  }

  /** Byte-exact ISO-BMFF (MP4) containers synthesized per the public
    * ISO/IEC 14496-12 layout: big-endian size-prefixed boxes — `ftyp`
    * (brand isom), an optional `free` padding box for every fifth file
    * (the hop evidence, like C54's LIST chunk), `moov` containing a
    * full 108-byte version-0 `mvhd` (timescale + duration at their spec
    * offsets, remaining fields zero), then `mdat` carrying the text
    * bytes.
    */
  def vidsFrom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def u32be(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    table(spark, dir, "documents")
      .filter(octet_length($"text") >= 8)
      .select($"doc_id".as("media_id"), $"text",
        element_at(array(lit(600L), lit(1000L), lit(90000L)),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("timescale"),
        (pmod($"doc_id" * 37, lit(100000)) + lit(600L)).as("dur_units"),
        (pmod($"doc_id", lit(5)) === 0).as("has_free"))
      .withColumn("payload", concat(
        unhex(concat(
          u32be(lit(16L)), lit("66747970"), lit("69736F6D"), u32be(lit(0L)),
          when($"has_free",
            concat(u32be(lit(16L)), lit("66726565"), lit("0" * 16)))
            .otherwise(lit("")),
          u32be(lit(116L)), lit("6D6F6F76"),
          u32be(lit(108L)), lit("6D766864"),
          u32be(lit(0L)), u32be(lit(0L)), u32be(lit(0L)),
          u32be($"timescale"), u32be($"dur_units"),
          lit("0" * 160),
          u32be(octet_length($"text").cast("long") + lit(8L)), lit("6D646174"))),
        substring($"text".cast("binary"), 1, 1000000).cast("binary")))
      .select($"media_id", $"payload")
  }

  /** ISO-BMFF box WALK: hop top-level boxes by their big-endian size
    * fields until `moov` (a `free` box in between is skipped by its
    * declared size, never mis-read), then read `mvhd`'s timescale and
    * duration from their version-0 offsets. Pure byte expressions over
    * the 160-byte head; bounded 3 hops, mirroring C54's RIFF walk.
    */
  def parseMp4Dims(vids: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    val head = hex(substring(col("payload"), 1, 160))
    def ru32(p: Column): Column =
      conv(head.substr(p.cast("int"), lit(8)), 16, 10).cast("long")
    val isMp4 = substring(head, 9, 8) === "66747970"
    val walk = aggregate(
      sequence(lit(1), lit(3)),
      struct(lit(1L).as("p"), lit(0L).as("moov")),
      (st, _) => {
        val p = st.getField("p")
        val size = ru32(p)
        val typ = head.substr((p + 8).cast("int"), lit(8))
        when(p === 0 || st.getField("moov") > 0, st)
          .when(typ === "6D6F6F76",
            struct(p.as("p"), p.as("moov")))
          .when(size >= 8,
            struct((p + size * 2).as("p"), lit(0L).as("moov")))
          .otherwise(struct(lit(0L).as("p"), lit(0L).as("moov")))
      })
    val moov = walk.getField("moov")
    val child = moov + lit(16L) // first box inside moov
    val mvhdOk = head.substr((child + 8).cast("int"), lit(8)) === "6D766864"
    val version0 = head.substr((child + 16).cast("int"), lit(2)) === "00"
    val ok = isMp4 && moov > 0 && mvhdOk && version0
    val timescale = ru32(child + 40) // header 8B + ver/flags,creation,modification
    val duration = ru32(child + 48)
    vids.select(
      col("media_id"),
      when(ok, lit("mp4")).otherwise(lit("unknown")).as("format"),
      when(ok, timescale).as("timescale"),
      when(ok, duration).as("duration_units"),
      when(ok, (duration * lit(1000)).divide(timescale).cast("long")).as("duration_ms"),
      // hop evidence: the moov byte offset shifts by the free box
      when(ok, ((moov - lit(1)) / lit(2)).cast("long")).as("moov_offset"))
  }

  val queries: Seq[GQ] = Seq(
    GQ("multimodal_decode", (s, d) => {
      import s.implicits._
      decode(mediaFrom(s, d))
        .toDF()
        .select($"media_id", $"kind", $"n_bytes", $"byte_sum",
          $"distinct_bytes".cast("long").as("distinct_bytes"))
        .orderBy($"media_id")
    }, // byte-level stats over ASCII text payloads are SQL-expressible, so
      // even the stubbed decode gets a real oracle.
      Some("""
      SELECT doc_id AS media_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(list_reduce(list_transform(generate_series(1, length(text)), i -> CAST(unicode(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)), (a, b) -> a + b) AS BIGINT) AS byte_sum,
        CAST(len(list_distinct(list_transform(generate_series(1, length(text)), i -> unicode(substr(text, CAST(i AS INTEGER), 1))))) AS BIGINT) AS distinct_bytes
      FROM documents ORDER BY media_id""")),

    // C36: frame sampling — the video-pipeline prep shape: each "video"
    // payload splits into fixed 64-byte frames, every 4th frame is
    // sampled (stride), and the sample is fingerprinted. Pure per-row
    // array expressions (sequence → substring → md5), shuffle-free and
    // codegen'd; the real decoder drops in for `substring` without
    // touching the plumbing. The md5-of-frame-md5s fingerprint verifies
    // EXACT frame boundaries and order on both engines.
    GQ("multimodal_frames", (s, d) => {
      import s.implicits._
      val frameLen = 64
      val stride = 4
      mediaFrom(s, d).toDF()
        .filter($"kind" === "video")
        .withColumn("n_frames",
          ceil($"meta_bytes" / lit(frameLen.toDouble)).cast("int"))
        .withColumn("sampled",
          transform(sequence(lit(0), $"n_frames" - 1, lit(stride)),
            i => md5(substring($"payload", i * frameLen + 1, lit(frameLen)))))
        .select($"media_id", $"n_frames".cast("long").as("n_frames"),
          size($"sampled").cast("long").as("n_sampled"),
          md5(concat_ws("", $"sampled")).as("fingerprint"))
        .orderBy($"media_id")
    }, Some("""
      WITH v AS (SELECT doc_id AS media_id, text,
          CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS n_frames
        FROM documents WHERE CAST(doc_id % 3 AS INTEGER) + 1 = 3),
      f AS (SELECT media_id, n_frames,
          list_transform(generate_series(0, n_frames - 1, 4),
            i -> md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64))) AS sampled
        FROM v)
      SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
        CAST(len(sampled) AS BIGINT) AS n_sampled,
        md5(list_reduce(sampled, (a, b) -> a || b)) AS fingerprint
      FROM f ORDER BY media_id""")),

    // C41: binary-header metadata extraction — the schema-extraction step
    // of a multimodal ingest: sniff the container from magic bytes, then
    // decode dimensions from the header with pure byte expressions
    // (substring → hex → conv), including a marker-segment scan for JPEG
    // (SOF0 is FOUND by walking the hex, byte-aligned, not read from a
    // hardcoded offset) and header sizes derived from the length FIELDS.
    // All codegen'd, shuffle-free per-row work. The oracle recomputes the
    // expected dimensions arithmetically from doc_id, so an endianness or
    // offset mistake in synthesis OR parsing breaks the hash match.
    GQ("multimodal_dims", (s, d) =>
      parseImageDims(imagesFrom(s, d)).orderBy(col("media_id")), Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        CAST(16 + (doc_id * 31) % 2048 AS BIGINT) AS width,
        CAST(16 + (doc_id * 7) % 2048 AS BIGINT) AS height,
        CAST(8 AS BIGINT) AS bit_depth,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS BIGINT) AS n_channels,
        CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes
      FROM documents ORDER BY media_id""")),

    // C54: audio-container metadata via a RIFF chunk walk. The oracle is
    // CLOSED-FORM (the generation formulas), so generator and parser are
    // independent code paths pinned against the same truth table —
    // including the chunk-hop evidence (data_offset shifts by the LIST
    // chunk's 20 bytes for every fifth file).
    GQ("audio_dims", (s, d) =>
      parseWavDims(wavsFrom(s, d)).orderBy(col("media_id")), Some("""
      WITH p AS (SELECT doc_id,
          CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
          CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               ELSE 44100 END AS BIGINT) AS sample_rate,
          CAST(CASE WHEN doc_id % 4 < 2 THEN 8 ELSE 16 END AS BIGINT) AS bits_per_sample,
          CAST(octet_length(encode(text)) AS BIGINT) AS nb,
          doc_id % 5 = 0 AS has_meta
        FROM documents WHERE octet_length(encode(text)) >= 8),
      q AS (SELECT *, n_channels * bits_per_sample // 8 AS block_align FROM p)
      SELECT doc_id AS media_id, 'wav' AS format,
        n_channels, sample_rate, bits_per_sample,
        CAST(nb // block_align AS BIGINT) AS n_frames,
        CAST((nb // block_align) * 1000 // sample_rate AS BIGINT) AS duration_ms,
        CAST(CASE WHEN has_meta THEN 64 ELSE 44 END AS BIGINT) AS data_offset
      FROM q ORDER BY media_id""")),

    // C60: video-container metadata via an ISO-BMFF box walk — the
    // format triad's third leg (C41 image marker walk, C54 audio chunk
    // walk). Boxes are BIG-endian size-prefixed (the opposite trap of
    // RIFF); a free/padding box before moov is hopped by its declared
    // size, and mvhd's timescale/duration read from their version-0
    // offsets. Oracle = the closed-form generation formulas, so
    // generator and parser stay independent code paths — including the
    // moov_offset evidence shifting by 16 bytes for every fifth file.
    GQ("video_dims", (s, d) =>
      parseMp4Dims(vidsFrom(s, d)).orderBy(col("media_id")), Some("""
      WITH p AS (SELECT doc_id,
          CAST([600, 1000, 90000][CAST(doc_id % 3 AS INTEGER) + 1] AS BIGINT) AS timescale,
          CAST((doc_id * 37) % 100000 + 600 AS BIGINT) AS dur
        FROM documents WHERE octet_length(encode(text)) >= 8)
      SELECT doc_id AS media_id, 'mp4' AS format, timescale,
        dur AS duration_units,
        CAST(dur * 1000 // timescale AS BIGINT) AS duration_ms,
        CAST(CASE WHEN doc_id % 5 = 0 THEN 32 ELSE 16 END AS BIGINT) AS moov_offset
      FROM p ORDER BY media_id"""))
  )
}
