package graft.delta

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
import org.apache.spark.sql.types._

/** Per-file statistics for AddFile.stats (SURVEY §2 A17): numRecords +
  * per-column min/max, harvested from the parquet footer the writer
  * already produced — no extra data pass. The scan uses them for
  * file-level data skipping on non-partition predicates.
  *
  * Stats JSON shape follows the open Delta convention:
  * {"numRecords":N,"minValues":{...},"maxValues":{...}}.
  */
object Stats {

  /** Spark types whose parquet footer min/max we trust and serialize.
    * Dates serialize as ISO days, timestamps as microsecond-precision UTC
    * strings, decimals as plain strings — all shapes `from_json` parses
    * back to the column's Spark type in the scan. (INT96 timestamps carry
    * no footer stats; files written that way simply never skip.)
    */
  private def eligible(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType |
         DoubleType | FloatType | StringType | BooleanType |
         DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Atomic eligible leaf fields of the data schema (top level only).
    * `numIndexedCols` caps indexing to the first N SCHEMA columns
    * (`delta.dataSkippingNumIndexedCols` semantics; -1 = all): at 1000
    * columns, footer harvesting and stats JSON stay bounded while the
    * leading (most-filtered) columns keep skipping.
    */
  def statFields(dataSchema: StructType, partCols: Seq[String],
      numIndexedCols: Int = -1,
      statsColumns: Seq[String] = Nil): Seq[StructField] = {
    // an explicit column list (delta.dataSkippingStatsColumns) overrides
    // the positional cap — the filtered columns of a wide table may sit
    // anywhere in the schema
    val capped =
      if (statsColumns.nonEmpty)
        dataSchema.fields.toSeq.filter(f =>
          statsColumns.exists(_.equalsIgnoreCase(f.name)))
      else if (numIndexedCols < 0) dataSchema.fields.toSeq
      else dataSchema.fields.toSeq.take(numIndexedCols)
    capped
      .filterNot(f => partCols.contains(f.name))
      .filter(f => eligible(f.dataType))
  }

  /** Schema for parsing stats JSON back in the scan. */
  def statsSchema(dataSchema: StructType, partCols: Seq[String]): StructType = {
    val mm = StructType(statFields(dataSchema, partCols).map(f => StructField(f.name, f.dataType)))
    StructType(Seq(
      StructField("numRecords", LongType),
      StructField("minValues", mm),
      StructField("maxValues", mm)))
  }

  /** numRecords out of a stats JSON string (None when stats are absent
    * or unparseable) — row tracking needs the per-file row count to
    * assign contiguous fresh-row-id ranges.
    */
  def numRecords(stats: String): Option[Long] =
    if (stats == null) None
    else try {
      val n = new ObjectMapper().readTree(stats).get("numRecords")
      if (n == null || n.isNull) None else Some(n.asLong())
    } catch { case _: Exception => None }

  /** Read footer metadata of one written file -> stats JSON. */
  def fromFooter(conf: Configuration, file: Path,
      dataSchema: StructType, partCols: Seq[String],
      numIndexedCols: Int = -1,
      statsColumns: Seq[String] = Nil): String = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val wanted = statFields(dataSchema, partCols, numIndexedCols, statsColumns)
        .map(f => f.name -> f.dataType).toMap
      // Physical timestamp unit per column (MILLIS/MICROS/NANOS) from the
      // parquet logical-type annotation — the raw INT64 footer stat is in
      // this unit, NOT necessarily microseconds.
      val tsUnits: Map[String, TimeUnit] =
        reader.getFooter.getFileMetaData.getSchema.getColumns.asScala.flatMap { cd =>
          cd.getPrimitiveType.getLogicalTypeAnnotation match {
            case t: TimestampLogicalTypeAnnotation => Some(cd.getPath.mkString(".") -> t.getUnit)
            case _ => None
          }
        }.toMap
      val mins = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      val maxs = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var failed = Set.empty[String]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        wanted.get(name).foreach { dt =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) failed += name
          else {
            val unit = tsUnits.get(name)
            val (mn, mx) = (convert(st.genericGetMin, dt, unit, roundUp = false),
              convert(st.genericGetMax, dt, unit, roundUp = true))
            if (mn == null || mx == null) failed += name
            else {
              mins(name) = mins.get(name).map(ordMin(_, mn, dt)).getOrElse(mn)
              maxs(name) = maxs.get(name).map(ordMax(_, mx, dt)).getOrElse(mx)
            }
          }
        }
      }
      failed.foreach { n => mins.remove(n); maxs.remove(n) }
      toJson(numRecords, mins.toMap, maxs.toMap)
    } finally reader.close()
  }

  private def convert(v: Any, dt: DataType,
      tsUnit: Option[TimeUnit] = None, roundUp: Boolean = false): Any = (v, dt) match {
    case (b: Binary, StringType) => b.toStringUsingUTF8
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, ShortType) => n.shortValue()
    case (n: java.lang.Number, ByteType) => n.byteValue()
    case (n: java.lang.Number, DoubleType) => n.doubleValue()
    case (n: java.lang.Number, FloatType) => n.floatValue()
    case (b: java.lang.Boolean, BooleanType) => b
    case (n: java.lang.Number, DateType) =>
      java.time.LocalDate.ofEpochDay(n.longValue()).toString
    case (n: java.lang.Number, TimestampType) =>
      // INT64 TIMESTAMP footer stats, scaled to micros by the column's
      // declared unit; INT96 yields Binary (no annotation) and falls
      // through to null (no stats, no skipping). NANOS truncation widens
      // the range (floor for min, ceil for max) so pruning stays safe.
      tsUnit match {
        case Some(TimeUnit.MILLIS) => formatMicros(Math.multiplyExact(n.longValue(), 1000L))
        case Some(TimeUnit.MICROS) => formatMicros(n.longValue())
        case Some(TimeUnit.NANOS) =>
          val nanos = n.longValue()
          formatMicros(if (roundUp) -Math.floorDiv(-nanos, 1000L) else Math.floorDiv(nanos, 1000L))
        case None => null
      }
    case (b: Binary, d: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), d.scale).toPlainString
    case (n: java.lang.Number, d: DecimalType) =>
      java.math.BigDecimal.valueOf(n.longValue(), d.scale).toPlainString
    case _ => null
  }

  private def formatMicros(micros: Long): String = {
    val secs = java.lang.Math.floorDiv(micros, 1000000L)
    val frac = java.lang.Math.floorMod(micros, 1000000L)
    val i = java.time.Instant.ofEpochSecond(secs, frac * 1000L)
    // ISO-8601 with explicit Z (the Delta stats convention): parses back
    // timezone-independently in any session zone.
    java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
  }

  private def cmp(a: Any, b: Any, dt: DataType): Int = (a, b, dt) match {
    case (x: String, y: String, _: DecimalType) =>
      new java.math.BigDecimal(x).compareTo(new java.math.BigDecimal(y))
    case (x: String, y: String, _) => x.compareTo(y) // ISO strings sort correctly
    case (x: java.lang.Number, y: java.lang.Number, _) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: java.lang.Boolean, y: java.lang.Boolean, _) => x.compareTo(y)
    case _ => 0
  }
  private def ordMin(a: Any, b: Any, dt: DataType): Any = if (cmp(a, b, dt) <= 0) a else b
  private def ordMax(a: Any, b: Any, dt: DataType): Any = if (cmp(a, b, dt) >= 0) a else b

  private val mapper = new ObjectMapper()

  private def toJson(numRecords: Long, mins: Map[String, Any], maxs: Map[String, Any]): String = {
    val root = mapper.createObjectNode()
    root.put("numRecords", numRecords)
    def putAll(key: String, m: Map[String, Any]): Unit = {
      val o = root.putObject(key)
      m.foreach {
        case (k, v: String) => o.put(k, v)
        case (k, v: java.lang.Integer) => o.put(k, v.intValue())
        case (k, v: java.lang.Long) => o.put(k, v.longValue())
        case (k, v: java.lang.Short) => o.put(k, v.intValue())
        case (k, v: java.lang.Byte) => o.put(k, v.intValue())
        case (k, v: java.lang.Double) => o.put(k, v.doubleValue())
        case (k, v: java.lang.Float) => o.put(k, v.floatValue())
        case (k, v: java.lang.Boolean) => o.put(k, v.booleanValue())
        case _ =>
      }
    }
    putAll("minValues", mins)
    putAll("maxValues", maxs)
    mapper.writeValueAsString(root)
  }
}
