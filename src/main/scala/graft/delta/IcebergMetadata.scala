package graft.delta

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.DataFileWriter
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** One Iceberg manifest's summary, shipped back to the driver. Public:
  * Spark's generated serializer code must reach the accessors (a
  * private nested class silently drops whole-stage codegen to the
  * interpreted path on every generation).
  */
final case class IcebergManifestSummary(path: String, length: Long,
    fileCount: Long, rowCount: Long,
    // one triple per identity-partition column, positional:
    // (contains_null, lower bound, upper bound) with bounds in the
    // Iceberg single-value binary serialization
    partSummaries: Seq[(Boolean, Option[Array[Byte]], Option[Array[Byte]])])

/** UniForm-style Iceberg metadata generation (delta-spark's
  * `delta.universalFormat.enabledFormats=iceberg` surface; public
  * Iceberg table spec v2): after a Delta commit, emit Iceberg table
  * metadata — `metadata/v<N>.metadata.json`, an Avro manifest list
  * `snap-<id>-…`, Avro data manifests, and `version-hint.text` — all
  * pointing at the SAME parquet data files, so an Iceberg reader
  * (HadoopTables catalog) reads the Delta table with zero data copies.
  *
  * Scale shape: data manifests are written ON EXECUTORS, one Avro file
  * per partition of the AddFile dataset — the driver collects only the
  * per-manifest summaries (path, length, counts), never the file list.
  * A 10^7-file table generates metadata with O(#manifests) driver state.
  *
  * Honest simplifications vs the full UniForm implementation, each
  * loud or documented:
  *  - every generation writes a FULL manifest set for the current
  *    snapshot with entries marked ADDED by it (correct for full table
  *    scans — the only effect is on Iceberg incremental consumption,
  *    which would re-see old files);
  *  - deletion vectors cannot be represented (Iceberg v2 positional
  *    deletes are a different encoding) — generation REFUSES while any
  *    live file carries a DV, exactly like IcebergCompat;
  *  - no Iceberg reader exists in this sandbox, so conformance is
  *    spec-structural: the suite re-reads the Avro manifests/list with
  *    the Avro library and the metadata JSON with Jackson and checks
  *    them against the Delta snapshot.
  */
object IcebergMetadata {

  private val mapper = new ObjectMapper()

  def metadataDir(log: DeltaLog): Path = new Path(log.dataPath, "metadata")

  /** Iceberg schema JSON from the Delta schema. Field ids come from
    * column mapping when the table has it (the ids Iceberg readers then
    * share with the parquet footers — the icebergCompat requirement);
    * otherwise positional. Nested element/key/value ids are assigned
    * after the top-level range, mirroring Iceberg's allocator.
    */
  private[delta] def icebergSchema(schema: StructType, mapped: Boolean):
      (com.fasterxml.jackson.databind.node.ObjectNode, Int, Map[String, Int],
        com.fasterxml.jackson.databind.node.ArrayNode) = {
    var nextId =
      if (mapped)
        schema.fields.map(_.metadata.getLong(ColumnMapping.IdKey)).max.toInt + 1
      else schema.fields.length + 1
    def fresh(): Int = { val i = nextId; nextId += 1; i }

    // one walk builds BOTH trees so nested ids cannot diverge: the
    // Iceberg schema JSON, and the name-mapping entries binding PARQUET
    // column names (physical names under column mapping) to those ids
    def mapEntry(parent: com.fasterxml.jackson.databind.node.ArrayNode,
        id: Int, name: String): com.fasterxml.jackson.databind.node.ObjectNode = {
      val e = parent.addObject()
      e.put("field-id", id)
      e.putArray("names").add(name)
      e
    }
    def attach(entry: com.fasterxml.jackson.databind.node.ObjectNode,
        sub: com.fasterxml.jackson.databind.node.ArrayNode): Unit =
      if (sub.size > 0) entry.set("fields", sub)

    def typeJson(dt: DataType,
        mapping: com.fasterxml.jackson.databind.node.ArrayNode): Object = dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType | IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case DateType => "date"
      case TimestampType => "timestamptz"
      case _: TimestampNTZType => "timestamp"
      case StringType => "string"
      case BinaryType => "binary"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case s: StructType =>
        val o = mapper.createObjectNode()
        o.put("type", "struct")
        val fs = o.putArray("fields")
        s.fields.foreach { f =>
          val id = fresh()
          val fo = fs.addObject()
          fo.put("id", id)
          fo.put("name", f.name)
          fo.put("required", !f.nullable)
          val entry = mapEntry(mapping, id, ColumnMapping.physicalName(f))
          val sub = mapper.createArrayNode()
          fo.putPOJO("type", typeJson(f.dataType, sub))
          attach(entry, sub)
        }
        o
      case a: ArrayType =>
        val o = mapper.createObjectNode()
        o.put("type", "list")
        val eid = fresh()
        o.put("element-id", eid)
        o.put("element-required", !a.containsNull)
        val entry = mapEntry(mapping, eid, "element")
        val sub = mapper.createArrayNode()
        o.putPOJO("element", typeJson(a.elementType, sub))
        attach(entry, sub)
        o
      case m: MapType =>
        val o = mapper.createObjectNode()
        o.put("type", "map")
        val kid = fresh()
        val vid = fresh()
        o.put("key-id", kid)
        o.put("value-id", vid)
        val ke = mapEntry(mapping, kid, "key")
        val ksub = mapper.createArrayNode()
        o.putPOJO("key", typeJson(m.keyType, ksub))
        attach(ke, ksub)
        val ve = mapEntry(mapping, vid, "value")
        val vsub = mapper.createArrayNode()
        o.put("value-required", !m.valueContainsNull)
        o.putPOJO("value", typeJson(m.valueType, vsub))
        attach(ve, vsub)
        o
      case other => throw new UnsupportedOperationException(
        s"cannot express ${other.simpleString} in Iceberg metadata")
    }

    val root = mapper.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", 0)
    val fields = root.putArray("fields")
    val rootMapping = mapper.createArrayNode()
    val ids = schema.fields.zipWithIndex.map { case (f, i) =>
      val id =
        if (mapped) f.metadata.getLong(ColumnMapping.IdKey).toInt else i + 1
      val fo = fields.addObject()
      fo.put("id", id)
      fo.put("name", f.name)
      fo.put("required", !f.nullable)
      val entry = mapEntry(rootMapping, id, ColumnMapping.physicalName(f))
      val sub = mapper.createArrayNode()
      fo.putPOJO("type", typeJson(f.dataType, sub))
      attach(entry, sub)
      f.name -> id
    }.toMap
    (root, nextId - 1, ids, rootMapping)
  }

  /** Avro type for one identity-partition column in the manifest's
    * partition struct; Iceberg physical types for the supported set.
    */
  private def partAvro(dt: DataType): (String, String) = dt match {
    case IntegerType | ShortType | ByteType => ("int", "int")
    case LongType => ("long", "long")
    case StringType => ("string", "string")
    case DateType => ("int", "date")
    case other => throw new UnsupportedOperationException(
      s"unsupported Iceberg partition column type ${other.simpleString}")
  }

  private def partitionStructSchemaJson(
      partCols: Seq[(String, DataType, Int)]): String = {
    val fields = partCols.zipWithIndex.map { case ((name, dt, _), i) =>
      val (avro, _) = partAvro(dt)
      s"""{"name":"${name}","type":["null","$avro"],"default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    s"""{"type":"record","name":"r102","fields":[$fields]}"""
  }

  private def longMap(name: String, fid: Int, kid: Int, vid: Int): String =
    s"""{"name":"$name","field-id":$fid,"default":null,"type":["null",
      {"type":"array","logicalType":"map","items":
        {"type":"record","name":"k${kid}_v$vid","fields":[
          {"name":"key","type":"int","field-id":$kid},
          {"name":"value","type":"long","field-id":$vid}]}}]}"""

  private def bytesMap(name: String, fid: Int, kid: Int, vid: Int): String =
    s"""{"name":"$name","field-id":$fid,"default":null,"type":["null",
      {"type":"array","logicalType":"map","items":
        {"type":"record","name":"k${kid}_v$vid","fields":[
          {"name":"key","type":"int","field-id":$kid},
          {"name":"value","type":"bytes","field-id":$vid}]}}]}"""

  private def manifestEntrySchemaJson(partStruct: String): String =
    s"""{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":$partStruct,"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        ${longMap("value_counts", 109, 119, 120)},
        ${longMap("null_value_counts", 110, 121, 122)},
        ${bytesMap("lower_bounds", 125, 126, 127)},
        ${bytesMap("upper_bounds", 128, 129, 130)}]}}]}"""

  /** Iceberg single-value serialization of one Delta stats-JSON bound for
    * a top-level primitive column; None when the type has no stats or the
    * JSON value cannot express it.
    */
  private def statBound(dt: DataType,
      v: com.fasterxml.jackson.databind.JsonNode): Option[Array[Byte]] = dt match {
    case _ if v == null || v.isNull => None
    case ByteType | ShortType | IntegerType =>
      Some(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v.asInt).array())
    case LongType =>
      Some(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v.asLong).array())
    case FloatType =>
      Some(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putFloat(v.asDouble.toFloat).array())
    case DoubleType =>
      Some(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v.asDouble).array())
    case StringType => Some(v.asText.getBytes(StandardCharsets.UTF_8))
    case DateType =>
      Some(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(java.time.LocalDate.parse(v.asText).toEpochDay.toInt).array())
    case _ => None
  }

  private val manifestListSchemaJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","field-id":507,"default":null,"type":["null",
        {"type":"array","element-id":508,"items":
          {"type":"record","name":"r508","fields":[
            {"name":"contains_null","type":"boolean","field-id":509},
            {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
            {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}]}}]}]}"""

  /** Iceberg single-value binary serialization for the supported
    * identity-partition types: int/date = 4 bytes little-endian,
    * long = 8 bytes little-endian, string = UTF-8 bytes.
    */
  private def boundBytes(dt: DataType, v: Any): Array[Byte] = v match {
    case i: java.lang.Integer =>
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    case l: java.lang.Long =>
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    case s: String => s.getBytes(StandardCharsets.UTF_8)
    case other => throw new UnsupportedOperationException(
      s"no single-value serialization for $other (${dt.simpleString})")
  }

  private def parsePartValue(dt: DataType, v: String): Any = dt match {
    case _ if v == null => null
    case IntegerType | ShortType | ByteType => java.lang.Integer.valueOf(v)
    case LongType => java.lang.Long.valueOf(v)
    case StringType => v
    case DateType =>
      java.lang.Integer.valueOf(java.time.LocalDate.parse(v).toEpochDay.toInt)
    case other => throw new UnsupportedOperationException(other.simpleString)
  }


  /** Generate Iceberg metadata for `snapshot`; returns the Iceberg
    * metadata version N (= delta version + 1). Refuses tables whose
    * live files carry deletion vectors.
    */
  def generate(spark: SparkSession, log: DeltaLog, snapshot: Snapshot): Long = {
    val md = snapshot.metadataOpt.getOrElse(throw new IllegalStateException(
      "cannot generate Iceberg metadata for a table without metadata"))
    val mapped = ColumnMapping.enabled(md)
    val schema = md.schema
    // Spark's default parquet timestamp encoding is INT96, which the
    // Iceberg spec does not permit for timestamp/timestamptz — metadata
    // declaring INT64-micros over INT96 data would misdecode in a
    // conformant reader. Refuse loudly (the DV-refusal contract) until
    // the table's files are known TIMESTAMP_MICROS.
    def hasTs(dt: DataType): Boolean = dt match {
      case TimestampType | _: TimestampNTZType => true
      case s: StructType => s.fields.exists(f => hasTs(f.dataType))
      case a: ArrayType => hasTs(a.elementType)
      case m: MapType => hasTs(m.keyType) || hasTs(m.valueType)
      case _ => false
    }
    if (hasTs(schema))
      throw new UnsupportedOperationException(
        "Iceberg metadata generation does not support timestamp columns: " +
          "this engine writes parquet timestamps as INT96 (Spark default), " +
          "which the Iceberg spec forbids")
    val (schemaJson, lastColumnId, fieldIds, nameMapping) =
      icebergSchema(schema, mapped)
    val partCols: Seq[(String, DataType, Int)] = md.partitionColumns.map { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalStateException(s"partition column $c not in schema"))
      (c, f.dataType, fieldIds(c))
    }

    val dir = metadataDir(log)
    val hconf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val dirStr = dir.toString
    val dataRoot = log.dataPath.toString
    val version = snapshot.version
    val snapshotId = version + 1L // Iceberg snapshot ids start life at 1 here
    val seqNum = version + 1L

    // ---- data manifests: one Avro file per partition, written on the
    // executors; the driver sees only the summaries
    val partStructJson = partitionStructSchemaJson(partCols)
    val entrySchemaJson = manifestEntrySchemaJson(partStructJson)
    val partMeta = partCols.map { case (n, dt, _) => (n, dt) }
    // top-level primitive columns whose Delta stats become Iceberg
    // per-file column stats (value/null counts + typed bounds)
    def statsSupported(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | DateType => true
      case _ => false
    }
    val statsCols: Seq[(String, DataType, Int)] = schema.fields.toSeq
      .filter(f => statsSupported(f.dataType))
      .map(f => (f.name, f.dataType, fieldIds(f.name)))
    import spark.implicits._
    // cluster manifests BY PARTITION (one metadata-sized shuffle): a
    // manifest covering one partition value gets tight field_summary
    // bounds, so Iceberg planning skips whole manifests — the
    // manifest-level analogue of the cell-bucketed ANN layout
    val clusteredFiles =
      if (partCols.isEmpty) snapshot.allFilesDS
      else snapshot.allFilesDS.repartition(
        org.apache.spark.sql.functions.col("partitionValues")
          .getItem(partCols.head._1))
    val summaries: Seq[IcebergManifestSummary] = clusteredFiles
      .mapPartitions { files =>
        val buf = files.toSeq
        if (buf.isEmpty) Iterator.empty
        else {
          val entrySchema = new org.apache.avro.Schema.Parser().parse(entrySchemaJson)
          val dfSchema = entrySchema.getField("data_file").schema()
          val pSchema = dfSchema.getField("partition").schema()
          val statsMapper = new ObjectMapper()
          def mapArraySchema(field: String): org.apache.avro.Schema =
            dfSchema.getField(field).schema().getTypes.asScala
              .find(_.getType == org.apache.avro.Schema.Type.ARRAY).get
          def kvArray(field: String,
              pairs: Seq[(Int, Any)]): GenericData.Array[GenericRecord] = {
            val arrS = mapArraySchema(field)
            val arr = new GenericData.Array[GenericRecord](pairs.length, arrS)
            pairs.foreach { case (k, v) =>
              val r = new GenericData.Record(arrS.getElementType)
              r.put("key", k)
              r.put("value", v)
              arr.add(r)
            }
            arr
          }
          val name = f"${java.util.UUID.randomUUID()}-m0.avro"
          val out = new Path(dirStr, name)
          val fs = out.getFileSystem(hconf.value)
          val stream = fs.create(out, true)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](entrySchema))
          w.create(entrySchema, stream)
          var rows = 0L
          var n = 0L
          // per-partition-column field_summary state
          val containsNull = Array.fill(partMeta.length)(false)
          val lo = Array.fill[Any](partMeta.length)(null)
          val hi = Array.fill[Any](partMeta.length)(null)
          def less(a: Any, b: Any): Boolean = (a, b) match {
            case (x: java.lang.Integer, y: java.lang.Integer) => x < y
            case (x: java.lang.Long, y: java.lang.Long) => x < y
            case (x: String, y: String) => x < y
            case _ => false
          }
          buf.foreach { a =>
            if (a.deletionVector != null)
              throw new UnsupportedOperationException(
                "Iceberg metadata cannot represent Delta deletion vectors; " +
                  "run OPTIMIZE (which materializes DVs) first")
            val rec = new GenericData.Record(entrySchema)
            rec.put("status", 1) // ADDED by this snapshot
            rec.put("snapshot_id", snapshotId)
            // null sequence numbers inherit from the manifest-list entry
            val df = new GenericData.Record(dfSchema)
            df.put("content", 0)
            df.put("file_path", FileNames.absolutePathString(
              new Path(dataRoot), a.path))
            df.put("file_format", "PARQUET")
            val p = new GenericData.Record(pSchema)
            partMeta.zipWithIndex.foreach { case ((pn, dt), i) =>
              val v = parsePartValue(dt, a.partitionValues.getOrElse(pn, null))
              if (v == null) containsNull(i) = true
              else {
                if (lo(i) == null || less(v, lo(i))) lo(i) = v
                if (hi(i) == null || less(hi(i), v)) hi(i) = v
              }
              p.put(pn, v)
            }
            df.put("partition", p)
            val rc = Stats.numRecords(a.stats).getOrElse(
              throw new IllegalStateException(
                s"Iceberg metadata requires numRecords stats; missing on ${a.path}"))
            df.put("record_count", rc)
            df.put("file_size_in_bytes", a.size)
            // per-file column stats from the Delta stats JSON: value
            // counts (top-level = record count), null counts, and typed
            // bounds in the single-value serialization — the inputs to
            // Iceberg's FILE-level skipping, completing the chain
            // manifest-list summary -> manifest entry -> data file
            if (a.stats != null && a.stats.nonEmpty && statsCols.nonEmpty) {
              val st = statsMapper.readTree(a.stats)
              df.put("value_counts",
                kvArray("value_counts", statsCols.map(c => (c._3, rc: Any))))
              val nulls = Option(st.get("nullCount"))
              if (nulls.nonEmpty)
                df.put("null_value_counts", kvArray("null_value_counts",
                  statsCols.flatMap { case (nme, _, id) =>
                    Option(nulls.get.get(nme)).filter(_.isNumber)
                      .map(n => (id, n.asLong: Any))
                  }))
              def bounds(key: String): Seq[(Int, Any)] =
                Option(st.get(key)).toSeq.flatMap { b =>
                  statsCols.flatMap { case (nme, dt, id) =>
                    statBound(dt, b.get(nme))
                      .map(bs => (id, java.nio.ByteBuffer.wrap(bs): Any))
                  }
                }
              val lows = bounds("minValues")
              if (lows.nonEmpty) df.put("lower_bounds", kvArray("lower_bounds", lows))
              val highs = bounds("maxValues")
              if (highs.nonEmpty) df.put("upper_bounds", kvArray("upper_bounds", highs))
            }
            rec.put("data_file", df)
            w.append(rec)
            rows += rc
            n += 1
          }
          w.close()
          val len = fs.getFileStatus(out).getLen
          val sums = partMeta.indices.map { i =>
            (containsNull(i),
              Option(lo(i)).map(v => boundBytes(partMeta(i)._2, v)),
              Option(hi(i)).map(v => boundBytes(partMeta(i)._2, v)))
          }
          Iterator(IcebergManifestSummary(out.toString, len, n, rows, sums))
        }
      }.collect().toSeq

    // ---- manifest list (driver: O(#manifests) rows)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val listName = f"snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    val listPath = new Path(dir, listName)
    val listSchema = new org.apache.avro.Schema.Parser().parse(manifestListSchemaJson)
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, fs.create(listPath, true))
    summaries.foreach { m =>
      val rec = new GenericData.Record(listSchema)
      rec.put("manifest_path", m.path)
      rec.put("manifest_length", m.length)
      rec.put("partition_spec_id", 0)
      rec.put("content", 0)
      rec.put("sequence_number", seqNum)
      rec.put("min_sequence_number", seqNum)
      rec.put("added_snapshot_id", snapshotId)
      rec.put("added_files_count", m.fileCount.toInt)
      rec.put("existing_files_count", 0)
      rec.put("deleted_files_count", 0)
      rec.put("added_rows_count", m.rowCount)
      rec.put("existing_rows_count", 0L)
      rec.put("deleted_rows_count", 0L)
      // field_summary per identity-partition column: planning can skip
      // this whole manifest when a partition predicate falls outside
      // [lower, upper] — never opening it
      if (partCols.nonEmpty) {
        val arrSchema = listSchema.getField("partitions").schema()
          .getTypes.asScala
          .find(_.getType == org.apache.avro.Schema.Type.ARRAY).get
        val elemSchema = arrSchema.getElementType
        val arr = new GenericData.Array[GenericRecord](
          m.partSummaries.length, arrSchema)
        m.partSummaries.foreach { case (cn, lob, hib) =>
          val r = new GenericData.Record(elemSchema)
          r.put("contains_null", cn)
          r.put("lower_bound", lob.map(java.nio.ByteBuffer.wrap).orNull)
          r.put("upper_bound", hib.map(java.nio.ByteBuffer.wrap).orNull)
          arr.add(r)
        }
        rec.put("partitions", arr)
      }
      lw.append(rec)
    }
    lw.close()

    // ---- table metadata JSON (v2), accumulating the snapshot log of a
    // previous generation when one exists
    val hintPath = new Path(dir, "version-hint.text")
    val prev: Option[com.fasterxml.jackson.databind.JsonNode] =
      if (!fs.exists(hintPath)) None
      else {
        val prevN = new String(readAll(fs, hintPath), StandardCharsets.UTF_8).trim.toLong
        val prevMeta = new Path(dir, s"v$prevN.metadata.json")
        if (fs.exists(prevMeta)) Some(mapper.readTree(readAll(fs, prevMeta)))
        else None
      }
    val now = log.clock.nowMillis
    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", md.id)
    root.put("location", dataRoot)
    root.put("last-sequence-number", seqNum)
    root.put("last-updated-ms", now)
    root.put("last-column-id", lastColumnId)
    root.put("current-schema-id", 0)
    root.putArray("schemas").add(schemaJson)
    root.put("default-spec-id", 0)
    val specs = root.putArray("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", 0)
    val sfs = spec.putArray("fields")
    partCols.zipWithIndex.foreach { case ((n, _, srcId), i) =>
      val f = sfs.addObject()
      f.put("name", n)
      f.put("transform", "identity")
      f.put("source-id", srcId)
      f.put("field-id", 1000 + i)
    }
    root.put("last-partition-id", if (partCols.isEmpty) 999 else 999 + partCols.length)
    root.put("default-sort-order-id", 0)
    val so = root.putArray("sort-orders").addObject()
    so.put("order-id", 0)
    so.putArray("fields")
    // name mapping (Iceberg spec: `schema.name-mapping.default`): the
    // parquet files were written by the DELTA path, so their footers
    // carry field ids only in column-mapping id mode, and under name
    // mode their physical column names are UUIDs — the name mapping
    // resolves PARQUET names to the schema field ids, which is how a
    // reader binds imported files in both cases
    val props = root.putObject("properties")
    props.put("schema.name-mapping.default",
      mapper.writeValueAsString(nameMapping))
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    // re-generating the SAME version (manual call + the post-commit
    // hook) must replace its snapshot entry, not duplicate it
    prev.foreach(_.get("snapshots").elements().asScala
      .filter(_.get("snapshot-id").asLong != snapshotId)
      .foreach(snaps.add))
    val sn = snaps.addObject()
    sn.put("snapshot-id", snapshotId)
    sn.put("sequence-number", seqNum)
    sn.put("timestamp-ms", now)
    // summary.operation from the Delta commit that produced this
    // snapshot: append for pure additions, replace for compaction
    // (rewrites with identical logical content), delete for TRUNCATE,
    // overwrite for everything that can change or remove rows —
    // the conservative bucket an incremental consumer must re-scan
    val ci = log.commitInfoAt(version)
    val deltaOp = ci.map(_.operation).getOrElse(Op.Write)
    val overwriteMode = ci.exists(_.operationParameters.get("mode")
      .exists(_.toLowerCase.contains("overwrite")))
    val icebergOp = deltaOp match {
      case Op.Write | Op.StreamingUpdate if overwriteMode => "overwrite"
      case Op.Write | Op.StreamingUpdate | Op.CopyInto | Op.CreateTable => "append"
      case o if o.startsWith(Op.Optimize) => "replace"
      case Op.Truncate => "delete"
      case _ => "overwrite"
    }
    sn.putObject("summary").put("operation", icebergOp)
    sn.put("manifest-list", listPath.toString)
    sn.put("schema-id", 0)
    val slog = root.putArray("snapshot-log")
    prev.foreach(p => Option(p.get("snapshot-log"))
      .foreach(_.elements().asScala
        .filter(_.get("snapshot-id").asLong != snapshotId)
        .foreach(slog.add)))
    val sl = slog.addObject()
    sl.put("timestamp-ms", now)
    sl.put("snapshot-id", snapshotId)
    root.putArray("metadata-log")

    val n = version + 1
    writeAll(fs, new Path(dir, s"v$n.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    // MONOTONIC hint: two near-simultaneous post-commit generations race
    // here — a slower OLDER one must not move the Iceberg view backwards
    // past a newer snapshot (its v<N>.metadata.json stays on disk, just
    // not pointed at; the next commit regenerates the full chain anyway)
    val existingHint =
      if (!fs.exists(hintPath)) -1L
      else try new String(readAll(fs, hintPath), StandardCharsets.UTF_8).trim.toLong
      catch { case scala.util.control.NonFatal(_) => -1L }
    if (n > existingHint)
      writeAll(fs, hintPath, n.toString.getBytes(StandardCharsets.UTF_8))
    n
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeAll(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }
}
