package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata => FieldMetadata, MetadataBuilder, StructField, StructType}

/** Column mapping (`delta.columnMapping.mode = name | id`): every field
  * carries a stable PHYSICAL name (the column name inside parquet files)
  * separate from its logical name, so RENAME and DROP COLUMN are
  * metadata-only commits — no data file is rewritten, and a column
  * re-added under an old name gets a fresh physical id instead of
  * resurrecting old data. Field keys follow the open Delta convention
  * (`delta.columnMapping.physicalName` / `.id`); partition columns keep
  * physical == logical here (renaming them would re-key the on-disk
  * directory layout — rejected).
  *
  * `id` mode resolves parquet columns by FIELD ID rather than physical
  * name, via Spark's native parquet field-id resolution: the read schema
  * carries `parquet.field.id` (= the Delta columnMapping id) and
  * `spark.sql.parquet.fieldId.read.enabled` is switched on for the scan;
  * written files stamp the same ids into their footers
  * (fieldId.write.enabled is on by default), so files written by another
  * engine under different physical names still resolve correctly.
  */
object ColumnMapping {

  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val IdKey = "delta.columnMapping.id"
  /** Spark's ParquetUtils.FIELD_ID_METADATA_KEY. */
  val ParquetFieldIdKey = "parquet.field.id"

  def mode(md: Metadata): String =
    DeltaConfig.ColumnMappingMode.fromMetadata(md)

  def enabled(md: Metadata): Boolean = mode(md) match {
    case "name" | "id" => true
    case _ => false
  }

  /** Reject unknown modes rather than silently reading wrong columns. */
  def assertSupported(md: Metadata): Unit = {
    val m = mode(md)
    if (m != "none" && m != "name" && m != "id")
      throw new UnsupportedOperationException(
        s"delta.columnMapping.mode=$m is not supported (only 'none', 'name', 'id')")
  }

  /** Flip on Spark's field-id parquet resolution before planning a scan
    * of an id-mode table. Session-wide but inert elsewhere: it only
    * changes resolution for read schemas that carry `parquet.field.id`,
    * which this engine attaches exclusively for id-mode tables.
    */
  def prepareRead(spark: org.apache.spark.sql.SparkSession, md: Metadata): Unit =
    if (mode(md) == "id")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** logical -> physical for every field where they differ. */
  def mapping(md: Metadata): Map[String, String] =
    if (!enabled(md)) Map.empty
    else md.schema.fields
      .map(f => f.name -> physicalName(f))
      .filter { case (l, p) => l != p }
      .toMap

  /** The schema as requested from parquet files: physical field names,
    * plus `parquet.field.id` per field in id mode so the reader matches
    * by id and the writer stamps ids into footers.
    */
  def physicalSchema(md: Metadata): StructType =
    if (!enabled(md)) md.schema
    else {
      val idMode = mode(md) == "id"
      StructType(md.schema.fields.map { f =>
        val named = f.copy(name = physicalName(f))
        if (idMode && f.metadata.contains(IdKey))
          named.copy(metadata = new MetadataBuilder().withMetadata(named.metadata)
            .putLong(ParquetFieldIdKey, f.metadata.getLong(IdKey)).build())
        else named
      })
    }

  /** logical name -> (physical name, metadata to stamp on the written
    * column). Non-empty exactly when files need renaming or id stamping.
    */
  def writeAliases(md: Metadata): Map[String, (String, FieldMetadata)] =
    if (!enabled(md)) Map.empty
    else if (mode(md) != "id") mapping(md).map { case (l, p) => l -> (p, FieldMetadata.empty) }
    else md.schema.fields.map { f =>
      val meta =
        if (f.metadata.contains(IdKey))
          new MetadataBuilder().putLong(ParquetFieldIdKey, f.metadata.getLong(IdKey)).build()
        else FieldMetadata.empty
      f.name -> (physicalName(f), meta)
    }.toMap

  /** Rename a logical-named frame to physical names for WRITING (data
    * and CDC files must agree byte-for-byte on column naming — the
    * property CDF-across-rename depends on); id mode also stamps
    * parquet.field.id metadata. No-op without column mapping.
    */
  def toPhysicalForWrite(md: Metadata, df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val aliases = writeAliases(md)
    if (aliases.isEmpty) df
    else df.select(df.columns.map { c =>
      aliases.get(c) match {
        case Some((p, m)) => org.apache.spark.sql.functions.col(c).as(p, m)
        case None => org.apache.spark.sql.functions.col(c)
      }
    }.toSeq: _*)
  }

  /** Project a physical-named scan back to logical names; `extra` columns
    * (e.g. DV row-identity keys) pass through.
    */
  def toLogical(md: Metadata, df: DataFrame, extra: Seq[String] = Nil): DataFrame =
    if (!enabled(md)) df
    else df.select(md.schema.fields.map(f =>
      col(physicalName(f)).as(f.name)).toSeq ++ extra.map(col): _*)

  /** Metadata with mapping enabled: mode set and every field annotated
    * with its physical name (current name) and a stable id. Idempotent.
    */
  def ensureEnabled(md: Metadata, targetMode: String = "name"): Metadata = {
    require(targetMode == "name" || targetMode == "id",
      s"columnMapping mode must be 'name' or 'id', got $targetMode")
    if (enabled(md) &&
        md.schema.fields.forall(_.metadata.contains(PhysicalNameKey))) return md
    var nextId = md.schema.fields
      .filter(_.metadata.contains(IdKey))
      .map(_.metadata.getLong(IdKey)).foldLeft(0L)(math.max) + 1
    val fields = md.schema.fields.map { f =>
      if (f.metadata.contains(PhysicalNameKey)) f
      else {
        val id = nextId; nextId += 1
        f.copy(metadata = annotate(f.metadata, f.name, id))
      }
    }
    md.copy(
      schemaString = StructType(fields).json,
      configuration = md.configuration + ("delta.columnMapping.mode" -> targetMode))
  }

  /** A fresh field for a column added AFTER mapping was enabled: a new
    * physical id, never a reused name — old parquet data stays invisible.
    */
  def freshField(f: StructField, usedIds: Long): StructField =
    f.copy(metadata = annotate(
      f.metadata, s"col-${java.util.UUID.randomUUID}", usedIds + 1))

  def maxId(schema: StructType): Long =
    schema.fields.filter(_.metadata.contains(IdKey))
      .map(_.metadata.getLong(IdKey)).foldLeft(0L)(math.max)

  private def annotate(m: FieldMetadata, physical: String, id: Long): FieldMetadata =
    new MetadataBuilder().withMetadata(m)
      .putString(PhysicalNameKey, physical)
      .putLong(IdKey, id)
      .build()
}
