package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata => FieldMetadata, MetadataBuilder, StructField, StructType}

/** Column mapping (`delta.columnMapping.mode = name`): every field carries
  * a stable PHYSICAL name (the column name inside parquet files) separate
  * from its logical name, so RENAME and DROP COLUMN are metadata-only
  * commits — no data file is rewritten, and a column re-added under an
  * old name gets a fresh physical id instead of resurrecting old data.
  * Field keys follow the open Delta convention
  * (`delta.columnMapping.physicalName` / `.id`); partition columns keep
  * physical == logical here (renaming them would re-key the on-disk
  * directory layout — rejected).
  */
object ColumnMapping {

  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val IdKey = "delta.columnMapping.id"

  def enabled(md: Metadata): Boolean =
    DeltaConfig.ColumnMappingMode.fromMetadata(md) == "name"

  /** Reject modes this reader does not resolve rather than silently
    * reading wrong columns: `id` mapping keys parquet fields by field id,
    * which the name-keyed scan path here would mis-resolve.
    */
  def assertSupported(md: Metadata): Unit = {
    val mode = DeltaConfig.ColumnMappingMode.fromMetadata(md)
    if (mode != "none" && mode != "name")
      throw new UnsupportedOperationException(
        s"delta.columnMapping.mode=$mode is not supported (only 'none' and 'name')")
  }

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

  /** The schema as written in parquet files: physical field names. */
  def physicalSchema(md: Metadata): StructType =
    if (!enabled(md)) md.schema
    else StructType(md.schema.fields.map(f => f.copy(name = physicalName(f))))

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
  def ensureEnabled(md: Metadata): Metadata = {
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
      configuration = md.configuration + ("delta.columnMapping.mode" -> "name"))
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
