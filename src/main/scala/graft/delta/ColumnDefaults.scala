package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField}

/** Column DEFAULT values (public Delta table feature
  * `allowColumnDefaults`, writer-only): a field whose metadata carries
  * `CURRENT_DEFAULT = <sql>` is filled from that expression whenever a
  * write batch OMITS the column. A batch that supplies the column wins —
  * defaults are a convenience, not a constraint (contrast
  * [[GeneratedColumns]], which enforce equality with their expression).
  *
  * Scope matches the spec's writer obligation: defaults apply at WRITE
  * time only, so they are declared on table creation (or attached to an
  * EXISTING column via [[DeltaTable.setColumnDefault]], which affects
  * only future writes — every live file already materializes the
  * column). Defaults on columns added by schema evolution are rejected:
  * files written before the column existed would need a read-time
  * `EXISTS_DEFAULT` fill, which this engine does not implement — the
  * failure is loud, never a silent null.
  */
object ColumnDefaults {

  /** Field-metadata key (delta-spark convention). */
  val CurrentKey = "CURRENT_DEFAULT"

  val FeatureName = "allowColumnDefaults"

  /** name -> default SQL for every defaulted column of the table. */
  def defaults(md: Metadata): Map[String, String] =
    md.schema.fields.filter(_.metadata.contains(CurrentKey))
      .map(f => f.name -> f.metadata.getString(CurrentKey)).toMap

  /** A schema field declaring a DEFAULT (helper for CREATE). */
  def field(name: String, dt: DataType, defaultSql: String,
      nullable: Boolean = true): StructField =
    StructField(name, dt, nullable,
      new MetadataBuilder().putString(CurrentKey, defaultSql).build())

  /** `df` with every defaulted column the batch omitted filled from its
    * expression, reordered to the table schema when complete.
    */
  def complete(df: DataFrame, md: Metadata): DataFrame = {
    val ds = defaults(md)
    if (ds.isEmpty) return df
    val filled = ds.toSeq.sortBy(_._1).foldLeft(df) { case (d, (name, sql)) =>
      if (d.columns.contains(name)) d
      else d.withColumn(name, expr(sql).cast(md.schema(name).dataType))
    }
    if (md.schema.fieldNames.forall(filled.columns.contains) &&
        filled.columns.length == md.schema.fields.length)
      filled.select(md.schema.fieldNames.map(col).toSeq: _*)
    else filled
  }
}
