package graft.delta

import org.apache.spark.sql.types._

/** In-place column type widening — Delta's `typeWidening` reader+writer
  * table feature. A widened column keeps its already-written files in the
  * narrow physical type; readers promote at scan time (Spark's parquet
  * reader up-converts int8/16/32→int64, float→double, int→double and
  * decimal precision growth natively), so widening is a pure metadata
  * commit: no rewrite, O(1) at any table size.
  *
  * Each widening appends an entry to the field's `delta.typeChanges`
  * metadata (`{fromType, toType}`, the spec's record of the physical
  * types a reader may encounter), and the commit stamps the
  * `typeWidening` feature so pre-feature readers — which would read the
  * narrow physical values through the wrong schema — refuse the table.
  *
  * The reference engine's fixed-schema model has no counterpart; the
  * widening matrix follows the open Delta spec (lossless promotions
  * only).
  */
object TypeWidening {

  val FeatureName = "typeWidening"
  val TypeChangesKey = "delta.typeChanges"

  /** Lossless widening matrix: integral up-casts, float→double,
    * integral→double, and decimal growth that loses neither integral
    * digits nor scale.
    */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => false
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case _ => false
  }

  /** The field widened to `to`, with a `delta.typeChanges` entry
    * appended recording the promotion.
    */
  def widenField(f: StructField, to: DataType): StructField = {
    val entry = new MetadataBuilder()
      .putString("fromType", f.dataType.typeName)
      .putString("toType", to.typeName)
      .build()
    val prior: Array[Metadata] =
      if (f.metadata.contains(TypeChangesKey)) f.metadata.getMetadataArray(TypeChangesKey)
      else Array.empty
    val md = new MetadataBuilder().withMetadata(f.metadata)
      .putMetadataArray(TypeChangesKey, prior :+ entry)
      .build()
    f.copy(dataType = to, metadata = md)
  }
}
