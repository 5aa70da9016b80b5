package graft.delta

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit, when}
import org.apache.spark.sql.types.{Metadata => _, _} // keep graft.delta.Metadata

/** Iceberg v3 default values, adopted (A85 × A64).
  *
  * Iceberg distinguishes two defaults per field (spec v3, "Default
  * values"): `write-default` fills the column when a WRITER omits it —
  * exactly Delta's `CURRENT_DEFAULT` (A64), imported as such — and
  * `initial-default` is a READ-time substitution: files written before
  * the field existed read the default, not null. Delta's parquet scan
  * null-fills missing columns and has no per-file default channel, so
  * the adoption records WHICH files physically lack each defaulted
  * column (one distributed footer check, only when defaults exist) as
  * an AddFile tag, and the read path coalesces exactly those files'
  * rows to the default via a broadcast of the tagged file list — a
  * null stored IN a file stays a null, matching Iceberg's per-file
  * rule. Tables carrying the tag request the `graftReadDefaults`
  * reader feature so a reader that would silently null-fill refuses
  * loudly instead.
  */
object ReadDefaults {

  /** AddFile tag: JSON array of PHYSICAL column names the file lacks —
    * physical names survive RENAME COLUMN, so the tag keeps applying
    * after a defaulted column is renamed (logical names would orphan
    * it and silently null-fill).
    */
  val MissingTag = "graft.convert.missingDefaults"

  /** Field-metadata key: the Iceberg single-value JSON default text. */
  val InitialKey = "graft.icebergInitialDefault"

  val FeatureName = "graftReadDefaults"

  def defaultedFields(md: Metadata): Seq[StructField] =
    md.schema.fields.filter(_.metadata.contains(InitialKey)).toSeq

  /** Spark literal for an Iceberg single-value JSON default (spec v3
    * single-value serialization). Unsupported shapes refuse loudly.
    */
  def defaultColumn(dt: DataType, jsonText: String): Column = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(jsonText)
    dt match {
      case BooleanType => lit(node.asBoolean)
      case ByteType | ShortType | IntegerType => lit(node.asInt).cast(dt)
      case LongType => lit(node.asLong)
      case FloatType => lit(node.floatValue())
      case DoubleType => lit(node.doubleValue())
      case StringType => lit(node.asText)
      case DateType => lit(java.sql.Date.valueOf(node.asText))
      case d: DecimalType =>
        lit(new java.math.BigDecimal(node.asText)).cast(d)
      case other => throw new UnsupportedOperationException(
        s"unsupported Iceberg default value $jsonText for type ${other.simpleString}")
    }
  }

  /** SQL literal for the same JSON default — the writer-side
    * CURRENT_DEFAULT translation (consumed by expr() in
    * [[ColumnDefaults.complete]]).
    */
  def sqlLiteral(dt: DataType, jsonText: String): String = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(jsonText)
    dt match {
      case BooleanType => node.asBoolean.toString
      case ByteType | ShortType | IntegerType | LongType => node.asLong.toString
      case FloatType | DoubleType =>
        val v = node.doubleValue()
        require(!v.isNaN && !v.isInfinite,
          s"non-finite Iceberg default $jsonText is not expressible as SQL")
        v.toString
      case StringType => "'" + node.asText.replace("'", "''") + "'"
      case DateType => s"DATE '${node.asText}'"
      case d: DecimalType =>
        s"CAST('${node.asText}' AS DECIMAL(${d.precision},${d.scale}))"
      case other => throw new UnsupportedOperationException(
        s"unsupported Iceberg default value $jsonText for type ${other.simpleString}")
    }
  }

  /** Iceberg single-value JSON for a FOLDABLE Spark SQL default
    * expression, or None when the expression isn't a plain literal
    * (write-default export is a writer-side convenience — omitting a
    * non-literal default is legal).
    */
  def jsonOfSql(dt: DataType, sql: String): Option[String] =
    try {
      val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sql)
      val e = org.apache.spark.sql.catalyst.expressions.Cast(
        parsed, dt, Some("UTC"))
      if (!parsed.resolved || !e.foldable) None
      else {
        val v = e.eval(null)
        if (v == null) return None
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        dt match {
          case BooleanType => Some(v.toString)
          case ByteType | ShortType | IntegerType | LongType => Some(v.toString)
          case FloatType | DoubleType =>
            // bare NaN/Infinity is not legal JSON — readTree on the
            // generator side would throw and fail every metadata
            // generation; omitting the default is legal
            val dv = v match {
              case f: java.lang.Float => f.doubleValue
              case dd: java.lang.Double => dd.doubleValue
              case o => o.toString.toDouble
            }
            if (dv.isNaN || dv.isInfinite) None else Some(v.toString)
          case StringType => Some(mapper.writeValueAsString(v.toString))
          case DateType => Some(mapper.writeValueAsString(
            java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString))
          case _: DecimalType => Some(mapper.writeValueAsString(
            v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toPlainString))
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Substitute initial-defaults into rows read from files that lack the
    * column physically. `key` must evaluate to the normalized absolute
    * file path of each row's source file (same form as
    * [[DeletionVectors.normFp]]); columns are addressed by PHYSICAL name
    * (the frame is pre-toLogical). The tagged list is broadcast —
    * O(#tagged files), the DV-descriptor contract.
    */
  def fill(spark: SparkSession, dataPath: Path, files: Seq[AddFile],
      md: Metadata, df: DataFrame, key: Column): DataFrame = {
    val defaulted = defaultedFields(md)
    if (defaulted.isEmpty) return df
    val tagged = files.filter(f =>
      Option(f.tags).exists(_.contains(MissingTag)))
    if (tagged.isEmpty) return df
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // same normalization as DeletionVectors.normFp so the key column
    // (__fp or normFp(_metadata.file_path)) matches exactly
    def norm(s: String): String = s.replaceFirst("^file:/+", "/")
    // tag lookup by PHYSICAL name — stable across RENAME COLUMN
    val names = defaulted.map(ColumnMapping.physicalName)
    val infoRows = tagged.map { f =>
      val missing = mapper.readTree(f.tags(MissingTag))
        .elements().asScala.map(_.asText).toSet
      Row.fromSeq(
        norm(FileNames.absolutePathString(dataPath, f.path)) +:
          names.map(n => Boolean.box(missing(n))))
    }
    val infoSchema = StructType(StructField("__df_fp", StringType) +:
      names.indices.map(i => StructField(s"__df_m$i", BooleanType)))
    val info = spark.createDataFrame(infoRows.asJava, infoSchema)
    var out = df.join(broadcast(info), key === col("__df_fp"), "left")
    defaulted.zipWithIndex.foreach { case (f, i) =>
      val phys = ColumnMapping.physicalName(f)
      out = out.withColumn(phys,
        when(col(s"__df_m$i") === true,
          defaultColumn(f.dataType, f.metadata.getString(InitialKey))
            .cast(f.dataType))
          .otherwise(col(phys)))
    }
    out.drop("__df_fp" +: names.indices.map(i => s"__df_m$i"): _*)
  }
}
