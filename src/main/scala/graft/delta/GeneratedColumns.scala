package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField}

/** Generated columns (open Delta convention: a field whose metadata
  * carries `delta.generationExpression = <sql>`).
  *
  * Write semantics: a batch that OMITS a generated column gets it computed
  * from the expression inside the write pass (no second scan); a batch
  * that SUPPLIES one has the value null-safe-compared against the
  * expression by the same fused enforcement pass as CHECK constraints
  * (see [[Constraints.enforce]]) — a mismatch raises
  * [[ConstraintViolationException]] and nothing commits.
  *
  * The 100 TB use is derived PARTITION columns: declare e.g.
  * `order_year = year(o_orderdate)` as a partition column and every
  * append lands hive-partitioned by it, so scans filtering on
  * `order_year` prune at the log level without the writer ever supplying
  * the column.
  */
object GeneratedColumns {

  val ExprKey = "delta.generationExpression"

  /** name -> generation SQL for every generated column of the table. */
  def expressions(md: Metadata): Map[String, String] =
    md.schema.fields.filter(_.metadata.contains(ExprKey))
      .map(f => f.name -> f.metadata.getString(ExprKey)).toMap

  /** A schema field declaring a generated column (helper for CREATE). */
  def field(name: String, dt: DataType, genExpr: String,
      nullable: Boolean = true): StructField =
    StructField(name, dt, nullable,
      new MetadataBuilder().putString(ExprKey, genExpr).build())

  /** `df` with every generated column the batch omitted computed from its
    * expression, reordered to the table schema when complete. Columns the
    * batch supplied are left for [[Constraints.enforce]] to validate.
    */
  def complete(df: DataFrame, md: Metadata): DataFrame = {
    val gens = expressions(md)
    if (gens.isEmpty) return df
    val filled = gens.toSeq.sortBy(_._1).foldLeft(df) { case (d, (name, sql)) =>
      if (d.columns.contains(name)) d
      else d.withColumn(name, expr(sql).cast(md.schema(name).dataType))
    }
    // completion can append columns out of declaration order; restore it
    // when every table column is present (always true outside mergeSchema)
    if (md.schema.fieldNames.forall(filled.columns.contains) &&
        filled.columns.length == md.schema.fields.length)
      filled.select(md.schema.fieldNames.map(col).toSeq: _*)
    else filled
  }
}
