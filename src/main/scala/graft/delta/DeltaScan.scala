package graft.delta

import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partition-pruned file scan (cf. reference `scan.go:20` Scan,
  * `scan.go:201` filteredScan).
  *
  * The reference re-implements an expression interpreter over partition
  * values (`types/expr_*.go`); here the predicate is a Spark `Column`:
  * conjuncts touching only partition columns are "pushed" and evaluated by
  * Catalyst against the file-state DataFrame (partitionValues cast to the
  * partition schema); the rest is the "residual" the parquet reader
  * applies after pruning — mirroring InputPredicate / PushedPredicate /
  * ResidualPredicate on the reference Scan interface.
  */
final case class DeltaScan(snapshot: Snapshot, predicate: Option[Column]) {

  private val spark = snapshot.spark
  private val md = snapshot.metadataOpt
  private val partCols: Seq[String] = md.map(_.partitionColumns).getOrElse(Nil)
  private val schema: StructType = md.map(_.schema).getOrElse(StructType(Nil))

  /** (pushed, residual) conjuncts of the input predicate. */
  val (pushedPredicates, residualPredicates): (Seq[Column], Seq[Column]) =
    predicate match {
      case None => (Nil, Nil)
      case Some(p) => DeltaScan.splitPredicate(spark, schema, p, partCols.toSet)
    }

  def inputPredicate: Option[Column] = predicate
  def pushedPredicate: Option[Column] = pushedPredicates.reduceOption(_ && _)
  def residualPredicate: Option[Column] = residualPredicates.reduceOption(_ && _)

  /** Matching files as a DataFrame of AddFile rows (scales with the log). */
  lazy val filesDF: DataFrame = {
    val base = snapshot.activeFilesDF
    pushedPredicate match {
      case None => base
      case Some(p) =>
        // typed partition columns out of the string partitionValues map
        val typed = partCols.foldLeft(base) { (df, c) =>
          val dt = schema.fields.find(_.name == c)
            .map(_.dataType).getOrElse(org.apache.spark.sql.types.StringType)
          df.withColumn(c, element_at(col("partitionValues"), c).cast(dt))
        }
        typed.filter(p).drop(partCols: _*)
    }
  }

  /** Driver-side materialization (mirrors reference `Scan.Files`). */
  def files: Seq[AddFile] = {
    import spark.implicits._
    filesDF.as[AddFile].collect().toSeq
  }
}

object DeltaScan {

  /** Split into (pushed, residual) conjuncts: pushed = references only
    * partition columns (cf. reference `scan.go:209` newFilteredScan).
    *
    * Columns in Spark 4 carry lazy ColumnNode trees, so the predicate is
    * first resolved by the analyzer against an empty relation with the
    * table schema; the analyzed conjuncts are then un-resolved back into
    * portable Columns usable against any DataFrame with those names.
    */
  def splitPredicate(spark: SparkSession, schema: StructType, p: Column,
      partCols: Set[String]): (Seq[Column], Seq[Column]) = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val dummy = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val analyzed = dummy.filter(p).queryExecution.analyzed
    val cond = analyzed.collectFirst { case f: Filter => f.condition }
      .getOrElse(throw new IllegalArgumentException(s"cannot analyze predicate $p"))

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CatalystAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def unresolve(e: Expression): Expression = e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        UnresolvedAttribute(a.name)
    }
    val (pushed, residual) = conjuncts(cond)
      .partition(c => c.references.nonEmpty && c.references.map(_.name).toSet.subsetOf(partCols))
    (pushed.map(c => GraftShims.column(unresolve(c))),
      residual.map(c => GraftShims.column(unresolve(c))))
  }

  /** Evaluate a partition-only predicate against one file's partition
    * values (used by conflict checking on winning AddFiles).
    */
  def evalOnPartition(
      spark: SparkSession, pred: Column, partitionValues: Map[String, String],
      partCols: Seq[String], schema: StructType): Boolean = {
    val row = spark.range(1).select(partCols.map { c =>
      val dt = schema.fields.find(_.name == c)
        .map(_.dataType).getOrElse(org.apache.spark.sql.types.StringType)
      lit(partitionValues.getOrElse(c, null)).cast(dt).as(c)
    }: _*)
    row.filter(pred).count() > 0
  }
}
