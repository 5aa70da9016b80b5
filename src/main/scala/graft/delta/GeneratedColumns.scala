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

/** Partition-filter derivation from generated partition columns
  * (delta-spark's OptimizeGeneratedColumn, re-expressed over the graft
  * scan): a query filtering on `ts` against a table partitioned by
  * `p_date = CAST(ts AS DATE)` should prune partitions, but the filter
  * never mentions `p_date` — so without derivation the scan reads every
  * partition and discards rows in the parquet reader. For a WHITELISTED
  * set of monotone non-decreasing generation shapes, each data-column
  * comparison implies a partition-column comparison:
  *
  *   d =  L  ==>  g =  E(L)
  *   d <= L  ==>  g <= E(L)      d <  L  ==>  g <= E(L)
  *   d >= L  ==>  g >= E(L)      d >  L  ==>  g >= E(L)
  *   d IN (L...)                 ==>  g IN (E(L)...)
  *
  * (strict bounds widen to non-strict because E collapses values). The
  * derived conjunct is EXTRA pruning on top of the untouched residual,
  * so a shape outside the whitelist simply derives nothing — it can
  * never change results, only skip I/O. Null semantics are safe: for
  * these shapes g is null iff d is null, and d-null rows fail the data
  * comparison anyway.
  *
  * Whitelist (all monotone by construction): CAST(d AS DATE),
  * to_date(d), year(d), date_trunc(unit, d) / trunc(d, unit),
  * floor(d / N) for literal N > 0, substring(d, 1, n) (lexicographic
  * prefix order).
  */
object GeneratedPartitionFilters {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.catalyst.expressions.{
    Alias, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression,
    Floor, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual,
    Literal, Substring, Year}
  import org.apache.spark.sql.catalyst.plans.logical.Project
  import org.apache.spark.sql.types.{DateType, StringType}
  import org.apache.spark.sql.GraftShims

  /** The analyzed generation expression of `sql` against the data
    * schema, when it matches a whitelisted monotone shape over exactly
    * one base column: (base column name, evaluator literal->literal).
    */
  private def monotoneShape(spark: SparkSession, md: Metadata,
      sql: String): Option[(String, Expression)] = {
    val analyzed =
      try {
        val df = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), md.schema)
          .selectExpr(sql)
        df.queryExecution.analyzed.asInstanceOf[Project]
          .projectList.head match {
            case Alias(child, _) => child
            case e => e
          }
      } catch { case _: Exception => return None }
    // SOUNDNESS: the date-family shapes (cast-to-date, year, trunc) are
    // monotone only when the BASE column already orders temporally — a
    // STRING base would be compared lexicographically by the data filter
    // while the generated value follows parsed-date order, and non-ISO
    // strings break the correspondence (deriving would prune wrong).
    def temporal(dt: DataType): Boolean = dt match {
      case DateType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    def base(e: Expression): Option[String] = e match {
      case a: AttributeReference if temporal(a.dataType) => Some(a.name)
      case Cast(a: AttributeReference, DateType, _, _)
          if temporal(a.dataType) => Some(a.name)
      case _ => None
    }
    val ok = analyzed match {
      case Cast(a: AttributeReference, DateType, _, _)
          if temporal(a.dataType) => Some(a.name)
      case Year(inner) => base(inner)
      case t if t.getClass.getSimpleName == "TruncTimestamp" ||
          t.getClass.getSimpleName == "TruncDate" =>
        // date_trunc(unit, d) / trunc(d, unit): a floor for every unit,
        // hence monotone; the base column is the sole attribute child
        val attrs = t.references.toSeq
        if (attrs.size == 1 && temporal(attrs.head.dataType))
          Some(attrs.head.name)
        else None
      case Floor(div) =>
        // floor(id / 100) analyzes as FLOOR(CAST(id AS DOUBLE) /
        // CAST(100 AS DOUBLE)) — widening casts are monotone, strip them
        def strip(e: Expression): Expression = e match {
          case Cast(c, _, _, _) => strip(c)
          case other => other
        }
        strip(div) match {
          case org.apache.spark.sql.catalyst.expressions.Divide(num, den, _) =>
            (strip(num), strip(den)) match {
              case (a: AttributeReference, Literal(n: Number, _))
                  if n.doubleValue() > 0 => Some(a.name)
              case _ => None
            }
          case _ => None
        }
      case Substring(a: AttributeReference, Literal(pos: Integer, _), Literal(_, _))
          if pos == 1 && a.dataType == StringType => Some(a.name)
      case _ => None
    }
    ok.map(_ -> analyzed)
  }

  /** E(lit): substitute the base attribute with the literal and fold. */
  private def evalAt(gen: Expression, lit: Literal): Option[Literal] =
    try {
      val substituted = gen.transform {
        case _: AttributeReference => lit
      }
      Some(Literal(substituted.eval(null), gen.dataType))
    } catch { case _: Exception => None }

  /** Derived partition-pruning Columns implied by `dataFilters`. */
  def derive(spark: SparkSession, md: Metadata,
      dataFilters: Seq[Expression]): Seq[Column] = {
    val partSet = md.partitionColumns.toSet
    val partGens = GeneratedColumns.expressions(md)
      .filter { case (name, _) => partSet.contains(name) }
    if (partGens.isEmpty || dataFilters.isEmpty) return Nil
    val resolver = spark.sessionState.conf.resolver
    // ANALYZED (not optimized) conjuncts still carry constant
    // sub-expressions unfolded (`ts >= to_timestamp('...')` is a Cast
    // around a Literal) — fold any reference-free deterministic side so
    // the comparison patterns below see plain Literals
    val folded = dataFilters.map(_.transformUp {
      case e if !e.isInstanceOf[Literal] && e.resolved &&
          e.references.isEmpty && e.deterministic =>
        // RuntimeReplaceable (to_timestamp, to_date, ...) cannot eval
        // directly — fold through its replacement expression; anything
        // that still fails to eval just stays unfolded (no derivation)
        val target = e match {
          case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
            r.replacement
          case other => other
        }
        try Literal(target.eval(null), e.dataType) catch { case _: Throwable => e }
    })
    partGens.toSeq.sortBy(_._1).flatMap { case (g, sql) =>
      monotoneShape(spark, md, sql) match {
        case None => Nil
        case Some((d, gen)) =>
          def gcol = org.apache.spark.sql.functions.col(g)
          def lcol(l: Literal): Option[Column] =
            if (l.value == null) None
            else evalAt(gen, l).map(GraftShims.column(_))
          def isBase(e: Expression): Boolean = e match {
            case a: AttributeReference => resolver(a.name, d)
            case _ => false
          }
          folded.flatMap {
            case EqualTo(a, l: Literal) if isBase(a) => lcol(l).map(gcol === _)
            case EqualTo(l: Literal, a) if isBase(a) => lcol(l).map(gcol === _)
            case EqualNullSafe(a, l: Literal) if isBase(a) && l.value != null =>
              lcol(l).map(gcol === _)
            case LessThan(a, l: Literal) if isBase(a) => lcol(l).map(gcol <= _)
            case LessThanOrEqual(a, l: Literal) if isBase(a) => lcol(l).map(gcol <= _)
            case GreaterThan(a, l: Literal) if isBase(a) => lcol(l).map(gcol >= _)
            case GreaterThanOrEqual(a, l: Literal) if isBase(a) => lcol(l).map(gcol >= _)
            // literal-on-the-left forms flip the bound
            case LessThan(l: Literal, a) if isBase(a) => lcol(l).map(gcol >= _)
            case LessThanOrEqual(l: Literal, a) if isBase(a) => lcol(l).map(gcol >= _)
            case GreaterThan(l: Literal, a) if isBase(a) => lcol(l).map(gcol <= _)
            case GreaterThanOrEqual(l: Literal, a) if isBase(a) => lcol(l).map(gcol <= _)
            case In(a, vs) if isBase(a) && vs.nonEmpty &&
                vs.forall(v => v.isInstanceOf[Literal] &&
                  v.asInstanceOf[Literal].value != null) =>
              val mapped = vs.map(v => evalAt(gen, v.asInstanceOf[Literal]))
              if (mapped.forall(_.isDefined))
                Some(GraftShims.column(In(
                  org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(g),
                  mapped.map(_.get))))
              else None
            case _ => None
          }
      }
    }
  }
}
