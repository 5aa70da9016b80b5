package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A write violated a CHECK constraint or NOT NULL invariant. Raised by
  * the write path (see [[Constraints.enforce]]) so callers get one typed
  * error regardless of where Spark evaluated the violating row — in the
  * write job on an executor, or on the driver when the optimizer folds a
  * local relation (`ConvertToLocalRelation`) at plan time.
  */
final class ConstraintViolationException(message: String)
  extends RuntimeException(message)

/** CHECK constraints and NOT NULL column invariants.
  *
  * Constraints are stored in table configuration under the open Delta
  * convention `delta.constraints.<name> = <sql expression>` (the
  * reference's `config.go` surface carries table configuration; the
  * constraint keys themselves follow the public Delta constraints
  * protocol). NOT NULL invariants come from `nullable = false` fields in
  * the table schema.
  *
  * Enforcement is a filter FUSED INTO THE WRITE PASS: each row evaluates
  * `CASE WHEN <constraint> THEN true ELSE raise_error(...) END`, so a
  * violating write fails fast inside the same Spark job that writes the
  * parquet — no second scan of the input, which matters when the input
  * is a 100 TB shuffle output. SQL CHECK semantics: a NULL predicate
  * result passes; only FALSE violates.
  */
object Constraints {

  val Prefix = "delta.constraints."

  /** Marker embedded in `raise_error` messages so [[unwrap]] can recognize
    * a constraint violation anywhere in a Spark exception cause chain.
    */
  private val Sentinel = "[GRAFT_CONSTRAINT] "

  /** The [[ConstraintViolationException]] buried in `t`'s cause chain, if
    * the failure originated from an enforcement `raise_error`.
    */
  def unwrap(t: Throwable): Option[ConstraintViolationException] = {
    var cur = t
    while (cur != null) {
      val m = cur.getMessage
      if (m != null && m.contains(Sentinel))
        return Some(new ConstraintViolationException(
          m.substring(m.indexOf(Sentinel) + Sentinel.length)))
      cur = cur.getCause
    }
    None
  }

  /** name -> SQL expression for every CHECK constraint on the table. */
  def fromMetadata(md: Metadata): Map[String, String] =
    md.configuration.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }

  /** The enforcement predicates for `md`: CHECK constraints plus NOT NULL
    * invariants, each paired with a human-readable violation message.
    */
  private def checks(md: Metadata): Seq[(Column, String)] = {
    val constraints = fromMetadata(md).toSeq.sortBy(_._1).map { case (name, sql) =>
      (coalesce(expr(sql), lit(true)),
        s"${Sentinel}CHECK constraint $name ($sql) violated by row")
    }
    val notNulls = md.schema.fields.filterNot(_.nullable).toSeq.map { f =>
      (col(f.name).isNotNull,
        s"${Sentinel}NOT NULL constraint violated for column ${f.name}")
    }
    // a supplied generated column must equal its generation expression
    val generated = GeneratedColumns.expressions(md).toSeq.sortBy(_._1).map {
      case (name, sql) =>
        (col(name) <=> expr(sql).cast(md.schema(name).dataType),
          s"${Sentinel}generated column $name does not match its expression ($sql)")
    }
    // LEGACY writer-v2 column invariants (public Delta PROTOCOL.md):
    // field metadata `delta.invariants` carries
    // {"expression":{"expression":"<sql>"}}; a conforming writer must
    // reject violating rows. Foreign tables (old delta-standalone
    // writers) still carry these, so accepting writer v2 without
    // enforcing them would let us corrupt someone else's contract.
    // The protocol allows invariants on NESTED struct fields (the
    // PROTOCOL.md example is `x.y < 3` declared on field x.y, with the
    // expression already path-qualified from the root), so the walk
    // must recurse — a top-level-only scan would silently skip nested
    // invariants while still advertising writer-v2 support.
    val legacy = legacyInvariants(md.schema).map { case (path, sql) =>
      (coalesce(expr(sql), lit(true)),
        s"${Sentinel}column invariant on $path ($sql) violated by row")
    }
    constraints ++ notNulls ++ generated ++ legacy
  }

  val InvariantsKey = "delta.invariants"

  /** Every (dotted field path, invariant SQL) in `schema`, including
    * invariants declared on nested struct fields. The stored expression
    * is already qualified from the root per the protocol, so collection
    * only needs the path for the violation message.
    */
  private[delta] def legacyInvariants(
      schema: org.apache.spark.sql.types.StructType): Seq[(String, String)] = {
    import org.apache.spark.sql.types.{StructField, StructType}
    def walk(fields: Seq[StructField], prefix: Seq[String]): Seq[(String, String)] =
      fields.flatMap { f =>
        val path = prefix :+ f.name
        val here =
          if (f.metadata.contains(InvariantsKey))
            legacyInvariantSql(f.metadata.getString(InvariantsKey))
              .map(sql => path.mkString(".") -> sql).toSeq
          else Seq.empty
        val nested = f.dataType match {
          case st: StructType => walk(st.fields.toSeq, path)
          case _              => Seq.empty
        }
        here ++ nested
      }
    walk(schema.fields.toSeq, Nil)
  }

  /** The SQL expression inside the legacy invariant JSON, if parseable.
    * Unparseable payloads fail loudly — silently skipping an invariant
    * we claimed (via writer v2) to enforce would be a protocol lie.
    */
  private[delta] def legacyInvariantSql(json: String): Option[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val e = node.path("expression").path("expression")
    if (e.isTextual) Some(e.asText())
    else throw new IllegalArgumentException(
      s"unsupported delta.invariants payload: $json")
  }

  /** Wrap `df` so that writing it enforces every constraint of `md`.
    * No-op (same plan) when the table has no constraints and no
    * non-nullable columns.
    */
  def enforce(df: DataFrame, md: Metadata): DataFrame = {
    val cs = checks(md)
    if (cs.isEmpty) df
    else {
      // [[graft.functions.PinnedTrue]] is always true but declared
      // NON-DETERMINISTIC, and it is embedded in EVERY guard: a
      // deterministic guard is fair game for conjunct-splitting
      // pushdown (below the filters selecting a MERGE branch, say) and
      // for FilterExec's own reordering (non-IsNotNull predicates run
      // before trailing IsNotNull conjuncts), either of which evaluates
      // the raise_error on rows that were about to be dropped — outer-
      // join phantom rows with nulls — and fails a perfectly valid
      // write. A non-deterministic guard cannot be split off, pushed, or
      // reordered, so it sees exactly the final written rows; the cost
      // is a literal `true` in codegen. (A plain `rand() <= 1.0` pin
      // does not survive: Spark 4 folds trivially-true rand compares.)
      val pin = org.apache.spark.sql.GraftShims
        .column(graft.functions.PinnedTrue())
      df.filter(cs.map { case (ok, msg) =>
        when(pin && ok, lit(true)).otherwise(raise_error(lit(msg)))
      }.reduce(_ && _))
    }
  }

  /** Wrap `df` so that writing it enforces `cond` on every row, with the
    * same pinned, non-reorderable raise_error guard as CHECK constraints
    * (see [[enforce]] for why the pin matters). Used by replaceWhere:
    * enforcement runs INSIDE the write job — no separate validation scan,
    * and a non-deterministic source cannot pass validation yet write
    * violating rows.
    */
  def enforcePredicate(df: DataFrame, cond: org.apache.spark.sql.Column,
      desc: String): DataFrame = {
    val pin = org.apache.spark.sql.GraftShims
      .column(graft.functions.PinnedTrue())
    df.filter(
      when(pin && coalesce(cond, lit(false)), lit(true))
        .otherwise(raise_error(lit(Sentinel + desc))))
  }

  /** Column names referenced by a constraint SQL expression (used to
    * reject RENAME/DROP of a constrained column).
    */
  def referencedColumns(spark: org.apache.spark.sql.SparkSession, sql: String): Set[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    spark.sessionState.sqlParser.parseExpression(sql)
      .collect { case a: UnresolvedAttribute => a.name }
      .toSet
  }
}
