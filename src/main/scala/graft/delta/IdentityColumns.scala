package graft.delta

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, Metadata => FieldMetadata, MetadataBuilder, StructField, StructType}

/** Identity columns (open Delta convention, writer version 6): a LONG
  * field whose metadata carries `delta.identity.start` / `.step` /
  * `.highWaterMark` / `.allowExplicitInsert`. A batch that omits the
  * column has values generated server-side — `hwm + step, hwm + 2*step,
  * …` in batch row order — and the commit advances the high-water mark
  * in the same transaction. GENERATED ALWAYS columns (the default)
  * reject batches that supply the column; `allowExplicitInsert = true`
  * accepts them and syncs the mark to the supplied extremum instead.
  *
  * Concurrency: the mark lives in table metadata, and metadata updates
  * conflict under the existing detection — two racing generating writers
  * cannot both commit, the loser retries against the winner's mark and
  * re-generates, so duplicate identities are impossible without any new
  * locking.
  *
  * Scale shape: generation is `zipWithIndex` over the batch — one extra
  * metadata-sized Spark job to learn per-partition counts, then per-row
  * distributed assignment; the mark advance is arithmetic on the row
  * count (no scan). Explicit-insert sync is a single min/max aggregate.
  * Values are unique and step-aligned but may show gaps after retries or
  * overwrites, exactly the open-format contract.
  */
object IdentityColumns {

  val StartKey = "delta.identity.start"
  val StepKey = "delta.identity.step"
  val HighWaterMarkKey = "delta.identity.highWaterMark"
  val AllowExplicitKey = "delta.identity.allowExplicitInsert"

  final case class Spec(name: String, start: Long, step: Long,
      highWaterMark: Option[Long], allowExplicitInsert: Boolean)

  def specs(md: Metadata): Seq[Spec] =
    if (md == null || md.schemaString == null) Nil
    else md.schema.fields.filter(_.metadata.contains(StartKey)).toSeq.map { f =>
      val m = f.metadata
      Spec(f.name, m.getLong(StartKey),
        if (m.contains(StepKey)) m.getLong(StepKey) else 1L,
        if (m.contains(HighWaterMarkKey)) Some(m.getLong(HighWaterMarkKey)) else None,
        m.contains(AllowExplicitKey) && m.getBoolean(AllowExplicitKey))
    }

  /** A schema field declaring an identity column (helper for CREATE). */
  def field(name: String, start: Long = 1L, step: Long = 1L,
      allowExplicitInsert: Boolean = false): StructField = {
    require(step != 0, "identity step must be non-zero")
    StructField(name, LongType, nullable = false,
      new MetadataBuilder()
        .putLong(StartKey, start)
        .putLong(StepKey, step)
        .putBoolean(AllowExplicitKey, allowExplicitInsert)
        .build())
  }

  private def withMark(f: StructField, mark: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(HighWaterMarkKey, mark).build())

  /** Assign identity values for a write batch. Returns the batch with
    * every omitted identity column generated, plus the advanced field
    * metadata per column (empty map = no mark moved, no metadata commit
    * needed). The caller re-stages table metadata with [[patchSchema]].
    */
  def assign(df: DataFrame, md: Metadata): (DataFrame, Map[String, FieldMetadata]) = {
    val ids = specs(md)
    if (ids.isEmpty) return (df, Map.empty)
    var cur = df
    val marks = Map.newBuilder[String, FieldMetadata]
    ids.foreach { spec =>
      val base = spec.highWaterMark.getOrElse(spec.start - spec.step)
      if (cur.columns.contains(spec.name)) {
        if (!spec.allowExplicitInsert) throw new IllegalArgumentException(
          s"identity column ${spec.name} is GENERATED ALWAYS: remove it from " +
            "the batch, or declare it with allowExplicitInsert = true")
        // sync the mark to the supplied extremum (one aggregate job)
        import org.apache.spark.sql.functions.{col, max => fmax, min => fmin}
        val agg = if (spec.step > 0) fmax(col(spec.name)) else fmin(col(spec.name))
        val row = cur.agg(agg).head()
        if (!row.isNullAt(0)) {
          val ext = row.getLong(0)
          val advanced = if (spec.step > 0) ext > base else ext < base
          if (advanced)
            marks += spec.name -> withMark(md.schema(spec.name), ext).metadata
        }
      } else {
        // generate hwm + step*(i+1) in batch row order: one metadata-sized
        // job learns per-partition counts (and the total, for the new
        // mark), then assignment is per-row with per-partition offsets
        val schema = StructType(cur.schema.fields :+
          StructField(spec.name, LongType, nullable = false))
        val step = spec.step
        val src = cur.rdd
        val counts = src.mapPartitionsWithIndex { (pi, it) =>
          Iterator(pi -> it.size.toLong)
        }.collect().sortBy(_._1).map(_._2)
        val offsets = counts.scanLeft(0L)(_ + _)
        val rdd = src.mapPartitionsWithIndex { (pi, it) =>
          var i = offsets(pi)
          it.map { r => i += 1; Row.fromSeq(r.toSeq :+ (base + step * i)) }
        }
        cur = df.sparkSession.createDataFrame(rdd, schema)
        marks += spec.name ->
          withMark(md.schema(spec.name), base + step * counts.sum).metadata
      }
    }
    // generation appends columns last; restore declaration order when
    // every table column is present (mirrors GeneratedColumns.complete)
    val out =
      if (md.schema.fieldNames.forall(cur.columns.contains) &&
          cur.columns.length == md.schema.fields.length)
        cur.select(md.schema.fieldNames.toSeq
          .map(org.apache.spark.sql.functions.col): _*)
      else cur
    (out, marks.result())
  }

  /** `md`'s schema with the given per-field metadata replacements. */
  def patchSchema(md: Metadata, marks: Map[String, FieldMetadata]): Metadata = {
    val patched = StructType(md.schema.fields.map(f =>
      marks.get(f.name).map(m => f.copy(metadata = m)).getOrElse(f)))
    md.copy(schemaString = patched.json)
  }
}
