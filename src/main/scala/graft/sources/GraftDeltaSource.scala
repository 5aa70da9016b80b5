package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.delta.{ColumnMapping, DeltaConfig, DeltaTable, Snapshot}
import graft.streaming.DeltaStreamSourceProvider

/** The `graft-delta` data source: one format name covering the whole
  * surface a Spark user expects from a table format —
  *
  * {{{
  * spark.read.format("graft-delta").load(path)                    // batch read
  *   .option("versionAsOf", 3)                                    // time travel
  * df.write.format("graft-delta").partitionBy("p").save(path)     // batch write
  * spark.readStream.format("graft-delta").load(path)              // stream source
  * df.writeStream.format("graft-delta").start(path)               // exactly-once sink
  * }}}
  *
  * The role the reference leaves to its Go client API (`delta.go`,
  * `scan.go`) is played here by Spark's source contracts, so the engine
  * plugs into `spark.read`/`spark.sql` like any built-in format.
  *
  * Read architecture: the common case returns the table's
  * `HadoopFsRelation` over [[graft.delta.DeltaFileIndex]] directly —
  * planning stays fully inside Catalyst (partition pruning, stats-based
  * file skipping, parquet predicate pushdown, whole-stage codegen), with
  * zero per-row overhead versus `DeltaTable.toDF`. Tables whose scan
  * needs row-level post-processing (active deletion vectors) or logical
  * column renames (column mapping) fall back to [[SnapshotRelation]], a
  * `PrunedFilteredScan` that delegates to the full merge-on-read path —
  * pruning and pushdown still happen inside the nested plan; the only
  * extra cost is the row conversion at the V1 boundary, paid only by
  * tables that actually carry DVs.
  */
class GraftDeltaSource extends DeltaStreamSourceProvider
    with RelationProvider with CreatableRelationProvider with StreamSinkProvider {

  import GraftDeltaSource._

  // ------------------------------------------------------------ batch read

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = DeltaTable.forPath(spark, pathOf(parameters))
    if (flag(parameters, "readChangeFeed")) {
      // batch CDF: the row-level change feed of a version range —
      // same frame tableChanges produces (`_change_type` /
      // `_commit_version` / `_commit_timestamp` appended). Timestamp
      // bounds resolve through the same commit-timestamp index as time
      // travel: start = first commit at-or-after (past-the-end ⇒ empty
      // feed), end = last commit at-or-before (inclusive).
      def ts(v: String): Long =
        v.trim.toLongOption.getOrElse(java.sql.Timestamp.valueOf(v.trim).getTime)
      val start = (parameters.get("startingVersion"), parameters.get("startingTimestamp")) match {
        case (Some(_), Some(_)) => throw new IllegalArgumentException(
          "specify at most one of startingVersion / startingTimestamp")
        case (Some(v), None) => v.trim.toLong
        case (None, Some(t)) =>
          table.deltaLog.startingVersionAtOrAfterTimestamp(ts(t))
        case (None, None) => throw new IllegalArgumentException(
          "readChangeFeed batch reads require startingVersion or startingTimestamp")
      }
      val end = (parameters.get("endingVersion"), parameters.get("endingTimestamp")) match {
        case (Some(_), Some(_)) => throw new IllegalArgumentException(
          "specify at most one of endingVersion / endingTimestamp")
        case (Some(v), None) => v.trim.toLong
        case (None, Some(t)) =>
          table.deltaLog.versionBeforeOrAtTimestamp(ts(t)).getOrElse(
            throw new IllegalArgumentException(
              s"endingTimestamp $t precedes the table's first commit"))
        case (None, None) => -1L
      }
      val latest = table.deltaLog.update().version
      val cdf =
        if (start > latest || (end >= 0L && start > end)) {
          // past-the-end start (e.g. a startingTimestamp after the last
          // commit), with OR without an ending bound — one consistent
          // contract: an EMPTY feed with the CDF schema, the streaming
          // source's behavior for the same input, not an error. (Without
          // this, start > end only threw when an ending bound was also
          // supplied, while the unbounded form returned empty.)
          val schema = table.snapshot.metadata.schema
            .add("_change_type", org.apache.spark.sql.types.StringType)
            .add("_commit_version", org.apache.spark.sql.types.LongType)
            .add("_commit_timestamp", org.apache.spark.sql.types.TimestampType)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        } else table.tableChanges(start, end)
      new DataFrameRelation(sqlContext, cdf)
    } else if (flag(parameters, "withRowIds")) {
      require(parameters.get("versionAsOf").isEmpty &&
        parameters.get("timestampAsOf").isEmpty,
        "withRowIds reads the current snapshot; combine it with time travel is not supported")
      new DataFrameRelation(sqlContext, table.toDFWithRowIds)
    } else relationFor(sqlContext, table, snapshotFor(table, parameters))
  }

  // ----------------------------------------------------------- batch write

  override def createRelation(
      sqlContext: SQLContext, mode: SaveMode, parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val table = DeltaTable.forPath(spark, path)
    val exists = DeltaTable.isDeltaTable(spark, path)
    val write = mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"delta table already exists at $path (mode ErrorIfExists)")
      case SaveMode.Ignore if exists => false
      case _ => true
    }
    if (write) {
      val saveMode =
        if (mode == SaveMode.Overwrite) SaveMode.Overwrite else SaveMode.Append
      // partitionOverwriteMode: the write option wins; otherwise the
      // standard session conf decides (delta-spark precedence)
      val dynamic = saveMode == SaveMode.Overwrite &&
        parameters.get("partitionOverwriteMode")
          .orElse(Option(spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "STATIC")))
          .exists(_.trim.equalsIgnoreCase("dynamic")) &&
        parameters.get("replaceWhere").isEmpty
      table.write(data, saveMode, partitionColumnsOf(parameters),
        mergeSchema = flag(parameters, "mergeSchema"),
        replaceWhere = parameters.get("replaceWhere")
          .map(org.apache.spark.sql.functions.expr),
        dynamicPartitionOverwrite = dynamic)
    }
    relationFor(sqlContext, table, table.snapshot)
  }

  // ------------------------------------------------------- streaming sink

  /** Exactly-once append sink: each micro-batch commits through the
    * table's idempotent `SetTransaction` path keyed by the query's
    * checkpoint location, so a replayed batch after failure is a no-op.
    */
  override def createSink(
      sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    // Update re-emits changed rows, which an append-only commit would
    // duplicate — reject it. Complete is supported as overwrite-per-batch
    // (matching the Delta sink's semantics).
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft-delta sink supports Append and Complete output modes, got $outputMode")
    val path = pathOf(parameters)
    new GraftDeltaSink(sqlContext.sparkSession, path, partitionColumns,
      parameters.get("checkpointLocation"),
      overwrite = outputMode == OutputMode.Complete())
  }
}

object GraftDeltaSource {

  private[sources] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "'path' is required for the graft-delta format (pass it to load/save)"))

  private def flag(parameters: Map[String, String], name: String): Boolean =
    parameters.get(name).exists(_.trim.equalsIgnoreCase("true"))

  /** `partitionBy(...)` arrives from DataFrameWriter as the JSON-encoded
    * `__partition_columns` option (Spark's V1 convention); a plain
    * comma-separated `partitionBy` option is accepted as well.
    */
  private[sources] def partitionColumnsOf(parameters: Map[String, String]): Seq[String] =
    parameters.get("__partition_columns") match {
      case Some(json) =>
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        m.readValue(json, classOf[Array[String]]).toSeq
      case None => parameters.get("partitionBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    }

  /** versionAsOf / timestampAsOf (epoch millis or `yyyy-MM-dd HH:mm:ss`). */
  private[sources] def snapshotFor(
      table: DeltaTable, parameters: Map[String, String]): Snapshot =
    (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "specify at most one of versionAsOf / timestampAsOf")
      case (Some(v), None) => table.deltaLog.snapshotForVersionAsOf(v.trim.toLong)
      case (None, Some(t)) =>
        val millis = t.trim.toLongOption.getOrElse(
          java.sql.Timestamp.valueOf(t.trim).getTime)
        table.deltaLog.snapshotForTimestampAsOf(millis)
      case (None, None) => table.deltaLog.update()
    }

  private[sources] def relationFor(
      sqlContext: SQLContext, table: DeltaTable, s: Snapshot): BaseRelation = {
    val md = s.metadata
    // descriptor presence, not the table property, decides the DV-aware
    // fallback (the protocol: readers honor DVs wherever files carry them)
    val direct = !ColumnMapping.enabled(md) && s.dvFiles.isEmpty
    // HadoopFsRelation's schema is dataSchema ++ partitionSchema — partition
    // columns migrate to the end. Only hand it out raw when that matches the
    // metadata column order; otherwise positional consumers (union,
    // insertInto) would see a different layout than the table schema.
    val orderPreserved = {
      val partCols = md.partitionColumns
      val names = md.schema.fieldNames
      (names.filterNot(partCols.contains) ++ partCols).sameElements(names)
    }
    if (direct && orderPreserved) table.baseRelationFor(s)
    else new SnapshotRelation(sqlContext, table, s)
  }

  /** Best-effort translation of V1 source filters into Columns for the
    * nested scan; untranslated filters are simply not pushed (Spark
    * re-evaluates every filter above the relation regardless).
    */
  private[sources] def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    // under NOT the "half an AND" narrowing flips into a widening:
    // !(A && B) weakened to !A drops rows where A holds and B fails.
    // The negated child must translate in full or not at all.
    case Not(c) => filterToColumnStrict(c).map(!_)
    case And(l, r) =>
      (filterToColumn(l), filterToColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b) // half an AND is still a valid narrowing
      }
    case Or(l, r) =>
      for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a || b
    case _ => None
  }

  /** Like [[filterToColumn]] but with no partial-AND narrowing: every
    * connective's children must translate completely. Required inside NOT,
    * where a narrowed child would negate into an unsound widening.
    */
  private def filterToColumnStrict(f: Filter): Option[Column] = f match {
    case And(l, r) =>
      for { a <- filterToColumnStrict(l); b <- filterToColumnStrict(r) } yield a && b
    case Or(l, r) =>
      for { a <- filterToColumnStrict(l); b <- filterToColumnStrict(r) } yield a || b
    case Not(c) => filterToColumnStrict(c).map(!_)
    case leaf => filterToColumn(leaf)
  }
}

/** Fallback relation for tables whose read is more than a parquet scan
  * (deletion vectors, column mapping): delegates to the table's full
  * merge-on-read DataFrame, forwarding column pruning and translatable
  * filters into the nested plan.
  */
final class SnapshotRelation(
    override val sqlContext: SQLContext,
    table: DeltaTable,
    s: Snapshot) extends BaseRelation with PrunedFilteredScan
    with InsertableRelation {

  private[graft] def tablePath: String = table.deltaLog.dataPath.toString
  private[graft] def relationSnapshot: Snapshot = s

  override val schema: StructType =
    Snapshot.nullable(s.metadata.schema).asInstanceOf[StructType]

  /** V1 `INSERT INTO` lands through the transaction log, never as loose
    * parquet files (column order here is already the table order).
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    table.write(data.toDF(schema.fieldNames.toIndexedSeq: _*),
      if (overwrite) SaveMode.Overwrite else SaveMode.Append)
    ()
  }

  // the nested plan already produces InternalRows in the pruned schema;
  // declaring needConversion=false hands its toRdd straight to the V1
  // boundary with zero per-row conversion (the same contract
  // HadoopFsRelation uses)
  override val needConversion: Boolean = false

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val pred = filters.toSeq.flatMap(GraftDeltaSource.filterToColumn)
      .reduceOption(_ && _)
    table.readSnapshot(s, pred)
      .select(requiredColumns.toIndexedSeq.map(col): _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** A prebuilt DataFrame behind the V1 relation boundary (batch CDF and
  * row-id reads): the nested plan produces InternalRows directly, so
  * `needConversion = false` hands its toRdd through with zero per-row
  * conversion.
  */
final class DataFrameRelation(
    override val sqlContext: SQLContext, df: DataFrame)
    extends BaseRelation with TableScan {
  override val schema: StructType = df.schema
  override val needConversion: Boolean = false
  override def buildScan(): RDD[Row] =
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

/** V1 streaming sink with exactly-once semantics via the table's
  * idempotent-writer transactions (A13): `(appId, batchId)` is recorded in
  * the same commit as the data, so re-delivered batches are skipped.
  */
final class GraftDeltaSink(
    spark: SparkSession, path: String, partitionColumns: Seq[String],
    checkpointLocation: Option[String], overwrite: Boolean = false) extends Sink {

  /** The dedup key must be private to THIS logical query. The streaming
    * queryId (persisted in checkpoint metadata, stable across restarts,
    * set as a local property by StreamExecution while addBatch runs) is
    * exactly that; an explicit checkpointLocation is an equivalent
    * fallback for direct addBatch callers. Never the table path — two
    * independent queries writing one table would share a batch counter
    * and silently drop each other's batches.
    */
  private def resolveAppId: String =
    checkpointLocation.orElse(
      // StreamExecution.QUERY_ID_KEY, set on the stream execution thread;
      // stable across restarts (persisted in checkpoint metadata)
      Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId")))
      .getOrElse(throw new IllegalStateException(
        "graft-delta sink needs a stable query identity for exactly-once " +
          "writes: run it inside a streaming query or set checkpointLocation"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // re-wrap: the incoming frame is planned by IncrementalExecution and
    // cannot be transformed or re-executed as a batch query directly
    val batch = GraftShims.asBatchDF(spark, data)
    DeltaTable.forPath(spark, path)
      .writeStreamBatch(batch, resolveAppId, batchId, partitionColumns,
        overwrite = overwrite)
    ()
  }

  override def toString: String = s"GraftDeltaSink[$path]"
}
