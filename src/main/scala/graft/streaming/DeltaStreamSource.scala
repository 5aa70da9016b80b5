package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.delta.{AddFile, DeltaLog, DeltaTable}

/** Streaming source over a Delta table's transaction log (SURVEY §2 D4):
  * offsets are log versions; each micro-batch is the rows of the AddFiles
  * committed in `(start, end]` (dataChange only — an appends-only source,
  * like the default mode of Delta's own).
  *
  *   spark.readStream
  *     .format("graft.streaming.DeltaStreamSourceProvider")
  *     .option("path", tableDir).load()
  *
  * With `.option("readChangeFeed", "true")`, each micro-batch is instead
  * the row-level CHANGE feed of those versions (`tableChanges` semantics:
  * exact CDC rows when the table captures them, file-level
  * inserts/deletes otherwise), with `_change_type` / `_commit_version` /
  * `_commit_timestamp` appended — a DML-following stream, not
  * appends-only.
  *
  * cf. reference `log.go:188` Changes — the same version-cursor contract,
  * lifted into Structured Streaming's Source API.
  */
class DeltaStreamSource(spark: SparkSession, path: String, cdf: Boolean = false)
    extends Source {

  private val log = DeltaLog.forTable(spark, path)

  override def schema: StructType =
    DeltaStreamSource.sourceSchema(log.snapshot.metadata.schema, cdf)

  override def getOffset: Option[Offset] = {
    val v = log.update().version
    if (v < 0) None else Some(LongOffset(v))
  }

  private def version(o: Offset): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromVersion = start.map(version(_) + 1).getOrElse(0L)
    val toVersion = version(end)
    if (cdf) {
      val batch =
        if (fromVersion > toVersion)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else DeltaTable.forPath(spark, path).tableChanges(fromVersion, toVersion)
      return GraftShims.asStreamingDF(spark, batch)
    }
    val adds = log.changes(fromVersion)
      .takeWhile(_._1 <= toVersion)
      .flatMap { case (_, actions) =>
        actions.collect { case a: AddFile if a.dataChange => a }
      }.toSeq
    val md = log.snapshot.metadata
    val batch =
      if (adds.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), md.schema)
      else graft.delta.ColumnMapping.toLogical(md, spark.read
        .schema(graft.delta.ColumnMapping.physicalSchema(md))
        .option("basePath", log.dataPath.toString)
        .parquet(adds.map(a => graft.delta.FileNames.absolutePath(log.dataPath, a.path).toString): _*))
    GraftShims.asStreamingDF(spark, batch)
  }

  override def stop(): Unit = ()
}

object DeltaStreamSource {
  import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

  private[streaming] def sourceSchema(table: StructType, cdf: Boolean): StructType =
    if (!cdf) table
    else table
      .add("_change_type", StringType)
      .add("_commit_version", LongType)
      .add("_commit_timestamp", TimestampType)
}

class DeltaStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option required for the graft-delta source"))

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.toLowerCase == "true")

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      DeltaStreamSource.sourceSchema(
        DeltaLog.forTable(sqlContext.sparkSession, tablePath(parameters))
          .snapshot.metadata.schema,
        cdf(parameters))))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, tablePath(parameters), cdf(parameters))
}
