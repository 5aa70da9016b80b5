package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.delta.{AddFile, DeltaLog}

/** Streaming source over a Delta table's transaction log (SURVEY §2 D4):
  * offsets are log versions; each micro-batch is the rows of the AddFiles
  * committed in `(start, end]` (dataChange only — an appends-only source,
  * like the default mode of Delta's own).
  *
  *   spark.readStream
  *     .format("graft.streaming.DeltaStreamSourceProvider")
  *     .option("path", tableDir).load()
  *
  * cf. reference `log.go:188` Changes — the same version-cursor contract,
  * lifted into Structured Streaming's Source API.
  */
class DeltaStreamSource(spark: SparkSession, path: String) extends Source {

  private val log = DeltaLog.forTable(spark, path)

  override def schema: StructType = log.snapshot.metadata.schema

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
    val adds = log.changes(fromVersion)
      .takeWhile(_._1 <= toVersion)
      .flatMap { case (_, actions) =>
        actions.collect { case a: AddFile if a.dataChange => a }
      }.toSeq
    val md = log.snapshot.metadata
    val batch =
      if (adds.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), md.schema)
      else spark.read
        .schema(md.schema)
        .option("basePath", log.dataPath.toString)
        .parquet(adds.map(a => graft.delta.FileNames.absolutePath(log.dataPath, a.path).toString): _*)
    GraftShims.asStreamingDF(spark, batch)
  }

  override def stop(): Unit = ()
}

class DeltaStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option required for the graft-delta source"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      DeltaLog.forTable(sqlContext.sparkSession, tablePath(parameters))
        .snapshot.metadata.schema))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, tablePath(parameters))
}
