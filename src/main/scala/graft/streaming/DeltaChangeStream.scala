package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, element_at, lit}

import graft.delta.{AddFile, DeltaTable}

/** Incremental reader over a Delta table's changes feed (SURVEY §2 D4):
  * the micro-batch primitive of a Delta streaming source. Each poll
  * returns the rows of files *added* since the last seen version —
  * exactly the input a MicroBatchStream would feed one trigger
  * (cf. reference `log.go:188` Changes / `version_log.go`).
  *
  * Offsets are log versions, so recovery is trivial: persist
  * `currentVersion`, reconstruct with it as `startAfterVersion`.
  */
class DeltaChangeStream(table: DeltaTable, startAfterVersion: Long = -1L) {

  @volatile private var cursor = startAfterVersion

  def currentVersion: Long = cursor

  /** Rows added in versions (cursor, latest]; None when caught up.
    * Data changes only — compaction rewrites (dataChange=false) are
    * skipped, like Delta's own source.
    */
  def poll(): Option[(Long, DataFrame)] = synchronized {
    val spark = table.spark
    val latest = table.deltaLog.update().version
    if (latest <= cursor) return None
    val adds = table.changes(cursor + 1).flatMap {
      case (_, actions) => actions.collect { case a: AddFile if a.dataChange => a }
    }.toSeq
    val md = table.deltaLog.snapshot.metadata
    cursor = latest
    if (adds.isEmpty)
      return Some(latest -> spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), md.schema))
    val paths = adds.map(a => graft.delta.FileNames.absolutePathString(table.deltaLog.dataPath, a.path))
    Some(latest -> spark.read
      .schema(md.schema)
      .option("basePath", table.deltaLog.dataPath.toString)
      .parquet(paths: _*))
  }
}
