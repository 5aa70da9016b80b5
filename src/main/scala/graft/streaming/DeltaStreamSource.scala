package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.delta.{Action, AddFile, DeltaLog, DeltaTable, RemoveFile}

/** Offset into a Delta table's log: `index` is the number of (path-sorted)
  * dataChange AddFiles of `version` already consumed; [[DeltaSourceOffset.All]]
  * means the whole version. Admitting a version file-by-file is what lets
  * a micro-batch stop mid-commit under `maxFilesPerTrigger`.
  */
final case class DeltaSourceOffset(version: Long, index: Long,
    snap: Boolean = false) extends Offset {
  override def json(): String =
    if (snap) s"""{"version":$version,"index":$index,"snap":1}"""
    else s"""{"version":$version,"index":$index}"""
}

object DeltaSourceOffset {
  /** index value meaning "every file of this version". */
  val All: Long = Long.MaxValue

  def fromOffset(o: Offset): DeltaSourceOffset = o match {
    case d: DeltaSourceOffset => d
    case LongOffset(v) => DeltaSourceOffset(v, All) // pre-rate-limit checkpoints
    case s: SerializedOffset => fromJson(s.json)
    case other => fromJson(other.json())
  }

  private def fromJson(j: String): DeltaSourceOffset = {
    val t = j.trim
    if (!t.startsWith("{")) return DeltaSourceOffset(t.toLong, All)
    def fieldOpt(name: String): Option[Long] =
      s""""$name"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(t).map(_.group(1).toLong)
    def field(name: String): Long = fieldOpt(name).getOrElse(
      throw new IllegalArgumentException(s"bad graft-delta offset: $j"))
    DeltaSourceOffset(field("version"), field("index"),
      snap = fieldOpt("snap").exists(_ == 1L))
  }
}

/** Streaming source over a Delta table's transaction log (SURVEY §2 D4):
  * offsets are (log version, file index); each micro-batch is the rows of
  * the dataChange AddFiles committed after `start` up to `end` (an
  * appends-only source, like the default mode of Delta's own).
  *
  *   spark.readStream
  *     .format("graft.streaming.DeltaStreamSourceProvider")
  *     .option("path", tableDir).load()
  *
  * Rate limiting: `.option("maxFilesPerTrigger", n)` and/or
  * `.option("maxBytesPerTrigger", "128m")` bound each micro-batch — a
  * stream started against a large existing table drains it in bounded
  * admission-controlled batches instead of reading the whole table as
  * batch 0. At least one file is always admitted so progress is
  * guaranteed; the file index in the offset lets a batch stop mid-commit.
  *
  * `.option("startingVersion", v | "latest")` starts the cursor at a log
  * version instead of 0; data-changing removes fail the stream loudly
  * unless `.option("ignoreDeletes", true)` (delete-only commits),
  * `.option("skipChangeCommits", true)` (update/delete commits — DV
  * remove+re-adds included — are skipped entirely, no duplicates), or
  * `.option("ignoreChanges", true)` (stream rewritten files; downstream
  * tolerates duplicates) — the same appends-only contract as Delta's own
  * source.
  *
  * With `.option("readChangeFeed", "true")`, each micro-batch is instead
  * the row-level CHANGE feed of those versions (`tableChanges` semantics:
  * exact CDC rows when the table captures them, file-level
  * inserts/deletes otherwise), with `_change_type` / `_commit_version` /
  * `_commit_timestamp` appended — a DML-following stream, not
  * appends-only. CDF batches are bounded at whole-version granularity
  * (the change feed of one commit is indivisible).
  *
  * cf. reference `log.go:188` Changes — the same version-cursor contract,
  * lifted into Structured Streaming's Source API.
  */
class DeltaStreamSource(
    spark: SparkSession, path: String, cdf: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    startingVersion: Long = 0L,
    ignoreDeletes: Boolean = false,
    ignoreChanges: Boolean = false,
    skipChangeCommits: Boolean = false,
    eventTimeOrderColumn: Option[String] = None,
    schemaTrackingLocation: Option[String] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import DeltaSourceOffset.All

  private val log = DeltaLog.forTable(spark, path)
  private val limited = maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty

  // the admission cursor: everything up to and including this offset has
  // been returned by getOffset (the engine may still be processing it)
  private var cursor: Option[DeltaSourceOffset] = None

  // Trigger.AvailableNow: the end of the log as of query start. Admission
  // never looks past it, so rate-limited micro-batches drain up to the
  // latch and the query terminates instead of following new commits.
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(log.update().version)

  /** Rate limits come from the source options; the engine's limit is the
    * default passthrough.
    */
  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** SupportsAdmissionControl entry — the engine calls this instead of
    * [[getOffset]] once the trait is implemented. Delegates to the same
    * cursor-based admission; `startOffset` re-seeds the cursor after a
    * checkpoint restart (a fresh instance would otherwise re-admit from
    * startingVersion and emit empty catch-up batches).
    */
  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset = {
    if (cursor.isEmpty && startOffset != null)
      cursor = Some(startOffset match {
        case o: Offset => DeltaSourceOffset.fromOffset(o)
        case o => DeltaSourceOffset.fromOffset(SerializedOffset(o.json()))
      })
    getOffset.orNull
  }

  // Pinned at stream start: Structured Streaming analyzes the plan once,
  // so a mid-stream ADD COLUMNS / RENAME cannot be absorbed — batches
  // must keep this shape or fail LOUDLY asking for a restart (the
  // delta-spark contract; a silent projection would drop the new column
  // from the feed). With `schemaTrackingLocation` (delta-spark's opt-in
  // schema log, persisted beside the query checkpoint), the boundary
  // failure RECORDS the evolved schema first, so the restart picks it up
  // with no operator intervention: the restarted stream serves the whole
  // history under the evolved schema (pre-evolution files null-fill the
  // added columns). The loud-fail-with-no-recovery default is unchanged.
  private val schemaLog: Option[StreamSchemaLog] =
    schemaTrackingLocation.map(dir => new StreamSchemaLog(spark, dir))

  private val declaredTableSchema: StructType = {
    val current = log.update().metadata.schema
    schemaLog match {
      case None => current
      case Some(sl) => sl.read() match {
        case Some(tracked) => tracked
        case None => sl.write(current, log.snapshot.version); current
      }
    }
  }

  private val declaredSchema: StructType =
    DeltaStreamSource.sourceSchema(declaredTableSchema, cdf)

  override def schema: StructType = declaredSchema

  private def assertSchemaUnchanged(batchSchema: StructType): Unit = {
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (shape(batchSchema) != shape(declaredSchema)) {
      // record the evolved schema BEFORE failing, so the restart resumes
      // under it (the table schema, not the cdf-decorated batch shape)
      val recovery = schemaLog match {
        case Some(sl) =>
          sl.write(log.update().metadata.schema, log.snapshot.version)
          "the evolved schema was recorded in the schema tracking log; " +
            "restart the query to continue from it"
        case None => "restart the query to pick up the evolved schema"
      }
      throw new IllegalStateException(
        s"the schema of $path changed during the stream " +
          s"(${declaredSchema.simpleString} -> ${batchSchema.simpleString}); " +
          recovery)
    }
  }

  /** The appends-only contract, enforced loudly (matching Delta's own
    * source): a commit that REMOVES data files would silently re-stream
    * rewritten rows as duplicates, so it fails the stream unless the user
    * opted in — `ignoreDeletes` permits delete-only commits (e.g. dropping
    * a partition), `ignoreChanges` additionally streams the re-added files
    * of update/merge rewrites (caller handles duplicates downstream).
    */
  private def isChangeCommit(actions: Seq[Action]): Boolean =
    actions.exists { case r: RemoveFile => r.dataChange; case _ => false }

  private def assertAppendOnly(version: Long, actions: Seq[Action]): Unit = {
    if (cdf || ignoreChanges || skipChangeCommits) return
    if (!isChangeCommit(actions)) return
    val adds = actions.exists { case a: AddFile => a.dataChange; case _ => false }
    if (!adds && ignoreDeletes) return
    throw new UnsupportedOperationException(
      s"Detected a data update or delete in table version $version of $path. " +
        "The graft-delta stream is appends-only: set option ignoreDeletes=true " +
        "to allow delete-only commits, skipChangeCommits=true to skip " +
        "update/delete commits entirely, or ignoreChanges=true to stream " +
        "rewritten files (downstream must tolerate duplicates).")
  }

  /** Path-sorted dataChange AddFiles of one commit — empty for a change
    * commit under `skipChangeCommits` (update/delete commits, including
    * deletion-vector remove+re-adds, are passed over without emitting
    * their re-added files).
    */
  private def commitFiles(actions: Seq[Action]): Seq[AddFile] =
    if (skipChangeCommits && isChangeCommit(actions)) Nil
    else actions.collect { case a: AddFile if a.dataChange => a }.sortBy(_.path)

  private def addFiles(version: Long): Seq[AddFile] =
    log.changes(version).take(1).toSeq.headOption.map { case (_, actions) =>
      assertAppendOnly(version, actions)
      commitFiles(actions)
    }.getOrElse(Nil)

  // ------------------------------------------------- withEventTimeOrder
  // delta-spark parity: the BACKLOG present when the stream starts
  // (versions [startingVersion, initialSnapshotEnd]) is admitted in
  // EVENT-TIME order via each file's stats minValues of the declared
  // column, not commit/path order. A watermarked query over a large
  // existing table would otherwise advance its watermark on whichever
  // backlog slice drains first and silently DROP the out-of-order tail
  // of the initial snapshot. Restart-safe and deterministic: the sorted
  // list is a pure function of (startingVersion, end version, column),
  // and the end version rides in the checkpointed offset (snap=1).
  // Commits after initialSnapshotEnd tail normally — new data is
  // roughly in arrival order already, which is delta-spark's contract
  // too (the option governs the initial snapshot only).

  // Stats minValues are compared as STRINGS below — exact for ISO
  // timestamp/date stats, silently wrong for numerics ("10" < "9"),
  // which would reintroduce the very watermark-drop hazard the option
  // exists to prevent. Reject anything but temporal columns up front.
  // Resolved with the SESSION's resolver (case-insensitive unless
  // spark.sql.caseSensitive): a user passing 'TS' for column 'ts' gets
  // the canonical schema name, not a spurious rejection — and stats
  // minValues are keyed by the canonical name, so downstream lookups
  // must use it too.
  private val orderColumn: Option[String] = eventTimeOrderColumn.map { c =>
    val resolver = spark.sessionState.conf.resolver
    val field = log.snapshot.metadata.schema.fields.find(f => resolver(f.name, c))
    require(field.nonEmpty, s"eventTimeOrderColumn '$c' not in table schema")
    val dt = field.get.dataType
    require(dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType ||
        dt == org.apache.spark.sql.types.DateType,
      s"eventTimeOrderColumn '$c' must be a timestamp or date column " +
        s"(got ${dt.simpleString}: its stats do not sort " +
        "lexicographically in event-time order)")
    field.get.name
  }

  private val initialSnapshotEnd: Long =
    if (eventTimeOrderColumn.isEmpty) -1L else log.update().version

  private val snapshotCache =
    scala.collection.concurrent.TrieMap.empty[Long, IndexedSeq[AddFile]]

  /** stats minValues[col] as a sortable string; files without stats sort
    * first (the conservative bucket, as in delta-spark). Timestamp stats
    * are ISO strings, so lexicographic order IS event-time order.
    */
  private def eventTimeKey(f: AddFile, col: String): String = {
    if (f.stats == null) return ""
    try {
      val v = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(f.stats).path("minValues").path(col)
      if (v.isMissingNode || v.isNull) "" else v.asText()
    } catch { case _: Exception => "" }
  }

  private def snapshotFiles(endV: Long): IndexedSeq[AddFile] =
    snapshotCache.getOrElseUpdate(endV, {
      val col = orderColumn.get
      val files = (startingVersion to endV).flatMap(addFiles)
      // Stats-less files sort FIRST (the conservative bucket — they
      // drain before the watermark has advanced). NOTE: Spark's legacy
      // INT96 parquet timestamps (the `spark.sql.parquet.outputTimestampType`
      // default) carry no trustworthy footer min/max, so a table written
      // that way has no ts stats at all and ordering degrades to path
      // order — warn loudly; write with TIMESTAMP_MICROS for real
      // event-time ordering (and ts data skipping generally).
      if (files.nonEmpty && files.forall(f => eventTimeKey(f, col).isEmpty))
        System.err.println(
          s"[graft-delta] withEventTimeOrder: no '$col' stats on any of " +
            s"${files.length} initial-snapshot files (INT96 timestamps?); " +
            "falling back to path order — watermark drops are possible")
      files.sortBy(f => (eventTimeKey(f, col), f.path))
    })

  /** Event-time-ordered admission over the initial snapshot; Some while
    * the phase is active, None once (or if) it is complete.
    */
  private def snapshotPhaseOffset: Option[Option[Offset]] = {
    if (eventTimeOrderColumn.isEmpty) return None
    val active = cursor match {
      case None => initialSnapshotEnd >= startingVersion
      case Some(o) => o.snap && o.index < snapshotFiles(o.version).length
    }
    if (!active) return None
    val endV = cursor.map(_.version).getOrElse(initialSnapshotEnd)
    val files = snapshotFiles(endV)
    if (files.isEmpty) {
      // Empty initial snapshot (fresh table, or an all-change-commit
      // backlog under skipChangeCommits): mark the phase COMPLETE so the
      // normal tail path admits commits made after stream start — a bare
      // Some(None) here would hold the phase active forever and stall
      // the stream.
      cursor = Some(DeltaSourceOffset(endV, 0, snap = true))
      return None
    }
    val from = cursor.map(_.index.toInt).getOrElse(0)
    val maxF = maxFilesPerTrigger.getOrElse(Int.MaxValue)
    val maxB = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var i = from
    var nF = 0L
    var nB = 0L
    while (i < files.length && nF + 1 <= maxF &&
        (nF == 0 || nB + files(i).size <= maxB)) {
      nF += 1; nB += files(i).size; i += 1
    }
    if (i == from) return Some(cursor) // nothing admissible (empty backlog)
    cursor = Some(DeltaSourceOffset(endV, i, snap = true))
    Some(cursor)
  }

  override def getOffset: Option[Offset] = {
    snapshotPhaseOffset match {
      case Some(o) => return o
      case None => // initial snapshot complete (or ordering not requested)
    }
    val latest = availableNowCap
      .map(math.min(_, log.update().version))
      .getOrElse(log.update().version)
    if (latest < 0) return None
    if (!limited) {
      cursor = Some(DeltaSourceOffset(latest, All))
      return cursor
    }
    val maxF = maxFilesPerTrigger.getOrElse(Int.MaxValue)
    val maxB = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    // resume point: first (version, idx) not yet admitted
    val (resumeV, resumeI) = cursor match {
      case None => (startingVersion, 0L)
      case Some(o) if o.snap => (o.version + 1, 0L) // snapshot phase done
      case Some(DeltaSourceOffset(v, All, _)) => (v + 1, 0L)
      case Some(DeltaSourceOffset(v, i, _)) =>
        if (i >= addFiles(v).length) (v + 1, 0L) else (v, i)
    }
    if (resumeV > latest) return cursor
    var nFiles = 0L
    var nBytes = 0L
    var end: Option[DeltaSourceOffset] = None
    var v = resumeV
    while (v <= latest && end.isEmpty) {
      val files = addFiles(v)
      val from = if (v == resumeV) resumeI.toInt else 0
      var i = from
      while (i < files.length && end.isEmpty) {
        val f = files(i)
        val overFiles = nFiles + 1 > maxF
        val overBytes = nFiles > 0 && nBytes + f.size > maxB
        if (overFiles || overBytes) end = Some(DeltaSourceOffset(v, i))
        else { nFiles += 1; nBytes += f.size; i += 1 }
      }
      if (end.isEmpty) {
        if (cdf && nFiles >= maxF && v < latest)
          end = Some(DeltaSourceOffset(v, All)) // CDF: whole versions only
        v += 1
      }
    }
    val admitted = end match {
      // stopped mid-version at index i: batch covers up to file i-1
      case Some(DeltaSourceOffset(ev, ei, _)) if ei != All =>
        if (ei == 0) DeltaSourceOffset(ev - 1, All) else DeltaSourceOffset(ev, ei)
      case Some(o) => o
      case None => DeltaSourceOffset(latest, All)
    }
    // CDF batches must cover whole versions: round a mid-version stop down
    val next =
      if (cdf && admitted.index != All)
        DeltaSourceOffset(math.max(admitted.version - 1, resumeV), All)
      else admitted
    if (nFiles == 0 && next.version < resumeV) return cursor // nothing new
    cursor = Some(next)
    cursor
  }

  /** AddFiles strictly after `start` up to `end` (inclusive). */
  private def filesBetween(
      start: Option[DeltaSourceOffset], end: DeltaSourceOffset): Seq[AddFile] = {
    val (fromV, skip) = start match {
      case None => (startingVersion, 0L)
      case Some(o) if o.snap => (o.version + 1, 0L) // after the snapshot phase
      case Some(DeltaSourceOffset(v, All, _)) => (v + 1, 0L)
      case Some(DeltaSourceOffset(v, i, _)) => (v, i)
    }
    if (fromV > end.version) return Nil
    log.changes(fromV)
      .takeWhile(_._1 <= end.version)
      .flatMap { case (v, actions) =>
        assertAppendOnly(v, actions)
        var files = commitFiles(actions)
        if (v == fromV && skip > 0) files = files.drop(skip.toInt)
        if (v == end.version && end.index != DeltaSourceOffset.All) {
          val keep = end.index - (if (v == fromV) skip else 0L)
          files = files.take(keep.toInt)
        }
        files
      }.toSeq
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startOff = start.map(DeltaSourceOffset.fromOffset)
    val endOff = DeltaSourceOffset.fromOffset(end)
    // restart recovery: the engine replays the last committed range before
    // asking for a new offset — never re-admit files at or below `end`
    if (cursor.forall(c => c.version < endOff.version ||
        (c.version == endOff.version && c.index < endOff.index)))
      cursor = Some(endOff)
    if (cdf) {
      val fromVersion = startOff.map(_.version + 1).getOrElse(startingVersion)
      val batch =
        if (fromVersion > endOff.version)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else DeltaTable.forPath(spark, path).tableChanges(fromVersion, endOff.version)
      assertSchemaUnchanged(batch.schema)
      return GraftShims.asStreamingDF(spark, batch)
    }
    val adds =
      if (endOff.snap) {
        // a slice of the event-time-sorted initial snapshot
        val files = snapshotFiles(endOff.version)
        val from = startOff.filter(_.snap).map(_.index.toInt).getOrElse(0)
        files.slice(from, endOff.index.toInt)
      } else filesBetween(startOff, endOff)
    val md = log.snapshot.metadata
    assertSchemaUnchanged(md.schema)
    val batch =
      if (adds.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), md.schema)
      else graft.delta.ColumnMapping.toLogical(md, spark.read
        .schema(graft.delta.ColumnMapping.physicalSchema(md))
        .option("basePath", log.dataPath.toString)
        .parquet(adds.map(a => graft.delta.FileNames.absolutePathString(log.dataPath, a.path)): _*))
    GraftShims.asStreamingDF(spark, batch)
  }

  override def stop(): Unit = ()
}

/** The schema tracking log (`schemaTrackingLocation` option, delta-spark
  * parity): one tiny JSON artifact beside the query checkpoint holding
  * the TABLE schema the stream is committed to, plus the log version it
  * was captured at. Written once at first start, overwritten at each
  * schema-change boundary (just before the loud failure), read back at
  * restart. Atomic via write-temp-then-rename on the location's
  * filesystem — a torn write can only lose the newest entry, never
  * corrupt it, and losing it merely repeats one fail-and-restart cycle.
  */
private[streaming] class StreamSchemaLog(spark: SparkSession, dir: String) {
  import org.apache.hadoop.fs.Path
  private val logPath = new Path(dir, "_schema_log.json")
  private val fs = logPath.getFileSystem(spark.sessionState.newHadoopConf())

  def read(): Option[StructType] =
    if (!fs.exists(logPath)) None
    else {
      val in = fs.open(logPath)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      Some(org.apache.spark.sql.types.DataType.fromJson(
        node.get("schemaString").asText()).asInstanceOf[StructType])
    }

  def write(schema: StructType, version: Long): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("schemaString", schema.json)
    node.put("deltaVersion", version)
    val tmp = new Path(dir, s"_schema_log.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(m.writeValueAsString(node).getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(logPath)) fs.delete(logPath, false)
    require(fs.rename(tmp, logPath),
      s"could not publish schema tracking entry at $logPath")
  }
}

object DeltaStreamSource {
  import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

  private[streaming] def sourceSchema(table: StructType, cdf: Boolean): StructType =
    if (!cdf) table
    else table
      .add("_change_type", StringType)
      .add("_commit_version", LongType)
      .add("_commit_timestamp", TimestampType)

  /** "128", "128k", "64m", "1g" → bytes. */
  private[streaming] def parseBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    val (num, mult) = t.last match {
      case 'k' => (t.dropRight(1), 1L << 10)
      case 'm' => (t.dropRight(1), 1L << 20)
      case 'g' => (t.dropRight(1), 1L << 30)
      case _ => (t, 1L)
    }
    num.toLong * mult
  }
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
    (shortName(), schema.getOrElse {
      // with schema tracking, the plan analyzes against the TRACKED
      // schema (what the checkpointed stream is committed to), which may
      // lag the table's current one until the next boundary restart
      val tracked = parameters.get("schemaTrackingLocation")
        .flatMap(dir =>
          new StreamSchemaLog(sqlContext.sparkSession, dir).read())
      DeltaStreamSource.sourceSchema(
        tracked.getOrElse(
          DeltaLog.forTable(sqlContext.sparkSession, tablePath(parameters))
            .snapshot.metadata.schema),
        cdf(parameters))
    })

  private def flag(parameters: Map[String, String], name: String): Boolean =
    parameters.get(name).exists(_.trim.toLowerCase == "true")

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new DeltaStreamSource(
      sqlContext.sparkSession, tablePath(parameters), cdf(parameters),
      maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map { v =>
        val n = v.trim.toInt
        require(n > 0, "maxFilesPerTrigger must be positive")
        n
      },
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger").map { v =>
        val n = DeltaStreamSource.parseBytes(v)
        require(n > 0, "maxBytesPerTrigger must be positive")
        n
      },
      // "latest" = only commits arriving after the stream starts;
      // startingTimestamp resolves through the same commit-timestamp
      // index as batch time travel (DeltaLog.versionAtOrAfterTimestamp)
      startingVersion =
        (parameters.get("startingVersion"), parameters.get("startingTimestamp")) match {
          case (Some(_), Some(_)) => throw new IllegalArgumentException(
            "specify at most one of startingVersion / startingTimestamp")
          case (Some(v), None) if v.trim.toLowerCase == "latest" =>
            DeltaLog.forTable(sqlContext.sparkSession, tablePath(parameters))
              .update().version + 1
          case (Some(v), None) => v.trim.toLong
          case (None, Some(t)) =>
            val millis = t.trim.toLongOption.getOrElse(
              java.sql.Timestamp.valueOf(t.trim).getTime)
            DeltaLog.forTable(sqlContext.sparkSession, tablePath(parameters))
              .startingVersionAtOrAfterTimestamp(millis)
          case (None, None) => 0L
        },
      ignoreDeletes = flag(parameters, "ignoreDeletes"),
      ignoreChanges = flag(parameters, "ignoreChanges"),
      skipChangeCommits = flag(parameters, "skipChangeCommits"),
      // withEventTimeOrder=true processes the initial snapshot in
      // event-time order; the column is declared explicitly (delta-spark
      // infers it from the query's watermark — a Source cannot see the
      // analyzed plan, so the explicit option is the honest equivalent)
      eventTimeOrderColumn = {
        val on = flag(parameters, "withEventTimeOrder")
        val col = parameters.get("eventTimeOrderColumn").map(_.trim)
        if (on) {
          require(col.exists(_.nonEmpty),
            "withEventTimeOrder=true requires eventTimeOrderColumn=<column>")
          require(!cdf(parameters),
            "withEventTimeOrder applies to the appends stream, not readChangeFeed")
          col
        } else None
      },
      schemaTrackingLocation =
        parameters.get("schemaTrackingLocation").map(_.trim).filter(_.nonEmpty))
}
