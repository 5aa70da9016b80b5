package graft.delta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta transaction-log actions and their JSON-line codec.
  *
  * Re-expresses the reference action model (cf. reference `action/action.go`,
  * `action/add.go:1`, `action/remove.go:1`, `action/metadata.go:1`,
  * `action/protocol.go:1`, `action/trx.go:1`, `action/commit_info.go:1`,
  * `action/cdc.go:1`) as Scala case classes that double as Spark Encoder
  * products, so the same types serve the driver-side JSON tail and the
  * Spark-side checkpoint DataFrames.
  *
  * Wire format: one JSON object per line, single key naming the action
  * (`add`, `remove`, `metaData`, `protocol`, `txn`, `commitInfo`, `cdc`).
  */
sealed trait Action {
  def wrap: SingleAction
}

final case class Format(
    provider: String = "parquet",
    options: Map[String, String] = Map.empty)

/** cf. reference `action/metadata.go` (Metadata). */
final case class Metadata(
    id: String = java.util.UUID.randomUUID.toString,
    name: String = null,
    description: String = null,
    format: Format = Format(),
    schemaString: String = null,
    partitionColumns: Seq[String] = Nil,
    configuration: Map[String, String] = Map.empty,
    createdTime: Option[Long] = None) extends Action {
  def schema: StructType =
    if (schemaString == null) new StructType()
    else DataType.fromJson(schemaString).asInstanceOf[StructType]
  def wrap: SingleAction = SingleAction(metaData = this)
}

/** cf. reference `action/protocol.go`; extended with the open Delta
  * TABLE FEATURES shape (reader v3 / writer v7): capability names listed
  * explicitly so clients gate on what a table actually uses rather than
  * a monolithic version number.
  */
final case class Protocol(
    minReaderVersion: Int = 1,
    minWriterVersion: Int = 2,
    readerFeatures: Option[Set[String]] = None,
    writerFeatures: Option[Set[String]] = None) extends Action {
  def wrap: SingleAction = SingleAction(protocol = this)
}

object Protocol {
  // features a legacy (pre-table-features) version number implies; when a
  // table upgrades to reader 3 / writer 7 these must be listed explicitly
  // so feature-gating clients keep working (public table-features spec)
  private[delta] def readerImplicits(v: Int): Set[String] =
    if (v >= 2) Set("columnMapping") else Set.empty
  private[delta] def writerImplicits(v: Int): Set[String] = {
    var s = Set.empty[String]
    if (v >= 2) s ++= Set("appendOnly", "invariants")
    if (v >= 3) s += "checkConstraints"
    if (v >= 4) s ++= Set("changeDataFeed", "generatedColumns")
    if (v >= 5) s += "columnMapping"
    if (v >= 6) s += "identityColumns"
    s
  }

  /** The upgrade action needed before committing data that uses a
    * reader+writer `feature` (e.g. "deletionVectors"), or None when `p`
    * already supports it. The result is reader 3 / writer 7 with the
    * old protocol's implicit features made explicit.
    */
  def requireReaderWriterFeature(p: Protocol, feature: String): Option[Protocol] = {
    val hasReader = p.minReaderVersion >= 3 &&
      p.readerFeatures.exists(_.contains(feature))
    val hasWriter = p.minWriterVersion >= 7 &&
      p.writerFeatures.exists(_.contains(feature))
    if (hasReader && hasWriter) None
    else Some(Protocol(3, 7,
      Some(p.readerFeatures.getOrElse(Set.empty) ++
        readerImplicits(p.minReaderVersion) + feature),
      Some(p.writerFeatures.getOrElse(Set.empty) ++
        writerImplicits(p.minWriterVersion) + feature)))
  }

  /** Writer-only variant: the upgrade to writer v7 listing `features`
    * (plus the old version's implicit features), or None when `p` already
    * lists them all. The reader version is untouched — writer features
    * like `rowTracking`/`domainMetadata` don't constrain readers.
    */
  def requireWriterFeatures(p: Protocol, features: Set[String]): Option[Protocol] = {
    val has = p.minWriterVersion == 7 &&
      features.subsetOf(p.writerFeatures.getOrElse(Set.empty))
    if (has) None
    else {
      val base =
        if (p.minWriterVersion == 7) p.writerFeatures.getOrElse(Set.empty)
        else p.writerFeatures.getOrElse(Set.empty) ++ writerImplicits(p.minWriterVersion)
      Some(p.copy(minWriterVersion = 7, writerFeatures = Some(base ++ features)))
    }
  }
}

sealed trait FileAction extends Action {
  def path: String
  def dataChange: Boolean
}

/** Open Delta protocol deletion-vector descriptor (PROTOCOL.md
  * "Deletion Vectors"). `storageType` is `"u"` (path derived from a
  * Z85-encoded UUID relative to the table root, with an optional
  * directory prefix carried in front of the 20-char UUID), `"p"`
  * (absolute path) or `"i"` (bitmap bytes inline, Z85). `offset` points
  * at the DV's 4-byte length prefix inside the shared `.bin` file;
  * `sizeInBytes` is the serialized-bitmap length those 4 bytes must
  * repeat; `cardinality` the number of deleted rows.
  */
final case class DeletionVectorDescriptor(
    storageType: String,
    pathOrInlineDv: String,
    offset: Option[Int] = None,
    sizeInBytes: Int = 0,
    cardinality: Long = 0L)

/** cf. reference `action/add.go` (AddFile). `baseRowId` and
  * `defaultRowCommitVersion` are the open row-tracking protocol fields:
  * a row's fresh id is `baseRowId + <position in file>` unless the file
  * carries materialized row-id columns (see [[RowTracking]]).
  */
final case class AddFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    modificationTime: Long = 0L,
    dataChange: Boolean = true,
    stats: String = null,
    tags: Map[String, String] = null,
    deletionVector: DeletionVectorDescriptor = null,
    baseRowId: Option[Long] = None,
    defaultRowCommitVersion: Option[Long] = None) extends FileAction {
  def remove(deletionTimestamp: Long, dataChange: Boolean = true): RemoveFile =
    RemoveFile(path, Some(deletionTimestamp), dataChange,
      extendedFileMetadata = true, partitionValues, Some(size),
      // tags ride along: a CDF delete category reads the removed file's
      // rows, and a ReadDefaults missing-columns tag must keep applying
      tags = tags,
      deletionVector = deletionVector)
  def wrap: SingleAction = SingleAction(add = this)
}

/** cf. reference `action/remove.go` (RemoveFile). */
final case class RemoveFile(
    path: String,
    deletionTimestamp: Option[Long] = None,
    dataChange: Boolean = true,
    extendedFileMetadata: Boolean = false,
    partitionValues: Map[String, String] = null,
    size: Option[Long] = None,
    tags: Map[String, String] = null,
    deletionVector: DeletionVectorDescriptor = null) extends FileAction {
  def wrap: SingleAction = SingleAction(remove = this)
}

/** cf. reference `action/cdc.go` (AddCDCFile). */
final case class AddCDCFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    tags: Map[String, String] = null) extends Action {
  def wrap: SingleAction = SingleAction(cdc = this)
}

/** Open Delta protocol domain metadata (PROTOCOL.md "Domain Metadata"):
  * a named configuration domain owned by the system or the user.
  * `configuration` is an opaque serialized string (JSON by convention);
  * `removed = true` tombstones the domain. Snapshot replay keeps the
  * latest action per domain; checkpoints persist live domains only.
  */
final case class DomainMetadata(
    domain: String,
    configuration: String = null,
    removed: Boolean = false) extends Action {
  def wrap: SingleAction = SingleAction(domainMetadata = this)
}

/** V2-checkpoint manifest marker (open protocol "V2 Checkpoint Table
  * Feature"): present exactly once in a v2 checkpoint manifest, naming
  * the checkpointed version.
  */
final case class CheckpointMetadata(version: Long) extends Action {
  def wrap: SingleAction = SingleAction(checkpointMetadata = this)
}

/** One sidecar of a v2 checkpoint: a parquet file under
  * `_delta_log/_sidecars/` holding a bucket of the file actions. The
  * file NAME carries (bucketing, bucket, content fingerprint), which is
  * what makes incremental reuse possible: a bucket whose fingerprint is
  * unchanged since the previous checkpoint references the SAME sidecar
  * file instead of rewriting it.
  */
final case class SidecarFile(
    path: String,
    sizeInBytes: Long = 0L,
    modificationTime: Long = 0L) extends Action {
  def wrap: SingleAction = SingleAction(sidecar = this)
}

/** cf. reference `action/trx.go` (SetTransaction). */
final case class SetTransaction(
    appId: String,
    version: Long,
    lastUpdated: Option[Long] = None) extends Action {
  def wrap: SingleAction = SingleAction(txn = this)
}

/** cf. reference `action/commit_info.go` (trimmed to the portable core). */
/** Job provenance of a commit written by a scheduled-job engine
  * (cf. reference `action/job_info.go:3`). Carried verbatim so history
  * written by a Databricks-lineage writer round-trips without loss.
  */
final case class JobInfo(
    jobId: Option[String] = None,
    jobName: Option[String] = None,
    runId: Option[String] = None,
    jobOwnerId: Option[String] = None,
    triggerType: Option[String] = None)

/** Notebook provenance (cf. reference `action/notebook_info.go:3`). */
final case class NotebookInfo(notebookId: Option[String] = None)

final case class CommitInfo(
    version: Option[Long] = None,
    timestamp: Long = 0L,
    operation: String = null,
    operationParameters: Map[String, String] = Map.empty,
    readVersion: Option[Long] = None,
    isolationLevel: Option[String] = None,
    isBlindAppend: Option[Boolean] = None,
    operationMetrics: Map[String, String] = Map.empty,
    engineInfo: Option[String] = None,
    txnId: Option[String] = None,
    inCommitTimestamp: Option[Long] = None,
    // interop provenance fields (cf. reference `action/commit_info.go:16`):
    // not produced by this engine's write path, but preserved exactly
    // through replay/history so foreign commits re-emit without loss
    userId: Option[String] = None,
    userName: Option[String] = None,
    job: Option[JobInfo] = None,
    notebook: Option[NotebookInfo] = None,
    clusterId: Option[String] = None,
    userMetadata: Option[String] = None) extends Action {
  def wrap: SingleAction = SingleAction(commitInfo = this)
}

/** One log line; exactly one field is non-null. Doubles as the checkpoint
  * parquet row schema (cf. reference `checkpoint_writer.go`).
  */
final case class SingleAction(
    txn: SetTransaction = null,
    add: AddFile = null,
    remove: RemoveFile = null,
    metaData: Metadata = null,
    protocol: Protocol = null,
    cdc: AddCDCFile = null,
    commitInfo: CommitInfo = null,
    domainMetadata: DomainMetadata = null,
    checkpointMetadata: CheckpointMetadata = null,
    sidecar: SidecarFile = null) {
  def unwrap: Action =
    if (add != null) add
    else if (remove != null) remove
    else if (metaData != null) metaData
    else if (protocol != null) protocol
    else if (txn != null) txn
    else if (cdc != null) cdc
    else if (commitInfo != null) commitInfo
    else if (domainMetadata != null) domainMetadata
    else if (checkpointMetadata != null) checkpointMetadata
    else if (sidecar != null) sidecar
    else null
}

/** JSON-line codec (Jackson tree API; no scala module dependency). */
object Actions {
  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- write
  private def put(o: ObjectNode, k: String, v: String): Unit =
    if (v != null) o.put(k, v)
  private def putMap(o: ObjectNode, k: String, m: Map[String, String]): Unit =
    if (m != null) {
      val n = o.putObject(k)
      m.foreach { case (mk, mv) => if (mv == null) n.putNull(mk) else n.put(mk, mv) }
    }
  private def putDv(o: ObjectNode, dv: DeletionVectorDescriptor): Unit =
    if (dv != null) {
      val n = o.putObject("deletionVector")
      n.put("storageType", dv.storageType)
      n.put("pathOrInlineDv", dv.pathOrInlineDv)
      dv.offset.foreach(n.put("offset", _))
      n.put("sizeInBytes", dv.sizeInBytes)
      n.put("cardinality", dv.cardinality)
    }

  def toJson(a: Action): String = {
    val root = mapper.createObjectNode()
    a match {
      case f: AddFile =>
        val o = root.putObject("add")
        o.put("path", f.path)
        putMap(o, "partitionValues", f.partitionValues)
        o.put("size", f.size)
        o.put("modificationTime", f.modificationTime)
        o.put("dataChange", f.dataChange)
        put(o, "stats", f.stats)
        putMap(o, "tags", f.tags)
        putDv(o, f.deletionVector)
        f.baseRowId.foreach(o.put("baseRowId", _))
        f.defaultRowCommitVersion.foreach(o.put("defaultRowCommitVersion", _))
      case f: RemoveFile =>
        val o = root.putObject("remove")
        o.put("path", f.path)
        f.deletionTimestamp.foreach(o.put("deletionTimestamp", _))
        o.put("dataChange", f.dataChange)
        o.put("extendedFileMetadata", f.extendedFileMetadata)
        putMap(o, "partitionValues", f.partitionValues)
        f.size.foreach(o.put("size", _))
        putMap(o, "tags", f.tags)
        putDv(o, f.deletionVector)
      case m: Metadata =>
        val o = root.putObject("metaData")
        put(o, "id", m.id)
        put(o, "name", m.name)
        put(o, "description", m.description)
        val fo = o.putObject("format")
        fo.put("provider", m.format.provider)
        val foo = fo.putObject("options")
        m.format.options.foreach { case (k, v) => foo.put(k, v) }
        put(o, "schemaString", m.schemaString)
        val pc = o.putArray("partitionColumns")
        m.partitionColumns.foreach(pc.add)
        putMap(o, "configuration", m.configuration)
        m.createdTime.foreach(o.put("createdTime", _))
      case p: Protocol =>
        val o = root.putObject("protocol")
        o.put("minReaderVersion", p.minReaderVersion)
        o.put("minWriterVersion", p.minWriterVersion)
        p.readerFeatures.foreach { fs =>
          val a = o.putArray("readerFeatures"); fs.toSeq.sorted.foreach(a.add)
        }
        p.writerFeatures.foreach { fs =>
          val a = o.putArray("writerFeatures"); fs.toSeq.sorted.foreach(a.add)
        }
      case d: DomainMetadata =>
        val o = root.putObject("domainMetadata")
        o.put("domain", d.domain)
        put(o, "configuration", d.configuration)
        o.put("removed", d.removed)
      case c: CheckpointMetadata =>
        root.putObject("checkpointMetadata").put("version", c.version)
      case sf: SidecarFile =>
        val o = root.putObject("sidecar")
        o.put("path", sf.path)
        o.put("sizeInBytes", sf.sizeInBytes)
        o.put("modificationTime", sf.modificationTime)
      case t: SetTransaction =>
        val o = root.putObject("txn")
        o.put("appId", t.appId)
        o.put("version", t.version)
        t.lastUpdated.foreach(o.put("lastUpdated", _))
      case c: AddCDCFile =>
        val o = root.putObject("cdc")
        o.put("path", c.path)
        putMap(o, "partitionValues", c.partitionValues)
        o.put("size", c.size)
        putMap(o, "tags", c.tags)
      case ci: CommitInfo =>
        // field order mirrors the reference struct (commit_info.go:13) so
        // a foreign commit parses and re-emits byte-stable
        val o = root.putObject("commitInfo")
        ci.version.foreach(o.put("version", _))
        o.put("timestamp", ci.timestamp)
        ci.userId.foreach(o.put("userId", _))
        ci.userName.foreach(o.put("userName", _))
        put(o, "operation", ci.operation)
        putMap(o, "operationParameters", ci.operationParameters)
        ci.job.foreach { j =>
          val jo = o.putObject("job")
          j.jobId.foreach(jo.put("jobId", _))
          j.jobName.foreach(jo.put("jobName", _))
          j.runId.foreach(jo.put("runId", _))
          j.jobOwnerId.foreach(jo.put("jobOwnerId", _))
          j.triggerType.foreach(jo.put("triggerType", _))
        }
        ci.notebook.foreach { nb =>
          val no = o.putObject("notebook")
          nb.notebookId.foreach(no.put("notebookId", _))
        }
        ci.clusterId.foreach(o.put("clusterId", _))
        ci.readVersion.foreach(o.put("readVersion", _))
        ci.isolationLevel.foreach(o.put("isolationLevel", _))
        ci.isBlindAppend.foreach(o.put("isBlindAppend", _))
        putMap(o, "operationMetrics", ci.operationMetrics)
        ci.userMetadata.foreach(o.put("userMetadata", _))
        ci.engineInfo.foreach(o.put("engineInfo", _))
        ci.txnId.foreach(o.put("txnId", _))
        ci.inCommitTimestamp.foreach(o.put("inCommitTimestamp", _))
    }
    mapper.writeValueAsString(root)
  }

  // ----------------------------------------------------------------- read
  private def str(n: JsonNode, k: String): String = {
    val v = n.get(k)
    if (v == null || v.isNull) null else v.asText()
  }
  private def optLong(n: JsonNode, k: String): Option[Long] = {
    val v = n.get(k)
    if (v == null || v.isNull) None else Some(v.asLong())
  }
  private def long(n: JsonNode, k: String, dflt: Long = 0L): Long = {
    val v = n.get(k)
    if (v == null || v.isNull) dflt else v.asLong()
  }
  private def bool(n: JsonNode, k: String, dflt: Boolean = false): Boolean = {
    val v = n.get(k)
    if (v == null || v.isNull) dflt else v.asBoolean()
  }
  private def strMap(n: JsonNode, k: String): Map[String, String] = {
    val v = n.get(k)
    if (v == null || v.isNull) null
    else {
      val b = Map.newBuilder[String, String]
      val it = v.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }
  }
  private def nonNullMap(m: Map[String, String]): Map[String, String] =
    if (m == null) Map.empty else m
  private def dvOf(n: JsonNode): DeletionVectorDescriptor = {
    val d = n.get("deletionVector")
    if (d == null || d.isNull) null
    else DeletionVectorDescriptor(
      str(d, "storageType"), str(d, "pathOrInlineDv"),
      optLong(d, "offset").map(_.toInt), long(d, "sizeInBytes").toInt,
      long(d, "cardinality"))
  }

  def fromJson(line: String): Option[Action] = {
    val root = mapper.readTree(line)
    val it = root.properties().iterator()
    if (!it.hasNext) return None
    val e = it.next()
    val n = e.getValue
    e.getKey match {
      case "add" => Some(AddFile(
        str(n, "path"), nonNullMap(strMap(n, "partitionValues")), long(n, "size"),
        long(n, "modificationTime"), bool(n, "dataChange", dflt = true),
        str(n, "stats"), strMap(n, "tags"), dvOf(n),
        optLong(n, "baseRowId"), optLong(n, "defaultRowCommitVersion")))
      case "remove" => Some(RemoveFile(
        str(n, "path"), optLong(n, "deletionTimestamp"), bool(n, "dataChange", dflt = true),
        bool(n, "extendedFileMetadata"), strMap(n, "partitionValues"),
        optLong(n, "size"), strMap(n, "tags"), dvOf(n)))
      case "metaData" =>
        val fmt = n.get("format")
        Some(Metadata(
          str(n, "id"), str(n, "name"), str(n, "description"),
          if (fmt == null || fmt.isNull) Format()
          else Format(Option(str(fmt, "provider")).getOrElse("parquet"),
            nonNullMap(strMap(fmt, "options"))),
          str(n, "schemaString"),
          {
            val pc = n.get("partitionColumns")
            if (pc == null || pc.isNull) Nil
            else (0 until pc.size()).map(pc.get(_).asText())
          },
          nonNullMap(strMap(n, "configuration")), optLong(n, "createdTime")))
      case "protocol" =>
        def features(field: String): Option[Set[String]] = {
          val a = n.get(field)
          if (a == null || a.isNull) None
          else Some((0 until a.size()).map(a.get(_).asText()).toSet)
        }
        Some(Protocol(
          long(n, "minReaderVersion", 1).toInt, long(n, "minWriterVersion", 2).toInt,
          features("readerFeatures"), features("writerFeatures")))
      case "domainMetadata" => Some(DomainMetadata(
        str(n, "domain"), str(n, "configuration"), bool(n, "removed")))
      case "checkpointMetadata" => Some(CheckpointMetadata(long(n, "version")))
      case "sidecar" => Some(SidecarFile(
        str(n, "path"), long(n, "sizeInBytes"), long(n, "modificationTime")))
      case "txn" => Some(SetTransaction(
        str(n, "appId"), long(n, "version"), optLong(n, "lastUpdated")))
      case "cdc" => Some(AddCDCFile(
        str(n, "path"), nonNullMap(strMap(n, "partitionValues")),
        long(n, "size"), strMap(n, "tags")))
      case "commitInfo" =>
        val jobNode = n.get("job")
        val job =
          if (jobNode == null || jobNode.isNull) None
          else Some(JobInfo(
            Option(str(jobNode, "jobId")), Option(str(jobNode, "jobName")),
            Option(str(jobNode, "runId")), Option(str(jobNode, "jobOwnerId")),
            Option(str(jobNode, "triggerType"))))
        val nbNode = n.get("notebook")
        val notebook =
          if (nbNode == null || nbNode.isNull) None
          else Some(NotebookInfo(Option(str(nbNode, "notebookId"))))
        Some(CommitInfo(
          optLong(n, "version"), long(n, "timestamp"), str(n, "operation"),
          nonNullMap(strMap(n, "operationParameters")), optLong(n, "readVersion"),
          Option(str(n, "isolationLevel")),
          { val v = n.get("isBlindAppend"); if (v == null || v.isNull) None else Some(v.asBoolean()) },
          nonNullMap(strMap(n, "operationMetrics")), Option(str(n, "engineInfo")),
          Option(str(n, "txnId")), optLong(n, "inCommitTimestamp"),
          Option(str(n, "userId")), Option(str(n, "userName")), job, notebook,
          Option(str(n, "clusterId")), Option(str(n, "userMetadata"))))
      case _ => None // unknown action: forward-compatible skip
    }
  }
}

/** Delta schema codec. Delta's `schemaString` IS Spark's DataType JSON
  * format (shared lineage) — cf. reference `types/type_parser.go`, which
  * parses the identical structure. Round-trip validated in specs.
  */
object SchemaCodec {
  def toJson(schema: StructType): String = schema.json
  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]
}
