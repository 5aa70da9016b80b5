package graft.delta

/** Typed operation names for `CommitInfo.operation` (cf. reference
  * `op/names.go:16`). The reference enumerates the Databricks-lineage
  * history vocabulary as a closed enum; commits in this engine draw
  * from these constants only, so `DESCRIBE HISTORY` is a closed
  * vocabulary rather than free-form strings. The names after the enum
  * block cover the maintenance/DDL surface the reference leaves to the
  * engine on top.
  */
object Op {
  // reference enum, verbatim (op/names.go)
  val Write = "WRITE"
  val StreamingUpdate = "STREAMING_UPDATE"
  val Delete = "DELETE"
  val Truncate = "TRUNCATE"
  val Convert = "CONVERT"
  val Merge = "MERGE"
  val Update = "UPDATE"
  val CreateTable = "CREATE_TABLE"
  val ReplaceTable = "REPLACE_TABLE"
  val SetTableProperties = "SET_TABLE_PROPERTIES"
  val UnsetTableProperties = "UNSET_TABLE_PROPERTIES"
  val AddColumns = "ADD_COLUMNS"
  val ChangeColumn = "CHANGE_COLUMN"
  val ReplaceColumns = "REPLACE_COLUMNS"
  val UpgradeProtocol = "UPGRADE_PROTOCOL"
  val UpgradeSchema = "UPGRADE_SCHEMA"
  val ManualUpdate = "MANUAL_UPDATE"

  // engine-side surface beyond the reference enum. These follow
  // delta-spark's space-separated vocabulary (RENAME COLUMN etc.) since
  // that is the engine layer delta-go leaves unspecified; the reference
  // enum above keeps its underscore style verbatim.
  val Optimize = "OPTIMIZE"
  val Reorg = "REORG"
  val Restore = "RESTORE"
  val Clone = "CLONE"
  val RenameColumn = "RENAME COLUMN"
  val DropColumn = "DROP COLUMN"
  val AddConstraint = "ADD CONSTRAINT"
  val DropConstraint = "DROP CONSTRAINT"
  val SetDomainMetadata = "SET DOMAIN METADATA"
  val Fsck = "FSCK"
  val ClusterBy = "CLUSTER BY"
  val DropFeature = "DROP FEATURE"
  val VacuumStart = "VACUUM START"
  val VacuumEnd = "VACUUM END"
  val CopyInto = "COPY INTO"

  /** The closed vocabulary. `OptimisticTransaction.commit` warns (once
    * per name per JVM) when a commit uses a name outside it, so drift
    * back to free-form strings is visible without breaking user code
    * that deliberately stamps a custom provenance label.
    */
  val all: Set[String] = Set(
    Write, StreamingUpdate, Delete, Truncate, Convert, Merge, Update,
    CreateTable, ReplaceTable, SetTableProperties, UnsetTableProperties,
    AddColumns, ChangeColumn, ReplaceColumns, UpgradeProtocol,
    UpgradeSchema, ManualUpdate, Optimize, Reorg, Restore, Clone,
    RenameColumn, DropColumn, AddConstraint, DropConstraint,
    SetDomainMetadata, Fsck, ClusterBy, DropFeature,
    VacuumStart, VacuumEnd, CopyInto)

  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Warn once per JVM per out-of-vocabulary name (no-op for canonical
    * names). Called from both commit paths.
    */
  def validate(operation: String): Unit =
    if (operation != null && !all(operation) && warned.add(operation))
      System.err.println(
        s"graft-delta: operation name '$operation' is outside the Op vocabulary; " +
          "DESCRIBE HISTORY stays cleaner when commits use graft.delta.Op constants")
}
