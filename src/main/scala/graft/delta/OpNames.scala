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

  // engine-side surface beyond the reference enum
  val Optimize = "OPTIMIZE"
  val Reorg = "REORG"
  val Restore = "RESTORE"
  val Clone = "CLONE"
  val RenameColumn = "RENAME COLUMN"
  val DropColumn = "DROP COLUMN"
  val AddConstraint = "ADD CONSTRAINT"
  val DropConstraint = "DROP CONSTRAINT"

  /** The closed vocabulary; commit paths can validate against it. */
  val all: Set[String] = Set(
    Write, StreamingUpdate, Delete, Truncate, Convert, Merge, Update,
    CreateTable, ReplaceTable, SetTableProperties, UnsetTableProperties,
    AddColumns, ChangeColumn, ReplaceColumns, UpgradeProtocol,
    UpgradeSchema, ManualUpdate, Optimize, Reorg, Restore, Clone,
    RenameColumn, DropColumn, AddConstraint, DropConstraint)
}
