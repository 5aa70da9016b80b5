package graft.delta

/** One typed table-configuration knob read from `Metadata.configuration`
  * (cf. reference `config.go` TableConfig / fromMetadata).
  */
final case class TableConfig[T](key: String, default: String, parse: String => T) {
  /** Reads the standard `delta.`-prefixed key, falling back to the
    * unprefixed form the reference's `config.go` reads (so tables created
    * by the reference engine keep their retention/checkpoint/appendOnly
    * settings here), then to the default.
    */
  def fromMetadata(md: Metadata): T =
    parse(md.configuration.getOrElse(key,
      md.configuration.getOrElse(key.stripPrefix("delta."), default)))
}

/** The table tunables the reference centralizes in `config.go`, under the
  * standard `delta.`-prefixed keys. Everything that used to read
  * `metadata.configuration` ad hoc goes through here.
  */
object DeltaConfig {

  /** `interval <number> <unit>` → milliseconds
    * (cf. reference `config.go:46` parseDuration).
    */
  private[delta] def parseInterval(s: String): Long = {
    val fields = s.trim.toLowerCase.split("\\s+")
    require(fields.length == 3 && fields(0) == "interval",
      s"cannot parse duration '$s': expected 'interval <number> <unit>'")
    val n = fields(1).toLong
    val unitMillis = fields(2).stripSuffix("s") match {
      case "millisecond" => 1L
      case "second" => 1000L
      case "minute" => 60L * 1000
      case "hour" => 3600L * 1000
      case "day" => 24L * 3600 * 1000
      case "week" => 7L * 24 * 3600 * 1000
      case u => throw new IllegalArgumentException(s"unknown duration unit '$u' in '$s'")
    }
    n * unitMillis
  }

  /** cf. reference `config.go:63` DeltaConfigLogRetention. */
  val LogRetention: TableConfig[Long] =
    TableConfig("delta.logRetentionDuration", "interval 30 days", parseInterval)

  /** VACUUM's retention window
    * (cf. reference `config.go:69` DeltaConfigTombstoneRetention).
    */
  val TombstoneRetention: TableConfig[Long] =
    TableConfig("delta.deletedFileRetentionDuration", "interval 1 week", parseInterval)

  /** SetTransaction retention (public spec
    * `delta.setTransactionRetentionDuration`; delta-spark parity): when
    * set, checkpoints drop idempotent-writer entries whose lastUpdated
    * is older than the horizon, bounding txn state on tables written by
    * many streaming appIds over years. Unset (the default) retains all
    * — expiring an entry re-opens its appId to replays, so opting in is
    * an explicit statement that replays older than the horizon are
    * impossible. Entries WITHOUT lastUpdated never expire (no evidence
    * of age).
    */
  val TxnRetention: TableConfig[Option[Long]] =
    TableConfig("delta.setTransactionRetentionDuration", "",
      s => if (s.trim.isEmpty) None else Some(parseInterval(s)))

  /** cf. reference `config.go:75` DeltaConfigCheckpointInterval. */
  val CheckpointInterval: TableConfig[Int] =
    TableConfig("delta.checkpointInterval", "10", _.trim.toInt)

  /** Max actions per checkpoint part file (multi-part checkpoints, A17). */
  val CheckpointPartSize: TableConfig[Option[Long]] =
    TableConfig("delta.checkpoint.partSize", "",
      s => if (s.trim.isEmpty) None else Some(s.trim.toLong))

  /** `classic` (default) or `v2` — manifest + incremental sidecars (A48). */
  val CheckpointPolicy: TableConfig[String] =
    TableConfig("delta.checkpointPolicy", "classic", _.trim.toLowerCase)

  /** Hash buckets (= max sidecar files) of a v2 checkpoint. More buckets
    * = finer-grained incremental reuse, more small files; size it so one
    * bucket's actions stay a comfortable parquet file (~10^5 actions).
    */
  val CheckpointNumSidecars: TableConfig[Int] =
    TableConfig("delta.checkpoint.numSidecars", "16", _.trim.toInt)

  /** cf. reference `config.go:84` DeltaConfigEnableExpiredLogCleanup. */
  val EnableExpiredLogCleanup: TableConfig[Boolean] =
    TableConfig("delta.enableExpiredLogCleanup", "true", _.trim.toLowerCase == "true")

  /** `checkpointProtection` table feature (public Delta spec): writers
    * must not create checkpoints at versions below this boundary, and
    * expired-log cleanup must sweep the protected region [0, V)
    * atomically — all of it (with a covering checkpoint at >= V) or none
    * of it. This is what makes DROP FEATURE ... TRUNCATE HISTORY sound
    * against newer writers: a checkpoint written inside the region could
    * materialize state under a protocol the checkpointing writer does
    * not fully understand.
    */
  val RequireCheckpointProtectionBeforeVersion: TableConfig[Long] =
    TableConfig("delta.requireCheckpointProtectionBeforeVersion", "0",
      _.trim.toLong)

  /** Reject data-changing removes when set
    * (cf. reference `config.go:92` DeltaConfigIsAppendOnly).
    */
  val AppendOnly: TableConfig[Boolean] =
    TableConfig("delta.appendOnly", "false", _.trim.toLowerCase == "true")

  /** Allow in-place column type widening on mergeSchema writes (Delta's
    * `typeWidening` reader+writer table feature): existing files keep the
    * narrow physical type and promote at read time.
    */
  val EnableTypeWidening: TableConfig[Boolean] =
    TableConfig("delta.enableTypeWidening", "false", _.trim.toLowerCase == "true")

  /** Checkpoints additionally materialize AddFile stats as a parsed
    * struct column (`add.stats_parsed`, delta-spark's convention): scan
    * planning over a 10^7-file table then skips on native parquet
    * columns instead of JSON-parsing every file's stats string.
    */
  val WriteStatsAsStruct: TableConfig[Boolean] =
    TableConfig("delta.checkpoint.writeStatsAsStruct", "false",
      _.trim.toLowerCase == "true")

  /** With writeStatsAsStruct on, setting this false drops the redundant
    * stats JSON string from checkpoint rows (the struct is the source;
    * readers reconstruct the JSON lazily) — roughly halves checkpoint
    * stats bytes on wide tables.
    */
  val WriteStatsAsJson: TableConfig[Boolean] =
    TableConfig("delta.checkpoint.writeStatsAsJson", "true",
      _.trim.toLowerCase == "true")

  /** Commit timestamps written INTO the commit (CommitInfo
    * `inCommitTimestamp`) instead of relying on log-file mtimes, which
    * object stores may rewrite (replication, bucket migration). Timestamp
    * time travel then has a source of truth that survives file copies.
    */
  val InCommitTimestamps: TableConfig[Boolean] =
    TableConfig("delta.enableInCommitTimestamps", "false", _.trim.toLowerCase == "true")

  /** First version whose commit carries an inCommitTimestamp (recorded
    * automatically when the table enables ICT after creation; absent =
    * enabled from version 0).
    */
  val IctEnablementVersionKey = "delta.inCommitTimestampEnablementVersion"
  val IctEnablementTimestampKey = "delta.inCommitTimestampEnablementTimestamp"

  /** OPTIMIZE's target output file size. */
  val TargetFileSize: TableConfig[Long] =
    TableConfig("delta.targetFileSize", (128L * 1024 * 1024).toString, _.trim.toLong)

  /** Optimized write: rebalance-shuffle the batch on the partition
    * columns before writing, so each Hive partition gets ~1 well-sized
    * file per commit instead of one file per (task x partition value).
    * The difference between O(tasks x partitions) and O(partitions)
    * files per append — at 1000 executors that is the difference
    * between a healthy log and a million-file small-file problem.
    */
  val OptimizedWrite: TableConfig[Boolean] =
    TableConfig("delta.autoOptimize.optimizeWrite", "false", _.trim.toLowerCase == "true")

  /** Auto compaction: after a write commit, bin-pack any just-touched
    * partition that accumulated `autoCompact.minNumFiles`+ active files.
    */
  val AutoCompact: TableConfig[Boolean] =
    TableConfig("delta.autoOptimize.autoCompact", "false", _.trim.toLowerCase == "true")

  val AutoCompactMinNumFiles: TableConfig[Int] =
    TableConfig("delta.autoOptimize.autoCompact.minNumFiles", "10", _.trim.toInt)

  /** Declared clustering columns (liquid-clustering-style UX): a plain
    * OPTIMIZE re-clusters along these instead of bin-packing, so the
    * maintenance job needs no per-table knowledge of the query columns.
    */
  val ClusteringColumns: TableConfig[Seq[String]] =
    TableConfig("delta.clusteringColumns", "",
      v => v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  /** Space-filling curve for multi-column clustering: `zorder` (Morton,
    * the default) or `hilbert` (unit-step walk, tighter per-file
    * min/max boxes — what liquid clustering uses). Applies wherever a
    * multi-column cluster key is built (declared clustering columns and
    * OPTIMIZE ZORDER BY alike; a single column needs no curve).
    */
  val ClusteringStrategy: TableConfig[String] =
    TableConfig("delta.clusteringStrategy", "zorder", { v =>
      val s = v.trim.toLowerCase
      require(s == "zorder" || s == "hilbert",
        s"delta.clusteringStrategy must be zorder or hilbert, got $v")
      s
    })

  /** Incremental-clustering stability threshold: a ZCube whose total
    * bytes reach this size is FINAL — plain OPTIMIZE never rewrites it
    * again (only `OPTIMIZE ... FULL` does). Smaller cubes keep merging
    * with new data until they reach it. 100 GB default (the delta-spark
    * convention): big enough that a mature table is mostly final cubes,
    * so nightly OPTIMIZE cost tracks the day's ingest, not table size.
    */
  val ClusteringMinCubeSize: TableConfig[Long] =
    TableConfig("delta.clustering.minCubeSize",
      (100L * 1024 * 1024 * 1024).toString, _.trim.toLong)

  /** Row-level change capture for DML: DELETE/UPDATE/MERGE also write
    * their changed rows as CDC files (`_change_data/`, AddCDCFile) that
    * `tableChanges` reads back exactly (the open Delta CDF convention).
    */
  val EnableChangeDataFeed: TableConfig[Boolean] =
    TableConfig("delta.enableChangeDataFeed", "false", _.trim.toLowerCase == "true")

  /** Merge-on-read DELETE: write per-file deletion vectors instead of
    * rewriting files (see [[DeletionVectors]]); OPTIMIZE materializes.
    */
  val EnableDeletionVectors: TableConfig[Boolean] =
    TableConfig("delta.enableDeletionVectors", "false", _.trim.toLowerCase == "true")

  /** Stable per-row ids (open `rowTracking` writer feature) — see
    * [[RowTracking]].
    */
  val RowTracking: TableConfig[Boolean] =
    TableConfig("delta.enableRowTracking", "false", _.trim.toLowerCase == "true")

  /** Index (collect min/max stats for) only the first N schema columns;
    * -1 indexes all. Bounds footer harvesting + stats JSON on very wide
    * tables (Delta's `dataSkippingNumIndexedCols`, default 32).
    */
  /** Explicit stats column list (delta-spark's
    * `delta.dataSkippingStatsColumns`): when set, min/max stats are
    * collected for EXACTLY these columns, overriding the positional
    * numIndexedCols cap — on a 1000-column table the three columns
    * queries actually filter on may sit anywhere in the schema.
    */
  val DataSkippingStatsColumns: TableConfig[Seq[String]] =
    TableConfig("delta.dataSkippingStatsColumns", "",
      v => v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  val DataSkippingNumIndexedCols: TableConfig[Int] =
    TableConfig("delta.dataSkippingNumIndexedCols", "32", _.trim.toInt)

  /** Columns that get NATIVE parquet bloom filters at write time
    * (comma-separated; empty = none). min/max stats cannot skip point
    * lookups on high-cardinality unsorted columns (uuid-ish ids hit
    * every file's [min,max]); a bloom answers "definitely not here"
    * per row group, and the stock parquet reader applies it to pushed
    * equality predicates with no reader-side change. The filter lives
    * IN the parquet file — nothing is added to the log, so 10^7-file
    * tables pay zero metadata cost.
    */
  val BloomFilterColumns: TableConfig[Seq[String]] =
    TableConfig("delta.bloomFilter.columns", "",
      _.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  /** Expected distinct values per row group for the bloom sizing
    * (parquet.bloom.filter.expected.ndv); ~1.2 bytes/value at the
    * default 1% false-positive rate.
    */
  val BloomFilterNdv: TableConfig[Long] =
    TableConfig("delta.bloomFilter.ndv", "100000", _.trim.toLong)

  /** Minor log compaction every N commits (0 = off): each window of N
    * deltas is reconciled into one `<s>.<e>.compacted.json` that replay
    * substitutes for the raw files — see [[DeltaLog.compactDeltas]].
    */
  val LogCompactionInterval: TableConfig[Int] =
    TableConfig("delta.logCompaction.interval", "0", _.trim.toInt)

  /** Coordinated commits (writer feature `coordinatedCommits`): the
    * external authority that ratifies commits — "memory:<name>" resolves
    * the in-process registry (tests / single-host multi-session; a
    * catalog or DynamoDB endpoint in a real deployment). Empty = classic
    * filesystem put-if-absent commits.
    */
  val CommitCoordinatorName: TableConfig[String] =
    TableConfig("delta.coordinatedCommits.commitCoordinator", "", _.trim)

  /** Backfill cadence for coordinated commits: copy ratified staged
    * commits to classic `<v>.json` names every N versions. 1 (default)
    * = synchronous backfill on every commit.
    */
  val CoordinatedBackfillBatchSize: TableConfig[Int] =
    TableConfig("delta.coordinatedCommits.backfillBatchSize", "1", _.trim.toInt)

  /** `none` | `name` | `id` — see [[ColumnMapping]]. */
  val ColumnMappingMode: TableConfig[String] =
    TableConfig("delta.columnMapping.mode", "none", _.trim.toLowerCase)

  /** UniForm: foreign-format metadata generated after each commit
    * (`iceberg` is the supported value — see [[IcebergMetadata]]).
    * Comma-separated, like delta-spark's
    * `delta.universalFormat.enabledFormats`.
    */
  val UniversalFormats: TableConfig[Seq[String]] =
    TableConfig("delta.universalFormat.enabledFormats", "",
      v => v.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
}

/** AddFile tag names stamped on clustered (Z-ordered) output files —
  * the open delta-spark tag convention (cf. reference clustering
  * metadata domains; delta-spark `ZCubeInfo`), so foreign readers see
  * the same provenance delta-spark writes. A "ZCube" is one OPTIMIZE
  * job's output: files sorted together along one space-filling curve
  * over one clustering-column set. Incremental OPTIMIZE uses the tags
  * to leave current full-size cubes alone.
  */
object ZCube {
  /** uuid of the clustering job that wrote the file */
  val IdTag = "ZCUBE_ID"
  /** comma-joined clustering columns the cube was laid out along */
  val SpecTag = "ZCUBE_ZORDER_BY"
  /** space-filling curve used (`zorder` | `hilbert`) */
  val CurveTag = "ZCUBE_ZORDER_CURVE"

  /** The file's cube id, IF it was clustered along exactly `spec`
    * (comma-joined clustering columns) — a cube laid out along a
    * different column set counts as unclustered for the current spec.
    */
  def of(f: AddFile, spec: String): Option[String] = {
    val t = Option(f.tags).getOrElse(Map.empty[String, String])
    t.get(IdTag).filter(_ => t.get(SpecTag).contains(spec))
  }
}
