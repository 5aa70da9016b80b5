package graft.delta

import java.net.URLDecoder
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}

/** User-facing ACID table on top of the transaction log — the compute
  * layer the reference intentionally leaves to "the engine on top"
  * (reference README): read snapshots as DataFrames with partition
  * pruning, and write DataFrames as parquet + AddFile commits.
  */
class DeltaTable private (val spark: SparkSession, val deltaLog: DeltaLog) {

  def snapshot: Snapshot = deltaLog.update()

  // ------------------------------------------------------------------ read

  def toDF: DataFrame = readSnapshot(snapshot, None)

  def toDF(versionAsOf: Long): DataFrame =
    readSnapshot(deltaLog.snapshotForVersionAsOf(versionAsOf), None)

  def toDFAsOfTimestamp(timestampMillis: Long): DataFrame =
    readSnapshot(deltaLog.snapshotForTimestampAsOf(timestampMillis), None)

  /** Pruned read: partition conjuncts prune files before the scan, the
    * full predicate is re-applied so residuals push into parquet.
    */
  def read(predicate: Column): DataFrame =
    readSnapshot(snapshot, Some(predicate))

  def scan(predicate: Column): DeltaScan = DeltaScan(snapshot, Some(predicate))

  /** Reads go through [[DeltaFileIndex]]: a HadoopFsRelation whose file
    * listing is served from AddFile metadata, so planning touches no
    * filesystem and partition pruning + stats skipping happen inside
    * Catalyst. Scales to O(10^7) files where a driver-built path list
    * (spark.read.parquet(paths)) would re-stat every file.
    */
  private def readSnapshot(s: Snapshot, predicate: Option[Column]): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    s.assertProtocolRead()
    val md = s.metadata
    val partCols = md.partitionColumns
    val dataSchema = org.apache.spark.sql.types.StructType(
      md.schema.filterNot(f => partCols.contains(f.name)))
    val index = new DeltaFileIndex(deltaLog, s)
    val relation = HadoopFsRelation(
      index, index.partitionSchema, dataSchema, None,
      new ParquetFileFormat(), Map.empty[String, String])(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    // LogicalRelation appends partition cols last; restore metadata order
    var df = org.apache.spark.sql.GraftShims
      .ofRows(spark, LogicalRelation(relation, isStreaming = false))
      .select(md.schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    predicate.foreach(p => df = df.filter(p))
    df
  }

  // ------------------------------------------------------------- history

  /** cf. reference `history_manager.go`: newest-first commit infos. */
  def history(limit: Int = Int.MaxValue): Seq[CommitInfo] =
    deltaLog.listDeltaVersions().reverse.take(limit)
      .flatMap(v => deltaLog.commitInfoAt(v))

  def changes(startVersion: Long, failOnDataLoss: Boolean = false): Iterator[(Long, Seq[Action])] =
    deltaLog.changes(startVersion, failOnDataLoss)

  // -------------------------------------------------------------- write

  /** Append or overwrite the table with a DataFrame. With `mergeSchema`,
    * new columns in the data evolve the table schema in the same commit
    * (old files read the new columns as null); type changes always fail.
    */
  def write(df: DataFrame, mode: SaveMode = SaveMode.Append,
      partitionBy: Seq[String] = Nil, mergeSchema: Boolean = false): Long = {
    val txn = deltaLog.startTransaction()
    val exists = txn.readVersion >= 0 && txn.snapshot.metadataOpt.isDefined
    val partCols = if (exists) txn.metadata.partitionColumns else partitionBy

    if (!exists) {
      txn.updateMetadata(Metadata(
        schemaString = df.schema.json,
        partitionColumns = partCols,
        createdTime = Some(deltaLog.clock.nowMillis)))
    } else {
      val existing = txn.metadata.schema
      val incoming = df.schema
      val existingByName = existing.fields.map(f => f.name -> f.dataType).toMap
      incoming.fields.foreach { f =>
        existingByName.get(f.name).foreach { dt =>
          if (dt != f.dataType)
            throw new IllegalArgumentException(
              s"cannot change type of column ${f.name}: $dt -> ${f.dataType}")
        }
      }
      val newCols = incoming.fields.filterNot(f => existingByName.contains(f.name))
      val missing = existing.fields.filterNot(f => incoming.fieldNames.contains(f.name))
      val same = existing.fields.map(f => (f.name, f.dataType)).toSeq ==
        incoming.fields.map(f => (f.name, f.dataType)).toSeq
      if (mergeSchema) {
        if (missing.nonEmpty)
          throw new IllegalArgumentException(
            s"mergeSchema append is missing table columns: ${missing.map(_.name).mkString(", ")}")
        if (newCols.nonEmpty) {
          val merged = org.apache.spark.sql.types.StructType(
            existing.fields ++ newCols.map(_.copy(nullable = true)))
          txn.updateMetadata(txn.metadata.copy(schemaString = merged.json))
        }
      } else if (!same) {
        throw new IllegalArgumentException(
          s"schema mismatch: table has ${existing.simpleString}, data has " +
            s"${incoming.simpleString} (pass mergeSchema = true to evolve)")
      }
      if (partitionBy.nonEmpty && partitionBy != partCols)
        throw new IllegalArgumentException(
          s"partitioning mismatch: table uses $partCols, got $partitionBy")
    }

    val adds = DeltaTable.writeFiles(spark, deltaLog.dataPath, df, partCols)
    val actions: Seq[Action] = mode match {
      case SaveMode.Append => adds
      case SaveMode.Overwrite =>
        txn.readWholeTable()
        val now = deltaLog.clock.nowMillis
        txn.snapshot.allFiles.map(_.remove(now)) ++ adds
      case m => throw new IllegalArgumentException(s"unsupported save mode $m")
    }
    txn.commit(actions,
      if (mode == SaveMode.Overwrite) "WRITE.Overwrite" else "WRITE.Append")
  }

  /** Exactly-once streaming sink batch (use from `foreachBatch`): the
    * batch is skipped when `SetTransaction(appId)` already covers batchId,
    * so replayed micro-batches after a failure don't duplicate data
    * (cf. reference `action/trx.go` SetTransaction semantics).
    * Returns false when the batch was already committed.
    */
  def writeStreamBatch(df: DataFrame, appId: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean = {
    val txn = deltaLog.startTransaction()
    if (txn.txnVersion(appId) >= batchId) return false
    val exists = txn.readVersion >= 0 && txn.snapshot.metadataOpt.isDefined
    val partCols = if (exists) txn.metadata.partitionColumns else partitionBy
    if (!exists) {
      txn.updateMetadata(Metadata(
        schemaString = df.schema.json,
        partitionColumns = partCols,
        createdTime = Some(deltaLog.clock.nowMillis)))
    }
    val adds = DeltaTable.writeFiles(spark, deltaLog.dataPath, df, partCols)
    txn.commit(adds :+ SetTransaction(appId, batchId, Some(deltaLog.clock.nowMillis)),
      "STREAMING UPDATE")
    true
  }

  /** OPTIMIZE: bin-pack partitions that have more than one file into a
    * single file each. Rewrites carry dataChange=false, so streaming
    * sources over this table skip them (no duplicate delivery) and
    * concurrent appends don't conflict.
    */
  def compact(): Long = {
    val txn = deltaLog.startTransaction()
    val byPartition = txn.snapshot.allFiles.groupBy(_.partitionValues)
    val toCompact = byPartition.filter(_._2.size > 1)
    if (toCompact.isEmpty) return txn.snapshot.version
    val md = txn.metadata
    val now = deltaLog.clock.nowMillis
    val actions = toCompact.flatMap { case (_, files) =>
      val paths = files.map(f => FileNames.absolutePath(deltaLog.dataPath, f.path).toString)
      val df = spark.read
        .schema(md.schema)
        .option("basePath", deltaLog.dataPath.toString)
        .parquet(paths: _*)
        .coalesce(1)
      val adds = DeltaTable.writeFiles(spark, deltaLog.dataPath, df, md.partitionColumns)
        .map(_.copy(dataChange = false))
      files.map(f => f.remove(now, dataChange = false)) ++ adds
    }.toSeq
    txn.commit(actions, "OPTIMIZE")
  }

  /** VACUUM: physically delete data files no longer referenced by the
    * current snapshot and older than the retention window. Returns the
    * deleted paths. Time travel before the vacuumed versions stops
    * working, as in any Delta implementation.
    */
  def vacuum(retentionMillis: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val fs = deltaLog.dataPath.getFileSystem(spark.sessionState.newHadoopConf())
    val s = snapshot
    val active = s.allFiles.map(f => FileNames.absolutePath(deltaLog.dataPath, f.path).toUri.getPath).toSet
    val cutoff = deltaLog.clock.nowMillis - retentionMillis
    val deleted = Seq.newBuilder[String]
    def walk(dir: Path): Unit = {
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) {
            walk(st.getPath)
            if (fs.listStatus(st.getPath).isEmpty) fs.delete(st.getPath, false)
          } else if (name.endsWith(".parquet") &&
              !active.contains(st.getPath.toUri.getPath) &&
              st.getModificationTime <= cutoff) {
            if (fs.delete(st.getPath, false)) deleted += st.getPath.toString
          }
        }
      }
    }
    walk(deltaLog.dataPath)
    deleted.result()
  }

  /** Partition-level delete: drops whole files selected by a
    * partition-column predicate (residual predicates are rejected — this
    * is file-granular, like the reference's metadata-only surface).
    */
  def deleteWhere(partitionPredicate: Column): Long = {
    val txn = deltaLog.startTransaction()
    val scan = DeltaScan(txn.snapshot, Some(partitionPredicate))
    if (scan.residualPredicates.nonEmpty)
      throw new IllegalArgumentException(
        "deleteWhere only supports partition-column predicates; " +
          s"residual: ${scan.residualPredicates.mkString(", ")}")
    val files = txn.markFilesAsRead(partitionPredicate)
    val now = deltaLog.clock.nowMillis
    txn.commit(files.map(_.remove(now)), "DELETE")
  }
}

object DeltaTable {

  def forPath(spark: SparkSession, path: String): DeltaTable =
    new DeltaTable(spark, DeltaLog.forTable(spark, path))

  def isDeltaTable(spark: SparkSession, path: String): Boolean =
    DeltaLog.forTable(spark, path).tableExists

  /** Physically write df as Hive-partitioned parquet under the table root
    * via a staging dir + rename, returning the AddFile actions. Rename is
    * metadata-only on a real FS; object stores would use a direct-write
    * committer instead.
    */
  private[delta] def writeFiles(
      spark: SparkSession, dataPath: Path, df: DataFrame,
      partCols: Seq[String]): Seq[AddFile] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = dataPath.getFileSystem(conf)
    val staging = new Path(dataPath, s".staging-${UUID.randomUUID}")
    try {
      var w = df.write.mode(SaveMode.Overwrite)
      if (partCols.nonEmpty) w = w.partitionBy(partCols: _*)
      w.parquet(staging.toString)

      def collectFiles(dir: Path): Seq[Path] = {
        fs.listStatus(dir).toSeq.flatMap { st =>
          if (st.isDirectory) collectFiles(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
          else Nil
        }
      }

      val stagingQualified = fs.makeQualified(staging).toString
      collectFiles(staging).map { src =>
        // partition dirs between staging root and the file
        val rel = fs.makeQualified(src).toString
          .stripPrefix(stagingQualified).stripPrefix("/")
        val dirs = rel.split('/').dropRight(1)
        val partitionValues = dirs.map { d =>
          val Array(k, v) = d.split("=", 2)
          k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
                else URLDecoder.decode(v, "UTF-8"))
        }.toMap
        val destRel = (dirs :+ s"part-${UUID.randomUUID}.parquet").mkString("/")
        val dest = new Path(dataPath, destRel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(src, dest))
          throw new java.io.IOException(s"failed to move $src -> $dest")
        val st = fs.getFileStatus(dest)
        val stats =
          try Stats.fromFooter(conf, dest, df.schema, partCols)
          catch { case _: Exception => null } // stats are an optimization only
        AddFile(
          path = destRel,
          partitionValues = partitionValues,
          size = st.getLen,
          modificationTime = st.getModificationTime,
          dataChange = true,
          stats = stats)
      }
    } finally {
      fs.delete(staging, true)
    }
  }
}
