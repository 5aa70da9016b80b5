package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COPY INTO (the delta-spark/lakehouse idempotent bulk-load surface):
  * load files from a location into a Delta table, skipping files already
  * loaded — re-running the same COPY INTO is a no-op, which is what
  * makes scheduled ingestion retry-safe at 100 TB.
  *
  *   COPY INTO tbl FROM '<dir>' FILEFORMAT = PARQUET
  *     [PATTERN = '<glob>'] [COPY_OPTIONS ('force' = 'true')]
  *
  * Exactly-once design (the part delta-spark keeps in hidden state under
  * the table): loaded-file FINGERPRINTS (md5 of path|size|mtime) live in
  * a sidecar graft-delta table at `<table>/_copy_into` — a log-backed,
  * checkpointed store that scales to 10^7 loaded files and SURVIVES
  * OPTIMIZE of the main table (AddFile tags would not: a bin-pack merges
  * many source files into one output). Crash-safety is write-ahead:
  *
  *  1. INTENT — append this batch's fingerprints to the sidecar, keyed
  *     by a fresh batchId;
  *  2. LOAD — one main-table commit carrying the rows AND
  *     `SetTransaction(appId = "graft.copyInto.<batchId>")`: the txn
  *     map IS the durable "batch landed" marker, atomic with the data.
  *
  * A fingerprint counts as loaded ONLY when its batch's marker exists in
  * the main txn map — so a crash between 1 and 2 leaves dangling intent
  * rows that simply don't count (the files reload next run), and a crash
  * after 2 is already durable. Skip-set evaluation is DISTRIBUTED: the
  * candidate listing anti-joins the sidecar against the (driver-tiny)
  * committed-batch set; the driver never holds the loaded-file set —
  * only the NEW files' paths, which the load itself pays for anyway.
  * Expiring markers via `delta.setTransactionRetentionDuration` shorter
  * than the ingestion recency re-opens idempotency, the same documented
  * trade as streaming SetTransactions.
  *
  * CONCURRENT loaders: the batchId is derived from the fingerprint set
  * being loaded (md5 of the sorted fingerprints), not a random UUID, and
  * the loading transaction REGISTERS a read of its own appId — so two
  * simultaneous COPY INTOs of the same pending files race to one
  * SetTransaction appId and the loser's conflict check throws
  * ConcurrentTransactionException instead of silently loading every file
  * twice. Scope: the guard covers EQUAL pending sets (the retry/cron
  * double-fire case); concurrent loaders whose sets overlap without
  * being equal derive different appIds and may double-load the shared
  * files — the per-file-marker alternative would grow the txn map with
  * every file ever loaded, the bloat the sidecar exists to avoid.
  * `force = true` keeps a random batchId: forced re-loads are
  * explicitly non-idempotent, and a deterministic id would make the
  * second forced run of identical files collide with its own marker.
  *
  * `mergeSchema = true` (COPY_OPTIONS 'mergeSchema' = 'true', the
  * delta-spark COPY option): source columns absent from the target are
  * APPENDED to the table schema in the same commit as the load (fresh
  * column-mapping ids when mapping is enabled, same rules as the write
  * path's mergeSchema append); target columns must still be present in
  * the source — missing data fails loudly either way.
  */
object CopyInto {

  final case class Result(version: Long, numLoadedFiles: Long,
      numSkippedFiles: Long)

  private[delta] val AppIdPrefix = "graft.copyInto."

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private[delta] def fingerprint(path: String, size: Long, mtime: Long): String =
    md5hex(s"$path|$size|$mtime")

  /** Content-derived batch identity: the md5 of the sorted fingerprint
    * set being loaded. Two loaders of the same pending files derive the
    * same SetTransaction appId and therefore conflict instead of
    * double-loading.
    */
  private[delta] def batchIdFor(fingerprints: Seq[String]): String =
    md5hex(fingerprints.sorted.mkString("\n"))

  private def sidecarPath(t: DeltaTable): String =
    new Path(t.deltaLog.dataPath, "_copy_into").toString

  def run(t: DeltaTable, source: String, format: String,
      pattern: Option[String], force: Boolean,
      mergeSchema: Boolean = false): Result = {
    val spark = t.spark
    import spark.implicits._
    require(Seq("parquet", "json", "csv").contains(format.toLowerCase),
      s"COPY INTO FILEFORMAT must be PARQUET, JSON or CSV, got $format")
    // the transaction opens BEFORE the skip set is computed, so the
    // committed-batch set comes from the txn's own read snapshot — a
    // marker committed after this point either surfaces through the
    // conflict check (identical pending set => same appId) or postdates
    // our read like any other optimistic race
    val txn = t.deltaLog.startTransaction()
    val snap = txn.snapshot
    require(snap.metadataOpt.nonEmpty,
      s"COPY INTO target ${t.deltaLog.dataPath} does not exist — create it first")

    // candidate listing: the glob is driver-side (bounded by the SOURCE
    // directory, the thing being ingested), hidden files excluded like
    // any Spark file source
    val conf = spark.sessionState.newHadoopConf()
    val srcPath = new Path(source)
    val fs = srcPath.getFileSystem(conf)
    val glob = pattern.map(p => new Path(srcPath, p)).getOrElse(srcPath)
    // directories matched by the glob are expanded RECURSIVELY (a
    // partitioned drop zone like date=.../part-*.parquet must ingest
    // fully — silently loading one level would be partial ingestion);
    // hidden files/dirs excluded like any Spark file source
    def expand(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
        Nil
      else if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(expand)
      else Seq(st)
    val statuses = Option(fs.globStatus(glob)).getOrElse(Array.empty).toSeq
      .flatMap(expand)
    val cand = statuses.map(st => (st.getPath.toString,
      fingerprint(st.getPath.toString, st.getLen, st.getModificationTime)))
    if (cand.isEmpty) return Result(snap.version, 0L, 0L)

    // loaded set = sidecar fingerprints whose batch marker exists in the
    // main txn map (O(#batches) driver-side, broadcast into the join)
    val sidecar = DeltaTable.forPath(spark, sidecarPath(t))
    val committedBatches: Set[String] = snap.transactions.keySet
      .filter(_.startsWith(AppIdPrefix)).map(_.stripPrefix(AppIdPrefix))
    val candDF = cand.toDF("src", "fp")
    val toLoadDF =
      if (force || !sidecar.deltaLog.tableExists) candDF
      else {
        val loaded = sidecar.toDF
          .where($"batchId".isInCollection(committedBatches.toSeq :+ "__none__"))
          .select($"fp")
        candDF.join(loaded, Seq("fp"), "left_anti")
      }
    val toLoad = toLoadDF.select($"src", $"fp").as[(String, String)].collect()
    val skipped = cand.size - toLoad.size
    if (toLoad.isEmpty) return Result(snap.version, 0L, skipped.toLong)

    // batch identity: content-derived for normal loads (same pending set
    // => same appId => concurrent duplicates conflict), random for force.
    // KNOWN residual window: two concurrent loaders whose pending sets
    // OVERLAP WITHOUT BEING EQUAL derive different appIds and do not
    // conflict — the shared files load twice (same as delta-spark; the
    // per-file-marker alternative would grow the txn map with every file
    // ever loaded, the exact bloat the sidecar exists to avoid).
    // Sequential re-runs always deduplicate.
    val batchId =
      if (force) java.util.UUID.randomUUID().toString
      else batchIdFor(toLoad.map(_._2).toSeq)
    val appId = AppIdPrefix + batchId

    // register the appId read: the conflict checker fails this txn with
    // ConcurrentTransactionException if a racing loader lands the same
    // batch first. txnVersion >= 0 means the marker ALREADY exists (a
    // sidecar-lag rerun) — everything here is a skip, not a reload.
    if (txn.txnVersion(appId) >= 0L)
      return Result(snap.version, 0L, cand.size.toLong)

    // 1. INTENT: write-ahead fingerprints under the batch id (re-running
    // after a crash appends the same rows again — harmless, the skip
    // anti-join is on fingerprints, not row counts)
    sidecar.write(toLoad.toSeq.toDF("src", "fp")
      .select(lit(batchId).as("batchId"), $"fp", $"src"))

    // 2. LOAD: target-schema projection (columns resolved by name,
    // case-insensitively, cast to the target type — a missing target
    // column fails loudly rather than null-filling silently)
    val raw: DataFrame = format.toLowerCase match {
      case "parquet" => spark.read.parquet(toLoad.map(_._1).toIndexedSeq: _*)
      case "json" => spark.read.json(toLoad.map(_._1).toIndexedSeq: _*)
      case "csv" => spark.read.option("header", "true")
        .csv(toLoad.map(_._1).toIndexedSeq: _*)
    }
    // projection and evolution work against the TRANSACTION's metadata
    // (its read snapshot), not the earlier listing-time snapshot — a
    // commit landing between the two must not resurrect a stale schema
    val txnMd = txn.metadata
    val resolver = spark.sessionState.conf.resolver
    val projected = txnMd.schema.fields.map { f =>
      raw.schema.fields.find(g => resolver(g.name, f.name)) match {
        case Some(g) => col(g.name).cast(f.dataType).as(f.name)
        case None => throw new IllegalArgumentException(
          s"COPY INTO: source lacks target column ${f.name} " +
            s"(source columns: ${raw.columns.mkString(", ")})")
      }
    }
    // schema evolution: source-only columns are appended to the table
    // schema in the SAME commit as the load (write-path mergeSchema
    // rules: nullable, fresh mapping ids under column mapping)
    val newCols =
      if (!mergeSchema) Array.empty[org.apache.spark.sql.types.StructField]
      else raw.schema.fields.filterNot(g =>
        txnMd.schema.fields.exists(f => resolver(f.name, g.name)))
    val writeMd =
      if (newCols.isEmpty) txnMd
      else {
        var mx = ColumnMapping.maxId(txnMd.schema)
        val annotated = newCols.map { f =>
          if (ColumnMapping.enabled(txnMd)) {
            val a = ColumnMapping.freshField(f.copy(nullable = true), mx); mx += 1; a
          } else f.copy(nullable = true)
        }
        val merged = org.apache.spark.sql.types.StructType(
          txnMd.schema.fields ++ annotated)
        txn.updateMetadata(txnMd.copy(schemaString = merged.json))
        txn.metadata
      }
    val outCols = projected ++ newCols.map(f => col(f.name))
    val adds = DeltaTable.writeFiles(spark, t.deltaLog.dataPath,
      raw.select(outCols.toSeq: _*), writeMd.partitionColumns, writeMd)
    val v = txn.commit(
      adds :+ SetTransaction(appId, 1L,
        Some(t.deltaLog.clock.nowMillis)),
      Op.CopyInto,
      operationParameters = Map(
        "source" -> source, "fileFormat" -> format.toLowerCase,
        "force" -> force.toString,
        "mergeSchema" -> mergeSchema.toString) ++
        pattern.map("pattern" -> _),
      operationMetrics = Map(
        "numLoadedFiles" -> toLoad.size.toString,
        "numSkippedFiles" -> skipped.toString))
    Result(v, toLoad.size.toLong, skipped.toLong)
  }
}
