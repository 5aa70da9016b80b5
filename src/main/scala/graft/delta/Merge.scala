package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO, built from [[DeltaTable.merge]]. The target is addressable
  * as `t.<col>` and the source as `s.<col>` in the merge condition and in
  * every clause expression. At most one whenMatched action (update OR
  * delete) and one whenNotMatched insert — the common MERGE shape; clause
  * conditions beyond the join condition are not modeled.
  *
  * Execution is the standard two-phase Delta shape, sized by the MATCH
  * SET rather than the table:
  *   1. find touched files — join target (with `_metadata.file_path`)
  *      to the source on the condition; only distinct file paths return
  *      to the driver. Catalyst prunes the scan to the condition columns
  *      and AQE broadcasts the source when it is small.
  *   2. rewrite — only the touched files' rows join the source again
  *      (full-outer when inserting, left-outer otherwise); matched rows
  *      update/delete, target-only rows pass through, source-only rows
  *      insert. A target row matched by more than one source row raises,
  *      per MERGE semantics (detected on `_metadata` row identity, no
  *      extra shuffle of the table).
  *
  * With `delta.enableChangeDataFeed`, insert / update_preimage /
  * update_postimage / delete rows are captured as CDC files.
  */
final class MergeBuilder private[delta] (
    t: DeltaTable, source: DataFrame, condition: Column) {

  private var matchedSet: Option[Map[String, Column]] = None
  private var matchedUpdateAll = false
  private var matchedDelete = false
  private var insertValues: Option[Map[String, Column]] = None
  private var insertAll = false

  private def requireNoMatchedClause(): Unit =
    require(matchedSet.isEmpty && !matchedUpdateAll && !matchedDelete,
      "at most one whenMatched clause")

  def whenMatchedUpdate(set: Map[String, Column]): this.type = {
    requireNoMatchedClause()
    require(set.nonEmpty, "whenMatchedUpdate needs at least one SET column")
    matchedSet = Some(set); this
  }

  /** Update every table column from the same-named source column. */
  def whenMatchedUpdateAll(): this.type = {
    requireNoMatchedClause(); matchedUpdateAll = true; this
  }

  def whenMatchedDelete(): this.type = {
    requireNoMatchedClause(); matchedDelete = true; this
  }

  def whenNotMatchedInsert(values: Map[String, Column]): this.type = {
    require(insertValues.isEmpty && !insertAll, "at most one whenNotMatched clause")
    insertValues = Some(values); this
  }

  /** Insert every table column from the same-named source column. */
  def whenNotMatchedInsertAll(): this.type = {
    require(insertValues.isEmpty && !insertAll, "at most one whenNotMatched clause")
    insertAll = true; this
  }

  def execute(): Long = {
    val spark = t.spark
    val log = t.deltaLog
    val txn = log.startTransaction()
    require(txn.snapshot.metadataOpt.nonEmpty, "MERGE target table does not exist")
    val md = txn.metadata
    val fields = md.schema.fields.toSeq
    val set: Option[Map[String, Column]] =
      if (matchedUpdateAll) Some(fields.map(f => f.name -> col(s"s.${f.name}")).toMap)
      else matchedSet
    val ins: Option[Map[String, Column]] =
      if (insertAll) Some(fields.map(f => f.name -> col(s"s.${f.name}")).toMap)
      else insertValues
    require(set.isDefined || matchedDelete || ins.isDefined, "MERGE needs at least one clause")
    set.foreach(m => require((m.keySet -- md.schema.fieldNames).isEmpty,
      s"SET references unknown columns: ${(m.keySet -- md.schema.fieldNames).mkString(", ")}"))
    ins.foreach(m => require((m.keySet -- md.schema.fieldNames).isEmpty,
      s"INSERT references unknown columns: ${(m.keySet -- md.schema.fieldNames).mkString(", ")}"))
    // MERGE reads the whole table for conflict purposes: the condition
    // depends on source rows, so no static predicate bounds the read
    txn.readWholeTable()
    val partCols = md.partitionColumns
    val cdfOn = DeltaConfig.EnableChangeDataFeed.fromMetadata(md)
    val now = log.clock.nowMillis

    def updateProj: Seq[Column] = fields.map { f =>
      set.get.get(f.name).map(_.cast(f.dataType).as(f.name))
        .getOrElse(col(s"t.${f.name}").as(f.name))
    }
    def insertProj: Seq[Column] = fields.map { f =>
      ins.get.get(f.name).map(_.cast(f.dataType).as(f.name))
        .getOrElse(lit(null).cast(f.dataType).as(f.name))
    }

    // ---- phase 1: touched files (none when the target has no files).
    // readFilesKeyed applies deletion vectors, so already-deleted rows
    // can neither match nor resurrect through the rewrite.
    val allFiles = txn.snapshot.allFiles
    val touched: Seq[AddFile] =
      if (allFiles.isEmpty) Nil
      else {
        val tgt = t.readFilesKeyed(allFiles, md).alias("t")
        val hit = tgt.join(source.alias("s"), condition, "inner")
          .select(col("t.__fp")).distinct()
          .collect().map(r => t.normPath(r.getString(0))).toSet
        allFiles.filter(f =>
          hit(t.normPath(FileNames.absolutePath(log.dataPath, f.path).toString)))
      }

    // ---- nothing matched: pure insert (or no-op)
    if (touched.isEmpty) {
      if (ins.isEmpty) return txn.readVersion
      val insDF = source.alias("s").select(insertProj: _*)
      val adds = DeltaTable.writeFiles(spark, log.dataPath, insDF, partCols,
        md)
      val cdc =
        if (cdfOn)
          DeltaTable.writeCdcFiles(spark, log.dataPath,
            source.alias("s").select(insertProj: _*)
              .withColumn("_change_type", lit("insert")))
        else Nil
      return txn.commit(adds ++ cdc, "MERGE",
        operationParameters = Map("predicate" -> condition.toString))
    }

    // ---- phase 2: rewrite only the touched files
    val tgt = t.readFilesKeyed(touched, md)
      .withColumn("__tid", concat_ws(":", col("__fp"), col("__ri")))
      .withColumn("__t_present", lit(true))
      .alias("t")
    val src = source.withColumn("__s_present", lit(true)).alias("s")
    val joinType = if (ins.isDefined) "full_outer" else "left_outer"
    val joined = tgt.join(src, condition, joinType).persist()
    try {
      val mT = col("__t_present").isNotNull
      val mS = col("__s_present").isNotNull
      if (set.isDefined || matchedDelete) {
        val dup = joined.filter(mT && mS)
          .groupBy(col("__tid")).count().filter(col("count") > 1).limit(1).count()
        if (dup > 0) throw new UnsupportedOperationException(
          "MERGE: multiple source rows matched the same target row")
      }
      val tCols = fields.map(f => col(s"t.${f.name}").as(f.name))
      val passthrough = joined.filter(mT && !mS).select(tCols: _*)
      val matchedOut =
        if (matchedDelete) None
        else if (set.isDefined) Some(joined.filter(mT && mS).select(updateProj: _*))
        else Some(joined.filter(mT && mS).select(tCols: _*))
      val inserts = ins.map(_ => joined.filter(!mT && mS).select(insertProj: _*))
      val rewritten = (Seq(passthrough) ++ matchedOut ++ inserts).reduce(_ unionByName _)
      val adds = DeltaTable.writeFiles(spark, log.dataPath, rewritten, partCols,
        md)
      val removes = touched.map(_.remove(now))
      val cdc =
        if (cdfOn) {
          val frames = Seq.newBuilder[DataFrame]
          if (matchedDelete)
            frames += joined.filter(mT && mS).select(tCols: _*)
              .withColumn("_change_type", lit("delete"))
          if (set.isDefined) {
            frames += joined.filter(mT && mS).select(tCols: _*)
              .withColumn("_change_type", lit("update_preimage"))
            frames += joined.filter(mT && mS).select(updateProj: _*)
              .withColumn("_change_type", lit("update_postimage"))
          }
          ins.foreach(_ => frames += joined.filter(!mT && mS).select(insertProj: _*)
            .withColumn("_change_type", lit("insert")))
          DeltaTable.writeCdcFiles(spark, log.dataPath,
            frames.result().reduce(_ unionByName _))
        } else Nil
      txn.commit(removes ++ adds ++ cdc, "MERGE",
        operationParameters = Map("predicate" -> condition.toString))
    } finally joined.unpersist()
  }
}
