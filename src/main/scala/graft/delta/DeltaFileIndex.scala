package graft.delta

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst `FileIndex` backed by the snapshot's file state — the
  * 100 TB read path. File listings come straight from AddFile metadata
  * (path, size, modificationTime already known from the log), so query
  * planning performs ZERO filesystem calls per file; partition pruning
  * and stats-based data skipping run inside `listFiles`, where Catalyst's
  * PruneFileSourcePartitions hands us the pushed filters.
  *
  * This is the role the reference's `Scan.Files` iterator plays
  * (reference `scan.go:60`), lifted into Spark's planner so the pruned
  * listing feeds the parquet reader directly.
  */
class DeltaFileIndex(log: DeltaLog, snapshot: Snapshot) extends FileIndex {

  private[graft] def deltaLog: DeltaLog = log
  private[graft] def indexSnapshot: Snapshot = snapshot

  private val spark = log.spark
  private val md = snapshot.metadata
  private val partCols: Seq[String] = md.partitionColumns

  override val partitionSchema: StructType =
    StructType(partCols.map(c => md.schema.find(_.name == c).getOrElse(
      throw new IllegalStateException(s"partition column $c missing from schema"))))

  override def rootPaths: Seq[Path] = Seq(log.dataPath)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    import spark.implicits._

    // 1. partition pruning: evaluate pushed filters over typed partition
    //    values with Catalyst (same machinery as DeltaScan). Data filters
    //    on the BASE column of a monotone generated partition column
    //    derive extra pruning conjuncts (`ts >= X` prunes `p_date`
    //    partitions) — extra-only, the residual data filter is untouched.
    var files = snapshot.activeFilesDF
    val derived = GeneratedPartitionFilters.derive(spark, md, dataFilters)
    val partPred = (partitionFilters.map(DeltaScan.toColumn) ++ derived)
      .reduceOption(_ && _)
    partPred.foreach { pred =>
      val typed = partCols.foldLeft(files) { (df, c) =>
        val dt = partitionSchema(c).dataType
        df.withColumn(c,
          org.apache.spark.sql.functions.element_at(col("partitionValues"), c).cast(dt))
      }
      files = typed.filter(pred).drop(partCols: _*)
    }
    // 2. stats-based data skipping on the data filters (A17); stats JSON
    //    is keyed by PHYSICAL names under column mapping
    files = DeltaScan.dataSkip(files, dataFilters,
      ColumnMapping.physicalSchema(md), partCols, ColumnMapping.mapping(md))

    val adds = files.as[AddFile].collect().toSeq
    adds.groupBy(_.partitionValues).map { case (pv, group) =>
      val row: InternalRow = InternalRow.fromSeq(partCols.map { c =>
        pv.get(c).flatMap(Option(_)) match {
          case None => null
          case Some(v) =>
            val dt = partitionSchema(c).dataType
            if (dt == StringType) UTF8String.fromString(v)
            else Cast(Literal(UTF8String.fromString(v), StringType), dt,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
        }
      })
      val statuses = group.map { a =>
        new FileStatus(a.size, false, 1, 128L * 1024 * 1024,
          a.modificationTime, absolute(a.path))
      }.toArray
      PartitionDirectory(row, statuses)
    }.toSeq
  }

  private def absolute(p: String): Path = FileNames.absolutePath(log.dataPath, p)

  override def inputFiles: Array[String] = {
    import spark.implicits._
    snapshot.activeFilesDF.select("path").as[String]
      .collect().map(p => FileNames.absolutePathString(log.dataPath, p))
  }

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = {
    import org.apache.spark.sql.functions.sum
    val r = snapshot.activeFilesDF.agg(sum(col("size"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
