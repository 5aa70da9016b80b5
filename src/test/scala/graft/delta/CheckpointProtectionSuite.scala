package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** checkpointProtection table feature (public Delta spec): writers must
  * not create checkpoints below `delta.requireCheckpointProtectionBeforeVersion`,
  * and routine expired-log cleanup must sweep the protected region
  * atomically — all of [0, V) with a covering checkpoint at >= V, or
  * none of it. This is what makes DROP FEATURE ... TRUNCATE HISTORY
  * sound against concurrent writers.
  */
class CheckpointProtectionSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-ckptprot").toString

  private def sampleDF = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
  }

  test("no checkpoint is written below the protection boundary") {
    val t = DeltaTable.forPath(spark, tmp())
    val log = t.deltaLog
    val txn0 = log.startTransaction()
    txn0.updateMetadata(Metadata(schemaString = sampleDF.schema.json,
      configuration = Map(
        "delta.requireCheckpointProtectionBeforeVersion" -> "100")))
    txn0.commit(Nil, Op.CreateTable)
    (1 to 3).foreach(_ => t.write(sampleDF))
    val s = log.update()
    log.checkpoint(s) // below the boundary: must be a silent no-op
    assert(!log.store.exists(FileNames.checkpointFile(log.logPath, s.version)),
      s"checkpoint written below protection boundary at v${s.version}")
    // lowering the boundary below the current version re-enables it
    spark.sql(s"ALTER TABLE graft.`${log.dataPath}` SET TBLPROPERTIES (" +
      "'delta.requireCheckpointProtectionBeforeVersion' = '2')")
    val s2 = log.update()
    log.checkpoint(s2)
    assert(log.store.exists(FileNames.checkpointFile(log.logPath, s2.version)))
  }

  test("expired-log cleanup sweeps the protected region atomically or not at all") {
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    val log = t.deltaLog
    val txn0 = log.startTransaction()
    txn0.updateMetadata(Metadata(schemaString = sampleDF.schema.json,
      configuration = Map("delta.checkpointInterval" -> "100"))) // no auto ckpt
    txn0.commit(Nil, Op.CreateTable) // v0
    (1 to 5).foreach(_ => t.write(sampleDF)) // v1..v5
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES (" +
      "'delta.requireCheckpointProtectionBeforeVersion' = '4')") // v6
    val fs = log.logPath.getFileSystem(spark.sessionState.newHadoopConf())
    val old = System.currentTimeMillis() - 40L * 24 * 3600 * 1000
    // age v0..v2 past the 30-day default retention, but NOT v3: part of
    // the protected region [0,4) survives, so NOTHING below 4 may go
    (0L to 2L).foreach(v => fs.setTimes(FileNames.deltaFile(log.logPath, v), old, -1))
    log.checkpoint(log.update()) // triggers cleanUpExpiredLogs
    assert(log.listDeltaVersions().toSet == (0L to 6L).toSet,
      s"partial protected-region sweep: ${log.listDeltaVersions()}")
    // age v3 as well: the WHOLE region is now expired and goes in one
    // sweep, covered by the checkpoint at the current version (>= 4)
    fs.setTimes(FileNames.deltaFile(log.logPath, 3L), old, -1)
    log.checkpoint(log.update())
    assert(log.listDeltaVersions().toSet == (4L to 6L).toSet,
      s"expected atomic sweep of v0..v3: ${log.listDeltaVersions()}")
    assert(t.toDF.count() == 10L) // 5 writes of 2 rows, state intact
  }
}
