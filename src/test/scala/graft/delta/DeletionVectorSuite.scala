package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DELETE via deletion vectors. */
class DeletionVectorSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-dv").toString

  private def dvTable(): DeltaTable = {
    import spark.implicits._
    val t = DeltaTable.forPath(spark, tmp())
    val df = Seq(
      (1L, "alice", 10, "x"), (2L, "bob", 20, "x"),
      (3L, "carol", 30, "y"), (4L, "dave", 40, "y"),
      (5L, "erin", 50, "z")).toDF("id", "name", "score", "part")
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = df.schema.json, partitionColumns = Seq("part"),
      configuration = Map("delta.enableDeletionVectors" -> "true")))
    txn.commit(Nil, "CREATE TABLE")
    t.write(df.coalesce(1), SaveMode.Append, Seq("part")) // one file per partition
    t
  }

  private def dvFiles(t: DeltaTable): Seq[AddFile] =
    t.snapshot.allFiles.filter(f => DeletionVectors.descriptor(f).isDefined)

  test("DV delete keeps data files in place and filters rows at read") {
    import spark.implicits._
    val t = dvTable()
    val before = t.snapshot.allFiles.map(_.path).toSet
    val v = t.delete(col("score") >= 30 && col("part") === "y")
    assert(v > 0)
    // same physical files: no rewrite happened
    assert(t.snapshot.allFiles.map(_.path).toSet == before)
    val dvd = dvFiles(t)
    assert(dvd.nonEmpty)
    assert(dvd.forall(_.partitionValues("part") == "y"))
    assert(DeletionVectors.descriptor(dvd.head).get.cardinality > 0)
    // reads apply the DV
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
    assert(t.read(col("part") === "y").count() == 0)
    // time travel before the delete still sees all rows
    assert(t.toDF(v - 1).count() == 5)
  }

  test("second DV delete on the same file merges row sets") {
    import spark.implicits._
    val t = dvTable()
    t.delete(col("id") === 3) // part=y file
    t.delete(col("id") === 4) // same file
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
    val d = DeletionVectors.descriptor(
      dvFiles(t).find(_.partitionValues("part") == "y").get).get
    assert(d.cardinality == 2, "merged DV must carry both deleted rows")
  }

  test("DV delete with no live matches is a no-op") {
    val t = dvTable()
    t.delete(col("id") === 3)
    val v = t.snapshot.version
    assert(t.delete(col("id") === 3) == v, "already-deleted rows must not re-commit")
  }

  test("rewrite DML on a DV'd table does not resurrect deleted rows") {
    import spark.implicits._
    val t = dvTable()
    t.delete(col("id") === 3) // DV on the part=y file
    // rewrite-based UPDATE touches the same file: survivors only
    t.update(col("id") === 4, Map("score" -> lit(44)))
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    assert(t.toDF.filter(col("id") === 4).select("score").head().getInt(0) == 44)
    // the updated file was rewritten -> its DV descriptor is gone
    assert(dvFiles(t).isEmpty)
  }

  test("MERGE on a DV'd table neither matches nor resurrects deleted rows") {
    import spark.implicits._
    val t = dvTable()
    t.delete(col("id") === 3)
    val src = Seq((3L, "zombie", 99, "y"), (6L, "frank", 60, "z")).toDF("id", "name", "score", "part")
    t.merge(src, col("t.id") === col("s.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    // id=3 was deleted -> the source row INSERTS (not-matched), id=6 inserts
    val r = t.toDF.orderBy("id").select("id", "name").as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "alice"), (2L, "bob"), (3L, "zombie"),
      (4L, "dave"), (5L, "erin"), (6L, "frank")))
  }

  test("OPTIMIZE materializes deletion vectors and drops descriptors") {
    import spark.implicits._
    val t = dvTable()
    t.delete(col("id") === 3)
    assert(dvFiles(t).nonEmpty)
    t.compact()
    assert(dvFiles(t).isEmpty, "compaction must drop DV descriptors")
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    // after materialization a fresh scan needs no DV join at all
    assert(t.snapshot.allFiles.forall(f => DeletionVectors.descriptor(f).isEmpty))
  }

  test("VACUUM sweeps orphaned DV sidecars but keeps referenced ones") {
    val t = dvTable()
    t.delete(col("id") === 3)
    val live = dvFiles(t).flatMap(f => DeletionVectors.descriptor(f)).map(_.relPath)
    assert(live.size == 1)
    // referenced DV survives a vacuum
    t.vacuum(Some(0L))
    val fs = t.deltaLog.dataPath.getFileSystem(spark.sessionState.newHadoopConf())
    val dvDir = new org.apache.hadoop.fs.Path(t.deltaLog.dataPath, "_deletion_vectors")
    assert(fs.listStatus(dvDir).length == 1)
    // compaction materializes the DV -> the sidecar is orphaned -> swept
    t.compact()
    val deleted = t.vacuum(Some(0L))
    assert(deleted.exists(_.contains("_deletion_vectors/")), "orphan DV must be vacuumed")
    assert(!fs.exists(dvDir) || fs.listStatus(dvDir).isEmpty)
    import spark.implicits._
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))
  }

  test("CDF captures DV deletes exactly once") {
    import spark.implicits._
    val t = DeltaTable.forPath(spark, tmp())
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = df.schema.json,
      configuration = Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true")))
    txn.commit(Nil, "CREATE TABLE")
    t.write(df)
    val v1 = t.delete(col("id") === 2)
    val v2 = t.delete(col("id") <= 2) // id=1 only: id=2 is already gone
    val ch = t.tableChanges(v1, v2)
      .select($"id", $"_change_type", $"_commit_version")
      .orderBy($"_commit_version", $"id")
      .as[(Long, String, Long)].collect().toSeq
    assert(ch == Seq((2L, "delete", v1), (1L, "delete", v2)))
  }
}
