package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deep CLONE: a fully independent copy — its own data files and DV
  * payloads — so deleting the SOURCE outright cannot break the clone
  * (the shallow clone's documented caveat, proven here by contrast).
  */
class DeepCloneSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-dclone").toString

  private def rmTree(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("deep clone survives source deletion; shallow does not") {
    import spark.implicits._
    val srcDir = tmp()
    val t = DeltaTable.forPath(spark, srcDir)
    // DV-bearing source: merge-on-read delete leaves a DV payload
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = Seq((1L, "a")).toDF("id", "v").schema.json,
      configuration = Map("delta.enableDeletionVectors" -> "true")))
    txn.commit(Nil, Op.CreateTable)
    t.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.delete(col("id") > 8)
    assert(t.snapshot.dvFiles.nonEmpty, "fixture must carry a DV")
    assert(t.toDF.count() == 8)

    val deepDir = tmp() + "/deep"
    val shallowDir = tmp() + "/shallow"
    val deep = t.deepCloneTo(deepDir)
    val shallow = t.shallowCloneTo(shallowDir)
    assert(deep.toDF.count() == 8)
    assert(shallow.toDF.count() == 8)

    rmTree(srcDir) // the source vanishes entirely
    assert(DeltaTable.forPath(spark, deepDir).toDF.count() == 8,
      "deep clone must be self-contained (data + DV payloads)")
    intercept[Exception] {
      DeltaTable.forPath(spark, shallowDir).toDF.count()
    }
  }

  test("deep clone of a shallow clone flattens absolute references") {
    import spark.implicits._
    val srcDir = tmp()
    val t = DeltaTable.forPath(spark, srcDir)
    t.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val sh = t.shallowCloneTo(tmp() + "/sh")
    val deep = sh.deepCloneTo(tmp() + "/deep2")
    assert(deep.snapshot.allFiles.forall(f => !f.path.contains(":")),
      "deep clone paths must be table-relative")
    rmTree(srcDir)
    assert(DeltaTable.forPath(spark, deep.deltaLog.dataPath.toString)
      .toDF.count() == 2)
  }

  test("SQL: CREATE TABLE ... DEEP CLONE on a path target") {
    import spark.implicits._
    val srcDir = tmp()
    val t = DeltaTable.forPath(spark, srcDir)
    t.write(Seq((1L, "a")).toDF("id", "v"))
    val dest = tmp() + "/sqldeep"
    spark.sql(s"CREATE TABLE graft.`$dest` DEEP CLONE graft.`$srcDir`")
    rmTree(srcDir)
    assert(spark.sql(s"SELECT * FROM graft.`$dest`").count() == 1)
  }
}
