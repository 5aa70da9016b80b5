package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DML operationMetrics: exact-or-absent row counts derived from file
  * stats (rewrite DELETE), DV cardinality growth (merge-on-read
  * DELETE), and the auto-derived file/byte/change-file counts every
  * commit records — the audit surface history() consumers read.
  */
class DmlMetricsSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-dmlmetrics").toString

  private def lastMetrics(t: DeltaTable): Map[String, String] =
    t.deltaLog.commitInfoAt(t.deltaLog.update().version).get.operationMetrics

  test("rewrite DELETE records exact deleted/copied rows from stats") {
    import spark.implicits._
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    t.write((0L until 100L).map(i => (i, i % 4)).toDF("id", "g"))
    t.delete(col("id") < 30L)
    val m = lastMetrics(t)
    assert(m.get("numDeletedRows").contains("30"), m.toString)
    // copied = surviving rows of the TOUCHED files only (ids 0..29 live
    // in two 25-row files; the untouched other files are not rewritten)
    assert(m.get("numCopiedRows").contains("20"), m.toString)
    assert(m.contains("numRemovedFiles") && m.contains("numAddedFiles"), m.toString)
    assert(t.toDF.count() == 70)
  }

  test("DV DELETE records deleted rows as cardinality growth") {
    import spark.implicits._
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    t.write((0L until 100L).map(i => (i, i % 4)).toDF("id", "g"))
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES " +
      "('delta.enableDeletionVectors' = 'true')")
    t.delete(col("id") < 10L)
    val m1 = lastMetrics(t)
    assert(m1.get("numDeletedRows").contains("10"), m1.toString)
    assert(m1.get("numDeletionVectorsAdded").exists(_.toInt > 0), m1.toString)
    // second DV delete on the SAME files: growth, not total
    t.delete(col("id") < 25L)
    val m2 = lastMetrics(t)
    assert(m2.get("numDeletedRows").contains("15"), m2.toString)
    assert(t.toDF.count() == 75)
  }

  test("CDF commits auto-record numAddedChangeFiles") {
    import spark.implicits._
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = Seq((1L, 1L)).toDF("id", "g").schema.json,
      configuration = Map("delta.enableChangeDataFeed" -> "true")))
    txn.commit(Nil, Op.CreateTable)
    t.write((0L until 50L).map(i => (i, i % 4)).toDF("id", "g"))
    t.delete(col("id") < 5L)
    val m = lastMetrics(t)
    assert(m.get("numAddedChangeFiles").exists(_.toInt > 0), m.toString)
    assert(m.get("numDeletedRows").contains("5"), m.toString)
  }

  test("partition-granular deleteWhere records deleted rows") {
    import spark.implicits._
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    t.write((0L until 40L).map(i => (i, s"p${i % 4}")).toDF("id", "part"),
      SaveMode.Append, Seq("part"))
    t.deleteWhere(col("part") === "p1")
    val m = lastMetrics(t)
    assert(m.get("numDeletedRows").contains("10"), m.toString)
    assert(t.toDF.count() == 30)
  }
}
