package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** stableCheckpoint: localCheckpoint by default (single-node), RELIABLE
  * checkpoint to shared storage when spark.graft.checkpointDir is set —
  * the difference between "a lost executor kills the iterative job" and
  * "it re-reads the checkpoint files" on a real cluster.
  */
class StableCheckpointSuite extends AnyFunSuite {

  // own session: sc.setCheckpointDir is SparkContext-global and sticky,
  // so exercising the reliable path must not leak into shared-session
  // suites that expect the localCheckpoint default
  private def withSession(f: SparkSession => Unit): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("stable-checkpoint-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark) finally spark.stop()
  }

  test("default path is a local checkpoint (no checkpoint dir involved)") {
    withSession { spark =>
      import spark.implicits._
      val df = QueryDefs.stableCheckpoint((1 to 10).toDF("x"))
      assert(df.queryExecution.logical.getClass.getSimpleName == "LogicalRDD",
        s"lineage must be cut (got ${df.queryExecution.logical.getClass.getSimpleName})")
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
      assert(df.as[Int].collect().sorted.toSeq == (1 to 10))
    }
  }

  test("spark.graft.checkpointDir switches to a reliable checkpoint") {
    withSession { spark =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-reliable-ckpt").toString
      spark.conf.set("spark.graft.checkpointDir", dir)
      val df = QueryDefs.stableCheckpoint((1 to 10).toDF("x"))
      assert(df.queryExecution.logical.getClass.getSimpleName == "LogicalRDD",
        s"lineage must be cut (got ${df.queryExecution.logical.getClass.getSimpleName})")
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.exists(_.contains(dir)),
        s"checkpoint dir should live under $dir, got $ckptDir")
      // the checkpoint really went to shared storage, not executor memory
      val wrote = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      val hasFiles = new java.util.ArrayList[java.nio.file.Path]()
      wrote.forEachRemaining(p => if (Files.isRegularFile(p)) hasFiles.add(p))
      assert(!hasFiles.isEmpty, "reliable checkpoint must write files")
      assert(df.as[Int].collect().sorted.toSeq == (1 to 10))
    }
  }
}
