package graft.delta

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Coordinated commits (public Delta `coordinatedCommits` writer
  * feature): commit atomicity moves from filesystem put-if-absent to an
  * external coordinator — staged commit files under
  * `_delta_log/_commits/`, reads merging ratified-but-unbackfilled
  * commits, the protocol gate round-tripping the feature name.
  */
class CoordinatedCommitsSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-cc").toString

  private var n = 0
  private def freshName(): String = { n += 1; s"cc-suite-$n" }

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def mkTable(dir: String, coord: String,
      batch: Int = 1): DeltaTable = {
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(schemaString = df((0L, "x")).schema.json,
      configuration = Map(
        "delta.coordinatedCommits.commitCoordinator" -> s"memory:$coord",
        "delta.coordinatedCommits.backfillBatchSize" -> batch.toString)))
    txn.commit(Nil, Op.CreateTable)
    t
  }

  test("commit goes through the coordinator and backfills to <v>.json") {
    val dir = tmp()
    val coord = freshName()
    val t = mkTable(dir, coord)
    t.write(df((1L, "a")))   // v1, coordinated
    t.write(df((2L, "b")))   // v2
    assert(t.toDF.count() == 2L)
    // default batchSize=1: classic names exist, staged garbage swept,
    // coordinator drained
    val log = t.deltaLog
    (0L to 2L).foreach(v =>
      assert(log.store.exists(FileNames.deltaFile(log.logPath, v)), s"v$v"))
    val stagedDir = CoordinatedCommits.commitsDir(log.logPath)
    val fs = stagedDir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(stagedDir) || fs.listStatus(stagedDir).isEmpty)
    assert(InMemoryTableCommitCoordinator.named(coord)
      .getCommits(CoordinatedCommits.tableKey(log)).isEmpty)
  }

  test("protocol gate round-trips the feature name") {
    val dir = tmp()
    val t = mkTable(dir, freshName())
    t.write(df((1L, "a")))
    val p = t.deltaLog.update().protocol
    assert(p.minWriterVersion == 7, p.toString)
    assert(p.writerFeatures.exists(_.contains(CoordinatedCommits.FeatureName)), p.toString)
    // a fresh log replays the feature and still passes the write gate
    val log2 = new DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    log2.update().assertProtocolWrite()
    // an UNKNOWN coordinator name fails loudly instead of forking the
    // log — at the enablement commit itself (its post-commit snapshot
    // refresh resolves the coordinator)
    val t2 = DeltaTable.forPath(spark, tmp())
    val txn = t2.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(schemaString = df((0L, "x")).schema.json,
      configuration = Map(
        "delta.coordinatedCommits.commitCoordinator" -> "dynamodb:prod")))
    val e = intercept[IllegalArgumentException](txn.commit(Nil, Op.CreateTable))
    assert(e.getMessage.contains("unknown commit coordinator"), e.getMessage)
  }

  test("read-your-write across sessions: a fresh log merges unbackfilled commits") {
    val dir = tmp()
    val coord = freshName()
    // batchSize 100: nothing backfills on its own
    val t = mkTable(dir, coord, batch = 100)
    t.write(df((1L, "a")))   // v1 ratified, NOT backfilled
    t.write(df((2L, "b")))   // v2 ratified, NOT backfilled
    // a SECOND log instance (fresh session's view) must see both rows:
    // its snapshot merges the coordinator's staged tail — with ZERO
    // backfill copies (the classic names stay absent)
    val log2 = new DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    val s2 = log2.update()
    assert(s2.version == 2L, s2.version.toString)
    assert(new DeltaTable2Probe(spark, log2).count == 2L)
    (1L to 2L).foreach(v =>
      assert(!log2.store.exists(FileNames.deltaFile(log2.logPath, v)),
        s"read path must not backfill v$v"))
  }

  test("deferred backfill: batch boundary flushes the staged backlog") {
    val dir = tmp()
    val coord = freshName()
    val t = mkTable(dir, coord, batch = 3)
    val log = t.deltaLog
    t.write(df((1L, "a")))   // v1: 1 % 3 != 0 -> staged only
    assert(!log.store.exists(FileNames.deltaFile(log.logPath, 1L)))
    assert(InMemoryTableCommitCoordinator.named(coord)
      .getCommits(CoordinatedCommits.tableKey(log)).map(_.version) == Seq(1L))
    assert(t.toDF.count() == 1L,
      "staged-but-unbackfilled commit must be readable")
    t.write(df((2L, "b")))   // v2: staged only
    t.write(df((3L, "c")))   // v3: 3 % 3 == 0 -> backfills v1..v3
    (1L to 3L).foreach(v =>
      assert(log.store.exists(FileNames.deltaFile(log.logPath, v)), s"v$v"))
    assert(InMemoryTableCommitCoordinator.named(coord)
      .getCommits(CoordinatedCommits.tableKey(log)).isEmpty)
    assert(t.toDF.count() == 3L)
  }

  test("history and CDF read the staged tail before backfill") {
    val dir = tmp()
    val coord = freshName()
    val t = mkTable(dir, coord, batch = 100)
    t.write(df((1L, "a")))   // v1 staged only
    t.write(df((2L, "b")))   // v2 staged only
    val log = t.deltaLog
    assert(!log.store.exists(FileNames.deltaFile(log.logPath, 1L)))
    // version-addressed history over staged commits
    val ci = log.commitInfoAt(2L)
    assert(ci.exists(_.operation == Op.Write), ci.toString)
    // changes feed includes the staged tail, gap-free
    val ch = log.changes(0L, failOnDataLoss = true).toSeq
    assert(ch.map(_._1) == Seq(0L, 1L, 2L), ch.map(_._1).toString)
    assert(ch.flatMap(_._2).count(_.isInstanceOf[AddFile]) == 2)
  }

  test("checkpoint cadence works over a staged-only tail") {
    // 12 coordinated commits with backfill deferred past them all: the
    // interval checkpoint at v10 must still capture correct state, and
    // a FRESH reader (checkpoint + staged tail, zero classic deltas
    // past v0) must reconstruct the exact table
    val dir = tmp()
    val coord = freshName()
    val t = mkTable(dir, coord, batch = 1000)
    (1L to 12L).foreach(i => t.write(df((i, s"r$i"))))
    val log = t.deltaLog
    assert(log.store.exists(FileNames.checkpointFile(log.logPath, 10L)),
      "interval checkpoint missing at v10")
    (1L to 12L).foreach(v =>
      assert(!log.store.exists(FileNames.deltaFile(log.logPath, v)),
        s"v$v should still be staged-only"))
    val log2 = new DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    val s2 = log2.update()
    assert(s2.version == 12L, s2.version.toString)
    assert(new DeltaTable2Probe(spark, log2).count == 12L)
  }

  test("disabling the coordinator over a staged-only tail cannot gap the log") {
    val dir = tmp()
    val coord = freshName()
    val t = mkTable(dir, coord, batch = 100)
    t.write(df((1L, "a")))   // v1 staged only
    t.write(df((2L, "b")))   // v2 staged only
    // v3 = the DISABLEMENT commit — snapshot still has the coordinator,
    // so it stages too
    spark.sql(s"ALTER TABLE graft.`$dir` UNSET TBLPROPERTIES " +
      "('delta.coordinatedCommits.commitCoordinator')")
    val log = t.deltaLog
    assert(!log.store.exists(FileNames.deltaFile(log.logPath, 3L)))
    // v4 = first CLASSIC commit: it must materialize the staged tail
    // below it first, or listDeltaVersions gaps and every snapshot dies
    t.write(df((4L, "d")))
    (0L to 4L).foreach(v =>
      assert(log.store.exists(FileNames.deltaFile(log.logPath, v)),
        s"classic v$v missing — log gap"))
    val log2 = new DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    assert(log2.update().version == 4L)
    assert(new DeltaTable2Probe(spark, log2).count == 3L) // rows 1, 2, 4
  }

  test("two-writer race: loser retries through the coordinator, both rows land") {
    val dir = tmp()
    val coord = freshName()
    mkTable(dir, coord)
    // two independent log instances, SAME read snapshot
    val logA = new DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    val logB = new DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    val txnA = logA.startTransaction()
    val txnB = logB.startTransaction()
    assert(txnA.readVersion == 0L && txnB.readVersion == 0L)
    def addOf(tag: String) = AddFile(
      path = s"part-$tag.parquet", partitionValues = Map.empty, size = 1L,
      modificationTime = 0L, dataChange = true,
      stats = """{"numRecords":1}""")
    val vA = txnA.commit(Seq(addOf("a")), Op.Write)
    // B committed second: its first attempt's version is ratified to A,
    // so the coordinator throws it into the retry loop; the retry lands
    // at the next version after the conflict check passes (blind append)
    val vB = txnB.commit(Seq(addOf("b")), Op.Write)
    assert(vA == 1L && vB == 2L, s"$vA / $vB")
    val files = logA.update().allFiles.map(_.path).toSet
    assert(files == Set("part-a.parquet", "part-b.parquet"), files.toString)
  }
}

/** toDF against an explicit (uncached) DeltaLog. */
private class DeltaTable2Probe(spark: SparkSession, log: DeltaLog) {
  def count: Long = {
    val s = log.snapshot
    val files = s.allFiles.map(f =>
      FileNames.absolutePathString(log.dataPath, f.path))
    if (files.isEmpty) 0L
    else spark.read.parquet(files: _*).count()
  }
}
