package graft.delta

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The UniForm pure-append fast path (IcebergMetadata.generate's
  * appendHint leg) — the r19 verdict's "gate and pin" item:
  *
  *  - fast ≡ general: the SAME logical appends committed with the fast
  *    path enabled vs suppressed (spark.graft.iceberg.fastAppendMaxFiles=0)
  *    must yield semantically equivalent Iceberg metadata — entry
  *    statuses, snapshot lineage, sequence numbers, per-partition
  *    record counts, and per-tuple manifest clustering;
  *  - the adds-count gate: a commit bigger than fastAppendMaxFiles falls
  *    back to the distributed general path (local-mode-assumption guard);
  *  - v3 liveness: a formatVersion=3 row-tracking append DOES take the
  *    fast path (r19 shipped it dead: postCommit handed generation the
  *    pre-assignment AddFiles, whose baseRowId was always empty).
  */
class IcebergFastAppendSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-fastapp").toString

  private def df(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v", "part")
  }

  private def localFile(p: String): java.io.File =
    new java.io.File(p.stripPrefix("file:"))

  private def avroRecords(path: String): Seq[GenericRecord] = {
    val r = DataFileReader.openReader(localFile(path),
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  private def mkUniform(dir: String,
      extraConf: Map[String, String] = Map.empty): DeltaTable = {
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = df((0L, "x", "p")).schema.json,
      partitionColumns = Seq("part"),
      configuration = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg") ++ extraConf))
    txn.commit(Nil, Op.CreateTable)
    t
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Current snapshot's manifest-list + manifest-entry semantics,
    * normalized so two tables holding the same logical data compare
    * equal: per-manifest (content, seq, minSeq, addedBy, counts,
    * partition-summary bounds) and per-entry
    * (status, snapshotId, seq, partitionTuple, recordCount) — file
    * paths/names (UUIDs, table dirs) excluded.
    */
  private def semantics(t: DeltaTable): (Seq[String], Seq[String]) = {
    val metaDir = IcebergMetadata.metadataDir(t.deltaLog).toString
      .stripPrefix("file:")
    val hint = Files.readString(
      new java.io.File(metaDir, "version-hint.text").toPath).trim
    val meta = mapper.readTree(
      Files.readString(new java.io.File(metaDir, s"v$hint.metadata.json").toPath))
    val curId = meta.get("current-snapshot-id").asLong
    val listPath = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId).get
      .get("manifest-list").asText
    val manifests = avroRecords(listPath)
    // REUSED manifests (addedBy != current snapshot) must match exactly;
    // manifests FRESH this snapshot may be clustered differently by the
    // two writers (driver per-tuple vs distributed hash-partitioned), so
    // they compare as an aggregate (total added files/rows, lineage)
    val (fresh, reused) = manifests.partition(
      _.get("added_snapshot_id").asInstanceOf[Long] == curId)
    // manifest GROUPING is a layout freedom (per-tuple vs hash-clustered);
    // the semantics pinned here are per-snapshot lineage + counts
    val reusedSem = reused
      .groupBy(m => (m.get("content").asInstanceOf[Int],
        m.get("sequence_number").asInstanceOf[Long],
        m.get("added_snapshot_id").asInstanceOf[Long]))
      .toSeq.map { case ((c, seq, by), ms) =>
        s"c=$c seq=$seq addedBy=$by " +
          s"af=${ms.map(_.get("added_files_count").asInstanceOf[Int]).sum} " +
          s"ef=${ms.map(_.get("existing_files_count").asInstanceOf[Int]).sum} " +
          s"df=${ms.map(_.get("deleted_files_count").asInstanceOf[Int]).sum} " +
          s"ar=${ms.map(_.get("added_rows_count").asInstanceOf[Long]).sum} " +
          s"er=${ms.map(_.get("existing_rows_count").asInstanceOf[Long]).sum}"
      }.sorted
    val freshAgg = Seq(
      s"freshAf=${fresh.map(_.get("added_files_count").asInstanceOf[Int]).sum} " +
        s"freshAr=${fresh.map(_.get("added_rows_count").asInstanceOf[Long]).sum} " +
        s"freshEf=${fresh.map(_.get("existing_files_count").asInstanceOf[Int]).sum} " +
        s"freshDf=${fresh.map(_.get("deleted_files_count").asInstanceOf[Int]).sum} " +
        s"freshDr=${fresh.map(_.get("deleted_rows_count").asInstanceOf[Long]).sum} " +
        s"freshSeq=${fresh.map(_.get("sequence_number").asInstanceOf[Long]).distinct.sorted.mkString(",")}")
    val listSem = reusedSem ++ freshAgg
    val entrySem = manifests.flatMap { m =>
      avroRecords(m.get("manifest_path").toString).map { e =>
        val dfr = e.get("data_file").asInstanceOf[GenericRecord]
        val pt = dfr.get("partition").asInstanceOf[GenericRecord]
        s"st=${e.get("status")} snap=${e.get("snapshot_id")} " +
          s"seq=${e.get("sequence_number")} part=${pt.get("part")} " +
          s"rc=${dfr.get("record_count")}"
      }
    }.sorted
    (listSem, entrySem)
  }

  /** Per-tuple clustering: every data manifest of the current snapshot
    * covers exactly one partition tuple.
    */
  private def manifestTupleCounts(t: DeltaTable): Seq[Int] = {
    val metaDir = IcebergMetadata.metadataDir(t.deltaLog).toString
      .stripPrefix("file:")
    val hint = Files.readString(
      new java.io.File(metaDir, "version-hint.text").toPath).trim
    val meta = mapper.readTree(
      Files.readString(new java.io.File(metaDir, s"v$hint.metadata.json").toPath))
    val curId = meta.get("current-snapshot-id").asLong
    val listPath = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId).get
      .get("manifest-list").asText
    avroRecords(listPath).filter(_.get("content").asInstanceOf[Int] == 0)
      .map { m =>
        avroRecords(m.get("manifest_path").toString)
          .map(_.get("data_file").asInstanceOf[GenericRecord]
            .get("partition").asInstanceOf[GenericRecord]
            .get("part").toString)
          .distinct.size
      }
  }

  private def seedAndAppend(t: DeltaTable): Unit = {
    // two seeded appends (manifest history the fast path must reuse by
    // reference), then the measured append spanning two partitions
    t.write(df((1L, "a", "p1"), (2L, "b", "p2")), SaveMode.Append, Seq("part"))
    t.write(df((3L, "c", "p1")), SaveMode.Append, Seq("part"))
    t.write(df((4L, "d", "p1"), (5L, "e", "p2"), (6L, "f", "p3")),
      SaveMode.Append, Seq("part"))
  }

  test("pure-append fast path ≡ general path (same appends, hint suppressed)") {
    val fastDir = tmp()
    val fast = mkUniform(fastDir)
    seedAndAppend(fast)
    assert(IcebergMetadata.lastGenUsedFastPath,
      "default-config pure append must take the fast path")

    val genDir = tmp()
    spark.conf.set("spark.graft.iceberg.fastAppendMaxFiles", "0")
    try {
      val gen = mkUniform(genDir)
      seedAndAppend(gen)
      assert(!IcebergMetadata.lastGenUsedFastPath,
        "fastAppendMaxFiles=0 must suppress the fast path")
      val (fl, fe) = semantics(fast)
      val (gl, ge) = semantics(gen)
      assert(fe == ge, s"entry semantics diverge:\nfast:\n${fe.mkString("\n")}" +
        s"\ngeneral:\n${ge.mkString("\n")}")
      assert(fl == gl, s"manifest-list semantics diverge:\nfast:\n" +
        s"${fl.mkString("\n")}\ngeneral:\n${gl.mkString("\n")}")
    } finally spark.conf.unset("spark.graft.iceberg.fastAppendMaxFiles")
  }

  test("fast-path manifests are clustered one-per-partition-tuple") {
    val dir = tmp()
    val t = mkUniform(dir)
    seedAndAppend(t)
    assert(IcebergMetadata.lastGenUsedFastPath)
    val counts = manifestTupleCounts(t)
    assert(counts.nonEmpty && counts.forall(_ == 1),
      s"each data manifest must cover exactly one partition tuple, got $counts")
  }

  test("adds-count gate: oversized append falls back to the general path") {
    val dir = tmp()
    val t = mkUniform(dir)
    t.write(df((1L, "a", "p1")), SaveMode.Append, Seq("part"))
    spark.conf.set("spark.graft.iceberg.fastAppendMaxFiles", "1")
    try {
      // 2 partitions -> >=2 files > threshold 1 -> general path
      t.write(df((2L, "b", "p1"), (3L, "c", "p2")), SaveMode.Append, Seq("part"))
      assert(!IcebergMetadata.lastGenUsedFastPath,
        "a commit adding more files than fastAppendMaxFiles must fall back")
    } finally spark.conf.unset("spark.graft.iceberg.fastAppendMaxFiles")
    // and the fallback's metadata is still whole: all 3 rows listed
    val (_, entries) = semantics(t)
    assert(entries.size == 3, s"expected 3 data-file entries, got:\n$entries")
  }

  test("dml hint ≡ general path (delete commit, hint vote suppressed)") {
    // same seed + same file-level delete on two tables; one votes reuse
    // via the commit's remove set (dml hint), the other via the general
    // snapshot join (spark.graft.iceberg.fastDmlMaxRemoves=0). Entry
    // semantics — survivors EXISTING with original lineage, DELETED
    // tombstones stamped by the deleting snapshot, reused manifests by
    // reference — must be identical.
    def seedAndDelete(t: DeltaTable): Unit = {
      t.write(df((1L, "a", "p1"), (2L, "b", "p2")), SaveMode.Append, Seq("part"))
      t.write(df((3L, "c", "p1"), (4L, "d", "p3")), SaveMode.Append, Seq("part"))
      t.delete(col("id") === 1L) // file-level remove in p1
    }
    val hintDir = tmp()
    val hinted = mkUniform(hintDir)
    seedAndDelete(hinted)
    val genDir = tmp()
    spark.conf.set("spark.graft.iceberg.fastDmlMaxRemoves", "0")
    try {
      val gen = mkUniform(genDir)
      seedAndDelete(gen)
      val (hl, he) = semantics(hinted)
      val (gl, ge) = semantics(gen)
      assert(he == ge, s"entry semantics diverge:\nhint:\n${he.mkString("\n")}" +
        s"\ngeneral:\n${ge.mkString("\n")}")
      assert(hl == gl, s"manifest-list semantics diverge:\nhint:\n" +
        s"${hl.mkString("\n")}\ngeneral:\n${gl.mkString("\n")}")
      // the scenario exercised what it claims: a DELETED tombstone and a
      // reused untouched manifest are both present
      assert(he.exists(_.startsWith("st=2")), s"no tombstone in:\n$he")
      assert(he.exists(_.startsWith("st=0")) || hl.exists(_.contains("addedBy=2")),
        "no survivor/reused evidence")
    } finally spark.conf.unset("spark.graft.iceberg.fastDmlMaxRemoves")
  }

  test("v3 row-tracking append takes the fast path (post-assignment actions)") {
    val dir = tmp()
    val t = mkUniform(dir, Map(
      "graft.iceberg.formatVersion" -> "3",
      "delta.enableRowTracking" -> "true"))
    t.write(df((1L, "a", "p1")), SaveMode.Append, Seq("part"))
    t.write(df((2L, "b", "p2")), SaveMode.Append, Seq("part"))
    assert(IcebergMetadata.lastGenUsedFastPath,
      "v3 append must take the fast path: postCommit hands generation the " +
        "winning attempt's ASSIGNED actions (baseRowId present)")
    // row lineage survived the fast path: every entry has first_row_id
    val metaDir = IcebergMetadata.metadataDir(t.deltaLog).toString
      .stripPrefix("file:")
    val hint = Files.readString(
      new java.io.File(metaDir, "version-hint.text").toPath).trim
    val meta = mapper.readTree(
      Files.readString(new java.io.File(metaDir, s"v$hint.metadata.json").toPath))
    val curId = meta.get("current-snapshot-id").asLong
    val listPath = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId).get
      .get("manifest-list").asText
    val frids = avroRecords(listPath)
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .flatMap(m => avroRecords(m.get("manifest_path").toString))
      .map(_.get("data_file").asInstanceOf[GenericRecord].get("first_row_id"))
    assert(frids.nonEmpty && frids.forall(_ != null),
      s"v3 fast-path manifests must carry first_row_id, got $frids")
  }
}
