package graft.delta

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UniForm Iceberg metadata generation: spec-structural conformance —
  * the metadata JSON, manifest list, and data manifests are re-read
  * with Jackson/Avro and checked against the Delta snapshot (no Iceberg
  * reader exists in this sandbox; see IcebergMetadata's scaladoc).
  */
class IcebergUniformSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-uniform").toString

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

  private def mkUniform(dir: String): DeltaTable = {
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = df((0L, "x", "p")).schema.json,
      partitionColumns = Seq("part"),
      configuration = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg")))
    txn.commit(Nil, Op.CreateTable)
    t
  }

  test("each commit regenerates metadata; manifests list exactly the snapshot's files") {
    val dir = tmp()
    val t = mkUniform(dir)
    t.write(df((1L, "a", "x"), (2L, "b", "y")), partitionBy = Seq("part")) // v1
    t.write(df((3L, "c", "x")), partitionBy = Seq("part"))                 // v2
    val metaDir = new java.io.File(dir, "metadata")
    assert(metaDir.isDirectory, "metadata/ not generated")

    // version hint tracks the latest generation (delta v2 -> iceberg v3)
    val hint = new String(Files.readAllBytes(
      metaDir.toPath.resolve("version-hint.text"))).trim
    assert(hint == "3", hint)

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readAllBytes(metaDir.toPath.resolve("v3.metadata.json")))
    assert(meta.get("format-version").asInt == 2)
    assert(meta.get("current-snapshot-id").asLong == 3L)
    assert(meta.get("table-uuid").asText ==
      t.deltaLog.update().metadata.id)
    // snapshot log accumulates one entry per generation (v0, v1, v2)
    assert(meta.get("snapshots").size == 3, meta.get("snapshots").toString)
    // identity partition spec on `part`, source-id = the schema field id
    val spec = meta.get("partition-specs").get(0).get("fields").get(0)
    assert(spec.get("name").asText == "part")
    assert(spec.get("transform").asText == "identity")
    val schemaFields = meta.get("schemas").get(0).get("fields")
    val partField = schemaFields.elements().asScala
      .find(_.get("name").asText == "part").get
    assert(spec.get("source-id").asInt == partField.get("id").asInt)
    // schema types mapped
    assert(schemaFields.elements().asScala
      .find(_.get("name").asText == "id").get.get("type").asText == "long")

    // the manifest list points at manifests whose entries are EXACTLY
    // the snapshot's live files
    val listPath = meta.get("snapshots").get(2).get("manifest-list").asText
    val manifests = avroRecords(listPath)
    assert(manifests.nonEmpty)
    val entries = manifests.flatMap(m =>
      avroRecords(m.get("manifest_path").toString))
    val listedPaths = entries.map(
      _.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString).toSet
    val log = t.deltaLog
    val snapPaths = log.update().allFiles.map(f =>
      FileNames.absolutePathString(log.dataPath, f.path)).toSet
    assert(listedPaths == snapPaths,
      s"manifest files != snapshot files:\n$listedPaths\nvs\n$snapPaths")
    // record counts and sizes agree with the AddFile stats
    val rowTotal = entries.map(
      _.get("data_file").asInstanceOf[GenericRecord]
        .get("record_count").asInstanceOf[Long]).sum
    assert(rowTotal == 3L, rowTotal.toString)
    // partition values ride in the typed partition struct
    val parts = entries.map { e =>
      e.get("data_file").asInstanceOf[GenericRecord]
        .get("partition").asInstanceOf[GenericRecord].get("part").toString
    }.toSet
    assert(parts == Set("x", "y"), parts.toString)
    // manifest-list summaries match the manifests they describe
    manifests.foreach { m =>
      val n = avroRecords(m.get("manifest_path").toString).size
      assert(m.get("added_files_count").asInstanceOf[Int] == n)
      assert(m.get("added_snapshot_id").asInstanceOf[Long] == 3L)
    }
    // re-generating the SAME version (manual call after the post-commit
    // hook) replaces its snapshot entry instead of duplicating it
    assert(t.generateIcebergMetadata() == 3L)
    val meta2 = mapper.readTree(
      Files.readAllBytes(metaDir.toPath.resolve("v3.metadata.json")))
    assert(meta2.get("snapshots").size == 3, meta2.get("snapshots").toString)
    assert(meta2.get("snapshot-log").size == 3)
    // name mapping binds parquet column names to the schema field ids
    // (spec: schema.name-mapping.default) — required because the delta
    // write path does not stamp parquet field ids outside id mode
    val nm = mapper.readTree(meta2.get("properties")
      .get("schema.name-mapping.default").asText)
    val nmIds = nm.elements().asScala
      .map(e => e.get("names").get(0).asText -> e.get("field-id").asInt).toMap
    val schemaIds = meta2.get("schemas").get(0).get("fields").elements().asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    assert(nmIds == schemaIds, s"$nmIds vs $schemaIds")
  }

  test("data_file column stats: typed bounds and counts from the Delta stats") {
    val dir = tmp()
    val t = mkUniform(dir)
    t.write(df((5L, "a", "x"), (42L, "b", "x")), partitionBy = Seq("part"))
    val metaDir = new java.io.File(dir, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hint = new String(Files.readAllBytes(
      metaDir.toPath.resolve("version-hint.text"))).trim
    val meta = mapper.readTree(Files.readAllBytes(
      metaDir.toPath.resolve(s"v$hint.metadata.json")))
    val idFieldId = meta.get("schemas").get(0).get("fields").elements().asScala
      .find(_.get("name").asText == "id").get.get("id").asInt
    val curId = meta.get("current-snapshot-id").asLong
    val listPath = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId).get
      .get("manifest-list").asText
    val entries = avroRecords(listPath).flatMap(m =>
      avroRecords(m.get("manifest_path").toString))
    assert(entries.nonEmpty)
    def mapOf(df: GenericRecord, field: String): Map[Int, Any] = {
      val arr = df.get(field).asInstanceOf[java.util.Collection[GenericRecord]]
      arr.iterator().asScala.map(r =>
        r.get("key").asInstanceOf[Int] -> r.get("value")).toMap
    }
    def longLE(b: Any): Long = b.asInstanceOf[java.nio.ByteBuffer].duplicate()
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    // across all files, the id bounds must cover exactly [5, 42] and
    // value counts equal each file's record count. null_value_counts is
    // absent by design: this engine's Delta stats carry
    // numRecords/minValues/maxValues only, and Iceberg's field is
    // optional — emitting a guessed zero would be a fabricated stat.
    var lo = Long.MaxValue; var hi = Long.MinValue
    entries.foreach { e =>
      val d = e.get("data_file").asInstanceOf[GenericRecord]
      val rc = d.get("record_count").asInstanceOf[Long]
      assert(mapOf(d, "value_counts")(idFieldId).asInstanceOf[Long] == rc)
      assert(d.get("null_value_counts") == null,
        "null counts must not be fabricated from stats that lack them")
      lo = math.min(lo, longLE(mapOf(d, "lower_bounds")(idFieldId)))
      hi = math.max(hi, longLE(mapOf(d, "upper_bounds")(idFieldId)))
    }
    assert(lo == 5L && hi == 42L, s"[$lo, $hi]")
  }

  test("manifest-list field summaries bound each manifest's partition values") {
    val dir = tmp()
    val t = mkUniform(dir)
    t.write(df((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")),
      partitionBy = Seq("part"))
    val metaDir = new java.io.File(dir, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hint = new String(Files.readAllBytes(
      metaDir.toPath.resolve("version-hint.text"))).trim
    val meta = mapper.readTree(Files.readAllBytes(
      metaDir.toPath.resolve(s"v$hint.metadata.json")))
    val curId = meta.get("current-snapshot-id").asLong
    val listPath = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == curId).get
      .get("manifest-list").asText
    val manifests = avroRecords(listPath)
    assert(manifests.nonEmpty)
    manifests.foreach { m =>
      // the entries this manifest actually contains
      val parts = avroRecords(m.get("manifest_path").toString).map { e =>
        e.get("data_file").asInstanceOf[GenericRecord]
          .get("partition").asInstanceOf[GenericRecord].get("part").toString
      }
      // its field_summary must bound exactly those values (string bounds
      // are the UTF-8 single-value serialization)
      val summary = m.get("partitions")
        .asInstanceOf[java.util.Collection[GenericRecord]]
        .iterator().next()
      def str(b: Any): String = {
        val bb = b.asInstanceOf[java.nio.ByteBuffer].duplicate()
        val arr = new Array[Byte](bb.remaining()); bb.get(arr)
        new String(arr, "UTF-8")
      }
      assert(!summary.get("contains_null").asInstanceOf[Boolean])
      assert(str(summary.get("lower_bound")) == parts.min,
        s"lower ${str(summary.get("lower_bound"))} vs ${parts.min}")
      assert(str(summary.get("upper_bound")) == parts.max,
        s"upper ${str(summary.get("upper_bound"))} vs ${parts.max}")
    }
    // clustered manifests: with >1 manifest no partition value spans two
    // (the skippability property); with 1 manifest the bound test above
    // already pinned correctness
    if (manifests.size > 1) {
      val perManifest = manifests.map(m =>
        avroRecords(m.get("manifest_path").toString).map { e =>
          e.get("data_file").asInstanceOf[GenericRecord]
            .get("partition").asInstanceOf[GenericRecord].get("part").toString
        }.toSet)
      val all = perManifest.flatten
      assert(all.size == perManifest.map(_.size).sum,
        s"a partition value spans manifests: $perManifest")
    }
  }

  test("SQL GENERATE iceberg_metadata; summary operation tracks the Delta commit kind") {
    import spark.implicits._
    val dir = tmp()
    // no auto property: metadata is generated ON DEMAND through SQL
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(schemaString = df((0L, "x", "p")).schema.json))
    txn.commit(Nil, Op.CreateTable)
    t.write(df((1L, "a", "x"), (2L, "b", "y")))   // v1 append
    t.delete(col("id") === 1L)                    // v2 copy-on-write delete
    spark.sql(s"GENERATE iceberg_metadata FOR TABLE graft.`$dir`")
    val metaDir = new java.io.File(dir, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def current() = {
      val hint = new String(Files.readAllBytes(
        metaDir.toPath.resolve("version-hint.text"))).trim
      val m = mapper.readTree(Files.readAllBytes(
        metaDir.toPath.resolve(s"v$hint.metadata.json")))
      val id = m.get("current-snapshot-id").asLong
      m.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong == id).get
        .get("summary").get("operation").asText
    }
    assert(current() == "overwrite", current()) // a delete can remove rows
    t.compact()                                  // v3 OPTIMIZE
    spark.sql(s"GENERATE iceberg_metadata FOR TABLE graft.`$dir`")
    assert(current() == "replace", current())   // rewrite, same logical rows
  }

  test("timestamp columns refuse generation (INT96 data vs Iceberg spec)") {
    import spark.implicits._
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(schemaString =
      Seq((1L, new java.sql.Timestamp(0L))).toDF("id", "ts").schema.json))
    txn.commit(Nil, Op.CreateTable)
    val e = intercept[UnsupportedOperationException](t.generateIcebergMetadata())
    assert(e.getMessage.contains("INT96"), e.getMessage)
  }

  test("unknown universalFormat values fail at the metadata commit") {
    val t = DeltaTable.forPath(spark, tmp())
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = df((0L, "x", "p")).schema.json,
      configuration = Map("delta.universalFormat.enabledFormats" -> "hudi")))
    val e = intercept[IllegalArgumentException](txn.commit(Nil, Op.CreateTable))
    assert(e.getMessage.contains("unknown universalFormat"), e.getMessage)
  }

  test("deletion vectors refuse Iceberg generation loudly") {
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(Metadata(
      schemaString = df((0L, "x", "p")).schema.json,
      configuration = Map("delta.enableDeletionVectors" -> "true")))
    txn.commit(Nil, Op.CreateTable)
    t.write(df((1L, "a", "x"), (2L, "b", "y")))
    t.delete(col("id") === 1L) // merge-on-read: DV masks the row
    val e = intercept[Exception](t.generateIcebergMetadata())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("deletion vectors"), e.toString)
  }

  test("column-mapped tables export the MAPPING field ids") {
    val dir = tmp()
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.deltaLog.startTransaction()
    txn.updateMetadata(ColumnMapping.ensureEnabled(Metadata(
      schemaString = df((0L, "x", "p")).schema.json,
      configuration = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg")), "id"))
    txn.commit(Nil, Op.CreateTable)
    t.write(df((1L, "a", "x")))
    val metaDir = new java.io.File(dir, "metadata")
    val hint = new String(Files.readAllBytes(
      metaDir.toPath.resolve("version-hint.text"))).trim
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      Files.readAllBytes(metaDir.toPath.resolve(s"v$hint.metadata.json")))
    val md = t.deltaLog.update().metadata
    val expected = md.schema.fields.map(f =>
      f.name -> f.metadata.getLong(ColumnMapping.IdKey).toInt).toMap
    val got = meta.get("schemas").get(0).get("fields").elements().asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    assert(got == expected, s"$got vs $expected")
    // and the name mapping binds the PHYSICAL parquet names (what the
    // footers actually carry under column mapping) to those ids
    val nm = mapper.readTree(meta.get("properties")
      .get("schema.name-mapping.default").asText)
    val nmPairs = nm.elements().asScala
      .map(e => e.get("names").get(0).asText -> e.get("field-id").asInt).toMap
    val physPairs = md.schema.fields.map(f =>
      ColumnMapping.physicalName(f) ->
        f.metadata.getLong(ColumnMapping.IdKey).toInt).toMap
    assert(nmPairs == physPairs, s"$nmPairs vs $physPairs")
  }
}
