package graft.delta

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{GQ, QueryDefs}
import QueryDefs.table

/** Driver-gate queries exercising the Delta layer end-to-end: each builds
  * a temp Delta table from the sf parquet inputs, round-trips through the
  * transaction log (write -> commit -> snapshot -> scan), and the DuckDB
  * oracle checks the result against the original parquet — so log replay,
  * the write path, pruning, time travel and checkpointing are all under
  * the same hash-match gate as the relational operators.
  */
object DeltaQueries {

  // one fixture per (sfDir, kind) per JVM — Verify/Bench run queries
  // sequentially in one session
  private val fixtures = TrieMap.empty[(String, String), String]

  private def fixture(s: SparkSession, d: String, kind: String)(build: String => Unit): String =
    fixtures.getOrElseUpdate((d, kind), {
      val dir = QueryDefs.scratchDir(s"graft-delta-$kind").toString
      build(dir)
      dir
    })

  /** Shared by delta_convert_sync and delta_convert_cdf: a UniForm table
    * is adopted as pure Iceberg (the `_delta_log` dropped), a FOREIGN
    * snapshot 99 is hand-crafted (removes batch A, adds batch C,
    * equality-deletes keys from B and C at the same sequence), and one
    * re-sync diff commit mirrors it.
    */
  private[graft] def convertSyncFixture(s: SparkSession, d: String): String =
    fixture(s, d, "convert-sync") { dir =>
        import s.implicits._
        import scala.jdk.CollectionConverters._
        import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
        import org.apache.avro.file.{DataFileReader, DataFileWriter}
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg")))
        txn.commit(Nil, Op.CreateTable)
        t.write(orders.filter(pmod($"o_orderkey", lit(4)) === 0)) // A (snap 2)
        t.write(orders.filter(pmod($"o_orderkey", lit(4)) === 1)) // B (snap 3)
        val hconf = s.sessionState.newHadoopConf()
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        logDir.getFileSystem(hconf).delete(logDir, true)
        DeltaTable.convertFromIceberg(s, dir) // adopt snapshot 3
        // ---- the foreign writer's next commit, crafted by hand
        val metaDir = new java.io.File(dir, "metadata")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val hint = new String(java.nio.file.Files.readAllBytes(
          metaDir.toPath.resolve("version-hint.text"))).trim
        val meta = mapper.readTree(java.nio.file.Files.readAllBytes(
          metaDir.toPath.resolve(s"v$hint.metadata.json")))
        val curId = meta.get("current-snapshot-id").asLong
        val listPath = meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong == curId).get
          .get("manifest-list").asText
        def avroRecs(p: String): Seq[GenericRecord] = {
          val r = DataFileReader.openReader(
            new org.apache.avro.mapred.FsInput(
              new org.apache.hadoop.fs.Path(p), hconf),
            new GenericDatumReader[GenericRecord]())
          try r.iterator().asScala.toList finally r.close()
        }
        val oldEntries = avroRecs(listPath)
        // incremental generation keeps batch A's manifests reused with
        // added_snapshot_id 2 — dropping them removes exactly batch A
        val keepB = oldEntries.filter(
          _.get("added_snapshot_id").asInstanceOf[Long] == 3L)
        require(keepB.nonEmpty && keepB.size < oldEntries.size,
          s"fixture shape: expected reused A + fresh B manifests, got $oldEntries")
        // batch C: one new parquet file under the root
        val cDir = new java.io.File(dir, "sync-c")
        val cDF = orders.filter(pmod($"o_orderkey", lit(4)) === 2)
        val cCount = cDF.count()
        cDF.coalesce(1).write.mode("overwrite").parquet(cDir.toString)
        val cFile = cDir.listFiles().find(_.getName.endsWith(".parquet")).get
        // equality-delete keys drawn from B AND C (only B's rows may die)
        val delDir = java.nio.file.Files.createTempDirectory("graft-sync-eq")
        val delKeys = orders.filter(pmod($"o_orderkey", lit(4)).isin(1, 2) &&
            pmod($"o_orderkey", lit(10)) === 3)
          .select($"o_orderkey")
        val delCount = delKeys.count()
        delKeys.coalesce(1).write.mode("overwrite").parquet(delDir.toString)
        val delFile = new java.io.File(delDir.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val schemaId = meta.get("current-schema-id").asInt
        val okeyId = meta.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt == schemaId).get
          .get("fields").elements().asScala
          .find(_.get("name").asText == "o_orderkey").get.get("id").asInt
        val entrySchema = new org.apache.avro.Schema.Parser().parse(
          IcebergMetadata.manifestEntrySchemaJson(
            IcebergMetadata.partitionStructSchemaJson(Nil)))
        val dfS = entrySchema.getField("data_file").schema()
        def writeManifest(out: java.io.File, content: Int, path: String,
            rc: Long, len: Long, eqIds: Seq[Int]): Unit = {
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](entrySchema))
          w.create(entrySchema, out)
          val rec = new GenericData.Record(entrySchema)
          rec.put("status", 1)
          rec.put("snapshot_id", 99L)
          rec.put("sequence_number", 4L)
          val dfr = new GenericData.Record(dfS)
          dfr.put("content", content)
          dfr.put("file_path", path)
          dfr.put("file_format", "PARQUET")
          dfr.put("partition",
            new GenericData.Record(dfS.getField("partition").schema()))
          dfr.put("record_count", rc)
          dfr.put("file_size_in_bytes", len)
          if (eqIds.nonEmpty) {
            val arrS = dfS.getField("equality_ids").schema().getTypes.asScala
              .find(_.getType == org.apache.avro.Schema.Type.ARRAY).get
            val arr = new GenericData.Array[Any](eqIds.size, arrS)
            eqIds.foreach(arr.add(_))
            dfr.put("equality_ids", arr)
          }
          rec.put("data_file", dfr)
          w.append(rec)
          w.close()
        }
        val cManifest = new java.io.File(metaDir, "sync-c-m0.avro")
        writeManifest(cManifest, 0, cFile.getAbsolutePath, cCount, cFile.length(), Nil)
        val dManifest = new java.io.File(metaDir, "sync-eq-d0.avro")
        writeManifest(dManifest, 2, delFile.getAbsolutePath,
          delCount, delFile.length(), Seq(okeyId))
        val listSchema = new org.apache.avro.Schema.Parser().parse(
          IcebergMetadata.manifestListSchemaJson)
        val newList = new java.io.File(metaDir, "snap-99-1-sync.avro")
        val lw = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](listSchema))
        lw.create(listSchema, newList)
        keepB.foreach(lw.append)
        def listRec(f: java.io.File, content: Int): GenericRecord = {
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", f.getAbsolutePath)
          r.put("manifest_length", f.length())
          r.put("partition_spec_id", 0)
          r.put("content", content)
          r.put("sequence_number", 4L)
          r.put("min_sequence_number", 4L)
          r.put("added_snapshot_id", 99L)
          r.put("added_files_count", 1)
          r.put("existing_files_count", 0)
          r.put("deleted_files_count", 0)
          r.put("added_rows_count", 1L)
          r.put("existing_rows_count", 0L)
          r.put("deleted_rows_count", 0L)
          r
        }
        lw.append(listRec(cManifest, 0))
        lw.append(listRec(dManifest, 1))
        lw.close()
        val root = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
        root.put("current-snapshot-id", 99L)
        root.put("last-sequence-number", 4L)
        val sn = root.withArray("snapshots").addObject()
        sn.put("snapshot-id", 99L)
        sn.put("sequence-number", 4L)
        sn.put("timestamp-ms", System.currentTimeMillis())
        sn.putObject("summary").put("operation", "overwrite")
        sn.put("manifest-list", newList.getAbsolutePath)
        sn.put("schema-id", schemaId)
        java.nio.file.Files.write(
          metaDir.toPath.resolve(s"v${hint.toLong + 1}.metadata.json"),
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
        java.nio.file.Files.deleteIfExists(
          metaDir.toPath.resolve(".version-hint.text.crc"))
        java.nio.file.Files.write(metaDir.toPath.resolve("version-hint.text"),
          (hint.toLong + 1).toString.getBytes("UTF-8"))
        // ---- RE-SYNC: one diff commit mirrors snapshot 99
        DeltaTable.convertFromIceberg(s, dir)
    }

  private def ordersFixture(s: SparkSession, d: String): String =
    fixture(s, d, "orders") { dir =>
      DeltaTable.forPath(s, dir)
        .write(table(s, d, "orders"), SaveMode.Append, Seq("o_orderstatus"))
    }

  private def timeTravelFixture(s: SparkSession, d: String): String =
    fixture(s, d, "tt") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      t.write(orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), SaveMode.Append) // v0
      t.write(orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), SaveMode.Append) // v1
    }

  private def checkpointFixture(s: SparkSession, d: String): String =
    fixture(s, d, "ckpt") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
      // small checkpoint interval so snapshots must stitch checkpoint + tail
      val txn0 = t.deltaLog.startTransaction()
      txn0.updateMetadata(Metadata(
        schemaString = nation.schema.json,
        configuration = Map("delta.checkpointInterval" -> "2")))
      txn0.commit(Nil, Op.CreateTable) // v0
      (0 until 5).foreach { k => // v1..v5; checkpoints at v2, v4
        t.write(nation.filter(pmod(col("n_nationkey"), lit(5)) === k))
      }
    }

  private def compactionFixture(s: SparkSession, d: String): String =
    fixture(s, d, "compact") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
      (0 until 3).foreach(k => t.write(nation.filter(pmod(col("n_nationkey"), lit(3)) === k)))
      t.compact()
    }

  private def regionTxnFixture(s: SparkSession, d: String): String =
    fixture(s, d, "region") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val region = table(s, d, "region")
      t.write(region, SaveMode.Append) // v0
      t.write(region, SaveMode.Append) // v1: second optimistic txn
    }

  private def cdfFixture(s: SparkSession, d: String): String =
    fixture(s, d, "cdf") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      t.write(nation, SaveMode.Append, Seq("n_regionkey")) // v0: 25 inserts
      t.deleteWhere(col("n_regionkey") === 2) // v1: partition delete
      t.write(nation.filter(col("n_nationkey") < 5)) // v2: 5 inserts
    }

  private def deleteFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-del") { dir =>
      val t = DeltaTable.forPath(s, dir)
      t.write(table(s, d, "orders"), SaveMode.Append, Seq("o_orderstatus"))
      // residual (non-partition) predicate -> the row-level rewrite path
      t.delete(col("o_totalprice") > 250000)
    }

  private def updateFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-upd") { dir =>
      val t = DeltaTable.forPath(s, dir)
      t.write(table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      t.update(col("n_regionkey") === 2,
        Map("n_name" -> concat(col("n_name"), lit("_EU"))))
    }

  private def mergeFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-merge") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      t.write(nation)
      val src = nation.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey"), upper(col("n_name")).as("n_name"), col("n_regionkey"))
        .unionByName(nation.filter(col("n_nationkey") < 5)
          .select((col("n_nationkey") + 100).as("n_nationkey"), col("n_name"), col("n_regionkey")))
      t.merge(src, col("t.n_nationkey") === col("s.n_nationkey"))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    }

  private def clusteredFixture(s: SparkSession, d: String): String =
    fixture(s, d, "clustered") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = orders.schema.json,
        configuration = Map(
          "delta.targetFileSize" -> (64L * 1024).toString,
          "delta.clusteringColumns" -> "o_custkey,o_totalprice")))
      txn.commit(Nil, Op.CreateTable)
      t.write(orders.repartition(8), SaveMode.Append)
      // plain OPTIMIZE picks up the declared clustering columns
      t.compact()
      val ci = t.deltaLog.commitInfoAt(t.snapshot.version).get
      require(ci.operation == Op.Optimize &&
        ci.operationParameters.get("zOrderBy").contains("o_custkey,o_totalprice"),
        "parameterless OPTIMIZE must apply the declared clustering")
    }

  private def identityFixture(s: SparkSession, d: String): String =
    fixture(s, d, "identity") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        IdentityColumns.field("id", start = 1L, step = 1L),
        org.apache.spark.sql.types.StructField("n_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_regionkey",
          org.apache.spark.sql.types.LongType)))
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(schemaString = schema.json))
      txn.commit(Nil, Op.CreateTable)
      val nation = table(s, d, "nation")
        .select(col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
      // two single-partition sorted batches => generation order is the
      // sort order, reproducible by the oracle's row_number
      t.write(nation.filter(col("n_regionkey") < 2).orderBy(col("n_name")).coalesce(1))
      t.write(nation.filter(col("n_regionkey") >= 2).orderBy(col("n_name")).coalesce(1))
      require(t.snapshot.protocol.minWriterVersion == 6,
        "identity tables must carry writer version 6")
    }

  private def reorgFixture(s: SparkSession, d: String): String =
    fixture(s, d, "reorg") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = orders.schema.json,
        configuration = Map("delta.enableDeletionVectors" -> "true")))
      txn.commit(Nil, Op.CreateTable)
      t.write(orders)
      t.delete(col("o_totalprice") > 250000) // DV masks
      t.reorgPurge()                         // materialize: no DVs survive
      require(t.snapshot.allFiles.forall(f =>
        DeletionVectors.descriptor(f).isEmpty), "purge must drop every DV")
    }

  private def checkpointV2Fixture(s: SparkSession, d: String): String =
    fixture(s, d, "ckptv2") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
      val txn0 = t.deltaLog.startTransaction()
      txn0.updateMetadata(Metadata(
        schemaString = nation.schema.json,
        configuration = Map(
          "delta.checkpointInterval" -> "2",
          "delta.checkpointPolicy" -> "v2",
          "delta.checkpoint.numSidecars" -> "4")))
      txn0.commit(Nil, Op.CreateTable) // v0
      (0 until 5).foreach { k => // v1..v5; v2 checkpoints at v2, v4
        t.write(nation.filter(pmod(col("n_nationkey"), lit(5)) === k))
      }
    }

  private def rowTrackingFixture(s: SparkSession, d: String): String =
    fixture(s, d, "rowtracking") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = nation.schema.json,
        configuration = Map(
          "delta.enableRowTracking" -> "true",
          "delta.enableDeletionVectors" -> "true")))
      txn.commit(Nil, Op.CreateTable)
      // one sorted file: fresh ids follow the sort order (0..N-1)
      t.write(nation.orderBy(col("n_nationkey")).coalesce(1))
      t.delete(col("n_regionkey") === 2) // DV mask: surviving ids stable
      t.compact()                        // materializes the surviving ids
      // re-admit the deleted region: fresh ids continue above the mark
      t.write(nation.filter(col("n_regionkey") === 2)
        .orderBy(col("n_nationkey")).coalesce(1))
    }

  private def dvMergeFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-dv-merge") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = nation.schema.json,
        configuration = Map("delta.enableDeletionVectors" -> "true")))
      txn.commit(Nil, Op.CreateTable)
      t.write(nation, SaveMode.Append)
      val before = t.snapshot.allFiles.map(_.path).toSet
      // matched deletes (rk=2) + matched updates (<10) + inserts (+100),
      // all merge-on-read: DV masks + appends only
      val src = nation.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey"), upper(col("n_name")).as("n_name"), col("n_regionkey"))
        .unionByName(nation.filter(col("n_nationkey") < 5)
          .select((col("n_nationkey") + 100).as("n_nationkey"), col("n_name"), col("n_regionkey")))
      t.merge(src, col("t.n_nationkey") === col("s.n_nationkey"))
        .whenMatchedDelete(col("s.n_regionkey") === 2)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
      require(before.subsetOf(t.snapshot.allFiles.map(_.path).toSet),
        "DV merge must not rewrite existing files")
    }

  private def mergeMultiFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-merge-multi") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      t.write(nation)
      val src = nation.filter(col("n_nationkey") < 15)
        .unionByName(nation.filter(col("n_nationkey") < 5)
          .withColumn("n_nationkey", col("n_nationkey") + 100))
        .withColumn("n_name", concat(col("n_name"), lit("_s")))
      // one MERGE exercising clause ordering, clause conditions, and the
      // whenNotMatchedBySource surface all at once
      t.merge(src, col("t.n_nationkey") === col("s.n_nationkey"))
        .whenMatchedDelete(col("s.n_regionkey") === 2)
        .whenMatchedUpdate(col("s.n_nationkey") < 8,
          Map("n_name" -> upper(col("s.n_name"))))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll(col("s.n_regionkey") =!= 0)
        .whenNotMatchedBySourceDelete(col("t.n_nationkey") >= 20)
        .whenNotMatchedBySourceUpdate(
          Map("n_name" -> concat(col("t.n_name"), lit("_keep"))))
        .execute()
    }

  private def generatedFixture(s: SparkSession, d: String): String =
    fixture(s, d, "generated") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      // order_year is a GENERATED partition column: the writer never
      // supplies it; every append computes it in the write pass and lands
      // hive-partitioned by it (derived partition pruning)
      val schema = org.apache.spark.sql.types.StructType(
        orders.schema.fields :+ GeneratedColumns.field(
          "order_year", org.apache.spark.sql.types.IntegerType,
          "year(o_orderdate)"))
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = schema.json, partitionColumns = Seq("order_year")))
      txn.commit(Nil, Op.CreateTable)
      t.write(orders)
    }

  private[graft] def cdfDmlFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-cdf") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = nation.schema.json,
        configuration = Map("delta.enableChangeDataFeed" -> "true")))
      txn.commit(Nil, Op.CreateTable) // v0
      t.write(nation) // v1
      t.delete(col("n_regionkey") === 2 && col("n_nationkey") > 10) // v2
      t.update(col("n_nationkey") < 3, Map("n_name" -> concat(col("n_name"), lit("!")))) // v3
    }

  private def dvFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-dv") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = orders.schema.json,
        partitionColumns = Seq("o_orderstatus"),
        configuration = Map("delta.enableDeletionVectors" -> "true")))
      txn.commit(Nil, Op.CreateTable)
      t.write(orders, SaveMode.Append, Seq("o_orderstatus"))
      // merge-on-read delete: same files, sidecar DVs
      t.delete(col("o_totalprice") > 250000)
      require(t.snapshot.allFiles.exists(f => DeletionVectors.descriptor(f).isDefined),
        "expected deletion-vector descriptors after the delete")
    }

  private def dvUpdateFixture(s: SparkSession, d: String): String =
    fixture(s, d, "dml-dv-update") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = orders.schema.json,
        partitionColumns = Seq("o_orderstatus"),
        configuration = Map("delta.enableDeletionVectors" -> "true")))
      txn.commit(Nil, Op.CreateTable)
      t.write(orders, SaveMode.Append, Seq("o_orderstatus"))
      t.delete(col("o_totalprice") > 250000)
      val before = t.snapshot.allFiles.map(_.path).toSet
      // merge-on-read update: old images masked by DVs, new images appended
      t.update(col("o_orderpriority") === "1-URGENT",
        Map("o_totalprice" -> (col("o_totalprice") + lit(1.0))))
      require(before.subsetOf(t.snapshot.allFiles.map(_.path).toSet),
        "DV update must not rewrite existing files")
    }

  private def zorderFixture(s: SparkSession, d: String): String =
    fixture(s, d, "zorder") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = orders.schema.json,
        configuration = Map("delta.targetFileSize" -> (64L * 1024).toString)))
      txn.commit(Nil, Op.CreateTable)
      t.write(orders)
      t.compact(Seq("o_custkey", "o_totalprice")) // multi-column clustering
      // >= 4 z-contiguous files so the Morton curve splits BOTH dimensions
      require(t.snapshot.allFiles.size >= 4, "zorder fixture needs several files")
    }

  private def columnMappingFixture(s: SparkSession, d: String): String =
    fixture(s, d, "colmap") { dir =>
      val t = DeltaTable.forPath(s, dir)
      t.write(table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      t.renameColumn("n_name", "nation_name") // metadata-only
      t.dropColumn("n_regionkey")             // metadata-only
      // post-rename append writes into the SAME physical column
      val extra = table(s, d, "nation")
        .select((col("n_nationkey") + 100).as("n_nationkey"),
          upper(col("n_name")).as("nation_name"))
        .filter(col("n_nationkey") < 105)
      t.write(extra)
    }

  /** CDF spanning a RENAME COLUMN boundary (A18 × A32): CDC and data
    * files store PHYSICAL names, so one range crossing the rename reads
    * consistently and presents rows under the END schema's logical names.
    */
  private def cdfRenameFixture(s: SparkSession, d: String): String =
    fixture(s, d, "cdf-rename") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(Metadata(
        schemaString = nation.schema.json,
        configuration = Map("delta.enableChangeDataFeed" -> "true")))
      txn.commit(Nil, Op.CreateTable)             // v0
      t.write(nation)                             // v1: 25 inserts
      t.delete(col("n_regionkey") === 2)          // v2: CDC row deletes
      t.renameColumn("n_name", "nation_name")     // v3: metadata-only
      t.write(nation.filter(col("n_nationkey") < 5)
        .select((col("n_nationkey") + 100).as("n_nationkey"),
          upper(col("n_name")).as("nation_name"),
          col("n_regionkey")))                    // v4: 5 post-rename inserts
      t.update(col("n_nationkey") === 101,
        Map("nation_name" -> lit("XX")))          // v5: CDC update pre/post
    }

  private def restoreFixture(s: SparkSession, d: String): String =
    fixture(s, d, "restore") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      t.write(nation) // v0
      t.delete(col("n_regionkey") === 2) // v1
      t.write(nation.filter(col("n_nationkey") < 3)
        .select((col("n_nationkey") + 500).as("n_nationkey"),
          col("n_name"), col("n_regionkey"))) // v2
      t.restoreToVersion(0) // v3: back to the full nation
      require(t.deltaLog.update().version == 3, "restore must be a new commit")
    }

  private def constraintsFixture(s: SparkSession, d: String): String =
    fixture(s, d, "constraints") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val nation = table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      t.write(nation)
      t.addConstraint("valid_region", "n_regionkey BETWEEN 0 AND 4")
      // violating batch fails INSIDE the write job and must not commit
      val rkType = nation.schema("n_regionkey").dataType
      val failed =
        try { t.write(nation.limit(1).select(col("n_nationkey"),
          col("n_name"), lit(99).cast(rkType).as("n_regionkey"))); false }
        catch { case e: ConstraintViolationException
          if e.getMessage.contains("valid_region") => true }
      require(failed, "violating write must fail")
      // conforming batch still lands
      t.write(nation.filter(col("n_nationkey") < 5)
        .select((col("n_nationkey") + 100).as("n_nationkey"),
          upper(col("n_name")).as("n_name"), col("n_regionkey")))
    }

  private def cloneFixture(s: SparkSession, d: String): String =
    fixture(s, d, "clone") { dir =>
      val src = DeltaTable.forPath(s, dir + "/src")
      src.write(table(s, d, "orders"), SaveMode.Append, Seq("o_orderstatus"))
      src.delete(col("o_totalprice") > 400000)
      val srcVersion = src.deltaLog.update().version
      val clone = src.shallowCloneTo(dir + "/dst")
      require(clone.snapshot.allFiles.exists(f =>
        new java.net.URI(f.path).isAbsolute), "clone must reference source URIs")
      // DML on the clone exercises the external-path read (partition
      // values attached from the log) and must leave the source untouched;
      // the delete may rewrite every file into the clone's own root
      clone.delete(col("o_totalprice") > 250000)
      require(src.deltaLog.update().version == srcVersion, "source log untouched")
    }

  /** A36 schema evolution: target = even orders (no p_cents column);
    * the merge source = multiple-of-3 orders CARRYING a new p_cents
    * column. After `withSchemaEvolution` UpdateAll/InsertAll: matched
    * even×3 rows refresh and gain p_cents, source-only odd×3 rows
    * insert with it, untouched even rows read it as NULL from their
    * pre-evolution files.
    */
  private def mergeEvolveFixture(s: SparkSession, d: String): String =
    fixture(s, d, "mevolve") { dir =>
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders").select(ordersCols.map(col): _*)
      t.write(orders.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val src = orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .withColumn("p_cents", QueryDefs.cents(col("o_totalprice")))
      t.merge(src, expr("t.o_orderkey = s.o_orderkey"))
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    }

  /** A35 time-travel clone: v0 = cheap orders, v1 overwrites with the
    * expensive ones; the clone forks AS OF v0, so it must read the
    * pre-overwrite content even though the source HEAD says otherwise.
    */
  private def cloneAsofFixture(s: SparkSession, d: String): String =
    fixture(s, d, "cloneasof") { dir =>
      val t = DeltaTable.forPath(s, dir + "/src")
      val orders = table(s, d, "orders").select(ordersCols.map(col): _*)
      t.write(orders.filter(col("o_totalprice") <= 200000))                    // v0
      t.write(orders.filter(col("o_totalprice") > 200000), SaveMode.Overwrite) // v1
      t.shallowCloneTo(dir + "/dst", versionAsOf = Some(0L))
    }

  private def dsv2Fixture(s: SparkSession, d: String): String =
    fixture(s, d, "dsv2") { dir =>
      // through the public DataFrameWriter surface — exercises the
      // CreatableRelationProvider write path end-to-end
      table(s, d, "orders").write.format("graft-delta")
        .partitionBy("o_orderstatus").mode(SaveMode.Append).save(dir)
    }

  private val ordersCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  val queries: Seq[GQ] = Seq(
    // A4/A5/A16: write path -> log replay -> snapshot read
    GQ("delta_roundtrip", (s, d) => {
      val dir = ordersFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders ORDER BY o_orderkey""")),

    // A6: pushed partition predicate + residual data predicate
    GQ("delta_partition_scan", (s, d) => {
      val dir = ordersFixture(s, d)
      DeltaTable.forPath(s, dir)
        .read(col("o_orderstatus") === "F" && col("o_totalprice") > 250000)
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 250000
      ORDER BY o_orderkey""")),

    // A7: snapshotForVersionAsOf
    GQ("delta_time_travel", (s, d) => {
      val dir = timeTravelFixture(s, d)
      DeltaTable.forPath(s, dir).toDF(0)
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey""")),

    // A11: two sequential optimistic commits, both visible
    GQ("delta_append_txn", (s, d) => {
      val dir = regionTxnFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("r_regionkey").cast("int").as("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"), col("r_name"))
    }, Some("""
      SELECT CAST(r_regionkey AS INTEGER) AS r_regionkey, r_name FROM (
        SELECT * FROM region UNION ALL SELECT * FROM region)
      ORDER BY r_regionkey, r_name""")),

    // A19: OPTIMIZE rewrite preserves table contents exactly
    GQ("delta_compaction", (s, d) => {
      val dir = compactionFixture(s, d)
      val t = DeltaTable.forPath(s, dir)
      require(t.snapshot.allFiles.size < 3, "compaction must reduce file count")
      t.toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // A19: OPTIMIZE ZORDER BY — Morton re-clustering preserves content
    // exactly while making both clustered columns stats-skippable
    GQ("delta_zorder", (s, d) => {
      val dir = zorderFixture(s, d)
      val t = DeltaTable.forPath(s, dir)
      val n = t.snapshot.allFiles.size
      require(DeltaScan(t.snapshot, Some(col("o_custkey") < 100)).files.size < n,
        "z-ordered custkey range must skip files")
      t.read(col("o_custkey") < 400 && col("o_totalprice") > 100000)
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_custkey < 400 AND o_totalprice > 100000
      ORDER BY o_orderkey""")),

    // A32: column mapping — rename/drop as metadata-only commits; old
    // files read through the physical-name projection, new appends land
    // in the same physical column
    GQ("delta_column_mapping", (s, d) => {
      val dir = columnMappingFixture(s, d)
      val t = DeltaTable.forPath(s, dir)
      require(t.toDF.columns.toSeq == Seq("n_nationkey", "nation_name"),
        "mapped schema must be (n_nationkey, nation_name)")
      t.toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("nation_name"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name AS nation_name FROM nation
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS INTEGER), upper(n_name) FROM nation
      WHERE n_nationkey + 100 < 105
      ORDER BY n_nationkey""")),

    // A18: change-data-feed read — inserts and deletes per commit version
    GQ("delta_cdf", (s, d) => {
      val dir = cdfFixture(s, d)
      DeltaTable.forPath(s, dir).tableChanges(0, 2)
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"),
          col("_change_type"), col("_commit_version"))
        .orderBy(col("_commit_version"), col("n_nationkey"), col("_change_type"))
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS INTEGER) AS nk, n_name,
                   CAST(n_regionkey AS INTEGER) AS rk FROM nation)
      SELECT nk AS n_nationkey, n_name, rk AS n_regionkey, _change_type, _commit_version
      FROM (
        SELECT nk, n_name, rk, 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version FROM n
        UNION ALL
        SELECT nk, n_name, rk, 'delete', CAST(1 AS BIGINT) FROM n WHERE rk = 2
        UNION ALL
        SELECT nk, n_name, rk, 'insert', CAST(2 AS BIGINT) FROM n WHERE nk < 5)
      ORDER BY _commit_version, n_nationkey, _change_type""")),

    // A18 × A32: CDF across a RENAME COLUMN boundary — the range spans
    // pre-rename inserts + CDC deletes, the rename itself, and
    // post-rename inserts + a CDC update; every row resolves through
    // stable physical names and surfaces under the END logical schema
    GQ("delta_cdf_rename", (s, d) => {
      val dir = cdfRenameFixture(s, d)
      DeltaTable.forPath(s, dir).tableChanges(0)
        .select(col("n_nationkey").cast("int").as("n_nationkey"),
          col("nation_name"), col("n_regionkey").cast("int").as("n_regionkey"),
          col("_change_type"), col("_commit_version"))
        .orderBy(col("_commit_version"), col("n_nationkey"), col("_change_type"))
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS INTEGER) AS nk, n_name,
                   CAST(n_regionkey AS INTEGER) AS rk FROM nation)
      SELECT nk AS n_nationkey, nation_name, rk AS n_regionkey,
             _change_type, _commit_version
      FROM (
        SELECT nk, n_name AS nation_name, rk, 'insert' AS _change_type,
               CAST(1 AS BIGINT) AS _commit_version FROM n
        UNION ALL
        SELECT nk, n_name, rk, 'delete', CAST(2 AS BIGINT) FROM n WHERE rk = 2
        UNION ALL
        SELECT nk + 100, upper(n_name), rk, 'insert', CAST(4 AS BIGINT)
        FROM n WHERE nk < 5
        UNION ALL
        SELECT nk + 100, upper(n_name), rk, 'update_preimage', CAST(5 AS BIGINT)
        FROM n WHERE nk = 1
        UNION ALL
        SELECT nk + 100, 'XX', rk, 'update_postimage', CAST(5 AS BIGINT)
        FROM n WHERE nk = 1)
      ORDER BY _commit_version, n_nationkey, _change_type""")),

    // DML: row-level DELETE through the touched-file rewrite path
    GQ("delta_delete", (s, d) => {
      val dir = deleteFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE NOT (o_totalprice > 250000) ORDER BY o_orderkey""")),

    // DML: merge-on-read DELETE via deletion vectors (same result as the
    // rewrite path, zero data files rewritten; pruned read + DV anti-join)
    GQ("delta_dv", (s, d) => {
      val dir = dvFixture(s, d)
      DeltaTable.forPath(s, dir)
        .read(col("o_orderstatus") =!= "P") // partition pruning atop the DV read
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE NOT (o_totalprice > 250000) AND o_orderstatus <> 'P'
      ORDER BY o_orderkey""")),

    // row tracking: fresh ids follow file position, survive a DV delete
    // untouched, survive OPTIMIZE via materialized columns, and continue
    // above the transactional high-water mark on later appends — the
    // oracle replays the whole id lifecycle with row_number arithmetic
    GQ("delta_row_tracking", (s, d) => {
      val dir = rowTrackingFixture(s, d)
      DeltaTable.forPath(s, dir).toDFWithRowIds
        .select(col("n_nationkey"), col("n_name"), col("row_id"))
        .orderBy(col("row_id"))
    }, Some("""
      WITH ranked AS (
        SELECT n_nationkey, n_name, n_regionkey,
               CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS BIGINT) AS row_id
        FROM nation),
      surv AS (SELECT n_nationkey, n_name, row_id FROM ranked WHERE n_regionkey <> 2),
      readd AS (
        SELECT n_nationkey, n_name,
               (SELECT count(*) FROM nation) - 1
                 + (SELECT count(*) FROM nation WHERE n_regionkey <> 2)
                 + CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS row_id
        FROM nation WHERE n_regionkey = 2)
      SELECT n_nationkey, n_name, row_id
      FROM (SELECT * FROM surv UNION ALL SELECT * FROM readd)
      ORDER BY row_id""")),

    // declared clustering columns: parameterless OPTIMIZE re-clusters
    // along them (checked in the fixture); content must survive the
    // Morton re-layout byte-exactly
    GQ("delta_clustered", (s, d) => {
      val dir = clusteredFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders ORDER BY o_orderkey""")),

    // identity columns: server-side generation in batch row order with a
    // transactional high-water mark; the oracle replays the same order
    GQ("delta_identity", (s, d) => {
      val dir = identityFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("id"), col("n_name"), col("n_regionkey"))
        .orderBy(col("id"))
    }, Some("""
      WITH b1 AS (
        SELECT CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS id,
               n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation WHERE n_regionkey < 2),
      b2 AS (
        SELECT (SELECT count(*) FROM nation WHERE n_regionkey < 2)
                 + CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS id,
               n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation WHERE n_regionkey >= 2)
      SELECT id, n_name, n_regionkey FROM (
        SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      ORDER BY id""")),

    // DML: merge-on-read UPDATE via deletion vectors — old images masked,
    // new images appended, zero files rewritten (checked in the fixture)
    GQ("delta_dv_update", (s, d) => {
      val dir = dvUpdateFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus,
        CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 1.0
             ELSE o_totalprice END AS o_totalprice,
        o_orderdate, o_orderpriority
      FROM orders WHERE NOT (o_totalprice > 250000) ORDER BY o_orderkey""")),

    // DML: row-level UPDATE, SET evaluated against the old row
    GQ("delta_update", (s, d) => {
      val dir = updateFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
        CASE WHEN n_regionkey = 2 THEN n_name || '_EU' ELSE n_name END AS n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // DML: MERGE upsert (updateAll + insertAll)
    GQ("delta_merge", (s, d) => {
      val dir = mergeFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
        CASE WHEN n_nationkey < 10 THEN upper(n_name) ELSE n_name END AS n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS INTEGER), n_name, CAST(n_regionkey AS INTEGER)
      FROM nation WHERE n_nationkey < 5
      ORDER BY n_nationkey""")),

    // DML: merge-on-read MERGE via deletion vectors — matched deletes and
    // update pre-images masked, updates/inserts appended, zero rewrites
    GQ("delta_dv_merge", (s, d) => {
      val dir = dvMergeFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
        CASE WHEN n_nationkey < 10 THEN upper(n_name) ELSE n_name END AS n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation WHERE NOT (n_nationkey < 10 AND n_regionkey = 2)
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS INTEGER), n_name, CAST(n_regionkey AS INTEGER)
      FROM nation WHERE n_nationkey < 5
      ORDER BY n_nationkey""")),

    // DML: MERGE with ordered conditional clauses — first-satisfied wins —
    // plus whenNotMatchedBySource update/delete on target-only rows
    GQ("delta_merge_multi", (s, d) => {
      val dir = mergeMultiFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS INTEGER) AS nk, n_name,
                   CAST(n_regionkey AS INTEGER) AS rk FROM nation)
      SELECT nk AS n_nationkey, n_name, rk AS n_regionkey FROM (
        SELECT nk, CASE WHEN nk < 8 THEN upper(n_name || '_s')
                        ELSE n_name || '_s' END AS n_name, rk
        FROM n WHERE nk <= 14 AND rk <> 2
        UNION ALL
        SELECT nk, n_name || '_keep', rk FROM n WHERE nk BETWEEN 15 AND 19
        UNION ALL
        SELECT nk + 100, n_name || '_s', rk FROM n WHERE nk < 5 AND rk <> 0)
      ORDER BY n_nationkey""")),

    // Generated columns: the omitted order_year partition column is
    // computed by the write pass; the scan prunes on it at the log level
    GQ("delta_generated", (s, d) => {
      val dir = generatedFixture(s, d)
      DeltaTable.forPath(s, dir)
        .read(col("order_year") >= 1996) // partition-pruned scan on the generated col
        .select(col("o_orderkey"), col("o_custkey"),
          col("order_year").cast("int").as("order_year"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, CAST(year(o_orderdate) AS INTEGER) AS order_year
      FROM orders WHERE year(o_orderdate) >= 1996 ORDER BY o_orderkey""")),

    // DML + CDF: row-level deletes and update pre/post images read back
    GQ("delta_cdf_dml", (s, d) => {
      val dir = cdfDmlFixture(s, d)
      DeltaTable.forPath(s, dir).tableChanges(2, 3)
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"),
          col("_change_type"), col("_commit_version"))
        .orderBy(col("_commit_version"), col("n_nationkey"), col("_change_type"))
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS INTEGER) AS nk, n_name,
                   CAST(n_regionkey AS INTEGER) AS rk FROM nation)
      SELECT nk AS n_nationkey, n_name, rk AS n_regionkey, _change_type, _commit_version
      FROM (
        SELECT nk, n_name, rk, 'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
        FROM n WHERE rk = 2 AND nk > 10
        UNION ALL
        SELECT nk, n_name || '!', rk, 'update_postimage', CAST(3 AS BIGINT) FROM n WHERE nk < 3
        UNION ALL
        SELECT nk, n_name, rk, 'update_preimage', CAST(3 AS BIGINT) FROM n WHERE nk < 3)
      ORDER BY _commit_version, n_nationkey, _change_type""")),

    // RESTORE: rollback-as-new-commit; the anti-join diff re-surfaces v0
    GQ("delta_restore", (s, d) => {
      val dir = restoreFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // CHECK constraints: enforcement fused into the write pass — the
    // violating batch is absent, the conforming batches are present
    GQ("delta_constraints", (s, d) => {
      val dir = constraintsFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey FROM nation
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS INTEGER), upper(n_name),
        CAST(n_regionkey AS INTEGER) FROM nation WHERE n_nationkey < 5
      ORDER BY n_nationkey""")),

    // shallow CLONE: metadata-only copy; row-level DML on the clone runs
    // through the external-URI read path and never mutates the source
    GQ("delta_clone", (s, d) => {
      val dir = cloneFixture(s, d)
      DeltaTable.forPath(s, dir + "/dst").toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE NOT (o_totalprice > 250000) ORDER BY o_orderkey""")),

    // A36: MERGE schema evolution under the hash gate
    GQ("delta_merge_evolve", (s, d) => {
      val dir = mergeEvolveFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select((ordersCols :+ "p_cents").map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        CASE WHEN o_orderkey % 3 = 0 THEN CAST(round(o_totalprice*100) AS BIGINT) END AS p_cents
      FROM orders
      WHERE o_orderkey % 2 = 0 OR o_orderkey % 3 = 0
      ORDER BY o_orderkey""")),

    // A35: VERSION AS OF clone under the hash gate
    GQ("delta_clone_asof", (s, d) => {
      val dir = cloneAsofFixture(s, d)
      DeltaTable.forPath(s, dir + "/dst").toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_totalprice <= 200000 ORDER BY o_orderkey""")),

    // A9/A10: snapshot stitched from parquet checkpoint + json tail
    GQ("delta_checkpoint", (s, d) => {
      val dir = checkpointFixture(s, d)
      val t = DeltaTable.forPath(s, dir)
      val log = t.deltaLog
      require(log.store.exists(FileNames.checkpointFile(log.logPath, 4L)),
        "expected checkpoint at version 4")
      require(log.update().segment.checkpoint.map(_.version).contains(4L),
        "snapshot must build from the checkpoint")
      t.toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // REORG APPLY (PURGE): content must survive DV materialization
    // byte-exactly (same oracle as a plain delete)
    GQ("delta_reorg", (s, d) => {
      val dir = reorgFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE NOT (o_totalprice > 250000)
      ORDER BY o_orderkey""")),

    // A48: v2 checkpoints — the snapshot must rebuild byte-exactly from a
    // manifest + fingerprint-named sidecars (with at least one sidecar
    // reused across the two checkpoints the fixture writes)
    GQ("delta_checkpoint_v2", (s, d) => {
      val dir = checkpointV2Fixture(s, d)
      val t = DeltaTable.forPath(s, dir)
      val log = new DeltaLog(s, t.deltaLog.dataPath) // fresh: replay from ckpt
      val snap = log.update()
      require(snap.segment.checkpoint.exists(_.v2Uuid.isDefined),
        "snapshot must build from a v2 checkpoint")
      t.readSnapshot(snap, None)
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // A40: the `graft-delta` Spark data source — write via
    // DataFrameWriter, read via DataFrameReader with a pushed partition
    // predicate + residual data predicate, all inside Catalyst
    GQ("delta_dsv2", (s, d) => {
      val dir = dsv2Fixture(s, d)
      s.read.format("graft-delta").load(dir)
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") < 100000)
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderstatus = 'O' AND o_totalprice < 100000
      ORDER BY o_orderkey""")),

    // A42: optimizedWrite + autoCompact — three many-task appends into a
    // partitioned table with both knobs on; auto compaction bin-packs the
    // touched partitions and the content must survive byte-exact
    GQ("delta_auto_optimize", (s, d) => {
      val dir = fixture(s, d, "autoopt") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val nation = table(s, d, "nation")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = Snapshot.nullable(nation.schema)
            .asInstanceOf[org.apache.spark.sql.types.StructType].json,
          partitionColumns = Seq("n_regionkey"),
          configuration = Map(
            "delta.autoOptimize.optimizeWrite" -> "true",
            "delta.autoOptimize.autoCompact" -> "true",
            "delta.autoOptimize.autoCompact.minNumFiles" -> "3")))
        txn.commit(Nil, Op.CreateTable)
        (0 until 3).foreach { k =>
          t.write(nation.filter(pmod(col("n_nationkey"), lit(3)) === k)
            .repartition(8), SaveMode.Append, Seq("n_regionkey"))
        }
      }
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // A43: the SQL surface end-to-end — saveAsTable into the session
    // catalog, then SQL DELETE, UPDATE and a 4-clause MERGE INTO via
    // spark.sql; the oracle reconstructs the same final state relationally
    GQ("delta_sql_dml", (s, d) => {
      import org.apache.spark.sql.functions.count
      fixtures.getOrElseUpdate((d, "sqldml"), {
        s.sql("DROP TABLE IF EXISTS graft_sql_dml")
        // a prior session's managed-table dir survives the in-memory
        // catalog; DROP above can't see it, so sweep the location too
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), "graft_sql_dml")
        wh.getFileSystem(s.sessionState.newHadoopConf()).delete(wh, true)
        table(s, d, "customer")
          .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
            col("c_acctbal").cast("double").as("c_acctbal"), col("c_mktsegment"))
          .write.format("graft-delta").saveAsTable("graft_sql_dml")
        s.sql("DELETE FROM graft_sql_dml WHERE c_acctbal < 0")
        s.sql("UPDATE graft_sql_dml SET c_acctbal = c_acctbal + 100 " +
          "WHERE c_mktsegment = 'BUILDING'")
        val cnt = table(s, d, "orders")
          .groupBy(col("o_custkey").cast("long").as("k"))
          .agg(count(lit(1)).as("n"))
        val synth = s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(-1L, 7L),
            org.apache.spark.sql.Row(-2L, 9L)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType))))
        cnt.unionByName(synth).createOrReplaceTempView("graft_ordcnt")
        s.sql("""
          MERGE INTO graft_sql_dml t USING graft_ordcnt u ON t.c_custkey = u.k
          WHEN MATCHED AND u.n > 15 THEN DELETE
          WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + u.n
          WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_acctbal, c_mktsegment)
            VALUES (u.k, 'new', u.n, 'NONE')
        """)
        "graft_sql_dml"
      })
      s.table("graft_sql_dml")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }, Some("""
      WITH survivors AS (
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
          CASE WHEN c_mktsegment = 'BUILDING'
               THEN CAST(c_acctbal AS DOUBLE) + 100
               ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
          c_mktsegment
        FROM customer WHERE c_acctbal >= 0),
      cnt AS (
        SELECT CAST(o_custkey AS BIGINT) AS k, COUNT(*) AS n
        FROM orders GROUP BY 1
        UNION ALL SELECT * FROM (VALUES (CAST(-1 AS BIGINT), CAST(7 AS BIGINT)),
                                        (CAST(-2 AS BIGINT), CAST(9 AS BIGINT))) v(k, n)),
      merged AS (
        SELECT s.c_custkey, s.c_name,
          CASE WHEN c.n IS NOT NULL THEN s.c_acctbal + c.n ELSE s.c_acctbal END AS c_acctbal,
          s.c_mktsegment
        FROM survivors s LEFT JOIN cnt c ON s.c_custkey = c.k
        WHERE c.n IS NULL OR c.n <= 15),
      inserted AS (
        SELECT c.k AS c_custkey, 'new' AS c_name, CAST(c.n AS DOUBLE) AS c_acctbal,
          'NONE' AS c_mktsegment
        FROM cnt c LEFT JOIN survivors s ON s.c_custkey = c.k
        WHERE s.c_custkey IS NULL)
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM merged
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM inserted
      ORDER BY c_custkey""")),

    // TRUNCATE TABLE (reference op/names.go TRUNCATE): metadata-only
    // remove-all through the SQL surface, then a reload — proven
    // CDF-visible by reading the change feed across truncate + reload:
    // every original row surfaces as a delete, the reload as inserts.
    GQ("delta_truncate", (s, d) => {
      val dir = fixture(s, d, "truncate") { dir =>
        val t = DeltaTable.forPath(s, dir)
        t.write(table(s, d, "nation")
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("long").as("n_regionkey")),
          SaveMode.Append) // v0
        s.sql(s"TRUNCATE TABLE graft.`$dir`") // v1: metadata-only remove-all
        require(t.deltaLog.commitInfoAt(1L).exists(_.operation == Op.Truncate),
          "history must say TRUNCATE")
        t.write(table(s, d, "nation")
          .filter(col("n_regionkey") < 2)
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("long").as("n_regionkey")),
          SaveMode.Append) // v2: reload a subset
      }
      DeltaTable.forPath(s, dir).tableChanges(1L)
        .select(col("_change_type"), col("n_nationkey"), col("n_name"),
          col("n_regionkey"))
        .orderBy(col("_change_type"), col("n_nationkey"))
    }, Some("""
      SELECT * FROM (
        SELECT 'delete' AS _change_type, CAST(n_nationkey AS BIGINT) AS n_nationkey,
          n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation
        UNION ALL
        SELECT 'insert', CAST(n_nationkey AS BIGINT), n_name, CAST(n_regionkey AS BIGINT)
        FROM nation WHERE n_regionkey < 2)
      ORDER BY _change_type, n_nationkey""")),

    // COPY INTO (A83): idempotent bulk ingestion — the same source is
    // copied TWICE with an OPTIMIZE in between (which destroys AddFile
    // identity, the hard case for loaded-file tracking); the second copy
    // must load ZERO files, so the table equals exactly ONE copy of the
    // source. The skip decision is a distributed anti-join against the
    // _copy_into sidecar gated on main-log batch markers — exactly-once
    // without the driver ever holding the loaded-file set.
    GQ("delta_copy_into", (s, d) => {
      val dir = fixture(s, d, "copy-into") { base =>
        val t = DeltaTable.forPath(s, s"$base/t")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = table(s, d, "nation").schema.json))
        txn.commit(Nil, Op.CreateTable)
        val r1 = t.copyInto(d, pattern = Some("nation.parquet"))
        require(r1.numLoadedFiles == 1, s"first copy: $r1")
        t.compact()
        val r2 = t.copyInto(d, pattern = Some("nation.parquet"))
        require(r2.numLoadedFiles == 0 && r2.numSkippedFiles == 1,
          s"second copy must be a no-op: $r2")
      }
      DeltaTable.forPath(s, s"$dir/t").toDF
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        CAST(n_regionkey AS INTEGER) AS n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    // UniForm (A84): the generated ICEBERG metadata is the read path —
    // the query answers per-partition row counts FROM the Avro manifests
    // (manifest list on the driver, O(#manifests); entry reads
    // DISTRIBUTED, one task per manifest — the shape Iceberg scan
    // planning itself uses), and the oracle recomputes the same counts
    // by scanning the raw data. A wrong manifest (missing file, stale
    // record_count, misfiled partition value) breaks the hash match.
    GQ("delta_uniform", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "uniform") { dir =>
        val t = DeltaTable.forPath(s, dir)
        // o_orderdate (timestamp) stays: UniForm enabled from CREATE, so
        // the write path stamps TIMESTAMP_MICROS parquet — the Iceberg-
        // legal encoding — instead of Spark's INT96 default
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg")))
        txn.commit(Nil, Op.CreateTable)
        // TWO writes: the second generation reuses the first's manifests
        // by reference (incremental generation), so the oracle's
        // per-partition counts are answered through a MIXED list of
        // reused + fresh manifests — a reuse bug breaks the hash
        t.write(orders.filter(pmod(col("o_orderkey"), lit(2)) === 0),
          SaveMode.Append, Seq("o_orderstatus"))
        t.write(orders.filter(pmod(col("o_orderkey"), lit(2)) === 1),
          SaveMode.Append, Seq("o_orderstatus"))
      }
      val log = DeltaTable.forPath(s, dir).deltaLog
      val hconf = s.sessionState.newHadoopConf()
      val metaDir = IcebergMetadata.metadataDir(log)
      val fsys = metaDir.getFileSystem(hconf)
      def readAllBytes(p: org.apache.hadoop.fs.Path): Array[Byte] =
        IcebergMetadata.readAll(fsys, p)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val hint = new String(readAllBytes(
        new org.apache.hadoop.fs.Path(metaDir, "version-hint.text")), "UTF-8").trim
      val meta = mapper.readTree(readAllBytes(
        new org.apache.hadoop.fs.Path(metaDir, s"v$hint.metadata.json")))
      val curId = meta.get("current-snapshot-id").asLong
      val listPath = {
        import scala.jdk.CollectionConverters._
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong == curId).get
          .get("manifest-list").asText
      }
      // manifest list: driver-side, O(#manifests)
      val manifestPaths: Seq[String] = {
        import scala.jdk.CollectionConverters._
        val r = org.apache.avro.file.DataFileReader.openReader(
          new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(listPath), hconf),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try r.iterator().asScala.map(_.get("manifest_path").toString).toList
        finally r.close()
      }
      // manifest ENTRIES: distributed, one task per manifest
      val serConf = new SerializableHadoopConf(hconf)
      val counts = s.sparkContext
        .parallelize(manifestPaths, math.max(1, manifestPaths.size))
        .flatMap { p =>
          import scala.jdk.CollectionConverters._
          val r = org.apache.avro.file.DataFileReader.openReader(
            new org.apache.avro.mapred.FsInput(
              new org.apache.hadoop.fs.Path(p), serConf.value),
            new org.apache.avro.generic.GenericDatumReader[
              org.apache.avro.generic.GenericRecord]())
          try r.iterator().asScala.map { e =>
            val df = e.get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            val part = df.get("partition")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            (part.get("o_orderstatus").toString,
              df.get("record_count").asInstanceOf[Long])
          }.toList
          finally r.close()
        }
      counts.toDF("o_orderstatus", "n")
        .groupBy($"o_orderstatus")
        .agg(org.apache.spark.sql.functions.sum($"n").as("n_rows"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // A84 incremental-generation TREND (r18 verdict task 6): the measured
    // operation is one APPEND commit of marker rows plus the DELETE that
    // retracts them, each followed by its post-commit incremental Iceberg
    // generation — both must cost O(the commit's own files), reusing every
    // seeded manifest by reference. Content is invariant (markers in,
    // markers out), so repeated bench passes measure identical work; if
    // generation regresses to O(live-files) this number grows with the
    // seeded history and the bench trend flags it.
    GQ("delta_uniform_incremental", (s, d) => {
      val dir = fixture(s, d, "uniform-incr") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            // A42 optimized writes: without it every append lands
            // #input-partitions × #status files (~96 of ~15 rows at
            // sf0.1), and the seeded history alone is ~500 tiny files —
            // every later append/delete/generation pays O(that count).
            // The AQE rebalance write is the production layout (guide
            // §6); the trend this fixture exists for (generation =
            // O(the commit's own files)) is unchanged, just measured
            // over sane file sizes.
            "delta.autoOptimize.optimizeWrite" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        // seeded manifest history the measured commits must NOT rewrite
        (0 until 5).foreach(i =>
          t.write(orders.filter(pmod(col("o_orderkey"), lit(5)) === i),
            SaveMode.Append, Seq("o_orderstatus")))
      }
      val t = DeltaTable.forPath(s, dir)
      val orders = table(s, d, "orders")
      val markers = orders.filter(pmod(col("o_orderkey"), lit(100)) === 0)
        .withColumn("o_orderkey", -col("o_orderkey") - 1) // strictly < 0
      t.write(markers, SaveMode.Append, Seq("o_orderstatus"))
      // reuse-by-reference probe: the post-append manifest list must carry
      // the seeded manifests under their ORIGINAL snapshot ids
      locally {
        val log = t.deltaLog
        val hconf = s.sessionState.newHadoopConf()
        val metaDir = IcebergMetadata.metadataDir(log)
        val fsys = metaDir.getFileSystem(hconf)
        def readAllBytes(p: org.apache.hadoop.fs.Path): Array[Byte] =
          IcebergMetadata.readAll(fsys, p)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val hint = new String(readAllBytes(
          new org.apache.hadoop.fs.Path(metaDir, "version-hint.text")), "UTF-8").trim
        val meta = mapper.readTree(readAllBytes(
          new org.apache.hadoop.fs.Path(metaDir, s"v$hint.metadata.json")))
        val curId = meta.get("current-snapshot-id").asLong
        val listPath = {
          import scala.jdk.CollectionConverters._
          meta.get("snapshots").elements().asScala
            .find(_.get("snapshot-id").asLong == curId).get
            .get("manifest-list").asText
        }
        val addedBy: Seq[Long] = {
          import scala.jdk.CollectionConverters._
          val r = org.apache.avro.file.DataFileReader.openReader(
            new org.apache.avro.mapred.FsInput(
              new org.apache.hadoop.fs.Path(listPath), hconf),
            new org.apache.avro.generic.GenericDatumReader[
              org.apache.avro.generic.GenericRecord]())
          try r.iterator().asScala
            .map(_.get("added_snapshot_id").asInstanceOf[Long]).toList
          finally r.close()
        }
        require(addedBy.count(_ != curId) >= 5,
          s"incremental generation must reuse the seeded manifests by " +
            s"reference; list carries added_snapshot_ids $addedBy (cur $curId)")
      }
      t.delete(col("o_orderkey") < 0L) // retract the markers (file-level)
      t.toDF.select(ordersCols.map(col): _*).orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders ORDER BY o_orderkey""")),

    // UniForm + deletion vectors (A84, r17): a merge-on-read DELETE's DVs
    // become Iceberg v2 POSITION-DELETE parquet files. The query is the
    // Iceberg read path over the generated metadata: per-partition counts
    // = Σ data-manifest record_count (PHYSICAL rows) MINUS the position-
    // delete rows joined back to each data file — data manifests read
    // distributed (one task per manifest), delete parquet read through
    // spark.read. A wrong delete file (missing row, path mismatch, stale
    // count) breaks the hash match against DuckDB's logical recount.
    GQ("delta_uniform_dv", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "uniform-dv") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        // three commits so the ORACLE rides the incremental-generation
        // paths: the second write reuses the first's manifests, the
        // delete regenerates ONLY the delete side (DV'd fp set unchanged
        // -> every data manifest reused), and the final append reuses
        // BOTH the data manifests and the delete manifest + its
        // position-delete parquet by reference (unchanged DV
        // fingerprint) — a reuse bug in any leg breaks the hash
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0),
          SaveMode.Append, Seq("o_orderstatus"))
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1),
          SaveMode.Append, Seq("o_orderstatus"))
        t.delete(pmod(col("o_orderkey"), lit(10)) === 3) // merge-on-read DVs
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 2),
          SaveMode.Append, Seq("o_orderstatus"))
      }
      val log = DeltaTable.forPath(s, dir).deltaLog
      val hconf = s.sessionState.newHadoopConf()
      val metaDir = IcebergMetadata.metadataDir(log)
      val fsys = metaDir.getFileSystem(hconf)
      def readAllBytes(p: org.apache.hadoop.fs.Path): Array[Byte] =
        IcebergMetadata.readAll(fsys, p)
      def avroRows(p: String, conf: org.apache.hadoop.conf.Configuration):
          List[org.apache.avro.generic.GenericRecord] = {
        import scala.jdk.CollectionConverters._
        val r = org.apache.avro.file.DataFileReader.openReader(
          new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(p), conf),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try r.iterator().asScala.toList finally r.close()
      }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val hint = new String(readAllBytes(
        new org.apache.hadoop.fs.Path(metaDir, "version-hint.text")), "UTF-8").trim
      val meta = mapper.readTree(readAllBytes(
        new org.apache.hadoop.fs.Path(metaDir, s"v$hint.metadata.json")))
      val curId = meta.get("current-snapshot-id").asLong
      val listPath = {
        import scala.jdk.CollectionConverters._
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong == curId).get
          .get("manifest-list").asText
      }
      // manifest list: driver-side, O(#manifests), split by content
      val manifests: Seq[(String, Int)] = avroRows(listPath, hconf)
        .map(m => (m.get("manifest_path").toString,
          m.get("content").asInstanceOf[Int]))
      val dataManifests = manifests.collect { case (p, 0) => p }
      val delManifests = manifests.collect { case (p, 1) => p }
      // data-manifest ENTRIES: distributed, one task per manifest
      val serConf = new SerializableHadoopConf(hconf)
      val dataCounts = s.sparkContext
        .parallelize(dataManifests, math.max(1, dataManifests.size))
        .flatMap { p =>
          avroRows(p, serConf.value).map { e =>
            val df = e.get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            val part = df.get("partition")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            (df.get("file_path").toString,
              part.get("o_orderstatus").toString,
              df.get("record_count").asInstanceOf[Long])
          }
        }.toDF("fp", "o_orderstatus", "rc")
      // deletes manifests name the position-delete parquet files; read
      // the delete rows themselves through spark.read (the scan an
      // Iceberg reader performs) and count per target data file
      val delFiles: Seq[String] = delManifests.flatMap(p =>
        avroRows(p, hconf).map(_.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("file_path").toString))
      require(delFiles.nonEmpty, "fixture must produce position deletes")
      val deleted = s.read.parquet(delFiles: _*)
        .groupBy(col("file_path").as("fp"))
        .agg(count(lit(1)).as("dels"))
      dataCounts.join(deleted, Seq("fp"), "left")
        .groupBy($"o_orderstatus")
        .agg((sum($"rc") - sum(coalesce($"dels", lit(0L)))).as("n_rows"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders
      WHERE NOT (o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 = 3)
      GROUP BY 1 ORDER BY 1""")),

    // Iceberg FORMAT VERSION 3 (A86, r18): deletion vectors export
    // NATIVELY as Puffin `deletion-vector-v1` blobs — RAW-COPIED from
    // the Delta DV payloads (the two formats share the exact framing:
    // the Iceberg magic D1 D3 39 64 IS Delta's bitmap magic, so no
    // bitmap is ever decoded on export) — and every data file carries
    // row lineage (first_row_id = the Delta baseRowId, next-row-id =
    // high-water mark + 1). The query reads counts THROUGH the v3
    // metadata: data-manifest record counts minus per-file cardinality
    // DECODED from the Puffin blobs via footer offsets — broken blob
    // framing, wrong coordinates in the delete manifest, or a reuse bug
    // across the fixture's four commits breaks the hash.
    GQ("delta_uniform_v3", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "uniform-v3") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "graft.iceberg.formatVersion" -> "3",
            "delta.enableRowTracking" -> "true",
            "delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        // same four-commit shape as delta_uniform_dv so the v3 reuse
        // paths (manifest reuse, per-bucket Puffin carry-forward) are
        // all under the hash gate
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0),
          SaveMode.Append, Seq("o_orderstatus"))
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1),
          SaveMode.Append, Seq("o_orderstatus"))
        t.delete(pmod(col("o_orderkey"), lit(10)) === 3) // merge-on-read DVs
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 2),
          SaveMode.Append, Seq("o_orderstatus"))
      }
      val log = DeltaTable.forPath(s, dir).deltaLog
      val hconf = s.sessionState.newHadoopConf()
      val metaDir = IcebergMetadata.metadataDir(log)
      def readAllBytes(p: org.apache.hadoop.fs.Path): Array[Byte] =
        IcebergMetadata.readAll(metaDir.getFileSystem(hconf), p)
      def avroRows(p: String, conf: org.apache.hadoop.conf.Configuration):
          List[org.apache.avro.generic.GenericRecord] = {
        import scala.jdk.CollectionConverters._
        val r = org.apache.avro.file.DataFileReader.openReader(
          new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(p), conf),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try r.iterator().asScala.toList finally r.close()
      }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val hint = new String(readAllBytes(
        new org.apache.hadoop.fs.Path(metaDir, "version-hint.text")), "UTF-8").trim
      val meta = mapper.readTree(readAllBytes(
        new org.apache.hadoop.fs.Path(metaDir, s"v$hint.metadata.json")))
      require(meta.get("format-version").asInt == 3, "metadata must be v3")
      require(meta.get("next-row-id") != null, "v3 metadata must carry next-row-id")
      val curId = meta.get("current-snapshot-id").asLong
      val listPath = {
        import scala.jdk.CollectionConverters._
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong == curId).get
          .get("manifest-list").asText
      }
      val manifests: Seq[(String, Int)] = avroRows(listPath, hconf)
        .map(m => (m.get("manifest_path").toString,
          m.get("content").asInstanceOf[Int]))
      val serConf = new SerializableHadoopConf(hconf)
      val dataCounts = s.sparkContext
        .parallelize(manifests.collect { case (p, 0) => p },
          math.max(1, manifests.count(_._2 == 0)))
        .flatMap { p =>
          avroRows(p, serConf.value)
            .filter(_.get("status").asInstanceOf[Int] != 2)
            .map { e =>
              val df = e.get("data_file")
                .asInstanceOf[org.apache.avro.generic.GenericRecord]
              require(df.get("first_row_id") != null,
                s"v3 data file without row lineage: ${df.get("file_path")}")
              val part = df.get("partition")
                .asInstanceOf[org.apache.avro.generic.GenericRecord]
              (df.get("file_path").toString,
                part.get("o_orderstatus").toString,
                df.get("record_count").asInstanceOf[Long])
            }
        }.toDF("fp", "o_orderstatus", "rc")
      // v3 delete entries locate Puffin blobs; decode each through the
      // footer-verified framing and subtract per referenced data file
      val delEntries: Seq[(String, Long, Long, String)] =
        manifests.collect { case (p, 1) => p }.flatMap(p =>
          avroRows(p, hconf).map { e =>
            val df = e.get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            require(df.get("file_format").toString == "PUFFIN",
              s"v3 delete entry must be PUFFIN: $df")
            (df.get("file_path").toString,
              df.get("content_offset").asInstanceOf[Long],
              df.get("content_size_in_bytes").asInstanceOf[Long],
              df.get("referenced_data_file").toString)
          })
      require(delEntries.nonEmpty, "fixture must produce Puffin DV blobs")
      val deleted = s.sparkContext
        .parallelize(delEntries, math.max(1, delEntries.size))
        .map { case (pp, off, len, ref) =>
          (ref, IcebergPuffin.readDvBitmap(
            new org.apache.hadoop.fs.Path(pp), serConf.value, off, len)
            .cardinality)
        }.toDF("fp", "dels")
      dataCounts.join(deleted, Seq("fp"), "left")
        .groupBy($"o_orderstatus")
        .agg((sum($"rc") - sum(coalesce($"dels", lit(0L)))).as("n_rows"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders
      WHERE NOT (o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 = 3)
      GROUP BY 1 ORDER BY 1""")),

    // CONVERT FROM ICEBERG at format v3 (A86): adopting a v3 table whose
    // deletes are Puffin DVs is ZERO-COPY — the Delta descriptors point
    // straight into the Puffin blobs (storageType "p" + offset), no
    // delete byte read or rewritten at convert time (the fixture
    // REQUIREs that property). The read then flows through the ordinary
    // descriptor-gated DV subtraction; the oracle recomputes from raw
    // data minus the deleted rows.
    GQ("delta_convert_v3", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-v3") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "graft.iceberg.formatVersion" -> "3",
            "delta.enableRowTracking" -> "true",
            "delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        t.write(orders, SaveMode.Append, Seq("o_orderstatus"))
        t.delete(pmod(col("o_orderkey"), lit(10)) === 7) // merge-on-read DVs
        // drop the Delta identity; a pure v3 Iceberg table remains
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        val fsys = logDir.getFileSystem(s.sessionState.newHadoopConf())
        fsys.delete(logDir, true)
        val adopted = DeltaTable.convertFromIceberg(s, dir)
        val bad = adopted.deltaLog.update().allFiles
          .filter(_.deletionVector != null)
          .filterNot(a => a.deletionVector.storageType == "p" &&
            a.deletionVector.pathOrInlineDv.endsWith(".puffin"))
        require(bad.isEmpty,
          s"v3 adoption must be zero-copy; re-encoded descriptors: $bad")
      }
      DeltaTable.forPath(s, dir).toDF
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("sum_okey"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM orders WHERE o_orderkey % 10 <> 7
      GROUP BY 1 ORDER BY 1""")),

    // v3 ROW-LINEAGE IMPORT (A86): adopting a format-v3 Iceberg table
    // carries its row lineage INTO Delta row tracking — every data
    // file's explicit first_row_id becomes the AddFile's baseRowId and
    // the metadata's next-row-id seeds the high-water mark, so rows keep
    // their ids across the full migration round trip (Delta -> pure
    // Iceberg -> Delta) and post-convert DML assigns above the imported
    // mark instead of colliding from 0. The fixture writes three SORTED
    // single-file commits (ids deterministic: 0..nA-1, nA.., ..), DV-
    // deletes a stripe (masked rows keep neighbors' ids stable), drops
    // the _delta_log, and adopts back; the query reads (key, row_id,
    // row_commit_version) through toDFWithRowIds. The oracle recomputes
    // each batch's id range with row_number() — a shifted id, a lost
    // mask, or a re-assigned file breaks the hash.
    GQ("delta_convert_lineage", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-lineage") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "graft.iceberg.formatVersion" -> "3",
            "delta.enableRowTracking" -> "true",
            "delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        // sorted single-file commits: fresh ids follow the sort order
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
          .orderBy(col("o_orderkey")).coalesce(1))
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
          .orderBy(col("o_orderkey")).coalesce(1))
        t.delete(pmod(col("o_orderkey"), lit(10)) === 3) // DVs mask A+B rows
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 2)
          .orderBy(col("o_orderkey")).coalesce(1))
        val totalRows = orders.count()
        // drop the Delta identity; a pure v3 Iceberg table remains
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        val fsys = logDir.getFileSystem(s.sessionState.newHadoopConf())
        fsys.delete(logDir, true)
        val adopted = DeltaTable.convertFromIceberg(s, dir)
        val snap = adopted.deltaLog.update()
        val noBase = snap.allFiles.filter(_.baseRowId.isEmpty)
        require(noBase.isEmpty,
          s"v3 adoption must import row lineage; files without baseRowId: $noBase")
        val hwm = RowTracking.highWaterMark(snap.domainMetadata)
        require(hwm == totalRows - 1,
          s"imported high-water mark $hwm != ${totalRows - 1} (next-row-id - 1)")
        require(snap.allFiles.forall(a => a.deletionVector == null ||
          a.deletionVector.storageType == "p"),
          "lineage import must compose with the zero-copy DV adoption")
      }
      DeltaTable.forPath(s, dir).toDFWithRowIds
        .select($"o_orderkey", $"row_id", $"row_commit_version")
        .orderBy($"row_id")
    }, Some("""
      WITH a AS (
        SELECT o_orderkey,
               CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
        FROM orders WHERE o_orderkey % 3 = 0),
      b AS (
        SELECT o_orderkey,
               (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0)
                 + CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
        FROM orders WHERE o_orderkey % 3 = 1),
      c AS (
        SELECT o_orderkey,
               (SELECT count(*) FROM orders WHERE o_orderkey % 3 IN (0, 1))
                 + CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
        FROM orders WHERE o_orderkey % 3 = 2)
      SELECT o_orderkey, row_id, CAST(0 AS BIGINT) AS row_commit_version
      FROM (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c)
      WHERE NOT (o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 = 3)
      ORDER BY row_id""")),

    // OUT-OF-PLACE MIRROR (A85/A86): `mirrorFromIceberg` adopts a pure
    // Iceberg table into a SEPARATE target directory — AddFiles
    // reference the source parquet by absolute URI, deletion vectors
    // stay zero-copy references into the source's Puffin files, and NOT
    // A SINGLE BYTE is written under the source (REQUIREd on the exact
    // recursive (path, length) listing) — the shape that makes mirroring
    // a LIVE Flink-owned table safe, where the in-place form would drop
    // _delta_log into the foreign writer's directory. The fixture
    // mirrors an OLDER snapshot first, then re-syncs from the
    // REMEMBERED source (no source argument), so the diff leg is under
    // the hash gate too; the oracle recomputes the mirrored state.
    GQ("delta_convert_mirror", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-mirror") { dir =>
        val src = s"$dir/src"
        val tgt = s"$dir/tgt"
        val t = DeltaTable.forPath(s, src)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "graft.iceberg.formatVersion" -> "3",
            "delta.enableRowTracking" -> "true",
            "delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)                       // snapshot 1
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
          .orderBy(col("o_orderkey")).coalesce(1))            // snapshot 2
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
          .orderBy(col("o_orderkey")).coalesce(1))            // snapshot 3
        t.delete(pmod(col("o_orderkey"), lit(10)) === 3)      // snapshot 4: DVs
        t.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 2)
          .orderBy(col("o_orderkey")).coalesce(1))            // snapshot 5
        val hconf = s.sessionState.newHadoopConf()
        val srcPath = new org.apache.hadoop.fs.Path(src)
        val fsys = srcPath.getFileSystem(hconf)
        fsys.delete(new org.apache.hadoop.fs.Path(src, "_delta_log"), true)
        def listing(): Set[(String, Long)] = {
          val it = fsys.listFiles(srcPath, true)
          val b = Set.newBuilder[(String, Long)]
          while (it.hasNext) {
            val f = it.next(); b += ((f.getPath.toString, f.getLen))
          }
          b.result()
        }
        val before = listing()
        // mirror the PRE-DELETE snapshot, then re-sync from the
        // remembered source — the diff (DV attach + new file) is
        // out-of-place too
        DeltaTable.mirrorFromIceberg(s, src, tgt, asOfSnapshotId = Some(3L))
        val synced = DeltaTable.convertFromIceberg(s, tgt)
        require(listing() == before,
          "mirror adoption must not write a byte under the source")
        val snap = synced.deltaLog.update()
        require(snap.allFiles.forall(a =>
          (a.path.startsWith("/") || a.path.startsWith("file:")) &&
            a.path.contains("/src/")),
          "mirror AddFiles must reference the source by absolute path")
        require(snap.allFiles.filter(_.deletionVector != null).nonEmpty &&
          snap.allFiles.forall(a => a.deletionVector == null ||
            (a.deletionVector.storageType == "p" &&
              a.deletionVector.pathOrInlineDv.contains("/src/"))),
          "mirror DVs must be zero-copy references into the source")
        require(snap.allFiles.forall(_.baseRowId.isDefined),
          "mirror must import v3 row lineage")
      }
      DeltaTable.forPath(s, s"$dir/tgt").toDF
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("sum_okey"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM orders
      WHERE NOT (o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 = 3)
      GROUP BY 1 ORDER BY 1""")),

    // VARIANT THROUGH THE ICEBERG ROUND TRIP (A86 + A72): variant is an
    // Iceberg v3 type whose physical layout IS Spark's variant parquet
    // encoding (the open variant binary spec), so a v3 UniForm table
    // with a variant column declares it faithfully, loses its
    // _delta_log, and converts back with the SAME binary payloads —
    // typed variant_get extraction over the adopted table must equal
    // DuckDB's JSON extraction over the raw envelopes. A v2 table (or
    // on-demand generation) refuses variant loudly — the fixture pins
    // the adopted schema really is VariantType, not a lossy string.
    GQ("delta_convert_variant", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-variant") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val envelope = concat(
          lit("""{"meta":{"type":""""), col("event_type"),
          lit("""","uid":"""), col("user_id"),
          lit("""},"payload":"""), col("props"), lit("}"))
        val data = table(s, d, "events")
          .select(col("event_type"), parse_json(envelope).as("v"))
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = data.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "graft.iceberg.formatVersion" -> "3",
            "delta.enableRowTracking" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        t.write(data)
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        val fsys = logDir.getFileSystem(s.sessionState.newHadoopConf())
        fsys.delete(logDir, true)
        val adopted = DeltaTable.convertFromIceberg(s, dir)
        require(adopted.deltaLog.update().metadata.schema("v").dataType ==
          org.apache.spark.sql.types.VariantType,
          "adoption must import the Iceberg v3 variant type as VariantType")
      }
      DeltaTable.forPath(s, dir).toDF
        .select(
          variant_get($"v", "$.meta.type", "string").as("vtype"),
          variant_get($"v", "$.meta.uid", "bigint").as("uid"),
          variant_get($"v", "$.payload.k", "bigint").as("k"))
        .filter($"k".isNotNull)
        .groupBy($"vtype")
        .agg(count(lit(1)).as("n"),
          countDistinct($"uid").as("n_users"),
          sum($"k").as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"vtype")
    }, Some("""
      WITH j AS (SELECT
          concat('{"meta":{"type":"', event_type, '","uid":', user_id,
            '},"payload":', props, '}') AS v
        FROM events),
      x AS (SELECT
          json_extract_string(v, '$.meta.type') AS vtype,
          CAST(json_extract(v, '$.meta.uid') AS BIGINT) AS uid,
          CAST(json_extract(v, '$.payload.k') AS BIGINT) AS k
        FROM j)
      SELECT vtype, COUNT(*) AS n, COUNT(DISTINCT uid) AS n_users,
        CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
      FROM x WHERE k IS NOT NULL
      GROUP BY vtype ORDER BY vtype""")),

    // CONVERT FROM ICEBERG (A85, r17): the full migration round trip —
    // a UniForm table (with merge-on-read DVs) loses its _delta_log,
    // leaving a pure Iceberg table (parquet + metadata/), and
    // convertFromIceberg adopts it back IN PLACE: schema/partitions from
    // the metadata JSON, AddFiles + stats from the manifests (read
    // distributed, no footer opened), position deletes translated back
    // into deletion vectors. The query reads the CONVERTED table through
    // the Delta log; the oracle recomputes from raw data minus the
    // deleted rows — a lost DV, misread partition value, or dropped file
    // breaks the hash.
    GQ("delta_convert_iceberg", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-iceberg") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg",
            "delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        t.write(orders, SaveMode.Append, Seq("o_orderstatus"))
        t.delete(pmod(col("o_orderkey"), lit(10)) === 7) // merge-on-read DVs
        // drop the Delta identity; what remains is a pure Iceberg table
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        val fsys = logDir.getFileSystem(s.sessionState.newHadoopConf())
        fsys.delete(logDir, true)
        DeltaTable.convertFromIceberg(s, dir)
      }
      DeltaTable.forPath(s, dir).toDF
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("sum_okey"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM orders WHERE o_orderkey % 10 <> 7
      GROUP BY 1 ORDER BY 1""")),

    // Iceberg v3 DEFAULT VALUES (A85 × A64, r19): the fixture builds an
    // Iceberg table whose `bonus` column was added after the first batch
    // (UniForm generates the metadata; the fixture then stamps
    // initial-default/write-default on the column like a v3 writer
    // would), drops the Delta identity, and adopts. Pre-evolution rows
    // must read the initial-default (42), a REAL stored null must stay
    // null, and a post-adoption write omitting the column must fill the
    // imported write-default (7) — any null-fill shortcut breaks the hash.
    GQ("delta_convert_defaults", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-defaults") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val nation = table(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = nation.schema.json,
          configuration = Map(
            "delta.enableRowTracking" -> "true",
            "graft.iceberg.formatVersion" -> "3",
            "delta.universalFormat.enabledFormats" -> "iceberg")))
        txn.commit(Nil, Op.CreateTable)
        t.write(nation) // batch A: files physically lack `bonus`
        t.addColumns(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bonus",
            org.apache.spark.sql.types.LongType))))
        t.write(nation.filter(col("n_nationkey") < 5)
          .select((col("n_nationkey") + 100).as("n_nationkey"), col("n_name"),
            when(col("n_nationkey") === 1, lit(null))
              .otherwise(col("n_nationkey") * 10).cast("long").as("bonus")))
        // stamp the defaults a v3 writer would have recorded at ADD COLUMN
        val metaDir = new java.io.File(dir, "metadata")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val hint = new String(Files.readAllBytes(
          metaDir.toPath.resolve("version-hint.text"))).trim
        val mpath = metaDir.toPath.resolve(s"v$hint.metadata.json")
        val root = mapper.readTree(Files.readAllBytes(mpath))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        root.get("schemas").elements().forEachRemaining { sch =>
          sch.get("fields").elements().forEachRemaining { f =>
            if (f.get("name").asText == "bonus") {
              val fo = f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
              fo.put("initial-default", 42L)
              fo.put("write-default", 7L)
            }
          }
        }
        Files.deleteIfExists(metaDir.toPath.resolve(s".v$hint.metadata.json.crc"))
        Files.write(mpath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
        // drop the Delta identity; adopt the pure Iceberg table
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        val fsys = logDir.getFileSystem(s.sessionState.newHadoopConf())
        fsys.delete(logDir, true)
        val back = DeltaTable.convertFromIceberg(s, dir)
        // write-default: a post-adoption write omitting `bonus` fills 7
        back.write(table(s, d, "nation").limit(1)
          .select((col("n_nationkey") * 0 + 999).as("n_nationkey"),
            lit("ZZZ").as("n_name")))
      }
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"), col("bonus"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS nk, n_name FROM nation)
      SELECT n_nationkey, n_name, bonus FROM (
        SELECT nk AS n_nationkey, n_name, CAST(42 AS BIGINT) AS bonus FROM n
        UNION ALL
        SELECT nk + 100, n_name,
               CASE WHEN nk = 1 THEN NULL ELSE CAST(nk * 10 AS BIGINT) END
        FROM n WHERE nk < 5
        UNION ALL
        SELECT 999, 'ZZZ', CAST(7 AS BIGINT))
      ORDER BY n_nationkey""")),

    // NDV STATISTICS INTERCHANGE (A88, r19): analyzeNdv exports KMV
    // theta sketches as a Puffin statistics file; adoption imports each
    // blob's `ndv` property into `graft.stats.ndv.<col>` config. Below
    // 2^lgK distinct values the KMV sketch is in EXACT mode — its ndv
    // IS the distinct count, so DuckDB's COUNT(DISTINCT) replicates the
    // whole export→Puffin→import loop bit-exactly. The fixture builds a
    // UniForm table from `nation`, ANALYZEs via the SQL surface, drops
    // the Delta identity, adopts, and the query presents the imported
    // config — a sketch bug, a field-id mismap, a Puffin framing error,
    // or a lost import all change the hash.
    GQ("delta_ndv_stats", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "ndv-stats") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val nation = table(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = nation.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg")))
        txn.commit(Nil, Op.CreateTable)
        t.write(nation)
        s.sql(s"ANALYZE TABLE delta.`$dir` COMPUTE STATISTICS")
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        logDir.getFileSystem(s.sessionState.newHadoopConf())
          .delete(logDir, true)
        DeltaTable.convertFromIceberg(s, dir)
      }
      val conf = DeltaTable.forPath(s, dir).deltaLog.update()
        .metadata.configuration
      val rows = conf.toSeq
        .filter(_._1.startsWith("graft.stats.ndv."))
        .map { case (k, v) =>
          (k.stripPrefix("graft.stats.ndv."), v.toLong) }
      s.createDataFrame(rows).toDF("col_name", "ndv")
        .orderBy($"col_name")
    }, Some("""
      SELECT col_name, ndv FROM (
        SELECT 'n_name' AS col_name,
          CAST(COUNT(DISTINCT n_name) AS BIGINT) AS ndv FROM nation
        UNION ALL
        SELECT 'n_nationkey', CAST(COUNT(DISTINCT n_nationkey) AS BIGINT)
        FROM nation
        UNION ALL
        SELECT 'n_regionkey', CAST(COUNT(DISTINCT n_regionkey) AS BIGINT)
        FROM nation)
      ORDER BY col_name""")),

    // REFS ROUND TRIP (A87 export side, r19): the ENGINE publishes the
    // tag — `createIcebergRef` rides a config marker into the generated
    // metadata, and the tagged snapshot is PROTECTED from retention
    // expiry — then the table loses its Delta identity and is adopted
    // BY the tag. The fixture writes batch A, tags the head `rel-1`,
    // writes batch B (main moves on), drops `_delta_log`, and adopts
    // `asOfRef = "rel-1"`: the result is batch A alone. A generator
    // that lost the ref, an expiry that collected the tagged snapshot,
    // or an adoption that followed main would all hash-fail.
    GQ("delta_refs_roundtrip", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "refs-roundtrip") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val nation = table(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = nation.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg")))
        txn.commit(Nil, Op.CreateTable)
        t.write(nation.filter($"n_nationkey" < 12)) // batch A (snapshot 2)
        t.createIcebergRef("rel-1")                 // tag the head
        t.write(nation.filter($"n_nationkey" >= 12)) // batch B; main moves
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        logDir.getFileSystem(s.sessionState.newHadoopConf())
          .delete(logDir, true)
        DeltaTable.convertFromIceberg(s, dir, asOfRef = Some("rel-1"))
      }
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
      FROM nation WHERE n_nationkey < 12 ORDER BY 1""")),

    // NAMED ICEBERG REFS (A85, r19): Flink/Trino production tables pin
    // consumers to a branch in the metadata's `refs` map (Iceberg spec
    // v2, Table Metadata). The fixture writes three batches (snapshots
    // 2/3/4; main's head is 4), stamps refs {main -> 4, audit -> 2},
    // drops the Delta identity and adopts the `audit` BRANCH — then the
    // writer advances audit to snapshot 3 and a plain re-sync follows
    // the pinned branch to batches A+B. A mirror that wrongly followed
    // `current-snapshot-id` would include batch C and hash-fail.
    GQ("delta_convert_branch", (s, d) => {
      import s.implicits._
      val dir = fixture(s, d, "convert-branch") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val nation = table(s, d, "nation")
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = nation.schema.json,
          configuration = Map(
            "delta.universalFormat.enabledFormats" -> "iceberg")))
        txn.commit(Nil, Op.CreateTable)
        t.write(nation.filter($"n_nationkey" < 10))  // snapshot 2
        t.write(nation.filter($"n_nationkey" >= 10 && $"n_nationkey" < 20)) // 3
        t.write(nation.filter($"n_nationkey" >= 20)) // snapshot 4 (main)
        val metaDir = new java.io.File(dir, "metadata")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        def stampRefs(auditHead: Long): Unit = {
          val hint = new String(Files.readAllBytes(
            metaDir.toPath.resolve("version-hint.text"))).trim
          val mpath = metaDir.toPath.resolve(s"v$hint.metadata.json")
          val root = mapper.readTree(Files.readAllBytes(mpath))
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          val refs = root.putObject("refs")
          refs.putObject("main")
            .put("snapshot-id", root.get("current-snapshot-id").asLong)
            .put("type", "branch")
          refs.putObject("audit")
            .put("snapshot-id", auditHead).put("type", "branch")
          Files.deleteIfExists(
            metaDir.toPath.resolve(s".v$hint.metadata.json.crc"))
          Files.write(mpath,
            mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
        }
        stampRefs(2L)
        val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
        logDir.getFileSystem(s.sessionState.newHadoopConf())
          .delete(logDir, true)
        DeltaTable.convertFromIceberg(s, dir, asOfRef = Some("audit"))
        // the foreign writer advances the branch; the pin follows it
        stampRefs(3L)
        DeltaTable.convertFromIceberg(s, dir)
      }
      DeltaTable.forPath(s, dir).toDF
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
      FROM nation WHERE n_nationkey < 20 ORDER BY 1""")),

    // INCREMENTAL RE-SYNC (A85, r18): a table adopted from Iceberg keeps
    // mirroring the foreign writer. The fixture adopts snapshot 3 (batches
    // A+B), then hand-crafts what a Flink-style writer commits next —
    // snapshot 99 REMOVES batch A (its manifests leave the list), ADDS
    // batch C, and attaches an EQUALITY delete whose key set spans B *and*
    // C — and re-syncs. One diff commit: A's files remove, C's file adds,
    // and only B's matching rows die (the strictly-older-sequence apply
    // rule — C's file carries the delete's own sequence, so a sync that
    // applied deletes to same-sequence files would hash-fail). The oracle
    // recomputes the mirrored state from the base table.
    GQ("delta_convert_sync", (s, d) => {
      import s.implicits._
      val dir = convertSyncFixture(s, d)
      DeltaTable.forPath(s, dir).toDF
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("sum_okey"))
        .orderBy($"o_orderstatus")
    }, Some("""
      WITH live AS (
        SELECT * FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 10 <> 3
        UNION ALL
        SELECT * FROM orders WHERE o_orderkey % 4 = 2)
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM live GROUP BY 1 ORDER BY 1""")),

    // The re-sync diff commit is CDF-CONSUMABLE: adds surface as inserts,
    // vanished files as whole-file deletes, and the DV'd files'
    // remove+re-add pair yields exactly the DV-DIFF rows — a mirrored
    // Flink-written Iceberg table can drive incremental downstream
    // consumers (delta_incremental_agg and the streaming CDF source)
    // through tableChanges, with no change feed ever enabled. A
    // compaction-only foreign chain (summary operation `replace`)
    // commits dataChange=false and stays CDF-invisible (spec-pinned).
    GQ("delta_convert_cdf", (s, d) => {
      import s.implicits._
      val dir = convertSyncFixture(s, d)
      val t = DeltaTable.forPath(s, dir)
      val v = t.deltaLog.update().version
      t.tableChanges(v, v)
        .groupBy($"_change_type")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("sum_okey"))
        .orderBy($"_change_type")
    }, Some("""
      WITH chg AS (
        SELECT 'delete' AS ct, o_orderkey FROM orders WHERE o_orderkey % 4 = 0
        UNION ALL
        SELECT 'delete', o_orderkey FROM orders
        WHERE o_orderkey % 4 = 1 AND o_orderkey % 10 = 3
        UNION ALL
        SELECT 'insert', o_orderkey FROM orders WHERE o_orderkey % 4 = 2)
      SELECT ct AS _change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM chg GROUP BY 1 ORDER BY 1""")),

    // CONVERT TO DELTA (A49): a plain Hive-partitioned parquet directory
    // is adopted in place (footer-stat job + one commit, no rewrite),
    // then proven transactional with a DELETE and read back through the
    // log with partition pruning intact.
    GQ("delta_convert", (s, d) => {
      val dir = fixture(s, d, "convert") { base =>
        val dir = s"$base/pq"
        table(s, d, "nation")
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
          .write.partitionBy("n_regionkey").parquet(dir)
        val t = DeltaTable.convertToDelta(s, dir)
        t.delete(pmod(col("n_nationkey"), lit(7)) === 0)
      }
      DeltaTable.forPath(s, s"$dir/pq").toDF
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        CAST(n_regionkey AS BIGINT) AS n_regionkey
      FROM nation WHERE CAST(n_nationkey AS BIGINT) % 7 <> 0
      ORDER BY n_nationkey""")),

    // Incremental aggregate maintenance from the change feed (A59): the
    // flagship CDF use case — a downstream per-region aggregate is kept
    // in sync by applying each commit's row-level changes as SIGNED
    // deltas (insert/update_postimage = +1, delete/update_preimage = -1)
    // through one MERGE per version; groups that empty out are deleted by
    // a conditional matched clause. At 100 TB the maintenance cost is
    // O(changed rows per commit), never O(table): the CDF read is
    // bounded, the delta aggregation is one small shuffle, and the MERGE
    // rewrites only touched aggregate files. The oracle recomputes the
    // aggregate from the replayed FINAL state — incremental ≡ full.
    GQ("delta_incremental_agg", (s, d) => {
      val aggDir = fixture(s, d, "incr-agg") { aggDir =>
        val src = DeltaTable.forPath(s, cdfDmlFixture(s, d))
        val agg = DeltaTable.forPath(s, aggDir)
        val aggSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rk",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sum_nk",
            org.apache.spark.sql.types.LongType)))
        val txn = agg.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(schemaString = aggSchema.json))
        txn.commit(Nil, Op.CreateTable)
        (1L to src.deltaLog.update().version).foreach { v =>
          val deltas = src.tableChanges(v, v)
            .withColumn("sign",
              when(col("_change_type").isin("insert", "update_postimage"), 1L)
                .otherwise(-1L))
            .groupBy(col("n_regionkey").cast("int").as("rk"))
            .agg(sum(col("sign")).as("dn"),
              sum(col("sign") * col("n_nationkey")).as("dsum"))
          agg.merge(deltas.alias("s"), expr("t.rk = s.rk"))
            .whenMatchedDelete(expr("t.n + s.dn = 0"))
            .whenMatchedUpdate(Map(
              "n" -> expr("t.n + s.dn"),
              "sum_nk" -> expr("t.sum_nk + s.dsum")))
            .whenNotMatchedInsert(expr("s.dn <> 0"), Map(
              "rk" -> col("s.rk"), "n" -> col("s.dn"), "sum_nk" -> col("s.dsum")))
            .execute()
        }
      }
      DeltaTable.forPath(s, aggDir).toDF.orderBy(col("rk"))
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS INTEGER) AS nk,
                   CAST(n_regionkey AS INTEGER) AS rk FROM nation),
      final AS (SELECT * FROM n WHERE NOT (rk = 2 AND nk > 10))
      SELECT rk, COUNT(*) AS n, CAST(SUM(nk) AS BIGINT) AS sum_nk
      FROM final GROUP BY rk ORDER BY rk""")),

    // Type widening (A54): v1 writes the key as INT; a mergeSchema append
    // of LONG data widens the column in place (metadata-only — v1's
    // narrow files stay live and promote at scan time). The readback must
    // agree with DuckDB computing the same rows at BIGINT.
    GQ("delta_type_widening", (s, d) => {
      val dir = fixture(s, d, "widen") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val nation = table(s, d, "nation")
        val txn = t.deltaLog.startTransaction()
        val narrow = nation.select(col("n_nationkey").cast("int").as("nk"), col("n_name"))
        txn.updateMetadata(Metadata(
          schemaString = Snapshot.nullable(narrow.schema)
            .asInstanceOf[org.apache.spark.sql.types.StructType].json,
          configuration = Map("delta.enableTypeWidening" -> "true")))
        txn.commit(Nil, Op.CreateTable) // v0
        t.write(narrow.filter(col("nk") < 13)) // v1: INT files
        t.write(nation.select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
          .filter(col("nk") >= 13), SaveMode.Append, mergeSchema = true) // v2: widen + LONG files
      }
      DeltaTable.forPath(s, dir).toDF.orderBy(col("nk"))
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS nk, n_name
      FROM nation ORDER BY nk""")),

    // A16: replaceWhere — selective transactional overwrite. Op 1 uses an
    // ARBITRARY predicate (rewrites only files holding matches, survivors
    // carried); op 2 is PARTITION-granular (whole-file removal, nothing
    // read or rewritten). A write whose rows violate the predicate must
    // be rejected before any state changes.
    GQ("delta_replace_where", (s, d) => {
      val dir = fixture(s, d, "replwhere") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val orders = table(s, d, "orders")
        t.write(orders, SaveMode.Append, Seq("o_orderstatus")) // v0
        // v1: arbitrary predicate — replace the expensive rows with
        // re-prioritized copies; cheap rows in the same files survive
        t.write(
          orders.filter(col("o_totalprice") > 300000)
            .withColumn("o_orderpriority", lit("REPLACED")),
          SaveMode.Overwrite,
          replaceWhere = Some(col("o_totalprice") > 300000))
        // v2: partition-granular — swap the F partition for its even keys
        val fEven = orders.filter(col("o_orderstatus") === "F" &&
            pmod(col("o_orderkey"), lit(2)) === 0)
          .withColumn("o_custkey", lit(-1L))
        t.write(fEven, SaveMode.Overwrite,
          replaceWhere = Some(col("o_orderstatus") === "F"))
        // constraint: rows outside the region are rejected pre-commit
        val v = t.deltaLog.update().version
        val bad = try {
          t.write(orders.limit(1).withColumn("o_totalprice", lit(1.0)),
            SaveMode.Overwrite,
            replaceWhere = Some(col("o_totalprice") > 999999))
          false
        } catch { case e: Exception => // in-job raise_error enforcement
          e.isInstanceOf[ConstraintViolationException] ||
            Constraints.unwrap(e).isDefined }
        require(bad, "violating replaceWhere write must be rejected")
        require(t.deltaLog.update().version == v, "rejected write must not commit")
      }
      DeltaTable.forPath(s, dir).toDF
        .select(ordersCols.map(col): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM (
        SELECT o_orderkey, CAST(-1 AS BIGINT) AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               CASE WHEN o_totalprice > 300000 THEN 'REPLACED' ELSE o_orderpriority END
        FROM orders WHERE o_orderstatus <> 'F'
      ) ORDER BY o_orderkey"""))
    ,

    // A77: metadata-only aggregates, oracle-pinned. The table is built
    // from lineitem with a DV DELETE on top, then COUNT(*)/MIN/MAX run
    // as bare aggregates: the optimizer answers the count from log stats
    // (numRecords − DV cardinality, zero data I/O — the plan is a
    // LocalRelation) while MIN/MAX rescan (the DV might have deleted the
    // extremum). The oracle recomputes all three from the raw parquet —
    // so the row proves the metadata shortcut EQUALS ground truth, not
    // just that it runs.
    GQ("delta_meta_agg", (s, d) => {
      val dir = fixture(s, d, "metaagg") { dir =>
        val t = DeltaTable.forPath(s, dir)
        val txn = t.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = table(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")).schema.json,
          configuration = Map("delta.enableDeletionVectors" -> "true")))
        txn.commit(Nil, Op.CreateTable)
        t.write(table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")))
        t.delete(col("l_partkey") % 10 === 0) // DV delete
        require(t.snapshot.allFiles.exists(f =>
          DeletionVectors.descriptor(f).isDefined), "expected a DV")
      }
      val base = s.read.format("graft-delta").load(dir)
      val counted = base.groupBy().count()
      require(counted.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
        "COUNT(*) must be answered metadata-only")
      val n = counted.head().getLong(0)
      base.agg(
          min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
          sum(QueryDefs.cents(col("l_quantity"))).as("qty_cents"))
        .select(lit(n).as("n_rows"), col("min_ok"), col("max_ok"),
          QueryDefs.centsToDouble(col("qty_cents")).as("sum_qty"))
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
        CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
      FROM lineitem WHERE l_partkey % 10 <> 0"""))
  )
}
