package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta.DeltaTable

/** The cell-bucketed ANN layout (Similarity.writeCellIndexed plumbing):
  * the embedding corpus written as a graft-Delta table PARTITIONED BY
  * IVF cell id, read back through the `graft-delta` source. These specs
  * pin the property the layout exists for — a probe's candidate read
  * OPENS only the probed cells' files (log-level pruning), instead of
  * scanning everything and filtering rows.
  */
class CellIndexedLayoutSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-cell-idx").toString

  /** 64 vectors across 8 cells, written cell-partitioned the way the
    * ANN queries' index build does.
    */
  private def mkIndex(): (String, Int) = {
    import spark.implicits._
    val dir = tmp()
    val corpus = (0 until 64).map(i => (i % 8, i.toLong, Seq.fill(4)(i / 64.0)))
      .toDF("cell", "vec_id", "e")
      // several files per partition, like a real multi-task write
      .repartition(4)
    DeltaTable.forPath(spark, dir).write(corpus, partitionBy = Seq("cell"))
    val total = DeltaTable.forPath(spark, dir).snapshot.allFiles.size
    (dir, total)
  }

  test("a cell-filtered read opens ONLY the probed cells' files") {
    val (dir, totalFiles) = mkIndex()
    val probed = Seq(1, 3)
    val pruned = spark.read.format("graft-delta").load(dir)
      .where(col("cell").isInCollection(probed))
    // row-level correctness
    import spark.implicits._
    assert(pruned.select("cell").distinct().as[Int].collect().toSet == probed.toSet)
    assert(pruned.count() == 16L)
    // FILE-level pruning: every opened file lives under a probed cell's
    // partition directory, and strictly fewer files open than exist
    val opened = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(opened.nonEmpty)
    assert(opened.forall(p => p.contains("cell=1") || p.contains("cell=3")),
      s"unprobed cells' files were opened: $opened")
    assert(opened.size < totalFiles,
      s"no pruning: opened ${opened.size} of $totalFiles files")
  }

  test("an unfiltered read still sees the whole corpus (layout is lossless)") {
    val (dir, _) = mkIndex()
    import spark.implicits._
    val back = spark.read.format("graft-delta").load(dir)
    assert(back.count() == 64L)
    assert(back.select("vec_id").as[Long].collect().toSet == (0L until 64L).toSet)
    // partition column round-trips as its declared INT type
    assert(back.schema("cell").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }
}
