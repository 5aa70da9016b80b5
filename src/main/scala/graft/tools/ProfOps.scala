package graft.tools

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Scratch phase-level profiler for optimization work (not part of the
  * driver contract): times the internal phases of composite operators so
  * optimization effort lands where the seconds are. Body changes freely
  * between investigations.
  */
object ProfOps {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[TIME $label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.delta._
    import graft.queries.QueryDefs.{table => qtable}
    val orders = qtable(spark, d, "orders")
    def mkTable(uniform: Boolean): DeltaTable = {
      val dir = java.nio.file.Files.createTempDirectory(
        s"prof-uniform-$uniform").toString
      val tt = DeltaTable.forPath(spark, dir)
      val conf = (if (uniform)
        Map("delta.universalFormat.enabledFormats" -> "iceberg")
      else Map.empty[String, String]) +
        ("delta.autoOptimize.optimizeWrite" -> "true")
      t(s"create-$uniform") {
        val txn = tt.deltaLog.startTransaction()
        txn.updateMetadata(Metadata(
          schemaString = orders.schema.json,
          partitionColumns = Seq("o_orderstatus"),
          configuration = conf))
        txn.commit(Nil, Op.CreateTable)
      }
      t(s"seed-5-appends-$uniform") {
        (0 until 5).foreach(i =>
          tt.write(orders.filter(pmod(col("o_orderkey"), lit(5)) === i),
            SaveMode.Append, Seq("o_orderstatus")))
      }
      tt
    }
    val markers = orders.filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .withColumn("o_orderkey", -col("o_orderkey") - 1)
    def pass(tt: DeltaTable, tag: String, n: Int): Unit = {
      t(s"$tag-p$n-append") { tt.write(markers, SaveMode.Append, Seq("o_orderstatus")) }
      t(s"$tag-p$n-delete") { tt.delete(col("o_orderkey") < 0L) }
      t(s"$tag-p$n-scan") { tt.toDF.orderBy(col("o_orderkey")).count() }
    }
    val uni = mkTable(true)
    (1 to 3).foreach(n => pass(uni, "uni", n))
    t("explicit-regenerate") { uni.generateIcebergMetadata() }
    spark.stop()
  }
}
