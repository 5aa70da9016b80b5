package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for local tuning (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WSCG", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-25s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.queries.QueryDefs._
    val docs = table(spark, sfDir, "documents")
      .withColumn("sh", shingles3(tokens($"text")))
      .filter(size($"sh") > 0).select($"doc_id", $"sh")
    time("shingled") { docs.count() }
    val vs = docs.withColumn("vs",
      transform($"sh", x => conv(substring(md5(x), 1, 15), 16, 10).cast("long") % lit(1073741824L)))
    time("shingle_vals") { vs.count() }
    time("minhash_full_cold") { SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count() }
    time("minhash_warm") { SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count() }
  }
}
