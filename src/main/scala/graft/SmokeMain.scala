package graft
import org.apache.spark.sql.SparkSession
/** Replicates the driver's t1 smoke: entry() on sf0.001 must return rows. */
object SmokeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    spark.stop()
  }
}
