package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the AQE-final formatted physical plan of one
  * registered query. Usage:
  * `sbt "runMain graft.Explain <queryName> [sfDir]"`. Used to check the
  * properties SURVEY §6 demands: pushed filters, pruned read schemas,
  * broadcast where expected, unbroken WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <queryName> [sfDir]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // materialize so AQE settles on the final plan
    println(s"=== $name @ $sfDir (AQE-final) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
