package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes the AQE-final `.explain("formatted")` output of registry
  * queries to files — the per-round plan evidence the optimization
  * deliverable requires (plans/r{N}/<query>_<suffix>.txt).
  *
  * Usage: runMain graft.tools.PlanFiles <sfDir> <outDir> <suffix> [query ...]
  * With no query names: every bench query.
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.benchQueries
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
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.count() // settle AQE so the dump shows the final plan
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
          s"=== $name @ $sfDir (AQE-final, formatted) ===\n$formatted")
        println(s"[plan-files] wrote $name")
      } catch {
        case e: Throwable => println(s"[plan-files] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
