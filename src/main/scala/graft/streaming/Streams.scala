package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{GQ, QueryDefs}
import QueryDefs._

/** Structured Streaming operators (SURVEY §2 D).
  *
  * Each query drives a real streaming execution (file source ->
  * transforms -> memory sink, drained with processAllAvailable) and
  * returns the sink table, so the DuckDB oracle checks stream results
  * against the equivalent batch SQL — the streaming/batch unification
  * Spark promises, used as a correctness gate.
  */
object Streams {

  private val sinkId = new AtomicLong(0)

  /** Copy the events parquet into a fresh dir usable as a file source. */
  private def eventsSourceDir(d: String): String = {
    val src = Files.createTempDirectory("graft-stream-src")
    Files.copy(Paths.get(s"$d/events.parquet"),
      src.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    src.toString
  }

  private def runToMemory(agg: DataFrame, mode: String): DataFrame = {
    val name = s"graft_sink_${sinkId.incrementAndGet()}"
    val q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    agg.sparkSession.table(name)
  }

  val queries: Seq[GQ] = Seq(
    // D1: tumbling window aggregation over an event-time stream
    GQ("stream_window_agg", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(eventsSourceDir(d))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = stream
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          (sum(cents($"value")).cast("double") / lit(100.0)).as("sum_value"))
      runToMemory(agg, "complete")
        .select($"window.start".as("win_start"), $"event_type", $"n", $"sum_value")
        .orderBy($"win_start", $"event_type")
    }, Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // D3: streaming dedup inside a watermark, checked via aggregate
    GQ("stream_dedup", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      // source contains every event twice -> dedup must halve it
      val dir = Paths.get(eventsSourceDir(d))
      Files.copy(dir.resolve("events.parquet"), dir.resolve("events_dup.parquet"))
      val stream = s.readStream.schema(schema).parquet(dir.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val dedup = stream
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
      val out = runToMemory(dedup, "append")
      out.agg(
        count(lit(1)).as("n_events"),
        sum($"event_id").as("sum_ids"),
        countDistinct($"user_id").as("n_users"))
    }, Some("""
      SELECT COUNT(*) AS n_events, CAST(SUM(event_id) AS BIGINT) AS sum_ids,
        COUNT(DISTINCT user_id) AS n_users
      FROM events"""))
  )
}
