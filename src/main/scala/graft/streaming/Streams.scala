package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.delta.Op
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

  /** Copy the events parquet into a fresh dir usable as a file source.
    * Handles both table layouts: the driver testdata's single FILE
    * `events.parquet` and a directory of part-files (any Spark-written
    * table, e.g. the scale-sweep corpus) — silently copying a directory
    * entry would hand the stream an empty source and every D-query
    * would "pass" on zero rows (the round-12 scale-sweep catch).
    */
  private def eventsSourceDir(d: String): String = {
    val src = QueryDefs.scratchDir("graft-stream-src")
    val table = Paths.get(s"$d/events.parquet")
    if (Files.isDirectory(table)) {
      val listing = Files.list(table)
      val i =
        try {
          var n = 0
          listing.iterator().asScala.foreach { p =>
            if (p.getFileName.toString.endsWith(".parquet")) {
              Files.copy(p, src.resolve(f"events_$n%05d.parquet"),
                StandardCopyOption.REPLACE_EXISTING)
              n += 1
            }
          }
          n
        } finally listing.close()
      require(i > 0, s"no part-files under $table")
    } else {
      Files.copy(table, src.resolve("events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
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
        .transform(QueryDefs.withEventTs)
      val agg = stream
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          (sum(cents($"value")).cast("double") / lit(100.0)).as("sum_value"))
      // TIMESTAMP_NTZ: dump type independent of writer conf (UTC session)
      runToMemory(agg, "complete")
        .select($"window.start".cast("timestamp_ntz").as("win_start"),
          $"event_type", $"n", $"sum_value")
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
      // (duplicate every part-file: the source may be multi-file)
      val dir = Paths.get(eventsSourceDir(d))
      val listing = Files.list(dir)
      try listing.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { p =>
          val n = p.getFileName.toString.stripSuffix(".parquet")
          Files.copy(p, dir.resolve(n + "_dup.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
        }
      finally listing.close()
      val stream = s.readStream.schema(schema).parquet(dir.toString)
        .transform(QueryDefs.withEventTs)
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
      FROM events""")),

    // D6: streaming sessionization via native session windows. Events
    // within a 30-minute gap merge into one session per user; append mode
    // emits a session once the event-time watermark passes its end
    // (end = last event + gap). The oracle replays the same gap rule in
    // batch SQL and applies the same closure condition — the watermark is
    // the max event time truncated to milliseconds (Spark tracks
    // watermarks in ms), so sessions still open at end-of-stream are
    // excluded on both sides. State is keyed (user, session): at 100 TB
    // the shuffle is one hash partitioning on user_id and the state store
    // holds only OPEN sessions, not history.
    GQ("stream_sessionize", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(eventsSourceDir(d))
        .transform(QueryDefs.withEventTs)
      val agg = stream
        .withWatermark("ts", "0 seconds")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(cents($"value")).cast("double") / lit(100.0)).as("sum_value"))
      runToMemory(agg, "append")
        .select($"user_id", $"session_window.start".as("session_start"),
          $"session_window.end".as("session_end"), $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    }, Some("""
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      o AS (SELECT *, lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
      m AS (SELECT *, CASE WHEN prev_us IS NULL
            OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new FROM o),
      g AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess FROM m),
      sess AS (SELECT user_id, MIN(ts) AS session_start,
          MAX(ts) + INTERVAL 30 MINUTE AS session_end,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        FROM g GROUP BY user_id, sess),
      wm AS (SELECT (epoch_us(MAX(CAST(ts AS TIMESTAMP))) // 1000) * 1000 AS wm_us FROM events)
      SELECT user_id, session_start, session_end, n_events, sum_value
      FROM sess, wm WHERE epoch_us(session_end) <= wm_us
      ORDER BY user_id, session_start""")),

    // D7: arbitrary stateful streaming via flatMapGroupsWithState — the
    // custom-state primitive (running per-user totals that survive across
    // micro-batches in the state store). Update mode emits the refreshed
    // totals per user per batch; the final totals are recovered with a
    // monotonic max per user, so the result is independent of how the
    // source splits into batches. Batch oracle: plain GROUP BY user.
    GQ("stream_user_state", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(eventsSourceDir(d))
      val typed = stream.select($"user_id", cents($"value").as("c")).as[(Long, Long)]
      val updated = typed.groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
          OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, it, state) =>
          var (n, c) = state.getOption.getOrElse((0L, 0L))
          it.foreach { e => n += 1; c += e._2 }
          state.update((n, c))
          Iterator((uid, n, c))
        }
        .toDF("user_id", "n_events", "sum_cents")
      runToMemory(updated, "update")
        .groupBy($"user_id")
        .agg(max($"n_events").as("n_events"),
          (max($"sum_cents").cast("double") / lit(100.0)).as("sum_value"))
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // D8: stream-stream inner join with event-time range — each error
    // event joined to the same user's purchases in the preceding hour.
    // Both sides carry watermarks so the join state is bounded (Spark
    // evicts rows older than watermark - range); an INNER join emits a
    // match as soon as both rows have arrived, so after the source
    // drains the result equals the batch join — which is the oracle.
    // At 100 TB this is one hash shuffle per side on user_id and state
    // proportional to one hour of events, not history.
    GQ("stream_join", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      def src() = s.readStream.schema(schema).parquet(eventsSourceDir(d))
        .transform(QueryDefs.withEventTs)
      val errs = src().filter($"event_type" === "error")
        .select($"event_id".as("e_id"), $"user_id", $"ts".as("e_ts"))
        .withWatermark("e_ts", "1 hour")
      val purchases = src().filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts"), cents($"value").as("p_cents"))
        .withWatermark("p_ts", "1 hour")
      val joined = errs.join(purchases,
        $"user_id" === $"p_user" &&
          $"p_ts" <= $"e_ts" && $"p_ts" >= $"e_ts" - expr("INTERVAL 1 HOUR"))
      val out = runToMemory(joined, "append")
      out.groupBy($"user_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"e_id").as("n_errors"),
          (sum($"p_cents").cast("double") / lit(100.0)).as("sum_purchase"))
        .orderBy($"user_id")
    }, Some("""
      WITH e AS (SELECT event_id AS e_id, user_id, CAST(ts AS TIMESTAMP) AS e_ts
                 FROM events WHERE event_type = 'error'),
      p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts,
              CAST(round(value*100) AS BIGINT) AS p_cents
            FROM events WHERE event_type = 'purchase')
      SELECT e.user_id, COUNT(*) AS n_pairs,
        COUNT(DISTINCT e.e_id) AS n_errors,
        CAST(CAST(SUM(p_cents) AS BIGINT) AS DOUBLE)/100.0 AS sum_purchase
      FROM e JOIN p ON e.user_id = p.user_id
        AND p.p_ts <= e.e_ts AND p.p_ts >= e.e_ts - INTERVAL 1 HOUR
      GROUP BY e.user_id ORDER BY e.user_id""")),

    // D9: streaming CDF — the stream follows DML (update/delete), not just
    // appends. readChangeFeed=true turns each micro-batch into the
    // row-level change feed of the admitted versions (whole-version
    // granularity: one commit's changes are indivisible), so a downstream
    // materializer sees exactly the inserts, delete rows and
    // update pre/post images in commit order. The oracle replays the same
    // DML history (v1 insert-all, v2 predicate delete, v3 update) in
    // batch SQL over the raw parquet.
    GQ("stream_cdf", (s, d) => {
      import s.implicits._
      val dir = graft.delta.DeltaQueries.cdfDmlFixture(s, d)
      val stream = s.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(dir)
        .select($"n_nationkey".cast("int").as("n_nationkey"), $"n_name",
          $"n_regionkey".cast("int").as("n_regionkey"),
          $"_change_type", $"_commit_version")
      runToMemory(stream, "append")
        .orderBy($"_commit_version", $"n_nationkey", $"_change_type")
    }, Some("""
      WITH n AS (SELECT CAST(n_nationkey AS INTEGER) AS nk, n_name,
                   CAST(n_regionkey AS INTEGER) AS rk FROM nation)
      SELECT nk AS n_nationkey, n_name, rk AS n_regionkey, _change_type, _commit_version
      FROM (
        SELECT nk, n_name, rk, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
        FROM n
        UNION ALL
        SELECT nk, n_name, rk, 'delete', CAST(2 AS BIGINT)
        FROM n WHERE rk = 2 AND nk > 10
        UNION ALL
        SELECT nk, n_name || '!', rk, 'update_postimage', CAST(3 AS BIGINT) FROM n WHERE nk < 3
        UNION ALL
        SELECT nk, n_name, rk, 'update_preimage', CAST(3 AS BIGINT) FROM n WHERE nk < 3)
      ORDER BY _commit_version, n_nationkey, _change_type""")),

    // D10: streaming upsert — foreachBatch + MERGE maintains a per-user
    // running profile in a Delta table with exactly-once semantics: each
    // micro-batch pre-aggregates (count / cents-sum / max event time) and
    // merges accumulatively, and `withIdempotentTxn(app, batchId)` makes a
    // replayed batch a no-op, so totals are micro-batch-split independent.
    // This is the canonical streaming-DML sink shape Delta users run
    // (aggregation state lives in the TABLE, not the state store — it
    // survives query rewrites and is queryable mid-stream). The source is
    // split into two files and rate-limited to one file per trigger, so
    // the accumulate path really runs across multiple batches.
    GQ("stream_upsert", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      // two-file source dir -> two micro-batches with maxFilesPerTrigger=1
      val src = QueryDefs.scratchDir("graft-upsert-src")
      val raw = s.read.schema(schema).parquet(s"$d/events.parquet")
      Seq(0, 1).foreach { h =>
        val part = QueryDefs.scratchDir(s"graft-upsert-part$h")
        raw.filter(pmod($"event_id", lit(2)) === h).coalesce(1)
          .write.mode("overwrite").parquet(part.toString)
        val f = Files.list(part).filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get()
        Files.move(f, src.resolve(s"half$h.parquet"))
      }
      // target table (v0: schema only)
      val dir = QueryDefs.scratchDir("graft-upsert-tgt").toString
      val t = graft.delta.DeltaTable.forPath(s, dir)
      val tgtSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_events", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("last_us", org.apache.spark.sql.types.LongType)))
      val txn0 = t.deltaLog.startTransaction()
      txn0.updateMetadata(graft.delta.Metadata(schemaString = tgtSchema.json))
      txn0.commit(Nil, Op.CreateTable)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .transform(QueryDefs.withEventTs)
      val q = stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val agg = batch.groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"), sum(cents($"value")).as("sum_cents"),
            max(unix_micros($"ts")).as("last_us"))
        t.merge(agg.alias("s"), expr("t.user_id = s.user_id"))
          .withIdempotentTxn("stream_upsert", batchId)
          .whenMatchedUpdate(Map(
            "n_events" -> expr("t.n_events + s.n_events"),
            "sum_cents" -> expr("t.sum_cents + s.sum_cents"),
            "last_us" -> expr("greatest(t.last_us, s.last_us)")))
          .whenNotMatchedInsertAll()
          .execute()
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      t.toDF
        .select($"user_id", $"n_events",
          ($"sum_cents".cast("double") / lit(100.0)).as("sum_value"),
          timestamp_micros($"last_us").as("last_ts"))
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id, COUNT(*) AS n_events,
        CAST(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_value,
        CAST(MAX(ts) AS TIMESTAMP) AS last_ts
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // D11: stream-static join — each micro-batch joins against a STATIC
    // dimension (customer) that is planned per batch, broadcast to the
    // stream side (no state store, no watermark needed: the static side
    // is not a stream). The canonical enrichment shape at 100 TB: the
    // event stream never shuffles, the dim broadcasts once per trigger.
    GQ("stream_static_join", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(eventsSourceDir(d))
        .filter($"event_type" === "purchase")
      val dim = broadcast(table(s, d, "customer")
        .select($"c_custkey", $"c_mktsegment"))
      val joined = stream.join(dim, $"user_id" === $"c_custkey")
        .select($"c_mktsegment", cents($"value").as("cents"))
      val out = runToMemory(joined, "append")
      out.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_purchases"),
          (sum($"cents").cast("double") / lit(100.0)).as("sum_value"))
        .orderBy($"c_mktsegment")
    }, Some("""
      SELECT c_mktsegment, COUNT(*) AS n_purchases,
        CAST(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      WHERE event_type = 'purchase'
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // D12: streaming corpus ADMISSION by MinHash-LSH — the online face of
    // C2's batch near-dup sweep: documents arrive in micro-batches and a
    // document is flagged the moment any of its 4 LSH band buckets was
    // already claimed by an earlier document. State (one min-doc_id per
    // distinct band bucket, held in flatMapGroupsWithState) is exactly
    // the LSH index a streaming ingest pipeline keeps; each batch
    // shuffles only (band, key, id) triples — shingle arrays never leave
    // the map side. At 100 TB the state store is RocksDB-backed and
    // production adds a state TTL; the semantics here are append-only.
    //
    // The source is the documents table split into 3 micro-batches by
    // ascending doc_id range (mtimes force file order, 1 file/trigger),
    // so "claimed earlier" = "smaller doc_id" and the batch oracle — a
    // self-join over the same band keys in SQL — is exact and
    // batch-split independent.
    GQ("stream_lsh_admit", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val docs = s.read.parquet(s"$d/documents.parquet")
      val maxId = docs.agg(max($"doc_id")).head().getLong(0)
      val cuts = Seq(maxId / 3, 2 * maxId / 3, Long.MaxValue)
      val src = QueryDefs.scratchDir("graft-stream-docs")
      var lo = Long.MinValue
      cuts.zipWithIndex.foreach { case (hi, i) =>
        val stage = QueryDefs.scratchDir("graft-stream-docs-stage")
        docs.filter($"doc_id" > lo && $"doc_id" <= hi)
          .repartition(1).write.mode("overwrite").parquet(stage.toString)
        val part = Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        val dest = src.resolve(f"batch$i%d.parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 30000 + i * 10000))
        lo = hi
      }
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val bands = graft.llm.Dedup.bandKeys(stream).as[(Long, Int, String)]
      val flagged = bands
        .groupByKey { case (_, b, k) => s"$b|$k" }
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (_, rows, state: GroupState[Long]) =>
            // owner(bucket) = smallest doc_id seen in any prior batch or
            // earlier in this batch; a doc with owner < doc_id is a dup
            val ids = rows.map(_._1).toArray.sorted
            var owner = state.getOption.getOrElse(Long.MaxValue)
            val out = Seq.newBuilder[(Long, Long)]
            ids.foreach { id =>
              if (owner < id) out += ((id, owner))
              if (id < owner) owner = id
            }
            state.update(owner)
            out.result().iterator
        }.toDF("doc_id", "cand")
      runToMemory(flagged, "append")
        .groupBy($"doc_id").agg(min($"cand").as("dup_of"))
        .orderBy($"doc_id")
    }, Some(s"""
      WITH ${graft.llm.Dedup.duckBandsCte}
      SELECT a.doc_id AS doc_id, MIN(c.doc_id) AS dup_of
      FROM bands a JOIN bands c ON a.b = c.b AND a.bkey = c.bkey AND c.doc_id < a.doc_id
      GROUP BY a.doc_id ORDER BY doc_id""")),

    // D13: watermark LATE-DATA DROP — the semantics that make unbounded
    // streaming aggregation finite: rows arriving after the watermark has
    // closed their window are discarded, and closed windows are emitted
    // exactly once. The source is split into three mtime-ordered files
    // (maxFilesPerTrigger=1 → three micro-batches): the newest 36 h of
    // events, then the 36–72 h band, then everything older (the LATE
    // batch). Spark ≥3.4 runs TWO watermarks — the late-record filter
    // uses the watermark as of two batches back while eviction uses the
    // previous batch's (StateStoreSave carries both) — so the late file
    // must arrive at batch 2, where the filter watermark is already
    // max(ts) - 24 h from batch 0's stats and every late row sits in a
    // window closed >47 h earlier: all are dropped (batch 0 holds the
    // global max BY CONSTRUCTION, making the filter bound deterministic,
    // not sample-dependent). The final result is the on-time (72 h)
    // subset's hourly aggregate restricted to windows whose end precedes
    // the watermark; the oracle replays exactly that rule in batch SQL
    // (watermark in Spark's ms granularity; max(ts) is never a whole
    // hour, so no window end can tie the watermark and the <=/< boundary
    // is unambiguous). At 100 TB this is THE state-bound guarantee:
    // state holds only open windows, late stragglers cost zero state.
    GQ("stream_late_drop", (s, d) => {
      import s.implicits._
      val typed = QueryDefs.events(s, d)
      val mxUs = typed.agg(max(unix_micros($"ts"))).head().getLong(0)
      def tsAt(us: Long) = timestamp_micros(lit(us))
      val cut36 = mxUs - 36L * 3600 * 1000000
      val cut72 = mxUs - 72L * 3600 * 1000000
      val src = QueryDefs.scratchDir("graft-late-src")
      Seq(($"ts" > tsAt(cut36), 0),
          ($"ts" > tsAt(cut72) && $"ts" <= tsAt(cut36), 1),
          ($"ts" <= tsAt(cut72), 2)).foreach { case (pred, i) =>
        val stage = QueryDefs.scratchDir("graft-late-stage")
        typed.filter(pred).repartition(1).write.mode("overwrite").parquet(stage.toString)
        val part = Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        val dest = src.resolve(s"batch$i.parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 30000 + i * 10000))
      }
      val stream = s.readStream.schema(typed.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .withWatermark("ts", "24 hours")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          (sum(cents($"value")).cast("double") / lit(100.0)).as("sum_value"))
      runToMemory(stream, "append")
        .select($"window.start".as("win_start"), $"event_type", $"n", $"sum_value")
        .orderBy($"win_start", $"event_type")
    }, Some("""
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      c AS (SELECT MAX(epoch_us(ts)) AS mx_us FROM e),
      ot AS (SELECT e.* FROM e, c
             WHERE epoch_us(ts) > mx_us - CAST(72*3600 AS BIGINT)*1000000),
      a AS (SELECT date_trunc('hour', ts) AS win_start, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
            FROM ot GROUP BY 1, 2)
      SELECT win_start, event_type, n, sum_value
      FROM a, c
      WHERE epoch_us(win_start + INTERVAL 1 HOUR)
        <= (mx_us // 1000) * 1000 - CAST(24*3600 AS BIGINT)*1000000
      ORDER BY win_start, event_type""")),

    // D14: stream-stream LEFT OUTER join — the eviction-driven emission
    // semantics on top of D8's interval join: a matched (error,
    // purchase) pair is emitted as soon as both rows arrive, but an
    // UNMATCHED error can only be emitted null-extended once the
    // watermark proves no matching purchase can still arrive (its state
    // is evicted). Both sides drain in one micro-batch; the trailing
    // no-data batch advances the watermark and flushes the evicted
    // lefts. The QUERY watermark is the MIN across both watermark
    // nodes, each computed from its own FILTERED stream's max event
    // time (ms-truncated) minus the delay — not the global max; a left
    // row is declared unmatched when e_ts drops below that watermark
    // (no future right with p_ts <= e_ts can arrive). The oracle
    // replays exactly this: matched pairs ∪ never-matched errors below
    // least(max error ts, max purchase ts) - 1 h, pinned with zero
    // diffs at sf0.001/sf0.01/sf0.1. At 100 TB
    // the state bound is the same as the inner join's (one hour of
    // events per side) plus the unmatched-left buffer the watermark
    // drains — outer results lag by watermark delay, they do not
    // accumulate.
    GQ("stream_outer_join", (s, d) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      def src() = s.readStream.schema(schema).parquet(eventsSourceDir(d))
        .transform(QueryDefs.withEventTs)
      val errs = src().filter($"event_type" === "error")
        .select($"event_id".as("e_id"), $"user_id", $"ts".as("e_ts"))
        .withWatermark("e_ts", "1 hour")
      val purchases = src().filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts"), cents($"value").as("p_cents"))
        .withWatermark("p_ts", "1 hour")
      val joined = errs.join(purchases,
        $"user_id" === $"p_user" &&
          $"p_ts" <= $"e_ts" && $"p_ts" >= $"e_ts" - expr("INTERVAL 1 HOUR"),
        "left_outer")
      val out = runToMemory(joined, "append")
      out.groupBy($"user_id")
        .agg(count(lit(1)).as("n_rows"),
          count($"p_id").as("n_matched"),
          sum(when($"p_id".isNull, 1L).otherwise(0L)).as("n_unmatched"),
          (sum(coalesce($"p_cents", lit(0L))).cast("double") / lit(100.0)).as("sum_purchase"))
        .orderBy($"user_id")
    }, Some("""
      WITH e AS (SELECT event_id AS e_id, user_id, CAST(ts AS TIMESTAMP) AS e_ts
                 FROM events WHERE event_type = 'error'),
      p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts,
              CAST(round(value*100) AS BIGINT) AS p_cents
            FROM events WHERE event_type = 'purchase'),
      c AS (SELECT least(
              (SELECT (epoch_us(MAX(e_ts)) // 1000) * 1000 FROM e),
              (SELECT (epoch_us(MAX(p_ts)) // 1000) * 1000 FROM p))
              - CAST(3600 AS BIGINT)*1000000 AS wm_us),
      m AS (SELECT e.user_id, e.e_id, p.p_id, p.p_cents
            FROM e JOIN p ON e.user_id = p.user_id
              AND p.p_ts <= e.e_ts AND p.p_ts >= e.e_ts - INTERVAL 1 HOUR),
      un AS (SELECT e.user_id, e.e_id
             FROM e, c
             -- the query watermark = MIN over both sides' per-FILTERED-
             -- stream max event time (ms granularity) minus the delay;
             -- an unmatched left is emitted once e_ts < that watermark
             WHERE epoch_us(e.e_ts) < wm_us
               AND NOT EXISTS (SELECT 1 FROM p
                 WHERE p.user_id = e.user_id
                   AND p.p_ts <= e.e_ts AND p.p_ts >= e.e_ts - INTERVAL 1 HOUR)),
      rows_ AS (SELECT user_id, e_id, p_id, p_cents FROM m
                UNION ALL
                SELECT user_id, e_id, NULL, NULL FROM un)
      SELECT user_id, COUNT(*) AS n_rows,
        COUNT(p_id) AS n_matched,
        CAST(SUM(CASE WHEN p_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
        CAST(CAST(SUM(COALESCE(p_cents, 0)) AS BIGINT) AS DOUBLE)/100.0 AS sum_purchase
      FROM rows_ GROUP BY user_id ORDER BY user_id""")),

    // D15: transformWithState — Spark 4's arbitrary-stateful-processing
    // v2 (the successor of flatMapGroupsWithState: typed state handles
    // with per-state TTL, timers, and a RocksDB-only runtime). Per user
    // the processor keeps a ValueState profile of (purchase count,
    // last-3 purchase amounts) — a "recent activity" feature the
    // serving layer reads; update mode emits the refreshed profile per
    // batch and the final profile is recovered via the monotonic count,
    // so the result is batch-split independent. The source arrives in
    // two time-ranged micro-batches (older half then newer half, the
    // natural arrival order), and within a batch rows are ordered
    // explicitly by (ts, event_id) — determinism never rides on shuffle
    // order. State is per-user-bounded (a count and 3 longs) and
    // RocksDB-backed: the 100 TB shape for per-entity online features.
    GQ("stream_transform_state", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val typed = QueryDefs.events(s, d).filter($"event_type" === "purchase")
      val mxUs = typed.agg(max(unix_micros($"ts"))).head().getLong(0)
      val mnUs = typed.agg(min(unix_micros($"ts"))).head().getLong(0)
      val cutUs = (mnUs + mxUs) / 2
      val src = QueryDefs.scratchDir("graft-tws-src")
      Seq(($"ts" <= timestamp_micros(lit(cutUs)), 0),
          ($"ts" > timestamp_micros(lit(cutUs)), 1)).foreach { case (pred, i) =>
        val stage = QueryDefs.scratchDir("graft-tws-stage")
        typed.filter(pred).repartition(1).write.mode("overwrite").parquet(stage.toString)
        val part = Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        val dest = src.resolve(s"batch$i.parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 30000 + i * 10000))
      }
      val stream = s.readStream.schema(typed.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .select($"user_id", QueryDefs.cents($"value").as("c"),
          unix_micros($"ts").as("us"), $"event_id")
        .as[(Long, Long, Long, Long)]
      val proc = new StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Double)] {
        @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Seq[Long])] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          st = getHandle.getValueState[(Long, Seq[Long])]("profile",
            org.apache.spark.sql.Encoders.product[(Long, Seq[Long])], TTLConfig.NONE)
        override def handleInputRows(key: Long,
            rows: Iterator[(Long, Long, Long, Long)],
            tv: TimerValues): Iterator[(Long, Long, Double)] = {
          // newest first within the batch; batches arrive oldest-first
          val batch = rows.toSeq.sortBy(r => (-r._3, -r._4))
          val (n0, last0) = if (st.exists()) st.get() else (0L, Seq.empty[Long])
          val n = n0 + batch.size
          val last3 = (batch.map(_._2) ++ last0).take(3)
          st.update((n, last3))
          Iterator.single((key, n, last3.sum.toDouble / 100.0))
        }
      }
      val out = stream.groupByKey(_._1)
        .transformWithState(proc, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_purchases", "last3_sum")
      // transformWithState requires the RocksDB state store
      val pk = "spark.sql.streaming.stateStore.providerClass"
      // getAll, not getOption: getOption resolves the registered DEFAULT,
      // so restoring it would materialize the default as an explicit
      // session setting instead of unsetting (RegistrySuite pins this)
      val prev = s.conf.getAll.get(pk)
      s.conf.set(pk,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val sink =
        try runToMemory(out, "update")
        finally prev match {
          case Some(v) => s.conf.set(pk, v)
          case None => s.conf.unset(pk)
        }
      sink.groupBy($"user_id")
        .agg(max_by(struct($"n_purchases", $"last3_sum"), $"n_purchases").as("m"))
        .select($"user_id", $"m.n_purchases".as("n_purchases"),
          $"m.last3_sum".as("last3_sum"))
        .orderBy($"user_id")
    }, Some("""
      WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
              CAST(round(value*100) AS BIGINT) AS c
            FROM events WHERE event_type = 'purchase'),
      r AS (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM p)
      SELECT user_id, COUNT(*) AS n_purchases,
        CAST(CAST(SUM(CASE WHEN rn <= 3 THEN c ELSE 0 END) AS BIGINT) AS DOUBLE)/100.0 AS last3_sum
      FROM r GROUP BY user_id ORDER BY user_id""")),

    // D16: event-time-ordered initial-snapshot drain (the D4
    // withEventTimeOrder surface as an oracle-gated query). The delta
    // table is committed in hazard order — middle-aged events first,
    // the NEWEST second (advancing the watermark 24 h past the tail),
    // the OLDEST last — so a commit-order drain under a 24 h watermark
    // would DROP the final commit's rows and lose their windows.
    // withEventTimeOrder re-sorts the initial snapshot by per-file ts
    // stats, the watermark trails the data, and append mode emits every
    // window the batch semantics would: the oracle is the PLAIN batch
    // aggregation with no drop carve-out (contrast with D13's oracle,
    // which must model the dropped tail). At 100 TB this is the
    // backfill-then-tail pattern: state stays one watermark-delay wide
    // because the backlog arrives in time order.
    GQ("stream_event_order", (s, d) => {
      import s.implicits._
      // INT96 (the legacy default) has no usable footer stats; the
      // ordering needs annotated INT64 timestamps (see DeltaStreamSource).
      // Session conf MUST be restored: Verify runs every query on one
      // shared session, and an escaped TIMESTAMP_MICROS flips later
      // queries' parquet dumps from naive INT96 to UTC-adjusted micros
      // (the r13 regression — 3 oracle rows went red).
      val otk = "spark.sql.parquet.outputTimestampType"
      val otPrev = s.conf.getAll.get(otk) // explicit-only (see D15 note)
      s.conf.set(otk, "TIMESTAMP_MICROS")
      try {
        val typed = QueryDefs.events(s, d)
        val mxUs = typed.agg(max(unix_micros($"ts"))).head().getLong(0)
        def tsAt(us: Long) = timestamp_micros(lit(us))
        val cut36 = mxUs - 36L * 3600 * 1000000
        val cut72 = mxUs - 72L * 3600 * 1000000
        val dir = QueryDefs.scratchDir("graft-eto-table").toString
        val t = graft.delta.DeltaTable.forPath(s, dir)
        Seq($"ts" > tsAt(cut72) && $"ts" <= tsAt(cut36), // middle ages first
            $"ts" > tsAt(cut36),                         // newest second
            $"ts" <= tsAt(cut72))                        // oldest LAST
          .foreach(p => t.write(typed.filter(p).coalesce(1)))
        val stream = s.readStream
          .format("graft.streaming.DeltaStreamSourceProvider")
          .option("path", dir)
          .option("withEventTimeOrder", "true")
          .option("eventTimeOrderColumn", "ts")
          .option("maxFilesPerTrigger", "1")
          .load()
          .withWatermark("ts", "24 hours")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"),
            (sum(cents($"value")).cast("double") / lit(100.0)).as("sum_value"))
        // TIMESTAMP_NTZ: the dumped type never depends on writer conf
        // (session TZ is pinned UTC, so the cast is value-preserving)
        runToMemory(stream, "append")
          .select($"window.start".cast("timestamp_ntz").as("win_start"),
            $"event_type", $"n", $"sum_value")
          .orderBy($"win_start", $"event_type")
      } finally otPrev match {
        case Some(v) => s.conf.set(otk, v)
        case None => s.conf.unset(otk)
      }
    }, Some("""
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      c AS (SELECT MAX(epoch_us(ts)) AS mx_us FROM e),
      a AS (SELECT date_trunc('hour', ts) AS win_start, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
            FROM e GROUP BY 1, 2)
      SELECT win_start, event_type, n, sum_value
      FROM a, c
      WHERE epoch_us(win_start + INTERVAL 1 HOUR)
        <= (mx_us // 1000) * 1000 - CAST(24*3600 AS BIGINT)*1000000
      ORDER BY win_start, event_type""")),

    // D17: CDC REPLICATION — the composition the change feed exists for:
    // stream table A's CDF and apply it to replica B with an
    // idempotent apply-changes MERGE. Each micro-batch keeps only the
    // LATEST change per key (_commit_version desc; preimages dropped),
    // then deletes matched 'delete's, updates matched keys, inserts
    // unmatched non-deletes — so one batch spanning several commits
    // (insert→update→delete of the same key) still lands the final
    // state, and batch replays are no-ops via the SetTransaction id.
    // CDF batches admit at whole-version granularity under
    // maxFilesPerTrigger=1, so the insert/update/delete history really
    // crosses three micro-batches. The oracle recomputes A's FINAL
    // state from the base table — replica ≡ source is the correctness
    // claim. At 100 TB each batch ships only changed rows and the MERGE
    // touches only matched files: replication cost follows the CHANGE
    // rate, not table size.
    GQ("stream_replicate", (s, d) => {
      import s.implicits._
      val srcDir = QueryDefs.scratchDir("graft-repl-src").toString
      val a = graft.delta.DeltaTable.forPath(s, srcDir)
      val base = QueryDefs.table(s, d, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("r"))
      val txn0 = a.deltaLog.startTransaction()
      txn0.updateMetadata(graft.delta.Metadata(
        schemaString = base.schema.json,
        configuration = Map("delta.enableChangeDataFeed" -> "true")))
      txn0.commit(Nil, Op.CreateTable)
      a.write(base)                                                   // v1
      a.update($"r" === 2L, Map("name" -> concat($"name", lit("_U")))) // v2
      a.delete(pmod($"k", lit(5L)) === 0L)                             // v3
      val repDir = QueryDefs.scratchDir("graft-repl-dst").toString
      val b = graft.delta.DeltaTable.forPath(s, repDir)
      val txn1 = b.deltaLog.startTransaction()
      txn1.updateMetadata(graft.delta.Metadata(schemaString = base.schema.json))
      txn1.commit(Nil, Op.CreateTable)
      val stream = s.readStream
        .format("graft.streaming.DeltaStreamSourceProvider")
        .option("path", srcDir)
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "1") // whole-version CDF batches
        .load()
      val q = stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val latest = batch
          .filter(col("_change_type") =!= "update_preimage")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(col("_commit_version").desc)))
          .filter(col("rn") === 1).drop("rn")
        graft.delta.DeltaTable.forPath(s, repDir)
          .merge(latest.alias("s"), expr("t.k = s.k"))
          .withIdempotentTxn("stream_replicate", batchId)
          .whenMatchedDelete(expr("s._change_type = 'delete'"))
          .whenMatchedUpdate(Map(
            "name" -> expr("s.name"), "r" -> expr("s.r")))
          .whenNotMatchedInsert(expr("s._change_type != 'delete'"), Map(
            "k" -> expr("s.k"), "name" -> expr("s.name"), "r" -> expr("s.r")))
          .execute()
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      graft.delta.DeltaTable.forPath(s, repDir).toDF
        .select($"k", $"name", $"r").orderBy($"k")
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
        CASE WHEN n_regionkey = 2 THEN n_name || '_U' ELSE n_name END AS name,
        CAST(n_regionkey AS BIGINT) AS r
      FROM nation WHERE n_nationkey % 5 <> 0 ORDER BY k""")),

    // D20: STREAMING ICEBERG MIRROR — the full CDC pipeline a mirrored
    // foreign table drives, end to end: a UniForm table is adopted as
    // pure Iceberg, a hand-crafted FOREIGN snapshot (the Flink-writer
    // shape: removes batch A, adds batch C, equality-deletes keys
    // spanning B and C) is re-synced into ONE Delta diff commit
    // (convertSyncFixture = A85's sync leg), and a graft-delta CDF
    // STREAM over the adopted table feeds a downstream per-status
    // aggregate via foreachBatch signed-delta MERGE with
    // `withIdempotentTxn` exactly-once — A59's maintenance shape run as
    // a stream over a table whose change feed was never enabled (the
    // sync commit is CDF-consumable by construction: adds as inserts,
    // vanished files as whole-file deletes, DV-diff rows through the
    // descriptor-pair path). A replayed batch is proven a no-op after
    // the drain: re-merging the WHOLE change feed under batchId 0
    // would wreck the aggregate if it applied — the oracle recomputes
    // the mirror from scratch, so incremental ≡ full is the hash gate.
    // At 100 TB each sync ships O(changed files), each micro-batch
    // aggregates only its changed rows, and the MERGE touches only the
    // affected aggregate files — mirror maintenance follows the foreign
    // CHANGE rate, never the table size.
    // D21 (r19) — BRANCH-PINNED STREAMING MIRROR, the production CDC
    // shape on a branching foreign writer (Flink writes main freely; the
    // published `audit` branch advances only on review): a UniForm
    // source with three batches (snapshots 2/3/4) and refs
    // {main -> 4, audit -> 2} loses its Delta identity; a mirror adopts
    // PINNED to the audit branch (batch A only), a CDF stream over the
    // mirror maintains a downstream signed-delta aggregate, the writer
    // advances audit -> 3, one plain re-sync follows the PIN (diff =
    // batch B; main's batch C never arrives), and the stream drains the
    // sync commit. The oracle recomputes the aggregate from the two
    // audit batches — a mirror following current-snapshot-id (batch C
    // present) or a non-incremental re-sync (double-applied rows) both
    // hash-fail. Composition: A87 refs + A85 sync + D5 streaming CDF +
    // D10 exactly-once.
    GQ("stream_branch_mirror", (s, d) => {
      import s.implicits._
      val srcDir = QueryDefs.scratchDir("graft-branch-src").toString
      val tgtDir = QueryDefs.scratchDir("graft-branch-tgt").toString
      val orders = table(s, d, "orders")
      val t = graft.delta.DeltaTable.forPath(s, srcDir)
      val txnS = t.deltaLog.startTransaction()
      txnS.updateMetadata(graft.delta.Metadata(
        schemaString = orders.schema.json,
        configuration = Map(
          "delta.universalFormat.enabledFormats" -> "iceberg")))
      txnS.commit(Nil, Op.CreateTable)
      t.write(orders.filter(pmod($"o_orderkey", lit(3)) === 0)) // snap 2 (A)
      t.write(orders.filter(pmod($"o_orderkey", lit(3)) === 1)) // snap 3 (B)
      t.write(orders.filter(pmod($"o_orderkey", lit(3)) === 2)) // snap 4 (C)
      val metaDir = new java.io.File(srcDir, "metadata")
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
      val logDir = new org.apache.hadoop.fs.Path(srcDir, "_delta_log")
      logDir.getFileSystem(s.sessionState.newHadoopConf())
        .delete(logDir, true)
      // adopt the mirror PINNED to the audit branch
      graft.delta.DeltaTable.mirrorFromIceberg(s, srcDir, tgtDir,
        asOfRef = Some("audit"))
      // downstream aggregate maintained from the mirror's change feed
      val aggDir = QueryDefs.scratchDir("graft-branch-agg").toString
      val agg = graft.delta.DeltaTable.forPath(s, aggDir)
      val aggSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_okey",
          org.apache.spark.sql.types.LongType)))
      val txn0 = agg.deltaLog.startTransaction()
      txn0.updateMetadata(graft.delta.Metadata(schemaString = aggSchema.json))
      txn0.commit(Nil, Op.CreateTable)
      def applyBatch(batch: DataFrame, batchId: Long): Unit = {
        val deltas = batch
          .withColumn("sign",
            when(col("_change_type").isin("insert", "update_postimage"), 1L)
              .otherwise(-1L))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("sign")).as("dn"),
            sum(col("sign") * col("o_orderkey")).as("dsum"))
        graft.delta.DeltaTable.forPath(s, aggDir)
          .merge(deltas.alias("s"), expr("t.o_orderstatus = s.o_orderstatus"))
          .withIdempotentTxn("stream_branch_mirror", batchId)
          .whenMatchedDelete(expr("t.n_rows + s.dn = 0"))
          .whenMatchedUpdate(Map(
            "n_rows" -> expr("t.n_rows + s.dn"),
            "sum_okey" -> expr("t.sum_okey + s.dsum")))
          .whenNotMatchedInsert(expr("s.dn <> 0"), Map(
            "o_orderstatus" -> col("s.o_orderstatus"),
            "n_rows" -> col("s.dn"), "sum_okey" -> col("s.dsum")))
          .execute()
        ()
      }
      def drain(): Unit = {
        val stream = s.readStream
          .format("graft.streaming.DeltaStreamSourceProvider")
          .option("path", tgtDir)
          .option("readChangeFeed", "true")
          .option("startingVersion", "0")
          .option("maxFilesPerTrigger", "1")
          .load()
        val q = stream.writeStream.foreachBatch {
          (batch: DataFrame, batchId: Long) => applyBatch(batch, batchId)
        }.start()
        try q.processAllAvailable() finally q.stop()
      }
      drain() // batch A flows
      // the writer advances the published branch; the pin follows it
      stampRefs(3L)
      graft.delta.DeltaTable.mirrorFromIceberg(s, srcDir, tgtDir)
      drain() // the sync diff (batch B) flows; batch C never does
      graft.delta.DeltaTable.forPath(s, aggDir).toDF
        .orderBy(col("o_orderstatus"))
    }, Some("""
      WITH audit AS (
        SELECT * FROM orders WHERE o_orderkey % 3 IN (0, 1))
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM audit GROUP BY 1 ORDER BY 1""")),

    GQ("stream_iceberg_mirror", (s, d) => {
      import s.implicits._
      val srcDir = graft.delta.DeltaQueries.convertSyncFixture(s, d)
      val aggDir = QueryDefs.scratchDir("graft-mirror-agg").toString
      val agg = graft.delta.DeltaTable.forPath(s, aggDir)
      val aggSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_okey",
          org.apache.spark.sql.types.LongType)))
      val txn0 = agg.deltaLog.startTransaction()
      txn0.updateMetadata(graft.delta.Metadata(schemaString = aggSchema.json))
      txn0.commit(Nil, Op.CreateTable)
      def applyBatch(batch: DataFrame, batchId: Long): Unit = {
        val deltas = batch
          .withColumn("sign",
            when(col("_change_type").isin("insert", "update_postimage"), 1L)
              .otherwise(-1L))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("sign")).as("dn"),
            sum(col("sign") * col("o_orderkey")).as("dsum"))
        graft.delta.DeltaTable.forPath(s, aggDir)
          .merge(deltas.alias("s"), expr("t.o_orderstatus = s.o_orderstatus"))
          .withIdempotentTxn("stream_iceberg_mirror", batchId)
          .whenMatchedDelete(expr("t.n_rows + s.dn = 0"))
          .whenMatchedUpdate(Map(
            "n_rows" -> expr("t.n_rows + s.dn"),
            "sum_okey" -> expr("t.sum_okey + s.dsum")))
          .whenNotMatchedInsert(expr("s.dn <> 0"), Map(
            "o_orderstatus" -> col("s.o_orderstatus"),
            "n_rows" -> col("s.dn"), "sum_okey" -> col("s.dsum")))
          .execute()
        ()
      }
      val stream = s.readStream
        .format("graft.streaming.DeltaStreamSourceProvider")
        .option("path", srcDir)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1") // whole-version CDF batches
        .load()
      val q = stream.writeStream.foreachBatch {
        (batch: DataFrame, batchId: Long) => applyBatch(batch, batchId)
      }.start()
      try q.processAllAvailable() finally q.stop()
      // post-failure re-delivery: replay the ENTIRE change feed as
      // "batch 0" — the idempotent txn (recorded version >= 0) makes it
      // a no-op; if it applied, every group would double and hash-fail
      val src = graft.delta.DeltaTable.forPath(s, srcDir)
      applyBatch(src.tableChanges(0L, src.deltaLog.update().version), 0L)
      graft.delta.DeltaTable.forPath(s, aggDir).toDF
        .orderBy(col("o_orderstatus"))
    }, Some("""
      WITH live AS (
        SELECT * FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 10 <> 3
        UNION ALL
        SELECT * FROM orders WHERE o_orderkey % 4 = 2)
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
      FROM live GROUP BY 1 ORDER BY 1"""))
  )
}
