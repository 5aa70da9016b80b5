package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateful operators must run unchanged on the RocksDB state store
  * — the provider a real cluster uses at scale, where the default
  * HDFS-backed in-memory provider caps state at executor heap. This pins
  * the engine's 100 TB configuration: same queries, same results, state
  * spilled to local RocksDB instances.
  */
class RocksDBStateSuite extends AnyFunSuite {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Runs `body` with the RocksDB provider active, restoring the
    * session's previous provider afterwards (the JVM-shared session must
    * not leak the override into other suites).
    */
  private def withRocksDB[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("windowed aggregation with watermark runs on RocksDB state") {
    withRocksDB {
      assert(spark.conf.get(ProviderKey) == RocksDB)
      val n = graft.SparkEntry.queries("stream_window_agg")(spark, sfDir).count()
      assert(n > 0)
      // same cardinality as the batch equivalent, provider-independent
      val batch = graft.queries.QueryDefs.events(spark, sfDir)
        .groupBy(date_trunc("hour", col("ts")), col("event_type")).count().count()
      assert(n == batch)
    }
  }

  test("flatMapGroupsWithState (custom state) runs on RocksDB state") {
    withRocksDB {
      val rows = graft.SparkEntry.queries("stream_user_state")(spark, sfDir).collect()
      assert(rows.nonEmpty)
      val exp = graft.queries.QueryDefs.events(spark, sfDir)
        .groupBy(col("user_id")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { r =>
        assert(exp(r.getLong(0)) == r.getLong(1),
          s"user ${r.getLong(0)}: rocksdb ${r.getLong(1)} vs batch ${exp(r.getLong(0))}")
      }
    }
  }

  test("stream-stream outer join state runs on RocksDB") {
    withRocksDB {
      assert(graft.SparkEntry.queries("stream_outer_join")(spark, sfDir).count() > 0)
    }
  }
}
