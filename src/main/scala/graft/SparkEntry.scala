package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GQ, Relational}
import graft.llm.{Corpus, Dedup, Multimodal, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  /** Headline additions beyond the per-file `bench = true` flags: the
    * Delta DML/DV/checkpoint/incremental paths, one stream drain, the
    * dedup clustering loop and the trained-ANN loop — so a perf
    * regression in the transaction/streaming layer shows up in
    * BENCH_r{N}, not only in correctness.
    */
  private val extraBench = Set(
    "delta_merge", "delta_dv_update", "delta_checkpoint_v2",
    "delta_incremental_agg", "stream_window_agg", "dedup_cluster",
    "ann_ivf_trained", "hybrid_retrieval",
    // round-13 additions: the byte-level span pipeline and the one-pass
    // covariance aggregate are the newest heavy shapes — trend them
    "dedup_substr", "embed_covariance",
    // round-18: the amortized probe-over-maintained-index shape, so the
    // production ANN number (no in-query build) trends alongside
    // ann_ivf_trained's build-included number
    "ann_index_admit",
    // round-19: the UniForm incremental-generation shape — one append +
    // retract pair over seeded manifest history; O(live-files) drift in
    // the metadata layer shows up here, not first in a scale sweep
    "delta_uniform_incremental")

  /** Every implemented operator, in SURVEY §2 order. */
  def registry: Seq[GQ] = {
    val all =
      (Relational.queries ++ TextOps.queries ++ Corpus.queries ++ Dedup.queries ++
        Similarity.queries ++ Multimodal.queries ++ graft.delta.DeltaQueries.queries ++
        graft.streaming.Streams.queries)
        .map(q => if (extraBench(q.name)) q.copy(bench = true) else q)
    // `queries`/`oracleSql` are built with .toMap, where a duplicate key
    // silently drops the earlier operator from the correctness gate.
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names in registry: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap

  /** Headline subset for Bench. */
  def benchQueries: Seq[String] = registry.filter(_.bench).map(_.name)
}
