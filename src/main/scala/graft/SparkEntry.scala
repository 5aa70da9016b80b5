package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GQ, Relational}
import graft.llm.{Corpus, Dedup, Multimodal, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  /** Every implemented operator, in SURVEY §2 order. */
  def registry: Seq[GQ] =
    Relational.queries ++ TextOps.queries ++ Corpus.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ graft.delta.DeltaQueries.queries ++
      graft.streaming.Streams.queries

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
