package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package for wrapping custom Catalyst expressions
  * as user-facing Columns (the classic ExpressionUtils is private[sql]).
  * Same pattern used by public Spark extension libraries.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A cloned session whose SQL conf carries `extraConf`: a write job
    * that must pin a WRITER conf (e.g. parquet.outputTimestampType for
    * UniForm tables) sees it through prepareWrite without mutating the
    * shared session — two concurrent writes can no longer race on a
    * set/restore window of the same key.
    */
  def sessionWithConf(spark: SparkSession,
      extraConf: Map[String, String]): SparkSession = {
    val c = spark.asInstanceOf[classic.SparkSession].cloneSession()
    extraConf.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Run a parquet write of `df` under `outputPath` through
    * [[org.apache.spark.sql.execution.datasources.FileFormatWriter]] with
    * a caller-supplied commit protocol (FileFormatWriter is private[sql] —
    * same access pattern Delta's TransactionalWrite uses). Partition
    * columns get hive-style directories; the writer plans its own sort on
    * them when the incoming plan isn't already clustered.
    */
  def writeParquetDirect(
      spark: SparkSession,
      df: DataFrame,
      outputPath: String,
      partCols: Seq[String],
      committer: org.apache.spark.internal.io.FileCommitProtocol,
      extraHadoopConf: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.execution.datasources.FileFormatWriter
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val cs = spark.asInstanceOf[classic.SparkSession]
    val qe = df.asInstanceOf[classic.Dataset[Row]].queryExecution
    val output = qe.analyzed.output
    val partitionCols = partCols.map(c => output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"partition column $c not in ${output.map(_.name).mkString(", ")}")))
    val hc = spark.sessionState.newHadoopConf()
    extraHadoopConf.foreach { case (k, v) => hc.set(k, v) }
    FileFormatWriter.write(
      cs, qe.executedPlan, new ParquetFileFormat, committer,
      FileFormatWriter.OutputSpec(outputPath, Map.empty, output),
      hc,
      partitionCols, None, Nil, Map.empty)
    ()
  }

  /** Re-wrap a lazily-planned batch DataFrame as a streaming one — what
    * Spark's own file/delta v1 sources do inside Source.getBatch.
    */
  def asStreamingDF(spark: SparkSession, df: DataFrame): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse: re-wrap a micro-batch DataFrame handed to
    * `Sink.addBatch` (planned by IncrementalExecution, so transformations
    * on it would fail with "streaming sources must be executed with
    * writeStream") as a plain batch DataFrame over the same physical RDD.
    * Standard V1 sink pattern.
    */
  def asBatchDF(spark: SparkSession, df: DataFrame): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
