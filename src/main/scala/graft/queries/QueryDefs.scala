package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine capability exposed through the driver contract.
  *
  * @param fn     builds the result DataFrame for a scale-factor dir
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (None → driver records a weaker rows-only check)
  * @param bench  part of the headline benchmark set
  */
final case class GQ(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Shared helpers keeping Spark results bit-identical to the DuckDB oracle:
  * money stays in integer cents (exact + associative, so aggregation order
  * is irrelevant), floats only appear via identical IEEE expressions.
  */
object QueryDefs {
  /** Read a test table. The synthetic parquet ships as a single row group,
    * so Spark gets one input split no matter what maxPartitionBytes says;
    * when splits < cores, round-robin repartition so per-row compute
    * (hashing, dot products) uses the whole machine. At production scale
    * inputs have >= cores splits and this is a no-op.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** 2-decimal double -> exact integer cents (same rounding both engines). */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** cents sum -> double, formula text mirrored in the oracle SQL. */
  def centsToDouble(sumCents: Column): Column = sumCents.cast("double") / lit(100.0)

  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects by
    * default — read as long via spark.sql.legacy.parquet.nanosAsLong),
    * TIMESTAMP_MICROS with isAdjustedToUTC=0 (read as TIMESTAMP_NTZ), or
    * a UTC-adjusted TIMESTAMP. Normalize all three to a TimestampType
    * column so every downstream query is generation-agnostic. The session
    * timezone is pinned to UTC, so NTZ -> TZ is value-preserving and the
    * DuckDB oracles' `CAST(ts AS TIMESTAMP)` sees identical wall clocks.
    * Nanos stay on integer division (ns epochs exceed 2^53, so double
    * division would corrupt them).
    */
  def withEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTs(table(spark, dir, "events"))
  }

  /** Lowercased word tokens; regexp_extract_all avoids split() empty-string
    * edge cases and is identical in Spark (Java regex) and DuckDB (RE2)
    * for disjoint character classes.
    */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Distinct word 3-gram shingles out of a token array. */
  def shingles3(t: Column): Column =
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>")))

  /** Sequential-fold dot product over two double arrays. The 0.0 init makes
    * the fold bit-identical to DuckDB's init-less list_reduce (0.0 + x == x).
    */
  /** Sequential-fold dot product (bit-identical to DuckDB's list_reduce;
    * see [[graft.functions.DotProductD]]). A custom expression, not the
    * aggregate∘zip_with HOF chain: HOFs interpret per element, and the
    * similarity operators run this over 64-dim vectors N×C / N×Q times.
    */
  def dotD(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProductD(a, b)

  /** Native array cast, not `transform(_, _.cast)`: Cast is codegen'd
    * while transform interprets per element, and every similarity query
    * pays this on each 64-dim vector load. float→double widening is
    * exact, so values are unchanged.
    */
  def toDoubleArr(a: Column): Column = a.cast("array<double>")

  /** Scratch dir for the harness's temporary Delta tables. Honors
    * SPARK_GRAFT_TMP_ROOT so a cluster run can point every temp table at a
    * filesystem the executors share (a driver-local java.io.tmpdir path is
    * only valid in local mode); default behavior is unchanged.
    */
  def scratchDir(prefix: String): java.nio.file.Path =
    sys.env.get("SPARK_GRAFT_TMP_ROOT") match {
      case Some(root) =>
        val p = java.nio.file.Paths.get(root)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.createTempDirectory(p, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }

  /** Eager lineage cut for results consumed more than once (iterative
    * connected components, multi-consumer joins). `localCheckpoint` stores
    * the blocks only on executors — right for local mode, but on a real
    * cluster a lost executor loses blocks AND the truncated lineage, so
    * the job dies. When `spark.graft.checkpointDir` is set (or a
    * SparkContext checkpoint dir is already configured) use a RELIABLE
    * checkpoint on shared storage instead; executor loss then recovers by
    * re-reading the checkpoint files.
    */
  def stableCheckpoint(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      df.sparkSession.conf.getOption("spark.graft.checkpointDir")
        .foreach(sc.setCheckpointDir)
    if (sc.getCheckpointDir.nonEmpty) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }
}
