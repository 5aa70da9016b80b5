package graft.delta

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read DELETE (deletion vectors): instead of rewriting every
  * file that contains matching rows, a DELETE writes per-file deletion
  * vectors — (file, row_index) sets under `_deletion_vectors/` — and
  * commits remove+re-add of the SAME data file with a DV descriptor
  * attached. Reads apply the DV as an anti-join on parquet row identity
  * (`_metadata.file_path`/`row_index`); OPTIMIZE materializes the
  * deletes and drops the descriptors.
  *
  * This follows the public Delta deletion-vector design in mechanics
  * (sidecar DV files, remove+re-add commit, cardinality in the
  * descriptor, compaction materialization) with two documented
  * divergences: the descriptor lives in `AddFile.tags` (a dedicated
  * protocol struct requires reader version 3 — this engine gates at v1),
  * and the payload is a parquet file of row indexes rather than a
  * base85 roaring bitmap (the read path is a Spark join, not an
  * in-process bitmap probe).
  *
  * Scale shape: the DV side of the read anti-join is broadcast when the
  * summed descriptor cardinality (known driver-side for free) is small,
  * and falls back to a shuffled anti-join when it is not — never an
  * unconditional broadcast hint. DV volume is bounded by compaction
  * cadence: OPTIMIZE drains it.
  */
object DeletionVectors {

  /** AddFile.tags keys carrying the descriptor. */
  val PathTag = "graft.dv.path"
  val CardinalityTag = "graft.dv.cardinality"

  /** Above this many total deleted rows the read-side anti-join shuffles
    * instead of broadcasting the DV set.
    */
  private val BroadcastRowLimit = 4L * 1000 * 1000

  final case class Descriptor(relPath: String, cardinality: Long)

  def descriptor(f: AddFile): Option[Descriptor] =
    Option(f.tags).flatMap(t => t.get(PathTag).map(p =>
      Descriptor(p, t.getOrElse(CardinalityTag, "0").toLong)))

  def withDescriptor(f: AddFile, d: Descriptor): AddFile =
    f.copy(tags = Option(f.tags).getOrElse(Map.empty) ++
      Map(PathTag -> d.relPath, CardinalityTag -> d.cardinality.toString))

  /** Scheme-collapse for `_metadata.file_path` strings so file:/,
    * file:/// and plain absolute paths compare equal on both sides of
    * the DV join.
    */
  def normFp(c: Column): Column = regexp_replace(c, "^file:/+", "/")

  /** The (fp, ri) rows of the given descriptors. Descriptor paths are
    * table-relative, or absolute URIs on shallow clones of DV'd tables.
    */
  def rowsDF(spark: SparkSession, dataPath: Path, descs: Seq[Descriptor]): Option[DataFrame] =
    if (descs.isEmpty) None
    else Some(spark.read
      .schema("fp string, ri long")
      .parquet(descs.map(d => FileNames.absolutePath(dataPath, d.relPath).toString): _*))

  /** Drop a snapshot's deleted rows from `df` (a scan of its files that
    * can still resolve `_metadata`). No-op when no file carries a DV.
    * With `keepKeys`, the normalized `__fp`/`__ri` row-identity columns
    * stay on the result (and are added even when there is no DV), so
    * callers can keep using row identity after the join — `_metadata`
    * itself turns ambiguous once the DV relation is joined in.
    */
  def filterDeleted(spark: SparkSession, dataPath: Path,
      files: Seq[AddFile], df: DataFrame, keepKeys: Boolean = false): DataFrame = {
    val descs = files.flatMap(descriptor)
    val keyed = df
      .withColumn("__fp", normFp(col("_metadata.file_path")))
      .withColumn("__ri", col("_metadata.row_index"))
    val joined = rowsDF(spark, dataPath, descs) match {
      case None => keyed
      case Some(dv0) =>
        val totalCard = descs.map(_.cardinality).sum
        val dv = dv0.select(normFp(col("fp")).as("__dv_fp"), col("ri").as("__dv_ri"))
        val dvSide = if (totalCard <= BroadcastRowLimit) broadcast(dv) else dv
        keyed.join(dvSide,
          col("__fp") === col("__dv_fp") && col("__ri") === col("__dv_ri"), "left_anti")
    }
    if (keepKeys) joined else joined.drop("__fp", "__ri")
  }

  /** Write one DV parquet per distinct `fp` in `rows` (columns fp, ri)
    * and return the mapping normalized-fp -> descriptor. One partitioned
    * Spark pass, renamed into `_deletion_vectors/`.
    */
  def write(spark: SparkSession, dataPath: Path, rows: DataFrame): Map[String, Descriptor] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = dataPath.getFileSystem(conf)
    val staging = new Path(dataPath, s".staging-dv-${UUID.randomUUID}")
    try {
      rows.select(normFp(col("fp")).as("fp"), col("ri"))
        .distinct()
        .withColumn("fid", md5(col("fp")))
        .repartition(col("fid"))
        .write.partitionBy("fid").parquet(staging.toString)
      val counts = rows.select(normFp(col("fp")).as("fp"), col("ri")).distinct()
        .groupBy("fp").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val dvDir = new Path(dataPath, "_deletion_vectors")
      fs.mkdirs(dvDir)
      val md = java.security.MessageDigest.getInstance("MD5")
      def fidOf(fp: String): String =
        md.digest(fp.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val byFid = counts.map { case (fp, n) => fidOf(fp) -> (fp, n) }
      byFid.map { case (fid, (fp, n)) =>
        val dir = new Path(staging, s"fid=$fid")
        val part = fs.listStatus(dir).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
        require(part.size == 1, s"expected one DV part for $fp, got ${part.size}")
        val rel = s"_deletion_vectors/dv-${UUID.randomUUID}.parquet"
        val dest = new Path(dataPath, rel)
        if (!fs.rename(part.head.getPath, dest))
          throw new java.io.IOException(s"failed to move ${part.head.getPath} -> $dest")
        fp -> Descriptor(rel, n)
      }
    } finally fs.delete(staging, true)
  }
}
