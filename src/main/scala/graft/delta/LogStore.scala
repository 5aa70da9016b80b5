package graft.delta

import java.io.{BufferedReader, InputStreamReader, IOException}
import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path}

/** Ordered, atomic log storage on Hadoop `FileSystem`.
  *
  * The reference hand-rolls four stores (reference `store/local.go`,
  * `store/s3.go`, `store/azure.go`, `store/gcs.go`); one Hadoop-FS-backed
  * implementation covers file://, hdfs://, s3a://, abfs:// and gs:// —
  * the same abstraction Spark's own sources build on, so credentials,
  * retry and listing behavior come from the cluster config for free.
  *
  * Contract (cf. reference `store/store.go`):
  *  - `write(path, lines, overwrite=false)` is put-if-absent: it fails
  *    with [[FileAlreadyExistsException]] when the destination exists.
  *    Implemented as write-temp + `FileContext.rename(NONE)`, which is
  *    atomic on file:// and hdfs:// (object stores need a coordinating
  *    variant, as in the reference's multi-driver S3 TODO).
  *  - `listFrom(path)` returns sibling entries >= path, sorted by name.
  */
class LogStore(hadoopConf: Configuration) extends Serializable {

  @transient private lazy val fcCache =
    scala.collection.concurrent.TrieMap.empty[String, FileContext]

  private def fs(path: Path): FileSystem = path.getFileSystem(hadoopConf)
  private def fc(path: Path): FileContext =
    fcCache.getOrElseUpdate(
      Option(path.toUri.getScheme).getOrElse("file"),
      FileContext.getFileContext(path.toUri, hadoopConf))

  def read(path: Path): Seq[String] = {
    val in = fs(path).open(path)
    try {
      val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val out = ArrayBuffer.empty[String]
      var line = r.readLine()
      while (line != null) { out += line; line = r.readLine() }
      out.toSeq
    } finally in.close()
  }

  /** Entries in path's directory with name >= path's name, name-sorted. */
  def listFrom(path: Path): Seq[FileStatus] = {
    val dir = path.getParent
    val f = fs(path)
    if (!f.exists(dir)) throw new java.io.FileNotFoundException(dir.toString)
    f.listStatus(dir)
      .filter(_.getPath.getName >= path.getName)
      .sortBy(_.getPath.getName)
      .toSeq
  }

  def exists(path: Path): Boolean = fs(path).exists(path)

  /** Put-if-absent unless overwrite: write temp file, atomic rename. */
  def write(path: Path, lines: Iterator[String], overwrite: Boolean = false): Unit = {
    val f = fs(path)
    f.mkdirs(path.getParent)
    val temp = new Path(path.getParent, s".${path.getName}.${UUID.randomUUID}.tmp")
    val out = f.create(temp, true)
    try {
      lines.foreach { l =>
        out.write(l.getBytes(StandardCharsets.UTF_8))
        out.write('\n')
      }
    } finally out.close()
    try {
      if (overwrite) {
        fc(path).rename(temp, path, Options.Rename.OVERWRITE)
      } else {
        // local fs rename(NONE) has a check-then-rename window; serialize
        // same-JVM writers (matches local[*] reality; HDFS is atomic)
        val doRename = () =>
          try fc(path).rename(temp, path, Options.Rename.NONE)
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException =>
              throw new FileAlreadyExistsException(path.toString)
            case e: IOException if f.exists(path) =>
              throw new FileAlreadyExistsException(path.toString)
          }
        if (Option(path.toUri.getScheme).forall(_ == "file"))
          LogStore.localFsLock.synchronized {
            if (f.exists(path)) throw new FileAlreadyExistsException(path.toString)
            doRename()
          }
        else doRename()
      }
    } finally {
      if (f.exists(temp)) f.delete(temp, false)
    }
  }

  def delete(path: Path, recursive: Boolean = false): Boolean =
    fs(path).delete(path, recursive)
}

object LogStore {
  private[delta] val localFsLock = new Object
}

class FileAlreadyExistsException(path: String)
  extends IOException(s"target file already exists: $path")
