package graft.testutil

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-memory Hadoop FileSystem with OBJECT-STORE (S3) semantics, for
  * exercising the transaction-log protocol against the storage model the
  * reference integration-tests with live emulators
  * (cf. reference `docker-compose.yaml`, `store/s3_test.go:1`) — which a
  * zero-egress sandbox cannot run. The semantics modeled here are the
  * ones the log protocol's correctness actually depends on:
  *
  *  - '''Flat namespace''': state is a key → bytes map; "directories" are
  *    virtual, derived from key prefixes. `mkdirs` is a no-op, a dir
  *    "exists" iff some key lives under it, and listing groups flat keys
  *    by their next path segment (prefix + delimiter listing).
  *  - '''PUT visibility''': an object appears ATOMICALLY at stream
  *    close, never partially — readers see the old state or the complete
  *    new object (S3 PUT).
  *  - '''No atomic create-if-absent''': `create(overwrite = false)`
  *    checks existence at create() time and still blind-PUTs at close()
  *    — the S3A check-then-put race window. Two writers can both pass
  *    the check; last close wins. THIS is why HadoopLogStore's
  *    rename-based mutual exclusion is unsound on s3a and LogStore
  *    refuses the scheme without an external coordinator.
  *  - '''Non-atomic rename''': copy-then-delete per object, in key
  *    order. A concurrently-listing reader can observe both (or
  *    neither-complete) states; nothing in the log protocol may rely on
  *    rename atomicity here.
  *  - '''Consistent listing''': list-after-write sees every completed
  *    PUT (post-2020 S3 strong consistency).
  *
  * Register via `fs.s3a.impl` so code paths keyed on the REAL scheme
  * (LogStore.forTable's s3/s3a/s3n dispatch) are exercised verbatim.
  * State is process-global and keyed by bucket+key, so distinct
  * FileSystem instances (Spark's FS cache, multiple "drivers") share one
  * store, as they would one S3 endpoint. `ObjectStoreFileSystem.clear()`
  * resets between tests.
  */
class ObjectStoreFileSystem extends FileSystem {
  import ObjectStoreFileSystem._

  private var uri: URI = _
  private var workingDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    workingDir = new Path(uri.toString + "/")
  }

  override def getUri: URI = uri
  override def getScheme: String = uri.getScheme
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }

  /** bucket-qualified flat key for a path ("" = bucket root). */
  private def key(p: Path): String = {
    val q = makeQualified(p)
    s"${q.toUri.getAuthority}${q.toUri.getPath}".stripSuffix("/")
  }

  private def status(k: String, p: Path): FileStatus =
    blobs.get(k) match {
      case Some(b) =>
        new FileStatus(b.bytes.length.toLong, false, 1, BlockSize, b.mtime, makeQualified(p))
      case None =>
        val prefix = k + "/"
        if (k.indexOf('/') < 0 /* bucket root */ ||
            blobs.keysIterator.exists(_.startsWith(prefix)))
          new FileStatus(0, true, 1, BlockSize, 0, makeQualified(p))
        else throw new FileNotFoundException(p.toString)
    }

  override def getFileStatus(p: Path): FileStatus = status(key(p), p)

  override def exists(p: Path): Boolean =
    try { getFileStatus(p); true } catch { case _: FileNotFoundException => false }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = key(p)
    if (blobs.contains(k)) return Array(status(k, p))
    val prefix = k + "/"
    // ONE atomic snapshot of (key -> blob): a real S3 LIST returns keys
    // WITH their metadata in the same response, so an object deleted by
    // a concurrent writer mid-iteration silently drops out of the page —
    // it never 404s the listing. Enumerate-keys-then-stat-each would.
    val snap = blobs.toMap
    val direct = snap.collect {
      case (full, b) if full.startsWith(prefix) && !full.substring(prefix.length).contains('/') =>
        val name = full.substring(prefix.length)
        name -> new FileStatus(b.bytes.length.toLong, false, 1, BlockSize,
          b.mtime, makeQualified(new Path(p, name)))
    }
    val dirs = snap.keysIterator.collect {
      case full if full.startsWith(prefix) && full.substring(prefix.length).contains('/') =>
        val rest = full.substring(prefix.length)
        rest.substring(0, rest.indexOf('/'))
    }.toSet -- direct.keySet
    if (direct.isEmpty && dirs.isEmpty && k.indexOf('/') >= 0)
      throw new FileNotFoundException(p.toString)
    (direct.toSeq.map(_._2) ++ dirs.toSeq.map(c =>
      new FileStatus(0, true, 1, BlockSize, 0, makeQualified(new Path(p, c)))))
      .sortBy(_.getPath.getName).toArray
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val b = blobs.getOrElse(key(p), throw new FileNotFoundException(p.toString))
    new FSDataInputStream(new SeekableBytes(b.bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    // S3A model: existence CHECK here, blind PUT at close — deliberately
    // NOT atomic create-if-absent; racing writers both pass, last wins.
    if (!overwrite && blobs.contains(k))
      throw new FileAlreadyExistsException(p.toString)
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        super.close()
        blobs.put(k, Blob(buf.toByteArray, System.currentTimeMillis()))
      }
    }, null)
  }

  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  /** Copy-then-delete per object — observably non-atomic, like S3A. */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    var dk = key(dst)
    val srcIsFile = blobs.contains(sk)
    val dstStatus = try Some(getFileStatus(dst)) catch { case _: FileNotFoundException => None }
    dstStatus match {
      case Some(s) if s.isDirectory => dk = dk + "/" + src.getName // move INTO dir
      case Some(_) => return false // dest file exists
      case None => ()
    }
    if (srcIsFile) {
      blobs.get(sk).foreach(b => blobs.put(dk, b)) // copy (visible now)
      blobs.remove(sk) // then delete
      true
    } else {
      val prefix = sk + "/"
      val under = blobs.keysIterator.filter(_.startsWith(prefix)).toSeq.sorted
      if (under.isEmpty && !exists(src)) return false
      under.foreach { k =>
        blobs.get(k).foreach(b => blobs.put(dk + "/" + k.substring(prefix.length), b))
        blobs.remove(k)
      }
      true
    }
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    if (blobs.remove(k).isDefined) return true
    val prefix = k + "/"
    val under = blobs.keysIterator.filter(_.startsWith(prefix)).toSeq
    if (under.isEmpty) false
    else if (!recursive) throw new IOException(s"non-empty directory: $p")
    else { under.foreach(blobs.remove); true }
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = true // dirs are virtual
}

object ObjectStoreFileSystem {
  final case class Blob(bytes: Array[Byte], mtime: Long)
  private val BlockSize = 32L * 1024 * 1024

  /** Process-global blob store: one "endpoint" shared by every FS
    * instance, as distinct drivers share one S3.
    */
  val blobs: TrieMap[String, Blob] = TrieMap.empty

  def clear(): Unit = blobs.clear()

  private final class SeekableBytes(bytes: Array[Byte])
    extends ByteArrayInputStream(bytes) with Seekable with PositionedReadable {
    def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p of ${bytes.length}")
      pos = p.toInt
    }
    def getPos: Long = pos.toLong
    def seekToNewSource(targetPos: Long): Boolean = false
    def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException(s"readFully past end: $position+$length of ${bytes.length}")
    }
    def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
