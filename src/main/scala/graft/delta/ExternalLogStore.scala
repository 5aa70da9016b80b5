package graft.delta

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/** One row of the external commit table: the claim on `fileName` within
  * `logDir`, plus where the payload was pre-written. `complete = false`
  * means the claim holder may have died between claiming the version and
  * copying the payload into place — any reader/writer can (and must)
  * finish the copy, because the payload is immutable once claimed.
  */
final case class ExternalCommitEntry(
    logDir: String,
    fileName: String,
    tempPath: String,
    complete: Boolean,
    commitTime: Long)

final class EntryAlreadyExistsException(key: String)
  extends RuntimeException(s"commit entry already exists: $key")

/** Atomic put-if-absent service backing [[ExternalLogStore]] — the role
  * DynamoDB plays in the public multi-cluster S3 commit design the
  * reference points at (cf. reference `store/s3.go:17` "TODO: support
  * multi-drivers writes"). The contract is tiny on purpose: one
  * conditional insert, one unconditional update, two reads.
  */
trait CommitCoordinator extends Serializable {

  /** Insert; throws [[EntryAlreadyExistsException]] when an entry with the
    * same (logDir, fileName) exists. This is THE mutual-exclusion point.
    */
  def putIfAbsent(entry: ExternalCommitEntry): Unit

  /** Overwrite an existing entry (used to flip `complete`). */
  def update(entry: ExternalCommitEntry): Unit

  def get(logDir: String, fileName: String): Option[ExternalCommitEntry]

  /** Entry with the lexicographically greatest fileName for the log dir —
    * the only one that can be incomplete, since claims are sequential.
    */
  def latest(logDir: String): Option[ExternalCommitEntry]
}

/** Process-wide coordinator keyed by name: what a DynamoDB table is to
  * the real deployment, this is to tests and single-host multi-session
  * use. Distinct [[ExternalLogStore]] instances (one per "driver") that
  * share a coordinator name race through the same conditional-insert
  * path a remote coordinator would provide.
  */
final class InMemoryCommitCoordinator extends CommitCoordinator {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(String, String), ExternalCommitEntry]
  private val lock = new Object

  def putIfAbsent(entry: ExternalCommitEntry): Unit =
    if (entries.putIfAbsent((entry.logDir, entry.fileName), entry).isDefined)
      throw new EntryAlreadyExistsException(s"${entry.logDir}/${entry.fileName}")

  def update(entry: ExternalCommitEntry): Unit =
    entries.update((entry.logDir, entry.fileName), entry)

  def get(logDir: String, fileName: String): Option[ExternalCommitEntry] =
    entries.get((logDir, fileName))

  def latest(logDir: String): Option[ExternalCommitEntry] = {
    val forDir = entries.collect { case ((d, _), e) if d == logDir => e }
    if (forDir.isEmpty) None else Some(forDir.maxBy(_.fileName))
  }
}

object InMemoryCommitCoordinator {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, InMemoryCommitCoordinator]
  def named(name: String): InMemoryCommitCoordinator =
    registry.getOrElseUpdate(name, new InMemoryCommitCoordinator)
}

/** Log store for object stores WITHOUT atomic create-if-absent (s3a://):
  * mutual exclusion comes from [[CommitCoordinator.putIfAbsent]], never
  * from the filesystem. Write protocol (the public multi-cluster S3
  * commit design; cf. reference `store/base.go` + `store/s3.go`):
  *
  *  1. recover: if the latest coordinator entry for this log is
  *     incomplete, finish its copy (the claim holder may have died).
  *  2. pre-write the payload to a unique temp object — never contended.
  *  3. `putIfAbsent(fileName)` claims the version; losing throws
  *     [[FileAlreadyExistsException]] into the commit retry loop.
  *  4. copy temp -> fileName (we own the name; plain overwrite PUT).
  *  5. mark the entry complete.
  *
  * A crash after 3 leaves an incomplete entry whose payload any other
  * store instance completes in step 1 before reading or writing — the
  * commit is durable the moment the claim lands. Reads route through
  * [[recover]] so listings include claimed-but-uncopied versions.
  */
class ExternalLogStore(hadoopConf: Configuration, coordinator: CommitCoordinator)
  extends HadoopLogStore(hadoopConf) {

  override def read(path: Path): Seq[String] = {
    recover(path.getParent)
    super.read(path)
  }

  override def listFrom(path: Path): Seq[FileStatus] = {
    recover(path.getParent)
    super.listFrom(path)
  }

  override def exists(path: Path): Boolean = {
    recover(path.getParent)
    super.exists(path)
  }

  override def write(path: Path, lines: Iterator[String],
      overwrite: Boolean = false): Unit = {
    if (overwrite) {
      // overwrite writes (e.g. _last_checkpoint) are idempotent PUTs;
      // no coordination needed
      writeDirect(path, lines)
      return
    }
    val dir = path.getParent
    val dirKey = logKey(dir)
    recover(dir)
    // guard pre-coordinator history: a file that exists on the FS without
    // a coordinator entry must never be reclaimed and clobbered
    if (super.exists(path) && coordinator.get(dirKey, path.getName).isEmpty)
      throw new FileAlreadyExistsException(path.toString)
    val tempName = s".tmp-${UUID.randomUUID}-${path.getName}"
    val temp = new Path(dir, tempName)
    writeDirect(temp, lines)
    val entry = ExternalCommitEntry(dirKey, path.getName, tempName,
      complete = false, commitTime = System.currentTimeMillis())
    try coordinator.putIfAbsent(entry)
    catch {
      case _: EntryAlreadyExistsException =>
        fs(temp).delete(temp, false)
        throw new FileAlreadyExistsException(path.toString)
    }
    copyAndComplete(dir, entry)
  }

  /** Finish any claimed-but-uncopied commit. Only the latest entry can be
    * incomplete (claims are sequential: a writer must list — and thus
    * recover — before claiming the next version).
    */
  private def recover(dir: Path): Unit =
    coordinator.latest(logKey(dir)).filterNot(_.complete)
      .foreach(copyAndComplete(dir, _))

  private def copyAndComplete(dir: Path, entry: ExternalCommitEntry): Unit = {
    val temp = new Path(dir, entry.tempPath)
    val dest = new Path(dir, entry.fileName)
    // idempotent: concurrent recoveries copy identical bytes to the same
    // name; object-store PUT (and local full-file write) is last-wins with
    // equal content. A concurrent recoverer may delete temp after landing
    // dest — losing the temp is fine exactly when dest is already there.
    if (!super.exists(dest)) {
      try writeDirect(dest, super.read(temp).iterator)
      catch {
        case _: java.io.FileNotFoundException if super.exists(dest) => ()
      }
    }
    coordinator.update(entry.copy(complete = true))
    // temp is kept briefly recoverable on real deployments via TTL; here
    // delete once the destination is durable
    fs(temp).delete(temp, false)
  }

  /** Plain full-object write, bypassing HadoopLogStore's rename dance —
    * the object-store PUT model (atomic visibility per object).
    */
  private def writeDirect(path: Path, lines: Iterator[String]): Unit = {
    val f = fs(path)
    f.mkdirs(path.getParent)
    val out = f.create(path, true)
    try lines.foreach { l =>
      out.write(l.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.write('\n')
    } finally out.close()
  }

  private def logKey(dir: Path): String =
    fs(dir).makeQualified(dir).toString
}
