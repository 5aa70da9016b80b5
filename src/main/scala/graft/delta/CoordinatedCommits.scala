package graft.delta

import org.apache.hadoop.fs.Path

/** Coordinated commits (the public Delta `coordinatedCommits` writer
  * table feature; cf. reference `store/s3.go:17`'s multi-writer TODO —
  * this is the protocol-level generalization the spec landed): commit
  * ATOMICITY moves from the filesystem's put-if-absent to an external
  * COMMIT COORDINATOR, so any store — including ones with no atomic
  * create — supports multi-writer tables, and a catalog can become the
  * table's commit authority (the catalogOwned direction).
  *
  * Write protocol per commit:
  *  1. stage the payload at `_delta_log/_commits/<v>.<uuid>.json` — a
  *     unique name, never contended, durable before any claim exists;
  *  2. `coordinator.commit(v, staged)` — the ONE atomic point; losing
  *     throws into the existing optimistic-retry loop;
  *  3. backfill: copy ratified staged commits into the classic
  *     `<v>.json` names (put-if-absent, idempotent — ANY client may do
  *     it, the payload is immutable once ratified), tell the
  *     coordinator, then drop the staged garbage. With
  *     `delta.coordinatedCommits.backfillBatchSize` = 1 (default) this
  *     is synchronous; larger batches amortize the copies and rely on
  *     readers merging unbackfilled commits.
  *
  * Read protocol: snapshot construction ([[DeltaLog]]) asks the table's
  * coordinator for ratified-but-unbackfilled commits above the
  * filesystem head and MERGES their staged files into the replay tail —
  * read-your-write holds across sessions sharing the coordinator
  * without a single backfill copy. Version-addressed auxiliary reads
  * (history, CDF, timestamp travel) serve the classic `<v>.json`
  * sequence, which trails by at most one backfill batch; a lost-race
  * writer completes the winner's backfill before its conflict check for
  * the same reason.
  */
object CoordinatedCommits {
  val FeatureName = "coordinatedCommits"
  val CommitsDirName = "_commits"

  def commitsDir(logPath: Path): Path = new Path(logPath, CommitsDirName)

  // names this session has already warned about, so a read-served table
  // with a foreign coordinator logs once, not once per snapshot build
  private val warnedCoordinators =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The table's coordinator, resolved from
    * `delta.coordinatedCommits.commitCoordinator`:
    *
    *  - `"memory:<name>"` — the in-process registry (tests /
    *    single-JVM multi-session; ratify state does NOT survive a JVM
    *    restart, so `backfillBatchSize > 1` is only safe within one JVM
    *    lifetime here);
    *  - `"fs"` / `"fs:<name>"` — [[FileSystemTableCommitCoordinator]],
    *    the DURABLE coordinator: ratify state lives in the log directory
    *    itself, so two separate drivers (or a restarted one) share the
    *    table;
    *  - anything else is a coordinator this engine cannot talk to. Per
    *    the spec coordinatedCommits is a WRITER feature: on the write
    *    path (`forWrite = true`) that is a hard failure — a filesystem
    *    commit behind the coordinator's back would fork the table — but
    *    on the read path we warn once and serve the filesystem-backfilled
    *    view (possibly trailing by one backfill batch), exactly what a
    *    coordinator-unaware reader is entitled to.
    *
    * None = classic filesystem commits.
    */
  def coordinatorFor(log: DeltaLog, md: Option[Metadata],
      forWrite: Boolean = false): Option[TableCommitCoordinator] =
    md.map(DeltaConfig.CommitCoordinatorName.fromMetadata).flatMap {
      case n if n.startsWith("memory:") =>
        Some(InMemoryTableCommitCoordinator.named(n.stripPrefix("memory:")))
      case n if n == "fs" || n.startsWith("fs:") =>
        Some(new FileSystemTableCommitCoordinator(log.store, log.logPath))
      case n if n.nonEmpty =>
        if (forWrite)
          throw new IllegalArgumentException(
            s"unknown commit coordinator '$n' (supported: memory:<name>, fs[:<name>]); " +
              "refusing to write behind the table's commit authority")
        if (warnedCoordinators.add(n))
          System.err.println(s"WARN graft: table ${log.logPath} names commit " +
            s"coordinator '$n' this engine cannot reach; serving the " +
            "filesystem-backfilled view, which may trail the true head")
        None
      case _ => None
    }

  def tableKey(log: DeltaLog): String = log.logPath.toUri.toString

  private def stagedName(version: Long): String =
    f"$version%020d.${java.util.UUID.randomUUID()}.json"

  /** Steps 1+2(+3 when the batch is due): returns normally when this
    * writer owns `version`; throws [[FileAlreadyExistsException]] into
    * the caller's retry loop when the coordinator already ratified a
    * different commit at `version`.
    */
  def writeCommit(log: DeltaLog, coordinator: TableCommitCoordinator,
      version: Long, lines: Iterator[String], backfillBatchSize: Int): Unit = {
    val staged = new Path(commitsDir(log.logPath), stagedName(version))
    log.store.write(staged, lines, overwrite = true)
    try coordinator.commit(tableKey(log),
      StagedCommit(version, staged.getName, log.clock.nowMillis))
    catch {
      case e: FileAlreadyExistsException =>
        // lost the race: our staged payload is garbage. Backfill is
        // BEST-EFFORT here (the conflict checker reads winners through
        // readCommit, which falls back to staged copies) — a transient
        // backfill failure must not mask the retryable conflict
        try log.store.delete(staged)
        catch { case scala.util.control.NonFatal(_) => () }
        try ensureBackfilled(log, coordinator)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    // the commit is ratified; from here backfill is maintenance and must
    // never fail a committed transaction. Durability of an unbackfilled
    // ratify is the COORDINATOR's property: the fs coordinator persists
    // it in the log directory; the memory coordinator only within this
    // JVM's lifetime (its scaladoc spells out the batchSize > 1 caveat)
    if (version % math.max(1, backfillBatchSize) == 0)
      try ensureBackfilled(log, coordinator)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  /** The ratified staged payload of `version`, when the table has a
    * coordinator that still tracks it (i.e. not yet backfilled).
    */
  def stagedRead(log: DeltaLog, version: Long): Option[Seq[String]] =
    coordinatorFor(log, log.snapshot.metadataOpt).flatMap { c =>
      c.getCommits(tableKey(log)).find(_.version == version).map { sc =>
        try log.store.read(new Path(commitsDir(log.logPath), sc.stagedName))
        catch {
          // TOCTOU with a concurrent backfill: the staged copy was
          // swept because the classic name landed — read that instead
          case _: java.io.FileNotFoundException =>
            log.store.read(FileNames.deltaFile(log.logPath, version))
        }
      }
    }

  /** Ratified staged commits forming a CONTIGUOUS tail right after
    * `fsVersion` — what snapshot construction replays beyond the
    * filesystem head. A gap (entry backfilled+dropped out of order)
    * truncates the tail: replay must never skip a version.
    */
  def pendingAfter(log: DeltaLog, coordinator: TableCommitCoordinator,
      fsVersion: Long): Seq[(Long, String)] = {
    val pend = coordinator.getCommits(tableKey(log)).filter(_.version > fsVersion)
    var next = fsVersion + 1
    pend.takeWhile { sc =>
      val ok = sc.version == next
      if (ok) next += 1
      ok
    }.map(sc => (sc.version, sc.stagedName))
  }

  /** Copies every ratified-but-unbackfilled commit into its classic
    * `<v>.json` name (put-if-absent; a lost copy race means someone else
    * backfilled — fine), acknowledges the coordinator, and deletes the
    * staged files. Any client may run this at any time: payloads are
    * immutable once ratified. Returns how many commits were merged.
    */
  def ensureBackfilled(log: DeltaLog, coordinator: TableCommitCoordinator): Int = {
    val pending = coordinator.getCommits(tableKey(log))
    pending.foreach { c =>
      val staged = new Path(commitsDir(log.logPath), c.stagedName)
      val dest = FileNames.deltaFile(log.logPath, c.version)
      if (!log.store.exists(dest)) {
        val payload =
          try log.store.read(staged)
          catch {
            case _: java.io.FileNotFoundException =>
              // someone backfilled AND swept the staged file between our
              // getCommits and here; the destination must exist now
              require(log.store.exists(dest),
                s"staged commit ${c.stagedName} vanished without a " +
                  s"backfilled $dest — coordinated-commit state corrupt")
              Nil
          }
        if (payload.nonEmpty)
          try log.store.write(dest, payload.iterator)
          catch { case _: FileAlreadyExistsException => () }
      }
      coordinator.backfilled(tableKey(log), c.version)
      try log.store.delete(staged)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    pending.size
  }
}

/** One ratified commit the coordinator knows about but the classic log
  * may not yet contain.
  */
final case class StagedCommit(version: Long, stagedName: String,
    commitTime: Long)

/** The coordinator contract — deliberately tiny, like a catalog's
  * commit endpoint: one atomic ratify, one listing, one GC ack.
  */
trait TableCommitCoordinator extends Serializable {
  /** Atomically ratify `commit` as THE commit for its version; throws
    * [[FileAlreadyExistsException]] when the version is already taken.
    */
  def commit(table: String, commit: StagedCommit): Unit

  /** Ratified-but-unbackfilled commits in version order. */
  def getCommits(table: String): Seq[StagedCommit]

  /** `version` is durable under its classic name; drop its entry. */
  def backfilled(table: String, version: Long): Unit
}

/** Process-wide coordinator registry keyed by name — what a catalog or
  * DynamoDB table is to a real deployment, this is to tests and
  * single-host multi-session use (the same role
  * [[InMemoryCommitCoordinator]] plays for the s3a log store).
  *
  * DURABILITY CAVEAT: ratify state lives only in this JVM. With
  * `backfillBatchSize` = 1 (the default) every commit backfills to its
  * classic `<v>.json` synchronously, so nothing is lost on restart; with
  * batchSize > 1 a ratified-but-unbackfilled commit is unreachable after
  * a JVM restart (the registry — including the re-ratification guard —
  * is empty). Use `"fs"` ([[FileSystemTableCommitCoordinator]]) when
  * deferred backfill must survive the process.
  */
final class InMemoryTableCommitCoordinator extends TableCommitCoordinator {
  private val ratified =
    scala.collection.concurrent.TrieMap.empty[(String, Long), StagedCommit]
  // versions ratified EVER, including backfilled-and-dropped ones: a
  // coordinator that forgot them after backfill would ratify a racing
  // writer's duplicate of an old version and fork the table
  private val maxRatified =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  def commit(table: String, c: StagedCommit): Unit = synchronized {
    if (maxRatified.get(table).exists(_ >= c.version) ||
        ratified.contains((table, c.version)))
      throw new FileAlreadyExistsException(
        s"version ${c.version} of $table (already ratified)")
    ratified.put((table, c.version), c)
    maxRatified.put(table, math.max(maxRatified.getOrElse(table, -1L), c.version))
  }

  def getCommits(table: String): Seq[StagedCommit] =
    ratified.collect { case ((t, _), c) if t == table => c }
      .toSeq.sortBy(_.version)

  def backfilled(table: String, version: Long): Unit =
    ratified.remove((table, version))
}

object InMemoryTableCommitCoordinator {
  private val registry = scala.collection.concurrent.TrieMap
    .empty[String, InMemoryTableCommitCoordinator]
  def named(name: String): InMemoryTableCommitCoordinator =
    registry.getOrElseUpdate(name, new InMemoryTableCommitCoordinator)
}

/** The DURABLE coordinator (`commitCoordinator` = `"fs"`): ratify state
  * lives in the table's own log directory, so independent drivers — and
  * a driver restarted mid-backfill — share one commit authority with no
  * external service. Layout under `_delta_log/_commits/`:
  *
  *  - `<v>.<uuid>.json` — the staged payload (written by [[
  *    CoordinatedCommits.writeCommit]] before ratify; a loser's copy is
  *    garbage and swept);
  *  - `<v>.ratified` — THE atomic point: its put-if-absent creation
  *    (atomic rename on file/hdfs/abfs/gs, the [[ExternalLogStore]]
  *    claim table on s3a — the same primitive classic commits use)
  *    ratifies exactly one staged payload per version. Content is
  *    `stagedName \t commitTime`. The marker is deleted once the classic
  *    `<v>.json` is durable; from then on the classic name itself is the
  *    immutable proof the version is taken.
  *
  * What this buys over classic filesystem commits: ratify is one tiny
  * marker PUT regardless of payload size, so deferred backfill
  * (`backfillBatchSize` > 1) amortizes the big copies while staying
  * crash-safe — any reader reconstructs the ratified tail from the
  * directory alone, cold-start or not. It is also the in-repo reference
  * implementation of the coordinator endpoint contract a catalog would
  * provide.
  *
  * Stateless by design: every instance over the same (store, logPath) is
  * the same coordinator, so cold-registry recovery is a non-problem —
  * `getCommits` IS the recovery procedure.
  */
final class FileSystemTableCommitCoordinator(store: LogStore, logPath: Path)
  extends TableCommitCoordinator {
  import scala.util.control.NonFatal

  private val MarkerSuffix = ".ratified"
  private def markerPath(version: Long): Path =
    new Path(CoordinatedCommits.commitsDir(logPath), f"$version%020d$MarkerSuffix")

  def commit(table: String, c: StagedCommit): Unit = {
    // a classic <v>.json is immutable proof the version is taken (a
    // pre-coordination commit, or an already-backfilled ratify whose
    // marker was GC'd) — this check, not the marker put-if-absent,
    // guards re-ratification of old versions. exists→fail is safe in
    // that direction: classic names are never reused.
    if (store.exists(FileNames.deltaFile(logPath, c.version)))
      throw new FileAlreadyExistsException(
        s"version ${c.version} of $table (already committed)")
    val marker = markerPath(c.version)
    try store.write(marker, Iterator(s"${c.stagedName}\t${c.commitTime}"))
    catch {
      case _: FileAlreadyExistsException =>
        throw new FileAlreadyExistsException(
          s"version ${c.version} of $table (already ratified)")
    }
    // close the residual check-to-ratify window: a competitor's full
    // ratify+backfill+marker-GC of this version may have slipped between
    // the exists check and our marker landing, making our put-if-absent
    // a bogus win over an already-committed version. The classic file
    // appearing now is benign only if it IS our payload (a helper
    // backfilled us already — possible, we are ratified from the PUT
    // above); byte-compare to tell the cases apart.
    if (store.exists(FileNames.deltaFile(logPath, c.version))) {
      val ours =
        try Some(store.read(new Path(CoordinatedCommits.commitsDir(logPath), c.stagedName)))
        catch { case _: java.io.FileNotFoundException =>
          // our staged copy was swept — only a backfill of US does that
          None
        }
      val theirs = store.read(FileNames.deltaFile(logPath, c.version))
      if (ours.exists(_ != theirs)) {
        try store.delete(marker) catch { case NonFatal(_) => () }
        throw new FileAlreadyExistsException(
          s"version ${c.version} of $table (committed concurrently)")
      }
    }
  }

  def getCommits(table: String): Seq[StagedCommit] = {
    val dir = CoordinatedCommits.commitsDir(logPath)
    val entries =
      try store.listFrom(new Path(dir, "0"))
      catch { case _: java.io.FileNotFoundException => Nil }
    entries.iterator.map(_.getPath.getName)
      .filter(_.endsWith(MarkerSuffix))
      .flatMap { name =>
        val v = name.stripSuffix(MarkerSuffix).toLong
        if (store.exists(FileNames.deltaFile(logPath, v))) {
          // backfilled, but the marker outlived a crash between the copy
          // and the GC ack — sweep it lazily; the classic name rules
          try store.delete(new Path(dir, name)) catch { case NonFatal(_) => () }
          None
        } else {
          // a marker read racing a concurrent backfill+GC vanishes —
          // that version just moved to the classic sequence; skip it
          val line =
            try store.read(new Path(dir, name)).headOption
            catch { case _: java.io.FileNotFoundException => None }
          line.map { l =>
            val cut = l.lastIndexOf('\t')
            StagedCommit(v, l.substring(0, cut), l.substring(cut + 1).toLong)
          }
        }
      }
      .toSeq.sortBy(_.version)
  }

  def backfilled(table: String, version: Long): Unit =
    try store.delete(markerPath(version))
    catch { case NonFatal(_) => () }
}
