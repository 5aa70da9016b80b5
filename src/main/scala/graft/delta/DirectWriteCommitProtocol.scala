package graft.delta

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage

/** Direct-write commit protocol for [[DeltaTable.writeFiles]]: tasks write
  * UUID-named files STRAIGHT into the table directory — no `_temporary`
  * staging, no job-commit rename pass. Atomicity comes from the Delta log,
  * not the filesystem: a file is invisible until its AddFile is committed,
  * so files from failed/aborted attempts are simply never referenced (and
  * VACUUM sweeps them). This is the object-store-safe write shape — on
  * S3-style stores a rename is a copy, and the per-file driver-side rename
  * loop it replaces was the commit bottleneck at ~10^5 output files.
  *
  * Task-commit coordination (Spark's OutputCommitCoordinator) guarantees
  * only one attempt per task contributes its file list, so speculative
  * duplicates are never double-counted.
  */
final class DirectWriteCommitProtocol(jobId: String, path: String)
    extends FileCommitProtocol with Serializable {

  // executor-side, per task attempt
  @transient private var taskFiles: ArrayBuffer[String] = _
  // driver-side, populated by commitJob
  @transient private lazy val jobFiles = ArrayBuffer[String]()

  /** Table-relative paths of every file the committed job wrote. */
  def addedFiles(): Seq[String] = jobFiles.toSeq

  override def setupJob(jobContext: JobContext): Unit = ()

  override def commitJob(
      jobContext: JobContext, taskCommits: Seq[TaskCommitMessage]): Unit =
    jobFiles ++= taskCommits.flatMap(_.obj.asInstanceOf[Seq[String]])

  override def abortJob(jobContext: JobContext): Unit = ()

  override def setupTask(taskContext: TaskAttemptContext): Unit =
    taskFiles = ArrayBuffer.empty[String]

  override def newTaskTempFile(
      taskContext: TaskAttemptContext, dir: Option[String], ext: String): String =
    newTaskTempFile(taskContext, dir, FileNameSpec("", ext))

  override def newTaskTempFile(
      taskContext: TaskAttemptContext, dir: Option[String],
      spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    val name =
      f"${spec.prefix}part-$split%05d-${java.util.UUID.randomUUID}${spec.suffix}"
    val rel = dir.map(d => s"$d/$name").getOrElse(name)
    taskFiles += rel
    new Path(new Path(path), rel).toString
  }

  override def newTaskTempFileAbsPath(
      taskContext: TaskAttemptContext, absoluteDir: String, ext: String): String =
    throw new UnsupportedOperationException(
      "graft delta writes never target absolute partition locations")

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage =
    new TaskCommitMessage(taskFiles.toSeq)

  override def abortTask(taskContext: TaskAttemptContext): Unit = {
    // best-effort: even if the delete loses a race, the files are never
    // referenced by any commit and VACUUM removes them
    val root = new Path(path)
    val fs = root.getFileSystem(taskContext.getConfiguration)
    taskFiles.foreach { f =>
      try fs.delete(new Path(root, f), false)
      catch { case _: Exception => () }
    }
  }
}
