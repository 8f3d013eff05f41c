package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
import org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager

/** Checkpoint file manager for LOCAL checkpoint directories that routes
  * the per-file hot path (temp-file create, rename-into-place, mkdirs)
  * through java.nio instead of Hadoop's RawLocalFileSystem.
  *
  * Why (guide §1: measure first — r14 jstack profile of the streaming
  * keys): without libhadoop, every RawLocalFileSystem create() and
  * mkdirs() forks a `chmod` subprocess to apply permissions, and the
  * default checksummed local FS doubles each create with a .crc sidecar.
  * A stateful streaming micro-batch commits one delta file per state
  * store partition per operator (a stream-stream join keeps FOUR stores
  * per partition) plus the offset/commit log entries — at 32 shuffle
  * partitions that is hundreds of file creates per batch, each paying a
  * ~5-10 ms fork. java.nio creates the file with the process umask
  * directly — same resulting permissions, no fork, no sidecar.
  *
  * Scale honesty: this targets the LOCAL filesystem only (the deployment
  * this sandbox runs — and the common dev/test case). Any non-`file:`
  * checkpoint URI falls through to the inherited Hadoop-FS behavior, so
  * a cluster run against HDFS/S3 is byte-for-byte the stock manager.
  * Rename semantics mirror the parent exactly (atomic move; loud
  * `FileAlreadyExistsException` when `overwriteIfPossible = false` and
  * the destination exists — the signal HDFSMetadataLog uses to detect a
  * concurrently-committed batch).
  */
class NioCheckpointFileManager(root: HPath, conf: Configuration)
    extends FileSystemBasedCheckpointFileManager(root, conf) {

  private def localNio(p: HPath): Option[java.nio.file.Path] = {
    val u = p.toUri
    if (u.getScheme == null || u.getScheme == "file") Some(Paths.get(u.getPath))
    else None
  }

  override def createTempFile(path: HPath): FSDataOutputStream =
    localNio(path) match {
      case Some(np) =>
        Option(np.getParent).foreach(Files.createDirectories(_))
        new FSDataOutputStream(
          new java.io.BufferedOutputStream(Files.newOutputStream(np), 1 << 16), null)
      case None => super.createTempFile(path)
    }

  override def renameTempFile(srcPath: HPath, dstPath: HPath,
      overwriteIfPossible: Boolean): Unit =
    (localNio(srcPath), localNio(dstPath)) match {
      case (Some(s), Some(d)) =>
        if (overwriteIfPossible)
          Files.move(s, d, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        else {
          // no-overwrite publication must be ATOMIC, not check-then-move
          // (rename(2) silently replaces): link(2) fails EEXIST in the
          // same atomic step. A destination already present means another
          // writer committed this batch first — surface the Hadoop
          // exception type callers (HDFSMetadataLog and friends) catch
          // for that signal, and drop our temp body either way.
          try {
            Files.createLink(d, s)
            Files.deleteIfExists(s)
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(s)
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                s"rename destination $dstPath already exists")
          }
        }
      case _ => super.renameTempFile(srcPath, dstPath, overwriteIfPossible)
    }

  override def mkdirs(path: HPath): Unit =
    localNio(path) match {
      case Some(np) => Files.createDirectories(np); ()
      case None => super.mkdirs(path)
    }
}
