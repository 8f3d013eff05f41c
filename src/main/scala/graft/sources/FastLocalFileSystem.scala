package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Inner raw local FS with the fork-per-create removed: with no libhadoop
  * native library, RawLocalFileSystem applies file and directory
  * permissions by FORKING a `chmod` subprocess (Shell.execCommand) —
  * ~5–10 ms per created file/dir (r14 jstack: the top RUNNABLE frames of
  * the parquet/bucketed-write and streaming-state keys). The JVM already
  * creates files with the process umask applied, so the explicit chmod to
  * the very same default mode is a no-op bought at fork price. */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: HPath, permission: FsPermission): Unit = ()
}

/** Local filesystem for the `file:` scheme without the two per-file
  * overheads Hadoop's default pays on every create:
  *
  * 1. the `chmod` subprocess fork (see [[NoForkRawLocalFileSystem]]);
  * 2. the .crc sidecar file per create plus the checksum pass per read —
  *    disabled via the ChecksumFileSystem switches at initialize time
  *    (local disks already carry page-level integrity; the same
  *    trade-off `fs.setWriteChecksum(false)` deployments make for
  *    scratch space).
  *
  * MUST extend LocalFileSystem (not RawLocalFileSystem directly):
  * `FileSystem.getLocal`/`copyFromLocalFile` cast the `file:` filesystem
  * to LocalFileSystem (RocksDB state checkpoint upload does exactly
  * that), and only the Checksum wrapper implements `getScheme`.
  *
  * Wired via `spark.hadoop.fs.file.impl` in the entry mains (and mirrored
  * into GraftSink's shared Configuration so the JVM-wide FileSystem cache
  * resolves `file:` identically no matter which side touches it first).
  * Cluster deployments (hdfs:/s3:/abfs: URIs) are untouched — this class
  * only ever serves the `file:` scheme.
  */
class FastLocalFileSystem extends LocalFileSystem(new NoForkRawLocalFileSystem) {
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
