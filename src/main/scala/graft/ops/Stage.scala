package graft.ops

import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes
import scala.collection.concurrent.TrieMap

/** Staging directories for queries that materialize an intermediate
  * layout (csv/json/orc stages, partitioned sinks, bucketed warehouses,
  * streaming ingest dirs).
  *
  * Two properties (ADVICE round 3):
  *  - `dir(key)` is STABLE within the JVM: the same key always maps to
  *    the same directory, so repeated invocations (Bench runs every
  *    query twice; Verify + specs share one session) overwrite in place
  *    instead of leaking one orphan dir per run.
  *  - everything is ACTUALLY deleted at JVM exit: `File.deleteOnExit`
  *    is a no-op on non-empty directories; here each tree is removed by
  *    a recursive-delete shutdown hook.
  *
  * Queries whose semantics forbid reuse (streaming file sources would
  * re-ingest stale tranches from a prior run at a different SF) use
  * `fresh(prefix)` — per-run dir, still hook-deleted.
  */
object Stage {
  private val stable = TrieMap.empty[String, Path]

  /** Stable per-JVM staging dir for `key`; created lazily, hook-deleted. */
  def dir(key: String): String =
    stable.getOrElseUpdate(key, fresh(key)).toString

  /** New staging dir every call; hook-deleted at JVM exit. */
  def fresh(prefix: String): Path = {
    val p = Files.createTempDirectory(s"graft_${prefix}_")
    sys.addShutdownHook(deleteTree(p))
    p
  }

  private def deleteTree(root: Path): Unit =
    try Files.walkFileTree(root, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    }) catch { case _: java.io.IOException => () }
}
