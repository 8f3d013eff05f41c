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

  /** All live staging trees. ONE shutdown hook drains this registry —
    * a hook per fresh() call (ADVICE round 4) accumulates one thread
    * object per streaming-query run for the life of the JVM. */
  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val hookOnce: Unit = {
    sys.addShutdownHook(live.forEach(p => deleteTree(p)))
    ()
  }

  /** Stable per-JVM staging dir for `key`; created lazily, hook-deleted. */
  def dir(key: String): String =
    stable.getOrElseUpdate(key, fresh(key)).toString

  /** New staging dir every call; hook-deleted at JVM exit unless
    * [[release]]d eagerly by its consumer first. */
  def fresh(prefix: String): Path = {
    hookOnce
    val p = Files.createTempDirectory(s"graft_${prefix}_")
    live.add(p)
    p
  }

  /** Eagerly delete a fresh() tree whose consumer has finished (e.g. a
    * completed streaming query whose results now live in the memory
    * sink), instead of holding every per-run tree until JVM exit. */
  def release(p: Path): Unit = {
    live.remove(p)
    deleteTree(p)
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
