package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-13 surfaces: the commit-protocol hardening (atomic local slot
  * claims, guarded fix-forward pointer moves, scan-time base capture
  * for copy-on-write replaces) plus this round's catalog/procedure
  * additions.
  */
class Round13Spec extends AnyFunSuite with Matchers with SharedSpark {

  import graft.sources.GraftSink

  private val cat = "g13"
  private def ensureCatalog(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      graft.ops.Stage.dir("g13_warehouse"))
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
  }
  private def tablePath(name: String): String =
    s"${graft.ops.Stage.dir("g13_warehouse")}/ns/$name"

  private def freshSink(prefix: String): String =
    graft.ops.Stage.fresh(prefix).toString + "/t"

  // ------------------------------------------------------------------
  // Commit protocol: atomic claims under real contention
  // ------------------------------------------------------------------

  test("claim stress: N racing committers never share a slot and never lose an entry") {
    // the round-12 flake's root cause: RawLocalFileSystem's
    // create(overwrite=false) is exists-then-create, so two in-JVM
    // writers could both "claim" one slot and one body silently
    // truncated the other. The claim now goes through O_EXCL on the
    // file: scheme; this stress run (6 threads x 4 commits, no Spark
    // jobs, so the claims collide hard) must end with a gap-free chain
    // of exactly 1 + 24 versions and every writer's entries present.
    val p = freshSink("occ13stress")
    val f = GraftSink.fs(p)
    GraftSink.writeManifest(p, GraftSink.Manifest("k BIGINT", Nil)) // v1
    val threads = 6
    val perThread = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val tasks = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            start.await()
            (0 until perThread).foreach { i =>
              val name = s"w$t-$i.tsv"
              val out = f.create(new org.apache.hadoop.fs.Path(p, name), true)
              try out.write("1\n".getBytes("UTF-8")) finally out.close()
              GraftSink.commitManifest(p, None, maxAttempts = 64) { () =>
                val prior = GraftSink.mainHead(p).get
                prior.copy(files = prior.files :+
                  GraftSink.entry(name, Nil, None, Some(1L)), ts = None, ref = None)
              }
            }
          } catch { case e: Throwable => failures.add(e) }
        })
      }
      start.countDown()
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    failures.forEach(e => fail(s"racing committer threw: $e"))
    // gap-free chain, one slot per commit
    GraftSink.listVersions(p) shouldBe (1 to 1 + threads * perThread)
    // no lost updates: the head carries every writer's every entry
    val names = GraftSink.mainHead(p).get.files.map(GraftSink.entryName).toSet
    val expected = (for (t <- 0 until threads; i <- 0 until perThread)
      yield s"w$t-$i.tsv").toSet
    names shouldBe expected
    // the PLAIN POINTER agrees with the chain head (fix-forward repair:
    // no stalled winner left it regressed)
    GraftSink.readManifest(p).get.files.map(GraftSink.entryName).toSet shouldBe expected
    // ts stamps strictly monotone across all the races
    val stamps = GraftSink.listVersions(p)
      .map(v => GraftSink.readManifest(p, Some(v)).get.ts.get)
    stamps shouldBe stamps.sorted
    stamps.distinct.size shouldBe stamps.size
  }

  test("pointer repair: a stalled winner cannot regress the main pointer over a newer commit") {
    // deterministic replay of the regression interleave: A claims v2 by
    // writing the slot file DIRECTLY (simulating a winner that stalled
    // before its pointer move), B then commits v3 through the public
    // API (pointer -> v3). A's advance step is then replayed via one
    // more public commit; at no point may the pointer serve v2.
    val p = freshSink("occ13ptr")
    GraftSink.writeManifest(p, GraftSink.Manifest("k BIGINT", Nil)) // v1
    val v1ts = GraftSink.readManifest(p).get.ts.get
    // A: slot v2 claimed (chain-visible), pointer NOT moved — the stall
    val f = GraftSink.fs(p)
    val aBody = s"k BIGINT\tts:${v1ts + 1}\tref:main\n" +
      GraftSink.entry("a.tsv", Nil, None, Some(1L))
    val out = f.create(
      new org.apache.hadoop.fs.Path(p, s"${GraftSink.MANIFEST}.v2"), false)
    try out.write(aBody.getBytes("UTF-8")) finally out.close()
    // B: a real commit — plans from the CHAIN head (sees A's v2), takes
    // v3, and its pointer advance must land on v3, A's claim included
    GraftSink.commitManifest(p, None) { () =>
      val prior = GraftSink.mainHead(p).get
      prior.copy(files = prior.files :+
        GraftSink.entry("b.tsv", Nil, None, Some(1L)), ts = None, ref = None)
    }
    GraftSink.listVersions(p).last shouldBe 3
    val ptr = GraftSink.readManifest(p).get
    ptr.files.map(GraftSink.entryName) should contain("b.tsv")
    ptr.files.map(GraftSink.entryName) should contain("a.tsv") // rebased onto A
    ptr.ts shouldBe GraftSink.readManifest(p, Some(3)).get.ts
    // A resumes: its advance (modeled by any later advance — here a
    // no-op commit) must NOT move the pointer backwards
    GraftSink.commitManifest(p, None) { () =>
      GraftSink.mainHead(p).get.copy(ts = None, ref = None)
    }
    GraftSink.readManifest(p).get.ts shouldBe
      GraftSink.readManifest(p, Some(4)).get.ts
  }

  test("COW replace refuses when a commit lands between its scan and its first commit attempt") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.cow13")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .writeTo(s"$cat.ns.cow13").create()
    val p = tablePath("cow13")
    // interloper commit lands AFTER the head the DELETE will scan, but
    // BEFORE the DELETE's commit: with eager DML there is no external
    // hook between Spark's scan and commit, so replay the exact guard
    // contract — a write seeded with the scan-time base must refuse
    // once the head moves, ON ITS FIRST ATTEMPT (seenBase pre-seeded)
    val scanTs = GraftSink.mainHead(p).flatMap(_.ts)
    // interloper: a real append moves the head
    Seq((9L, "z")).toDF("k", "s").writeTo(s"$cat.ns.cow13").append()
    var attempts = 0
    val ex = intercept[java.util.ConcurrentModificationException] {
      var seenBase: Option[Option[Long]] = Some(scanTs) // the write's seed
      GraftSink.commitManifest(p, None) { () =>
        attempts += 1
        val baseTs = GraftSink.mainHead(p).flatMap(_.ts)
        if (seenBase.exists(_ != baseTs))
          throw new java.util.ConcurrentModificationException(
            s"graftsink: concurrent commit during a replace at $p")
        seenBase = Some(baseTs)
        GraftSink.Manifest("k BIGINT, s STRING", Nil)
      }
    }
    attempts shouldBe 1 // refused on the FIRST attempt — the new seed
    ex.getMessage should include("concurrent commit")
    // and the real DML path wires the seed end-to-end: a plain DELETE
    // with no interloper still works (the seed matches the head)
    spark.sql(s"DELETE FROM $cat.ns.cow13 WHERE k = 2")
    spark.table(s"$cat.ns.cow13").orderBy("k").as[(Long, String)].collect() shouldBe
      Seq((1L, "a"), (3L, "c"), (9L, "z"))
  }
}
