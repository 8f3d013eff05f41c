package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAllNoShrink, propBoolean}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.GraftSink

/** Property coverage for the manifest ENTRY LINE codec — now
  * load-bearing for three features at once (delete vectors, file-
  * skipping stats, and plain file lists): any (name, deletes, stats)
  * must round-trip exactly, and legacy bare-name lines must keep
  * parsing as themselves.
  */
object ManifestEntryProps extends Properties("manifest-entry") {

  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    cs <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('-')), (1, Gen.const('.'))))
  } yield cs.mkString

  private val delsGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 1000000L))

  private val statsGen: Gen[Option[(String, Long, Long)]] = Gen.option(for {
    c <- Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty)
    lo <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    span <- Gen.chooseNum(0L, 1000000L)
  } yield (c, lo, lo + span))

  private val rowsGen: Gen[Option[Long]] =
    Gen.option(Gen.chooseNum(0L, Long.MaxValue / 2))

  property("entry round-trips name + sorted-deduped DV + stats + rows; canonical form is a fixpoint") =
    forAllNoShrink(nameGen, delsGen, statsGen, rowsGen) { (name, dels, stats, rows) =>
      val line = GraftSink.entry(name, dels, stats, rows)
      val again = GraftSink.entry(GraftSink.entryName(line),
        GraftSink.entryDeletes(line).toSeq, GraftSink.entryStats(line),
        GraftSink.entryRows(line))
      (GraftSink.entryName(line) == name) :| "name" &&
        (GraftSink.entryDeletes(line).toSeq == dels.sorted.distinct) :| "dv" &&
        (GraftSink.entryStats(line) == stats) :| "stats" &&
        (GraftSink.entryRows(line) == rows) :| "rows" &&
        (again == line) :| "fixpoint"
    }

  property("legacy bare-name lines parse as themselves with no deletes, stats, or rows") =
    forAllNoShrink(nameGen) { name =>
      GraftSink.entryName(name) == name &&
        GraftSink.entryDeletes(name).isEmpty &&
        GraftSink.entryStats(name).isEmpty &&
        GraftSink.entryRows(name).isEmpty
    }
}

class ManifestEntrySpec extends AnyFunSuite with Matchers {
  test("segments are independent: dv-only, stats-only, and combined lines parse") {
    val dvOnly = GraftSink.entry("f.tsv", Seq(3L, 1L, 3L), None)
    dvOnly shouldBe "f.tsv\tdv:1,3"
    GraftSink.entryDeletes(dvOnly).toSeq shouldBe Seq(1L, 3L)
    GraftSink.entryStats(dvOnly) shouldBe None
    val statsOnly = GraftSink.entry("f.tsv", Nil, Some(("user_id", -5L, 17L)))
    statsOnly shouldBe "f.tsv\tstats:user_id=-5..17"
    GraftSink.entryDeletes(statsOnly) shouldBe empty
    GraftSink.entryStats(statsOnly) shouldBe Some(("user_id", -5L, 17L))
    val both = GraftSink.entry("f.tsv", Seq(0L), Some(("k", 1L, 2L)))
    both shouldBe "f.tsv\tdv:0\tstats:k=1..2"
    GraftSink.entryDeletes(both).toSeq shouldBe Seq(0L)
    GraftSink.entryStats(both) shouldBe Some(("k", 1L, 2L))
  }
}
