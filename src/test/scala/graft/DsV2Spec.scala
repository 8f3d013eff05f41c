package graft

import graft.sources.{GraftSeqPartition, GraftSeqScan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structural contract of the custom DataSource V2 connector
  * (sources/GraftSeqSource.scala) — q286's oracle certifies the VALUES;
  * this spec pins the connector machinery itself: partition-boundary
  * integrity under awkward slicings, column pruning actually reaching
  * the scan, and the degenerate shapes (empty table, more slices than
  * rows) that boundary arithmetic gets wrong first.
  */
class DsV2Spec extends AnyFunSuite with Matchers with SharedSpark {

  private def rd(rows: Long, slices: Int) =
    spark.read.format("graftseq")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("no row is lost or duplicated across slice boundaries, for awkward slicings") {
    for ((rows, slices) <- Seq((1000L, 7), (1000L, 1), (3L, 8), (16L, 16), (1L, 4))) {
      withClue(s"rows=$rows slices=$slices: ") {
        val ids = rd(rows, slices).select(col("id")).collect().map(_.getLong(0)).sorted
        ids shouldBe (0L until rows).toArray
      }
    }
  }

  test("empty table plans cleanly and returns zero rows") {
    rd(0L, 4).count() shouldBe 0L
  }

  test("column pruning reaches the scan: untouched columns drop out of readSchema") {
    def scanCols(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
      scans should have size 1
      scans.head.scan.asInstanceOf[GraftSeqScan].readSchema().fieldNames.toSeq
    }
    // counting by bucket needs ONLY bucket — even the selected-but-unused
    // tok column must be pruned away
    val counts = rd(1000L, 4).select(col("bucket"), col("tok"))
      .groupBy(col("bucket")).count()
    scanCols(counts) shouldBe Seq("bucket")
    counts.agg(sum(col("count"))).head().getLong(0) shouldBe 1000L
    // q286's shape keeps exactly (bucket, tok), never id
    scanCols(rd(1000L, 4).groupBy(col("bucket"))
      .agg(countDistinct(col("tok")))) shouldBe Seq("bucket", "tok")
  }

  test("partition planning covers [0, rows) exactly with no overlaps") {
    val scan = new GraftSeqScan(1000L, 7, graft.sources.GraftSeqTable.fullSchema)
    val parts = scan.planInputPartitions().map(_.asInstanceOf[GraftSeqPartition])
    parts.map(p => p.end - p.start).sum shouldBe 1000L
    parts.sortBy(_.start).sliding(2).foreach {
      case Array(a, b) => a.end shouldBe b.start
      case _ =>
    }
  }

  test("bucket column is bit-identical to the portable md5 SQL chain") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val bad = rd(500L, 3)
      .withColumn("chain", expr(
        "cast(conv(substr(md5(cast(cast(id as string) as binary)), 1, 15), 16, 10) as bigint) % 97"))
      .filter(col("bucket") =!= col("chain")).count()
    bad shouldBe 0L
  }
}
