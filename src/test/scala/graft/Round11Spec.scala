package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-11 surfaces: the native Bloom pair behind q103 (no closure udf
  * in the fact-pruning path), plus the connector's changelog /
  * evolution / partition additions (tests added alongside each).
  */
class Round11Spec extends AnyFunSuite with Matchers with SharedSpark {

  /** Every physical node including subquery plans (PlanGuardSpec's
    * tolerant walk). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    val subs = here
      .flatMap(_.expressions)
      .flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => pe.plan
      })
      .collect { case sp: SparkPlan => allNodes(sp) }
      .flatten
    here ++ subs
  }

  test("q103: fact pruning probes the native Bloom pair — no ScalaUDF anywhere in the plan") {
    val plan = SparkEntry.queries("q103_bloom_join")(spark, sf)
      .queryExecution.sparkPlan
    val exprs = allNodes(plan).flatMap(_.expressions)
      .flatMap(_.collect { case e => e })
    withClue("serialized-closure udf found in the q103 plan: ") {
      exprs.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      } shouldBe empty
    }
    withClue("native might_contain probe missing from the q103 plan: ") {
      exprs.collect {
        case m: org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain => m
      } should not be empty
    }
  }

  test("bloom_filter_agg + might_contain registry round-trip agrees with exact membership") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    spark.range(0, 1000).createOrReplaceTempView("bfkeys11")
    // every inserted key must probe TRUE (Bloom filters have no false negatives)
    val misses = spark.sql(
      """SELECT count(*) AS n FROM bfkeys11 WHERE NOT might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(id), 1000L, 10000L) FROM bfkeys11),
        |  xxhash64(id))""".stripMargin).collect().head.getLong(0)
    misses shouldBe 0L
  }

  // ------------------------------------------------------------------
  // Changelog (version-range) read on graftsink
  // ------------------------------------------------------------------

  import graft.sources.GraftSink
  import org.apache.spark.sql.functions._

  private def freshSink(prefix: String): String =
    graft.ops.Stage.fresh(prefix).toString + "/t"

  test("changelog scan plans ONLY the delta files of the requested range") {
    val p = freshSink("chg11a")
    spark.range(0, 100).selectExpr("id AS k", "cast(id % 7 as double) AS v")
      .write.format("graftsink").option("path", p).mode("overwrite").save()                 // v1
    spark.range(100, 130).selectExpr("id AS k", "cast(id % 7 as double) AS v")
      .write.format("graftsink").option("path", p).mode("append").save()  // v2
    val v1Names = GraftSink.readManifest(p, Some(1)).get.files.map(GraftSink.entryName).toSet
    val df = spark.read.format("graftsink").option("path", p)
      .option("changesFrom", "1").load()
    // physical partitions must cover ONLY v2's new files
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val names = scan.inputPartitions.map {
      case c: graft.sources.GraftSinkChangePartition => c.name
    }
    names should not be empty
    names.foreach(n => v1Names should not contain n)
    // and the served rows are exactly the appended range, all inserts
    df.agg(count(lit(1)), min(col("k")), max(col("k")),
        countDistinct(col("_change")), min(col("_commit_version")))
      .collect().head.toSeq shouldBe Seq(30L, 100L, 129L, 1L, 2L)
  }

  test("changelog serves delete-vector diffs as delete rows with original content") {
    val p = freshSink("chg11b")
    spark.range(0, 50).selectExpr("id AS k", "cast(id as double) AS v")
      .coalesce(1).write.format("graftsink").option("path", p).mode("overwrite").save()     // v1
    // fold a DV into v1's file via the manifest (the delta write's shape)
    val m = GraftSink.readManifest(p).get
    val line = m.files.head
    val withDv = GraftSink.entry(GraftSink.entryName(line), Seq(3L, 7L, 11L),
      GraftSink.entryStats(line), GraftSink.entryRows(line))
    GraftSink.writeManifest(p, GraftSink.Manifest(m.ddl, Seq(withDv)))    // v2
    val chg = spark.read.format("graftsink").option("path", p)
      .option("changesFrom", "1").load()
    chg.select(col("k"), col("_change"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1) shouldBe Array((3L, "delete", 2L), (7L, "delete", 2L), (11L, "delete", 2L))
    // overwrite drops the file: its SURVIVORS (not the DV'd rows) delete at v3
    spark.range(1000, 1001).selectExpr("id AS k", "cast(id as double) AS v")
      .write.format("graftsink").option("path", p).mode("overwrite").save() // v3
    val v3 = spark.read.format("graftsink").option("path", p)
      .option("changesFrom", "2").option("changesTo", "3").load()
    val dels = v3.filter(col("_change") === "delete").select(col("k"))
      .collect().map(_.getLong(0)).sorted
    dels.length shouldBe 47 // 50 - the 3 DV'd positions
    dels should not contain 3L
    val ins = v3.filter(col("_change") === "insert").select(col("k"))
      .collect().map(_.getLong(0))
    ins shouldBe Array(1000L)
  }

  test("changelog refusal matrix: bad ranges, version conflict, writes, plain readStream") {
    val p = freshSink("chg11c")
    spark.range(0, 5).selectExpr("id AS k").write.format("graftsink")
      .option("path", p).mode("overwrite").save()
    def reading(opts: (String, String)*): Unit = {
      val r = spark.read.format("graftsink").option("path", p)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load().collect()
      ()
    }
    intercept[IllegalArgumentException] { reading("changesFrom" -> "-1") }
    intercept[IllegalArgumentException] {
      reading("changesFrom" -> "2", "changesTo" -> "2") }
    intercept[IllegalArgumentException] {
      reading("changesFrom" -> "0", "version" -> "1") }
    // expired/missing snapshot in range fails loudly
    intercept[Exception] { reading("changesFrom" -> "0", "changesTo" -> "9") }
    // a changelog read is not a write target
    intercept[Exception] {
      spark.range(0, 3).selectExpr("id AS k", "'insert' AS _change")
        .write.format("graftsink").option("path", p)
        .option("changesFrom", "0").mode("append").save()
    }
    // plain readStream (no changesFrom) points at the change feed loudly
    val err = intercept[Exception] {
      spark.readStream.format("graftsink").option("path", p).load()
        .writeStream.format("memory").queryName("chg11c_mem")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    err.toString + Option(err.getCause).fold("")(_.toString) should include("changesFrom")
  }

  test("reserved column names are rejected at write; legacy reads prefer data columns") {
    val p = freshSink("chg11d")
    val e = intercept[Exception] {
      spark.range(0, 3).selectExpr("id AS k", "'x' AS _file")
        .write.format("graftsink").option("path", p).mode("overwrite").save()
    }
    e.toString should include("reserved")
  }

  test("append of a nullable column into a NOT NULL table widens the published DDL") {
    GraftSink.widenedDdl("k BIGINT NOT NULL,s STRING",
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT,s STRING")) shouldBe
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT,s STRING").toDDL
    // NOT NULL write into a nullable table keeps the table's (wider) DDL
    GraftSink.widenedDdl("k BIGINT,s STRING",
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT NOT NULL,s STRING")) shouldBe
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT,s STRING").toDDL
  }

  test("changelog stream: offsets are snapshot numbers; restart resumes at the commit boundary") {
    val p = freshSink("chg11e")
    spark.range(0, 20).selectExpr("id AS k").coalesce(1)
      .write.format("graftsink").option("path", p).mode("overwrite").save()                 // v1
    spark.range(20, 25).selectExpr("id AS k").coalesce(1)
      .write.format("graftsink").option("path", p).mode("append").save()  // v2
    val stage = graft.ops.Stage.fresh("chg11e_ck").toString
    def drain(): Unit = {
      // a file sink (unlike memory) RECOVERS from its checkpoint — the
      // restart-resumption half of the offset contract
      spark.readStream.format("graftsink").option("path", p)
        .option("changesFrom", "0").load()
        .writeStream.format("parquet")
        .option("path", s"$stage/out")
        .option("checkpointLocation", s"$stage/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    drain()
    spark.read.parquet(s"$stage/out").count() shouldBe 25
    // append v3, resume from the SAME checkpoint: only v3's rows arrive
    spark.range(25, 28).selectExpr("id AS k").coalesce(1)
      .write.format("graftsink").option("path", p).mode("append").save()  // v3
    drain()
    val all = spark.read.parquet(s"$stage/out")
      .select(col("k"), col("_commit_version")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    all.length shouldBe 28 // 25 + ONLY v3's 3 (not re-served from v1/v2)
    val v3rows = all.filter(_._2 == 3L).map(_._1).sorted
    v3rows shouldBe Array(25L, 26L, 27L)
    all.count(_._2 == 2L) shouldBe 5
    all.count(_._2 == 1L) shouldBe 20
  }
}
