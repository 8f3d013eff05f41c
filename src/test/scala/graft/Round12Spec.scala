package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-12 surfaces: bucketed storage-partitioned joins (the bucket
  * transform as a catalog function + bucket-keyed grouped scans),
  * optimistic-concurrency commits, BINARY/ARRAY<FLOAT> sink columns,
  * Z-order clustered writes.
  */
class Round12Spec extends AnyFunSuite with Matchers with SharedSpark {

  import graft.sources.GraftSink

  private val cat = "g12"
  private def ensureCatalog(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      graft.ops.Stage.dir("g12_warehouse"))
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
  }
  private def tablePath(name: String): String =
    s"${graft.ops.Stage.dir("g12_warehouse")}/ns/$name"

  private def withSpjConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ------------------------------------------------------------------
  // Bucketed storage-partitioned join (q405)
  // ------------------------------------------------------------------

  test("bucketed SPJ: two same-(n,col)-bucketed sink tables sort-merge join with ZERO exchange") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.bspja")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.bspjb")
    spark.sql(s"""CREATE TABLE $cat.ns.bspja (k BIGINT, v DOUBLE)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql(s"""CREATE TABLE $cat.ns.bspjb (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(4, k))""")
    Seq.tabulate(40)(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .writeTo(s"$cat.ns.bspja").append()
    Seq.tabulate(40)(i => (i.toLong, i * 100L)).toDF("k", "w")
      .writeTo(s"$cat.ns.bspjb").append()
    withSpjConfs {
      val a = spark.read.option("grouped", "true").table(s"$cat.ns.bspja")
      val b = spark.read.option("grouped", "true").table(s"$cat.ns.bspjb")
      val j = a.join(b.hint("merge"), "k")
        .agg(count(lit(1)), sum(col("v") + col("w")))
      j.collect().head.toSeq shouldBe
        Seq(40L, (0 until 40).map(i => i * 1.0 + i * 100L).sum)
      val planStr = j.queryExecution.executedPlan.toString
      planStr should include("SortMergeJoin")
      withClue(s"bucketed SPJ should make the join exchange-free:\n$planStr\n") {
        planStr should not include "Exchange hashpartitioning"
      }
      // each side reports bucket-keyed grouped output: one partition
      // per bucket id, key typed as the transform's output (int)
      // AQE wraps stages in leaf QueryStageExec nodes — walk through them
      def deep(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val here = p.collect { case n => n }
        here ++ here.flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            deep(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            deep(q.plan)
          case _ => Nil
        }
      }
      val scans = deep(j.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
      }
      scans should have size 2
      scans.foreach { s =>
        s.outputPartitioning.toString.toLowerCase should include("keygrouped")
        s.inputPartitions.foreach(p =>
          p.isInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey] shouldBe true)
      }
    }
  }

  test("bucketed SPJ key agrees with the write-path routing kernel") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.bkey")
    spark.sql(s"""CREATE TABLE $cat.ns.bkey (s STRING, x BIGINT)
      PARTITIONED BY (bucket(5, s))""")
    (Seq.tabulate(20)(i => (s"v$i", i.toLong)) :+ ((null: String), 99L))
      .toDF("s", "x").writeTo(s"$cat.ns.bkey").append()
    val scan = new graft.sources.GraftSinkScan(tablePath("bkey"),
      org.apache.spark.sql.types.StructType.fromDDL("s STRING, x BIGINT"),
      org.apache.spark.sql.types.StructType.fromDDL("s STRING, x BIGINT"),
      None, Map.empty, Map.empty, grouped = true)
    val parts = scan.planInputPartitions()
    parts.foreach { p =>
      val tp = p.asInstanceOf[graft.sources.GraftSinkTuplePartition]
      val key = tp.key
      if (key.isNullAt(0)) {
        // the null bucket's files carry exactly the null rows
        tp.files.foreach(_.name should not be "")
      } else {
        val id = key.getInt(0)
        id should (be >= 0 and be < 5)
      }
    }
    // every non-null value's bucket id recomputes through the catalog
    // function to the id its file was tagged with
    val fn = new graft.sources.GraftCatalog.BucketBound(Array(
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.StringType))
    fn.produceResult(org.apache.spark.sql.catalyst.InternalRow(5,
      org.apache.spark.unsafe.types.UTF8String.fromString("v7"))) shouldBe
      GraftSink.bucketIdOf("v7", 5).toInt
  }

  test("grouped scan on an unpartitioned table is still refused") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.nopart")
    Seq((1L, "a")).toDF("k", "s").writeTo(s"$cat.ns.nopart").create()
    intercept[Exception] {
      spark.read.option("grouped", "true").table(s"$cat.ns.nopart").collect()
    }
  }
}
