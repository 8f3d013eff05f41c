package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** V2 ViewCatalog: durable SQL views stored in the warehouse, created
  * through `CALL <cat>.sys.create_view` (Spark 4.1 has no SQL route
  * into a V2 ViewCatalog) and READ through the ResolveGraftViews
  * analyzer rule that substitutes the stored SQL for fully-qualified
  * references.
  */
class ViewCatalogSpec extends AnyFunSuite with Matchers with SharedSpark {

  private val cat = "gv12"
  private def ensureCatalog(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      graft.ops.Stage.dir("gv12_warehouse"))
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
  }
  private def gcat = spark.sessionState.catalogManager.catalog(cat)
    .asInstanceOf[graft.sources.GraftCatalog]
  private def ident(n: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), n)

  test("create_view / read-through / list / alter / rename / drop round-trip") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"CALL $cat.sys.drop_view('ns.v1')")
    spark.sql(s"CALL $cat.sys.drop_view('ns.v1r')")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.base")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "g", "v").writeTo(s"$cat.ns.base").create()
    val r = spark.sql(s"CALL $cat.sys.create_view('ns.v1', " +
      s"'SELECT g, count(*) AS n, sum(v) AS sv FROM $cat.ns.base GROUP BY g')")
      .collect().head
    r.getLong(1) shouldBe 3L
    // the view definition is DURABLE state, re-resolved on read
    spark.table(s"$cat.ns.v1").orderBy("g").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))) shouldBe
      Array(("a", 2L, 40.0), ("b", 1L, 20.0))
    // the view tracks the BASE table (not a materialized snapshot)
    spark.sql(s"INSERT INTO $cat.ns.base VALUES (4, 'b', 5.0)")
    spark.table(s"$cat.ns.v1").filter(col("g") === "b").collect()
      .head.getLong(1) shouldBe 2L
    // views and tables share the namespace and collide loudly
    intercept[Exception] { spark.sql(s"CREATE TABLE $cat.ns.v1 (x BIGINT)") }
    intercept[Exception] {
      spark.sql(s"CALL $cat.sys.create_view('ns.base', 'SELECT 1 AS one')")
    }
    // listViews serves the inventory
    gcat.listViews("ns").map(_.name()) should contain("v1")
    // property changes round-trip through alterView
    import org.apache.spark.sql.connector.catalog.ViewChange
    gcat.alterView(ident("v1"), ViewChange.setProperty("owner.team", "data"))
    gcat.loadView(ident("v1")).properties().get("owner.team") shouldBe "data"
    gcat.alterView(ident("v1"), ViewChange.removeProperty("owner.team"))
    gcat.loadView(ident("v1")).properties().containsKey("owner.team") shouldBe false
    // rename moves the definition
    gcat.renameView(ident("v1"), ident("v1r"))
    spark.table(s"$cat.ns.v1r").count() shouldBe 2L
    intercept[Exception] { spark.table(s"$cat.ns.v1").collect() }
    // drop removes it; the base table survives
    spark.sql(s"CALL $cat.sys.drop_view('ns.v1r')").collect()
      .head.getLong(0) shouldBe 1L
    gcat.listViews("ns").map(_.name()) should not contain "v1r"
    spark.table(s"$cat.ns.base").count() shouldBe 4L
  }

  test("views are context-free: unqualified relations refuse at create; a fresh catalog re-resolves") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"CALL $cat.sys.drop_view('ns.v2')")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.base2")
    Seq((1L, 2.0)).toDF("k", "v").writeTo(s"$cat.ns.base2").create()
    // a session-relative reference has no durable meaning — refused
    val ex = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.create_view('ns.v2', 'SELECT k FROM base2')")
    }
    ex.getMessage should include("catalog-qualified")
    spark.sql(s"CALL $cat.sys.create_view('ns.v2', " +
      s"'SELECT k, v FROM $cat.ns.base2 WHERE k >= 1')")
    // a brand-new catalog instance (fresh initialize) reads the same file
    val fresh = new graft.sources.GraftCatalog
    fresh.initialize(cat, new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", graft.ops.Stage.dir("gv12_warehouse"))))
    val v = fresh.loadView(ident("v2"))
    v.query() should include(s"FROM $cat.ns.base2")
    v.currentCatalog() shouldBe cat
    spark.table(s"$cat.ns.v2").columns.toSeq shouldBe Seq("k", "v")
    // nested views resolve through repeated rule application
    spark.sql(s"CALL $cat.sys.drop_view('ns.v3')")
    spark.sql(s"CALL $cat.sys.create_view('ns.v3', " +
      s"'SELECT count(*) AS n FROM $cat.ns.v2')")
    spark.table(s"$cat.ns.v3").collect().head.getLong(0) shouldBe 1L
  }
}
