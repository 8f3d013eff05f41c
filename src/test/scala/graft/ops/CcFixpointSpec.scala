package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[Text.ccMinLabels]] — the fixpoint-certified connected-components
  * helper under q80/q229/q239/q267. The executable spec is union-find
  * over the collected edge list; the key fixture is a PATH GRAPH of
  * diameter 30, which the pre-round-8 fixed-5-pass propagation would
  * silently under-merge (plain min-label propagation covers distance
  * ≤ #passes; only the pointer-jump doubling + the zero-changed exit
  * make the result diameter-independent). */
class CcFixpointSpec extends AnyFunSuite with Matchers with graft.SharedSpark {

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val sym = edges.toDF("u", "v")
    val both = sym.union(sym.select(col("v").as("u"), col("u").as("v")))
    Text.ccMinLabels(both).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph of diameter 30 fully merges to the min label") {
    // 0-1-2-...-30: a single component whose diameter (30) exceeds any
    // fixed small pass budget. Every node must land on label 0.
    val edges = (0L until 30L).map(i => (i, i + 1))
    val got = ccOf(edges)
    got.size shouldBe 31
    all(got.values) shouldBe 0L
  }

  test("two long chains + an isolated pair match union-find exactly") {
    // chain A: 100..140 (diameter 40), chain B: 200..215, pair: (500,501)
    val edges = (100L until 140L).map(i => (i, i + 1)) ++
      (200L until 215L).map(i => (i, i + 1)) ++ Seq((500L, 501L))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    ccOf(edges) shouldBe unionFind(nodes, edges)
  }

  test("random sparse graphs match union-find on every node (fixed seeds)") {
    val rnd = new scala.util.Random(8080L)
    for (_ <- 1 to 5) {
      val n = 30 + rnd.nextInt(60)
      val m = 10 + rnd.nextInt(50)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        ccOf(edges) shouldBe unionFind(nodes, edges)
      }
    }
  }

  test("empty edge frame yields an empty label frame without looping") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    Text.ccMinLabels(empty).count() shouldBe 0L
  }
}
