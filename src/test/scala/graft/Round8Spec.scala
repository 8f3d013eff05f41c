package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Formula/invariant tests for the round-8 widening:
  *  - q278 write-side MERGE vs a plain-Scala set-algebra recompute
  *  - q279 bounded-hop BFS on a crafted CHAIN corpus (the bench corpus
  *    has chain depth 1, so hops 2..4 and the −1 overflow bucket are
  *    only provable on a fixture) vs a scalar BFS recompute that
  *    rebuilds the shingle pair graph independently.
  */
class Round8Spec extends AnyFunSuite with Matchers with SharedSpark {

  test("q278 merge result matches a scalar set-algebra recompute of the upsert") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3), r.getString(4)))
    def dec2(x: Double): BigDecimal = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    // merged = base rows with key%10 ∉ {1,2}, plus updated %10=1 rows,
    // plus inserts re-keyed +1000000 — the same algebra as the oracle,
    // executed in plain Scala
    val merged =
      cust.filter(c => c._1 % 10 != 1 && c._1 % 10 != 2) ++
        cust.filter(_._1 % 10 == 1).map(c => c.copy(_4 = (dec2(c._4) + 100).toDouble)) ++
        cust.filter(_._1 % 10 == 3).map(c => (c._1 + 1000000L, "new|" + c._2, c._3, c._4, c._5))
    val expect = merged.groupBy(_._5).map { case (seg, rows) =>
      (seg, rows.length.toLong, rows.map(r => dec2(r._4)).sum.toDouble,
        rows.map(_._1).min, rows.map(_._1).max,
        rows.count(_._2.startsWith("new|")).toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q278_merge_upsert")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    got.length shouldBe expect.length
    got.zip(expect).foreach { case (g, e) =>
      g._1 shouldBe e._1
      g._2 shouldBe e._2
      g._3 shouldBe e._3 +- 1e-6
      (g._4, g._5, g._6) shouldBe ((e._4, e._5, e._6))
    }
    // the merge must actually exercise all three ops: inserts present,
    // deletes absent, updates shift the balance sums
    got.map(_._6).sum should be > 0L
  }

  // --- q279 chain fixture ------------------------------------------------

  /** 10 docs over a sliding 20-token window with stride 8: adjacent docs
    * share 12 tokens (8 full 5-gram shingles, jaccard 8/24 = 0.33 ≥ 0.01);
    * docs two apart share only 4 tokens (no full 5-gram) — a PATH graph
    * 0-1-…-9. The only greedy-survivor seed is doc 0 (every other doc has
    * a smaller neighbor), so hop levels 0..4 hold docs 0..4 and docs 5..9
    * overflow to −1. */
  private lazy val chainFx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_chainfx_").toString
    import spark.implicits._
    val words = (0 until 100).map(i => f"w$i%03d")
    val docs = (0 until 10).map { k =>
      val text = words.slice(8 * k, 8 * k + 20).mkString(" ")
      (k.toLong, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q279 BFS on the chain fixture: hop levels and overflow match a scalar recompute") {
    // independent scalar pair graph: 5-gram shingle sets + jaccard >= 0.01
    val texts = (0 until 10).map { k =>
      val words = (0 until 100).map(i => f"w$i%03d")
      k.toLong -> words.slice(8 * k, 8 * k + 20).sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    val pairs = for {
      a <- texts.keys.toSeq; b <- texts.keys.toSeq if a < b
      inter = texts(a).intersect(texts(b)).size
      if inter > 0 &&
        BigDecimal(inter.toDouble / (texts(a).size + texts(b).size - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.01")
    } yield (a, b)
    pairs.sorted shouldBe (0L until 9L).map(i => (i, i + 1)) // the path graph, exactly
    // scalar BFS from the greedy-survivor seeds (no smaller neighbor)
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = pairs.map(_._1).distinct.filterNot(pairs.map(_._2).toSet)
    var dist = seeds.map(_ -> 0).toMap
    for (i <- 1 to 4) {
      val frontier = dist.filter(_._2 == i - 1).keys
      val next = frontier.flatMap(adj.getOrElse(_, Seq.empty)).toSet -- dist.keySet
      dist = dist ++ next.map(_ -> i)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = nodes.groupBy(n => dist.getOrElse(n, -1)).map { case (d, ns) =>
      (d, ns.length.toLong, ns.min, ns.max)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q279_graph_reach")(spark, chainFx).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expect
    // the fixture must actually reach depth: all 5 hop levels plus overflow
    got.map(_._1) shouldBe Seq(-1, 0, 1, 2, 3, 4)
    got.find(_._1 == -1).get._2 shouldBe 5L // docs 5..9 beyond 4 hops
  }
}
