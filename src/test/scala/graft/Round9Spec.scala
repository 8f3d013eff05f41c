package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-9 additions — each query's math
  * re-derived with plain Scala collections from the same raw rows, so
  * a plan bug and an oracle bug can't agree by accident.
  */
class Round9Spec extends AnyFunSuite with Matchers with SharedSpark {

  test("q292 Neyman allocation: n_h = largest-remainder(200 · N_h·S_h / ΣN·S), sums to exactly 200") {
    val rows = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = rows.groupBy(_._1).map { case (lang, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sx2 = xs.map(x => x._2 * x._2).sum
      val sh = math.sqrt((sx2 - sx.toDouble * sx / n) / (n - 1))
      lang -> (n, sh, n * sh)
    }
    val sw = strata.values.map(_._3).sum
    val quotas = strata.map { case (l, (n, sh, wh)) => (l, n, sh, 200.0 * wh / sw) }
    val base = quotas.map { case (l, n, sh, q) => (l, n, sh, q.toLong, q - math.floor(q)) }
    val deficit = 200L - base.map(_._4).sum
    val byRem = base.toSeq.sortBy { case (l, _, _, _, rem) => (-rem, l) }
    val alloc = byRem.zipWithIndex.map { case ((l, n, sh, b, _), i) =>
      l -> (n, sh, b + (if (i < deficit) 1L else 0L))
    }.toMap
    alloc.values.map(_._3).sum shouldBe 200L

    val got = SparkEntry.queries("q292_neyman_alloc")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    got.keySet shouldBe alloc.keySet
    for ((l, (n, sh, nh)) <- alloc) withClue(l) {
      val (gn, gsd, galloc, gsampled) = got(l)
      gn shouldBe n
      gsd shouldBe (math.rint(sh * 1e6) / 1e6)
      galloc shouldBe nh
      // every stratum is big enough here that the allocation is honored
      gsampled shouldBe nh
    }
  }
}
