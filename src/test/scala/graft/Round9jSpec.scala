package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Invariants + scalar recomputes for the round-9 tenth tranche
  * (q336–q338).
  */
class Round9jSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q336 IVF sweep: recall and cost are monotone in nprobe; all-cells probe is exact") {
    val rows = SparkEntry.queries("q336_ivf_probe_sweep")(spark, sf)
      .orderBy(col("np")).collect()
    rows.map(_.getAs[Int]("np")).toSeq shouldBe Seq(1, 2, 4, 10)
    val recalls = rows.map(_.getAs[Double]("mean_recall_at_10"))
    val cands = rows.map(_.getAs[Long]("total_cand"))
    recalls.sliding(2).foreach { case Array(a, b) => b should be >= a }
    cands.sliding(2).foreach { case Array(a, b) => b should be >= a }
    // nprobe = 10 = every cell → candidates are the whole corpus minus
    // the probe itself, so recall is EXACTLY 1 — self-certifying row
    recalls.last shouldBe 1.0
    val nVecs = Tables.embeddings(spark, sf).count()
    cands.last shouldBe 10L * (nVecs - 1)
    // a partial probe must genuinely contract the scan
    cands.head.toDouble should be < 0.5 * cands.last
  }

  test("q337 Holm step-down matches a scalar recompute and is never more lenient than Bonferroni at rank 1") {
    val rows = SparkEntry.queries("q337_holm_fwer")(spark, sf)
      .orderBy(col("rank")).collect()
    val m = rows.length
    val ps = rows.map(_.getAs[Double]("p_value"))
    ps.sliding(2).foreach { case Array(a, b) => b should be >= a }
    // scalar step-down on the query's own (sorted) p-values
    var stopped = false
    for ((r, i) <- rows.zipWithIndex) {
      val crit = 0.05 / (m - i)
      r.getAs[Double]("holm_crit") shouldBe crit +- 1e-6
      // the query's unrounded p decides; only assert when the rounded p
      // is not sitting on the threshold knife-edge
      if (math.abs(r.getAs[Double]("p_value") - crit) > 1e-5) {
        val expectReject = !stopped && r.getAs[Double]("p_value") < crit
        r.getAs[Boolean]("rejected") shouldBe expectReject
      }
      if (!r.getAs[Boolean]("rejected")) stopped = true
      else stopped shouldBe false // a rejection after the stop would violate step-down
    }
    // rank-1 crit is exactly Bonferroni α/m
    rows.head.getAs[Double]("holm_crit") shouldBe 0.05 / m +- 1e-9
  }

  test("q338 MMR matches a scalar greedy recompute over the same shortlist") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = all.find(_._1 == 0L).get._2
    val short = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(v, q)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(20)
    var sel = Vector(short.head)
    var expected = Vector((1, short.head._1, short.head._3,
      BigDecimal(0.7 * short.head._3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      Option.empty[Double]))
    for (k <- 2 to 5) {
      val cands = short.filterNot(c => sel.exists(_._1 == c._1)).map { c =>
        val msim = sel.map(s => cos(c._2, s._2)).max
        val score = BigDecimal(0.7 * c._3 - 0.3 * msim)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (c, score, msim)
      }
      val best = cands.minBy { case (c, score, _) => (-score, c._1) }
      sel = sel :+ best._1
      expected = expected :+ ((k, best._1._1, best._1._3, best._2, Some(best._3)))
    }
    val rows = SparkEntry.queries("q338_mmr_rerank")(spark, sf)
      .orderBy(col("pick")).collect()
    rows.length shouldBe 5
    for ((r, (pick, id, rel, score, msim)) <- rows.zip(expected)) {
      r.getAs[Int]("pick") shouldBe pick
      r.getAs[Long]("vec_id") shouldBe id
      r.getAs[Double]("rel") shouldBe rel +- 1e-6
      r.getAs[Double]("mmr_score") shouldBe score +- 1e-6
      msim match {
        case Some(v) => r.getAs[Double]("max_sim_prior") shouldBe v +- 1e-6
        case None => r.isNullAt(r.fieldIndex("max_sim_prior")) shouldBe true
      }
    }
    // score composition holds row-by-row (msim may be NEGATIVE — an
    // anti-correlated prior pick RAISES the marginal score, so no
    // one-sided bound vs λ·rel exists; the identity is the invariant)
    rows.drop(1).foreach { r =>
      r.getAs[Double]("mmr_score") shouldBe
        (0.7 * r.getAs[Double]("rel") - 0.3 * r.getAs[Double]("max_sim_prior")) +- 1e-5
    }
  }
}
