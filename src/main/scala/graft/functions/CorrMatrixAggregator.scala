package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Pearson correlation MATRIX over 4 columns: a single
  * mergeable buffer of 4 means + 10 co-moments (vs 6 independent
  * 6-double corr states when composing built-ins as q17 does). The
  * win at scale is state locality, one merge path, and a single
  * finish — the SURVEY §7.3 "TypedImperativeAggregate" stretch,
  * realized with the typed Aggregator API (same partial/final shape,
  * simpler contract).
  *
  * Update/merge are the multivariate Welford/Chan formulas: for each
  * pair (i,j), C_ij += dx_i·(x_j − m_j′) on reduce and
  * C_ij += C_ij^a + C_ij^b + dx_i·dx_j·(n_a·n_b/n) on merge.
  * finish returns the upper triangle row-major:
  * corr(0,1), corr(0,2), corr(0,3), corr(1,2), corr(1,3), corr(2,3).
  */
case class CorrMatBuf(n: Long, m: Array[Double], c: Array[Double])

object CorrMatrixAggregator
  extends Aggregator[(Double, Double, Double, Double), CorrMatBuf, Array[Double]] {

  private val k = 4
  private def idx(i: Int, j: Int): Int = i * k + j // full k×k, symmetric

  def zero: CorrMatBuf = CorrMatBuf(0L, new Array[Double](k), new Array[Double](k * k))

  def reduce(b: CorrMatBuf, in: (Double, Double, Double, Double)): CorrMatBuf = {
    val x = Array(in._1, in._2, in._3, in._4)
    val n1 = b.n + 1
    val d = new Array[Double](k)      // x_i − old mean
    val m = b.m.clone()
    var i = 0
    while (i < k) { d(i) = x(i) - m(i); m(i) += d(i) / n1; i += 1 }
    val c = b.c.clone()
    i = 0
    while (i < k) {
      var j = i
      while (j < k) {
        // d(i) uses the OLD mean of i, (x_j − m(j)) the NEW mean of j —
        // the cross-term cancellation that makes Welford exact-in-
        // expectation and numerically stable.
        val v = c(idx(i, j)) + d(i) * (x(j) - m(j))
        c(idx(i, j)) = v; c(idx(j, i)) = v
        j += 1
      }
      i += 1
    }
    CorrMatBuf(n1, m, c)
  }

  def merge(a: CorrMatBuf, b: CorrMatBuf): CorrMatBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val f = a.n.toDouble * b.n / n
      val d = new Array[Double](k)
      val m = new Array[Double](k)
      var i = 0
      while (i < k) {
        d(i) = b.m(i) - a.m(i)
        m(i) = a.m(i) + d(i) * b.n / n
        i += 1
      }
      val c = new Array[Double](k * k)
      i = 0
      while (i < k) {
        var j = i
        while (j < k) {
          val v = a.c(idx(i, j)) + b.c(idx(i, j)) + d(i) * d(j) * f
          c(idx(i, j)) = v; c(idx(j, i)) = v
          j += 1
        }
        i += 1
      }
      CorrMatBuf(n, m, c)
    }
  }

  def finish(b: CorrMatBuf): Array[Double] = {
    val out = new Array[Double]((k * (k - 1)) / 2)
    var t = 0
    var i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        val denom = math.sqrt(b.c(idx(i, i)) * b.c(idx(j, j)))
        out(t) = if (b.n < 2 || denom == 0.0) Double.NaN
                 else b.c(idx(i, j)) / denom
        t += 1; j += 1
      }
      i += 1
    }
    out
  }

  def bufferEncoder: Encoder[CorrMatBuf] = Encoders.product[CorrMatBuf]
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
