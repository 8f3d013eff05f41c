package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically stable one-pass Pearson correlation as a typed
  * `Aggregator` (SURVEY.md §2.11 / q48) — proves the custom-UDAF
  * surface. Uses Welford/Chan co-moment updates: each partition folds
  * its rows locally (`reduce`), partials combine pairwise (`merge`)
  * with the parallel-variance correction term, so the aggregate is one
  * shuffle of 6 doubles per partition regardless of data size — the
  * same partial/final shape Spark's built-in `corr` plans, and the
  * result must agree with it (and the DuckDB oracle) to 6 dp.
  */
case class CorrBuf(n: Long, mx: Double, my: Double,
                   cxy: Double, mxx: Double, myy: Double)

object CorrAggregator extends Aggregator[(Double, Double), CorrBuf, Double] {

  def zero: CorrBuf = CorrBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  def reduce(b: CorrBuf, in: (Double, Double)): CorrBuf = {
    val (x, y) = in
    val n1 = b.n + 1
    val dx = x - b.mx
    val dy = y - b.my
    val mx = b.mx + dx / n1
    val my = b.my + dy / n1
    CorrBuf(n1, mx, my,
      b.cxy + dx * (y - my),
      b.mxx + dx * (x - mx),
      b.myy + dy * (y - my))
  }

  def merge(a: CorrBuf, b: CorrBuf): CorrBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val dx = b.mx - a.mx
      val dy = b.my - a.my
      val f = a.n.toDouble * b.n / n
      CorrBuf(n,
        a.mx + dx * b.n / n,
        a.my + dy * b.n / n,
        a.cxy + b.cxy + dx * dy * f,
        a.mxx + b.mxx + dx * dx * f,
        a.myy + b.myy + dy * dy * f)
    }
  }

  def finish(b: CorrBuf): Double =
    if (b.n < 2 || b.mxx == 0.0 || b.myy == 0.0) Double.NaN
    else b.cxy / math.sqrt(b.mxx * b.myy)

  def bufferEncoder: Encoder[CorrBuf] = Encoders.product[CorrBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
