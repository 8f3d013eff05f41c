package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (KMV) distinct-value sketch as a typed `Aggregator`
  * (SURVEY.md §2.21 / q245): the buffer is the k smallest DISTINCT
  * 60-bit hashes seen, kept sorted ascending — bounded at k longs per
  * partition regardless of data size, so the aggregate is one shuffle
  * of ≤k values per partition and buffers MERGE exactly (union → k
  * smallest), the property that lets per-partition/per-day sketches be
  * persisted once and unioned later without rescanning.
  *
  * Unlike HLL, the KMV estimate (k−1)/max_normalized is a DETERMINISTIC
  * function of the md5-derived hashes, so it cross-engine hash-matches
  * a DuckDB recompute bit-for-bit — the sketch itself is oracle-able,
  * not just bound-gated (q240's HLL can only pin accuracy booleans).
  *
  * reduce() is O(k) worst case with an O(1) full-buffer fast reject
  * (h ≥ current max); with uniform hashes the reject rate → 1 as a
  * partition drains, so the amortized per-row cost is ~1 comparison.
  */
case class KmvBuf(hs: Array[Long])

object KmvAggregator extends Aggregator[Long, KmvBuf, Array[Long]] {
  val k = 64

  def zero: KmvBuf = KmvBuf(Array.empty)

  def reduce(b: KmvBuf, h: Long): KmvBuf = insert(b, h)

  def merge(a: KmvBuf, b: KmvBuf): KmvBuf = b.hs.foldLeft(a)(insert)

  def finish(b: KmvBuf): Array[Long] = b.hs

  private def insert(b: KmvBuf, h: Long): KmvBuf = {
    val hs = b.hs
    if (hs.length == k && h >= hs(k - 1)) b // full and not smaller: reject
    else {
      val i = java.util.Arrays.binarySearch(hs, h)
      if (i >= 0) b // already present: KMV is a DISTINCT sketch
      else {
        val at = -i - 1
        val n = math.min(hs.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(hs, 0, out, 0, at)
        out(at) = h
        System.arraycopy(hs, at, out, at + 1, n - at - 1) // drops old max if full
        KmvBuf(out)
      }
    }
  }

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
