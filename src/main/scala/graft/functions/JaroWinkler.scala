package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `jaro_winkler(a, b)` — Jaro–Winkler
  * similarity in [0, 1], the record-linkage scorer Spark lacks
  * (`levenshtein` is its only built-in string distance).
  *
  * Exact semantics (pinned against DuckDB's
  * `jaro_winkler_similarity`, the cross-engine oracle, by a 6000-case
  * fuzz at build time — see JaroWinklerSpec):
  *  - match window = floor(max(|a|,|b|)/2) − 1, clamped ≥ 0; greedy
  *    left-to-right matching, each b-position consumed once;
  *  - transpositions = floor(k/2) where k = positions at which the two
  *    matched-character sequences disagree;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3; m = 0 or an empty input
  *    → 0.0 (DuckDB's convention, including for two empty strings);
  *  - Winkler boost iff jaro ≥ 0.7 (inclusive — DuckDB applies it AT
  *    the threshold): jw = jaro + min(prefix,4) · 0.1 · (1 − jaro).
  *
  * The score is assembled from exact integer counts (m, t, prefix,
  * lengths) with the same operation order both engines use, so after
  * the repo's 6dp output rounding the two engines agree bit-exactly;
  * distinct (m,t,|a|,|b|,prefix) tuples yield rationals ≥ 1e-10 apart,
  * so argmax-by-score winner selection can never flip on float noise
  * (ties are exact in both engines and fall to the query's explicit
  * tie-break column).
  *
  * Byte-level comparison (exact for ASCII, the part-name domain);
  * per-call scratch is two small boolean arrays — the inputs are short
  * dictionary strings, not documents.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def sim(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(i + win, lb - 1)
      var j = math.max(i - win, 0)
      var done = false
      while (j <= hi && !done) {
        if (!mb(j) && a(i) == b(j)) { ma(i) = true; mb(j) = true; m += 1; done = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // k = disagreement count between the two matched sequences, walked
    // in their own string orders without materializing either
    var k = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a(i) != b(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (m - t) / md) / 3.0
    if (jaro >= 0.7) {
      var l = 0
      while (l < 4 && l < la && l < lb && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
