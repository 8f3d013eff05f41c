package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the native jaro_winkler expression to the cross-engine contract
  * (DuckDB's jaro_winkler_similarity — q281's oracle scorer):
  *  - literal values measured from DuckDB 1.0.0 this round, including
  *    the three semantics corners an off-the-shelf description gets
  *    wrong: the boost threshold is INCLUSIVE (jaro = 0.7 exactly still
  *    boosts), transpositions floor (k/2) for odd disagreement counts,
  *    and two empty strings score 0, not 1;
  *  - an independent Scala reference (list-materializing, Fraction-free
  *    but structurally different from the shipped byte-walk);
  *  - codegen ≡ interpreted ≡ direct-call on the corpus pairs.
  */
class JaroWinklerSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("DuckDB-measured literal values, including the three corner rules") {
    // classic textbook pairs (DuckDB 1.0.0 values, exact doubles)
    jw("MARTHA", "MARHTA") shouldBe 0.9611111111111111
    jw("DWAYNE", "DUANE") shouldBe 0.8400000000000001
    jw("DIXON", "DICKSONX") shouldBe 0.8133333333333332 +- 1e-12
    jw("CRATE", "TRACE") shouldBe 0.7333333333333333 +- 1e-12
    // INCLUSIVE boost threshold: jaro('d','dababdbacr') = (1 + 0.1 + 1)/3
    // = 0.7 exactly, and DuckDB still applies the prefix boost -> 0.73
    jw("d", "dababdbacr") shouldBe 0.73 +- 1e-12
    // below the threshold the shared prefix must NOT boost
    jw("ABCDEFGH", "ABCXYZQW") shouldBe 0.5833333333333334 +- 1e-12
    // prefix cap 4 (not 5): jaro = 0.8181..; jw = j + 4*0.1*(1-j)
    jw("AAAAA", "AAAAAABBBBB") shouldBe 0.8909090909090909 +- 1e-12
    // zero-window behavior: len-3 strings get window 0, no matches
    jw("abc", "bca") shouldBe 0.0
    // empties: DuckDB scores ANY empty operand 0, including both
    jw("", "") shouldBe 0.0
    jw("", "abc") shouldBe 0.0
    jw("same", "same") shouldBe 1.0
  }

  /** Independent reference: materializes both matched-character lists
    * and the per-position flags the shipped byte-walk never builds. */
  private def refJw(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val win = math.max(math.max(s1.length, s2.length) / 2 - 1, 0)
    val used = Array.fill(s2.length)(false)
    val pairs = s1.indices.flatMap { i =>
      val js = (math.max(0, i - win) to math.min(s2.length - 1, i + win))
        .find(j => !used(j) && s1(i) == s2(j))
      js.foreach(used(_) = true)
      js.map(j => (i, j))
    }
    val m = pairs.length
    if (m == 0) return 0.0
    val aSeq = pairs.map { case (i, _) => s1(i) } // already in s1 order
    val bSeq = pairs.sortBy(_._2).map { case (_, j) => s2(j) }
    val t = aSeq.zip(bSeq).count { case (x, y) => x != y } / 2
    val jaro = (m.toDouble / s1.length + m.toDouble / s2.length + (m - t) / m.toDouble) / 3.0
    val l = s1.zip(s2).take(4).takeWhile { case (x, y) => x == y }.length
    if (jaro >= 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }

  test("shipped byte-walk equals the list-materializing reference on a generated fuzz") {
    val rnd = new scala.util.Random(20260814L)
    val voc = "abcdr "
    for (_ <- 1 to 4000) {
      val s1 = Seq.fill(rnd.nextInt(13))(voc(rnd.nextInt(voc.length))).mkString
      val s2 = Seq.fill(rnd.nextInt(13))(voc(rnd.nextInt(voc.length))).mkString
      withClue(s"'$s1' vs '$s2': ") { jw(s1, s2) shouldBe refJw(s1, s2) }
    }
  }

  test("codegen, interpreted, and direct-call paths agree on real corpus pairs") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val pairs = Tables.part(spark, sf)
      .selectExpr("p_name AS a",
        "concat(substr(p_name, 1, 1), substr(p_name, 3, 1), substr(p_name, 2, 1), substr(p_name, 4)) AS b")
      .distinct()
    val viaSql = pairs.selectExpr("a", "b", "jaro_winkler(a, b) AS s").collect()
    viaSql.length should be > 0
    viaSql.foreach { r =>
      r.getDouble(2) shouldBe jw(r.getString(0), r.getString(1))
    }
    // interpreted path (codegen off) must match codegen
    withClue("interpreted vs codegen drift: ") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val interp = pairs.selectExpr("a", "b", "jaro_winkler(a, b) AS s").collect()
          .map(r => (r.getString(0), r.getDouble(2))).toMap
        viaSql.foreach(r => interp(r.getString(0)) shouldBe r.getDouble(2))
      } finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("null propagation and implicit casts") {
    org.apache.spark.sql.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS a, jaro_winkler('x', CAST(NULL AS STRING)) AS b").head()
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
  }
}
