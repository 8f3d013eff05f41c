package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** saltedJoin must be semantically identical to the plain equi-join it
  * replaces, and must actually spread a hot key across sub-partitions.
  */
class SkewSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("salted join equals plain join on skewed data and spreads the hot key") {
    import spark.implicits._
    // 50k rows, 90% on one hot key
    val big = spark.range(0, 50000)
      .select(col("id"), when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"))
    val dim = spark.range(0, 100).select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))

    val plain = big.join(dim, "k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), first(col("payload")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val salted = Skew.saltedJoin(big, dim, "k", col("id"), 8).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), first(col("payload")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    salted shouldBe plain

    // the hot key's rows now span all 8 sub-keys
    val spread = big.filter(col("k") === 1)
      .select(pmod(xxhash64(col("id")), lit(8L)).as("s"))
      .distinct().count()
    spread shouldBe 8L
  }
}
