package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q85 CDC compaction + q91 SCD-2 invariants: the compacted state is
  * exactly one row per surviving key with the true latest version, and
  * the SCD-2 intervals tile each key's timeline with one open interval.
  */
class CompactionSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q85 keeps one latest row per non-tombstoned user") {
    val compacted = SparkEntry.queries("q85_cdc_compact")(spark, sf)
    val byUser = compacted.groupBy(col("user_id")).count()
      .filter(col("count") > 1).count()
    byUser shouldBe 0L

    val e = Tables.events(spark, sf)
    val users = e.select(col("user_id")).distinct().count()
    val tombstoned = e.withColumn("rn", expr(
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)"))
      .filter(col("rn") === 1 && col("event_type") === "error").count()
    compacted.count() shouldBe (users - tombstoned)
  }

  test("q91 intervals tile each user's timeline with exactly one open interval") {
    val scd = SparkEntry.queries("q91_scd2")(spark, sf).cache()
    val e = Tables.events(spark, sf)
    scd.count() shouldBe e.count() // every event becomes a version
    scd.filter(col("is_current") === 1).groupBy(col("user_id")).count()
      .filter(col("count") =!= 1).count() shouldBe 0L
    // tiling: each version's valid_to equals the next version's valid_from
    val gaps = scd.withColumn("next_from", expr(
        "lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)"))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    gaps.count() shouldBe 0L
  }
}
