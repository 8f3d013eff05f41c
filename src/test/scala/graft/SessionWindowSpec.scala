package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q46's manual lag→flag→running-sum sessionization must agree with
  * Spark's native `session_window` on real data. (Edge-case caveat the
  * operators differ on: a gap of EXACTLY the 30-min threshold stays
  * in-session for q46's `> INTERVAL 30` test but closes a native
  * session_window, whose window end is exclusive — microsecond event
  * times make an exact 30:00.000000 gap vanishingly unlikely, and this
  * dataset has none.)
  */
class SessionWindowSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("manual sessionization matches native session_window on sf0.001") {
    val manual = SparkEntry.queries("q46_sessionize")(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val native = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    native.size should be > 0
    manual shouldBe native
  }
}
