package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Stream/batch equivalence (SURVEY.md §5.6): every window the
  * streaming pipeline (q47, append mode, 10-min watermark) emits must
  * carry exactly the counts/sums the batch twin (q44) computes for that
  * window, and the windows it withholds must all be at the tail the
  * watermark hadn't closed.
  */
class StreamBatchSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q47 emitted windows match q44 batch results exactly") {
    val stream = SparkEntry.queries("q47_stream_demo")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("w_start"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v"))).toMap
    val batch = SparkEntry.queries("q44_window_tumble")(spark, sf).collect()
      .map(r => (java.sql.Timestamp.valueOf(r.getAs[java.time.LocalDateTime]("w_start")), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v"))).toMap

    stream.size should be > 0
    // every emitted window agrees with batch
    for ((k, v) <- stream) withClue(k) { batch(k) shouldBe v }
    // withheld windows are only those the final watermark left open:
    // strictly after (max event time - 10 min) truncated to the hour
    val withheld = batch.keySet.diff(stream.keySet)
    if (withheld.nonEmpty) {
      val cutoff = withheld.map(_._1).min
      val emittedAfter = stream.keySet.count(_._1.compareTo(cutoff) > 0)
      emittedAfter shouldBe 0
    }
  }
}
