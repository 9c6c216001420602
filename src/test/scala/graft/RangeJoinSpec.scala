package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Point-in-interval range join on a hand-computed dataset, including
  * interval spans larger than the bucket (multi-bucket explosion) and
  * boundary inclusivity. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("matches inclusive bounds, handles intervals spanning many buckets, respects keys") {
    val points = Seq(
      (1L, 1L, ts(100)),  // inside i1
      (2L, 1L, ts(200)),  // == i1.hi (inclusive)
      (3L, 1L, ts(201)),  // just outside
      (4L, 1L, ts(950)),  // inside long interval i2 (spans many 100s buckets)
      (5L, 2L, ts(100)))  // right key has no intervals
      .toDF("event_id", "user_id", "pt")
    val intervals = Seq(
      (10L, 1L, ts(50), ts(200)),   // i1
      (11L, 1L, ts(300), ts(1000))) // i2: 7 buckets at bucket=100s
      .toDF("ival_id", "ikey", "lo", "hi")

    val out = RangeJoin.pointInInterval(points, "user_id", "pt",
        intervals, "ikey", "lo", "hi", bucketSeconds = 100L)
      .select("event_id", "ival_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (4L, 11L)))
  }

  test("overlapping intervals each match; no duplicate pairs from bucket explosion") {
    val points = Seq((1L, 1L, ts(500))).toDF("event_id", "user_id", "pt")
    val intervals = Seq(
      (10L, 1L, ts(0), ts(600)),
      (11L, 1L, ts(450), ts(550)))
      .toDF("ival_id", "ikey", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "user_id", "pt",
        intervals, "ikey", "lo", "hi", bucketSeconds = 100L)
      .select("event_id", "ival_id").as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((1L, 10L), (1L, 11L)), s"got $out")
  }
}
