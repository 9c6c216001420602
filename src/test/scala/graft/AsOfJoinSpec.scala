package graft

import org.apache.spark.sql.functions.when
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics on a hand-computed dataset. */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof picks the latest right row at or before each left ts, per key; left-join semantics") {
    val left = Seq(
      (1L, 10L, 100), // key 1 at t=10
      (2L, 10L, 101), // key 1 at t=10 — second event, same ts
      (3L, 25L, 102), // key 1 at t=25
      (4L, 5L, 103),  // key 1 before any right row
      (5L, 50L, 104)  // key 2 with no right rows at all
    ).toDF("event_id", "ts", "payload")
      .withColumn("key", when($"event_id" === 5L, 2L).otherwise(1L))
    val right = Seq(
      (1L, 10L, "a"), // matches ts=10 exactly (>= semantics)
      (1L, 20L, "b"),
      (1L, 30L, "c")
    ).toDF("rkey", "rts", "tag")

    val out = AsOfJoin.asof(left, right, "key", "rkey", "ts", "rts", Seq("tag"))
      .select("event_id", "tag").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, Some("a")), // equal ts matches
      (2L, Some("a")),
      (3L, Some("b")), // 20 <= 25 < 30
      (4L, None),      // before first right row
      (5L, None)))     // key with no right side
  }

  test("all value columns come from the SAME matched right row (no cross-row blending)") {
    val left = Seq((1L, 1L, 30L)).toDF("event_id", "key", "ts")
    val right = Seq(
      (1L, 10L, Option("old_a"), Option("old_b")),
      (1L, 20L, Option("new_a"), Option.empty[String]) // newest row has NULL b
    ).toDF("rkey", "rts", "a", "b")
    val out = AsOfJoin.asof(left, right, "key", "rkey", "ts", "rts", Seq("a", "b"))
      .select("a", "b").as[(Option[String], Option[String])].head()
    // b must be the newest row's NULL, never backfilled from the older row
    assert(out == ((Some("new_a"), None)))
  }

  test("NULL keys never match (SQL equality), but left rows still pass through") {
    val left = Seq((1L, Option(1L), 10L), (2L, Option.empty[Long], 10L))
      .toDF("event_id", "key", "ts")
    val right = Seq((Option(1L), 5L, "a"), (Option.empty[Long], 5L, "nullkey"))
      .toDF("rkey", "rts", "tag")
    val out = AsOfJoin.asof(left, right, "key", "rkey", "ts", "rts", Seq("tag"))
      .select("event_id", "tag").as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, Some("a")), (2L, None)))
  }

  test("salted variant returns identical results to the unsalted plan") {
    val left = (0L until 200L).map(i => (i, i % 3, i % 40)).toDF("event_id", "key", "ts")
    val right = (0L until 30L).map(i => (i % 3, i, s"tag$i")).toDF("rkey", "rts", "tag")
    def run(s: Int) =
      AsOfJoin.asof(left, right, "key", "rkey", "ts", "rts", Seq("tag"), saltBuckets = s)
        .select("event_id", "tag").as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(run(8) == run(1))
  }

  test("asof join plan has a single shuffle (union + one window)") {
    val left = Seq((1L, 10L, 1)).toDF("event_id", "ts", "x").withColumn("key", $"event_id")
    val right = Seq((1L, 5L, "a")).toDF("rkey", "rts", "tag")
    val df = AsOfJoin.asof(left, right, "key", "rkey", "ts", "rts", Seq("tag"))
    val nShuffles = "(?m)^[\\s+*:!-]*Exchange ".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(nShuffles == 1, df.queryExecution.executedPlan.toString)
  }
}
