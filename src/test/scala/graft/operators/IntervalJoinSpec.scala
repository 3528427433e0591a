package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Point-in-interval bin join: half-open boundary semantics, multi-bin
  * intervals, once-per-match output, and the plan guarantee that makes it
  * scale — a hash equi-join on (key, bin), never a nested loop over the
  * range predicate. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600000000L
  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("half-open bounds, multi-bin intervals, one row per match") {
    val points = Seq(
      (1L, "a", ts(0L)),              // exactly at start: included
      (2L, "a", ts(3 * hourUs)),      // exactly at end: excluded
      (3L, "a", ts(2 * hourUs + 5)),  // inside, bin 2 of a 3-bin interval
      (4L, "b", ts(hourUs)),          // right key, but b's window differs
      (5L, "a", ts(10 * hourUs))      // outside any window
    ).toDF("event_id", "k", "ts")
    val intervals = Seq(
      ("a", ts(0L), ts(3 * hourUs)),            // [0h, 3h): spans 3 bins
      ("b", ts(4 * hourUs), ts(5 * hourUs))
    ).toDF("k", "s", "e")
    val out = IntervalJoin.pointInInterval(points, "ts", intervals,
        "s", "e", Seq("k"), binMicros = hourUs)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("an interval ending on a bin boundary does not leak into that bin") {
    val points = Seq((1L, "a", ts(2 * hourUs + 1))).toDF("event_id", "k", "ts")
    val intervals = Seq(("a", ts(0L), ts(2 * hourUs))).toDF("k", "s", "e")
    assert(IntervalJoin.pointInInterval(points, "ts", intervals,
      "s", "e", Seq("k"), hourUs).isEmpty)
  }

  test("plans as an equi-join on (key, bin) — never a nested loop") {
    val points = Seq((1L, "a", ts(0L))).toDF("event_id", "k", "ts")
    val intervals = Seq(("a", ts(0L), ts(hourUs))).toDF("k", "s", "e")
    val plan = IntervalJoin.pointInInterval(points, "ts", intervals,
      "s", "e", Seq("k"), hourUs).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
