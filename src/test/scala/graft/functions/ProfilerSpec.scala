package graft.functions

import graft.SparkSpec

/** One-pass table profiler: per-column nulls/distincts/min/max from a
  * single aggregate, and the approx mode's no-Expand plan shape. */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Option("a"), Option(10)),
    (2L, Option.empty[String], Option(20)),
    (3L, Option("b"), Option.empty[Int]),
    (4L, Option("a"), Option(10))
  ).toDF("id", "s", "v")

  test("per-column nulls, distincts, min/max") {
    val p = Profiler.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
    assert(p("v") === ((4L, 1L, 2L, "10", "20")))
  }

  test("approx mode: same triage numbers at tiny n, and NO Expand in the plan") {
    val p = Profiler.profile(df, Seq("id", "s", "v"), exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL++ is exact at cardinalities this small
    assert(p === Map("id" -> 4L, "s" -> 2L, "v" -> 2L))
    // the scale rationale: approx profiling must not pay the multi-
    // count-distinct Expand (input duplicated per aggregated column)
    val approxPlan = Profiler.profile(df, Seq("id", "s", "v"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), "approx profile must be Expand-free")
    val exactPlan = Profiler.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact multi-distinct goes through Expand")
  }

  test("all-null and single-value columns profile without surprises") {
    val odd = Seq((Option.empty[String], "k"), (Option.empty[String], "k"))
      .toDF("n", "c")
    val p = Profiler.profile(odd, Seq("n", "c")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), Option(r.getString(4))))).toMap
    assert(p("n") === ((2L, 0L, None)))
    assert(p("c") === ((0L, 1L, Some("k"))))
  }
}
