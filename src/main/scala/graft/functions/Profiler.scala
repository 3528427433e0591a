package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality summary every ingestion pipeline
  * runs before trusting a new drop: per-column null counts, distinct
  * cardinality, and min/max, in ONE pass over the table (the per-column
  * rows are exploded out of a single 1-row aggregate, never one scan per
  * column).
  *
  * Min/max are rendered as strings so heterogeneous columns share one
  * output schema; callers should profile PORTABLY-RENDERED types
  * (integers, strings, dates — not doubles, whose string forms are
  * engine-specific).
  *
  * Distinct counts: `exact = true` uses `count(distinct)` — Spark plans
  * the multi-column form through an Expand (input duplicated per
  * distinct aggregate, one shuffle). At 100 TB profile with
  * `exact = false` (HLL++ `approx_count_distinct`, single pass, no
  * Expand, mergeable partials) — the profiler's job is triage, and ±2%
  * on cardinality changes no triage decision.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"), nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map(c => struct(lit(c).as("column"),
      (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value")))
    wide.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
  }
}
