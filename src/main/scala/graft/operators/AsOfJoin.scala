package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-within-tolerance temporal join ("as-of" join).
  *
  * Reference semantics: the USD price enrichment looks up a
  * TokenHistoricalPrice within ±24 h of the donation/payout time and takes
  * *a first* row in the window (tokens/models.py:64-74; settings.py:82).
  * That pick is nondeterministic in the reference; we pin it to
  * *nearest by |Δt|, ties by right-side key ascending* — a deterministic
  * refinement (SURVEY §2.4 J6).
  *
  * Implementation: equi-join on the partition key (token / user) plus a
  * range predicate, then a window keeps the nearest right row per left row.
  * The equi-key makes this a plain shuffled hash/sort-merge join — NOT a
  * cross join — so it scales: each side shuffles once on the key. For a
  * 100 TB fact side with a small dimension (token prices), the dimension
  * side broadcasts and the fact side never shuffles at all.
  *
  * A bucketed/sorted layout on (key, time) would allow a zip-partitions
  * merge as a further step; the windowed form is what Catalyst handles
  * natively today and keeps AQE skew-handling in play.
  */
object AsOfJoin {

  /** @param left       fact side
    * @param right      lookup side
    * @param leftKeys   equi-join key column names on `left`
    * @param rightKeys  equi-join key column names on `right` (same arity)
    * @param leftTime   event-time column on `left` (TimestampType)
    * @param rightTime  event-time column on `right`
    * @param tolerance  max |Δt| in seconds (reference: 24*3600)
    * @param leftId     unique id column on `left` (window partition key)
    * @param joinType   "inner" drops unmatched fact rows; "left" keeps them
    *                   with null right columns (one output row per fact row
    *                   — what enrichment jobs need: a donation with no
    *                   in-window price keeps null USD rather than vanish)
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Long,
      leftId: String,
      rightTieBreak: String,
      joinType: String = "inner"): DataFrame = {

    val l = left.alias("l")
    val r = right.alias("r")
    val keyCond = leftKeys.zip(rightKeys).map { case (lk, rk) =>
      col(s"l.$lk") === col(s"r.$rk")
    }.reduce(_ && _)
    // Delta in microseconds: exact integer arithmetic, no float rounding,
    // portable to the DuckDB oracle (epoch_us).
    val delta = abs(
      unix_micros(col(s"l.$leftTime")) - unix_micros(col(s"r.$rightTime")))
    val joined = l.join(r, keyCond && delta <= tolerance * 1000000L, joinType)
      .withColumn("__delta_us", delta)

    // Matched rows (non-null delta) outrank a left-join's null row, so a
    // fact row with any match never keeps the unmatched variant.
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col("__delta_us").asc_nulls_last, col(s"r.$rightTieBreak").asc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Backward ("at-or-before") as-of join: for each fact row, the LATEST
    * lookup row with `rightTime <= leftTime` inside a bounded lookback —
    * the classic price-lookup semantics (DuckDB's ASOF JOIN, Pandas
    * merge_asof), and the batch twin of the streaming
    * `EventAnalytics.streamAsOfEnrich`. Deterministic refinement of the
    * reference's "a first row in the window" pick (tokens/models.py:64-74):
    * smallest lag wins, ties by right-side key ascending.
    *
    * Same scale shape as [[nearest]]: equi-join on the partition key plus
    * a range predicate — one shuffle per side, broadcastable dimension,
    * AQE skew handling intact. The bounded `lookback` is what keeps the
    * join state finite; an unbounded as-of would force a full-history
    * range join.
    *
    * @param lookback max (leftTime − rightTime) in seconds, ≥ 0
    * @param joinType "left" keeps fact rows with no in-window lookup row
    *                 (null right columns) — the enrichment contract
    */
  def before(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      lookback: Long,
      leftId: String,
      rightTieBreak: String,
      joinType: String = "inner"): DataFrame = {

    val l = left.alias("l")
    val r = right.alias("r")
    val keyCond = leftKeys.zip(rightKeys).map { case (lk, rk) =>
      col(s"l.$lk") === col(s"r.$rk")
    }.reduce(_ && _)
    // Signed lag in microseconds: 0 ≤ lag ≤ lookback admits only
    // at-or-before rows; exact integer arithmetic, portable to the
    // DuckDB oracle (epoch_us).
    val lag = unix_micros(col(s"l.$leftTime")) - unix_micros(col(s"r.$rightTime"))
    val joined = l.join(r,
        keyCond && lag >= 0L && lag <= lookback * 1000000L, joinType)
      .withColumn("__lag_us", lag)

    // Smallest lag = most recent at-or-before row; matched rows (non-null
    // lag) outrank a left-join's null row.
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col("__lag_us").asc_nulls_last,
        col(s"r.$rightTieBreak").asc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
