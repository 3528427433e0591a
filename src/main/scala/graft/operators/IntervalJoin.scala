package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join — "which window does this event fall in" — as a
  * bin-bucketed EQUI-join, never a nested loop.
  *
  * The naive formulation `points JOIN intervals ON key AND ts BETWEEN
  * start AND end` has no equi-condition on time, so Spark plans a
  * BroadcastNestedLoopJoin (or a cartesian when neither side broadcasts):
  * quadratic per key, the classic range-join trap at 100 TB. The standard
  * fix (the same trick as [[AsOfJoin]]'s equi-key bind): quantize time
  * into fixed bins, explode each interval into the bins it covers
  * (bounded by length/binWidth + 1 rows — pick binWidth near the typical
  * interval length), hash-join points to interval-bins on
  * (keys…, bin) — a plain shuffled/broadcast equi-join — and verify the
  * exact half-open `start ≤ ts < end` on the candidates. Each point
  * lands in exactly one bin, so a (point, interval) candidate appears
  * once and no distinct is needed.
  */
object IntervalJoin {

  /** Join `points` to the intervals they fall in (half-open
    * [start, end)), equi-keyed on `keys` plus the time bin. All three
    * time columns must be timestamps; `binMicros` is the bucket width.
    * Output: every points column plus the interval's columns (minus its
    * join keys). */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keys: Seq[String], binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    val p = points.withColumn("__bin",
      floor(unix_micros(col(tsCol)) / binMicros))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binMicros),
        // end is exclusive: an interval ending exactly on a bin boundary
        // does not cover that bin
        floor((unix_micros(col(endCol)) - 1) / binMicros))))
    p.join(iv, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
