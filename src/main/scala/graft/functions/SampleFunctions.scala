package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting primitives for training-data curation:
  * train/test splits and per-stratum downsampling that are
  *
  *  - **stable under re-runs, repartitioning and task retries** — the draw
  *    is a content hash of (seed, id), not RNG state, so the same row lands
  *    on the same side of the split on every engine and every execution
  *    (`df.sample`/`rand()` give neither: both are partition-layout
  *    dependent);
  *  - **engine-portable** — md5 is bit-identical everywhere, so a split
  *    materialized by this engine can be reproduced exactly by any other
  *    SQL engine for audit (the DuckDB oracles for q_samp1/q_samp2 run the
  *    same expression);
  *  - **cheap at 100 TB** — one codegen'd hash + string compare per row, no
  *    shuffle, no state.
  *
  * The draw is the first 8 hex chars of md5("seed:id"), compared
  * lexicographically against a precomputed hex threshold —
  * fixed-width lowercase hex compares identically to the numeric value, so
  * no engine-specific hex→int conversion is needed.
  */
object SampleFunctions {

  /** `floor(frac · 2³²)` as 8 lowercase hex chars — the split threshold. */
  private[functions] def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac outside [0,1]")
    f"${math.min((frac * 4294967296L).toLong, 4294967295L)}%08x"
  }

  /** Uniform [0, 2³²) draw as fixed-width hex: substring(md5(seed:id),1,8).
    * Deterministic per (seed, id); change `seed` for an independent draw. */
  def hashDraw(id: Column, seed: String): Column =
    substring(md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 8)

  /** 'train'/'test' split label at `trainFrac` (exact in expectation;
    * per-row deterministic). */
  def splitLabel(id: Column, trainFrac: Double, seed: String): Column =
    when(hashDraw(id, seed) < lit(hexThreshold(trainFrac)), lit("train"))
      .otherwise(lit("test"))

  /** Keep ~`fractions(stratum)` of rows per stratum (class-balancing
    * downsample — e.g. cap over-represented languages); strata not in the
    * map keep `default`. One filter, no shuffle. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      fractions: Map[String, Double], default: Double,
      seed: String): DataFrame = {
    val threshold = fractions.foldLeft(lit(hexThreshold(default))) {
      case (acc, (value, frac)) =>
        when(stratum === value, lit(hexThreshold(frac))).otherwise(acc)
    }
    df.filter(hashDraw(id, seed) < threshold)
  }
}
