package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** `floor(frac · 2³²)` as 8 lowercase hex chars — the split threshold.
    * `frac >= 1.0` returns `"g"`, which sorts above every 8-hex draw, so a
    * 1.0 fraction keeps ALL rows (a clamped `"ffffffff"` would drop the
    * 2⁻³² of rows whose draw is exactly the max under the strict `<`). */
  private[functions] def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac outside [0,1]")
    if (frac >= 1.0) "g" else f"${(frac * 4294967296L).toLong}%08x"
  }

  /** Uniform [0, 2³²) draw as fixed-width hex: substring(md5(seed:id),1,8).
    * Deterministic per (seed, id); change `seed` for an independent draw.
    * A null id draws null (concat null-propagates — matching what
    * `'seed:' || id` does in any SQL engine reproducing the split), so
    * null-id rows fall to the `otherwise` side of [[splitLabel]] and are
    * never kept by [[stratifiedSample]]. */
  def hashDraw(id: Column, seed: String): Column =
    substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8)

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

  /** Sequence packing — the concat-then-chunk layout step that turns a
    * tokenized corpus into fixed-budget training sequences (GPT-style
    * packing: documents are laid end-to-end and cut every `budgetTokens`;
    * a document may straddle a cut). Emits, per document, the shard it
    * lands in, the index of the training sequence its first token falls
    * into, and its token offset inside that sequence — enough for a writer
    * to materialize the packed sequences without any further shuffle.
    *
    * Layout is fully deterministic: shard = id mod `numShards`, order
    * within a shard = id — reproducible by any engine, independent of
    * partitioning (the q_samp3 oracle recomputes it in DuckDB). The
    * running offset is a per-shard window (one shuffle on shard, one sort
    * per shard); pick `numShards` ≳ cluster cores so no reducer holds more
    * than ~corpus/numShards tokens — the window never goes global.
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      budgetTokens: Long, numShards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens must be positive")
    require(numShards > 0, s"numShards $numShards must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.select(col(idCol), tokens.cast("long").as("__tok"),
        pmod(col(idCol), lit(numShards.toLong)).as("shard"))
      .withColumn("__start", sum(col("__tok")).over(w) - col("__tok"))
      .select(col(idCol), col("shard"),
        floor(col("__start") / lit(budgetTokens.toDouble)).cast("long").as("seq"),
        (col("__start") % lit(budgetTokens)).as("seq_offset"))
  }
}
