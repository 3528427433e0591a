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

  /** Deterministic downsample to a TARGET DOMAIN MIXTURE — the data-mixing
    * step of training-corpus assembly ("make the corpus 50% web, 30% code,
    * 20% papers"). Computes the largest corpus achievable under `target`
    * given the per-domain supply, then keeps exactly the per-domain
    * fraction that lands it: scale S = min_d n_d/t_d (the binding domain
    * survives whole), keep fraction f_d = S·t_d/n_d. Domains not in
    * `target` are dropped. The draw itself is the same content-hash draw
    * as [[stratifiedSample]] — re-run/engine/partitioning stable.
    *
    * Cost: one count aggregation over the domain column (domains are few
    * by definition — the collect is bounded), then a single codegen'd
    * filter; no shuffle of the data itself.
    *
    * Fails loud when a target domain has no rows at all — the requested
    * mixture is unachievable and silently returning an empty corpus would
    * masquerade as a clean run. */
  def targetMixture(df: DataFrame, id: Column, domain: Column,
      target: Map[String, Double], seed: String): DataFrame = {
    require(target.nonEmpty, "target mixture is empty")
    require(target.values.forall(t => t > 0.0 && t <= 1.0),
      s"target weights must be in (0,1]: $target")
    require(math.abs(target.values.sum - 1.0) < 1e-9,
      s"target weights must sum to 1: $target")
    val counts = df.groupBy(domain.cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = target.keys.filterNot(counts.contains)
    require(missing.isEmpty,
      s"target domains absent from the data: ${missing.mkString(", ")}")
    val scale = target.map { case (d, t) => counts(d).toDouble / t }.min
    val fracs = target.map { case (d, t) =>
      d -> math.min(1.0, scale * t / counts(d).toDouble)
    }
    stratifiedSample(df, id, domain, fracs, default = 0.0, seed)
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

  /** Token-budgeted shard CUTTING over a deterministic corpus order —
    * the export-plane primitive [[shardAssign]] cannot give: shards of
    * ≈`budgetTokens` each (count-balanced shards skew by document
    * length; training exports budget TOKENS). Documents are laid out in
    * [[hashDraw]] order (ties by id) and a document belongs to the
    * shard its cumulative START offset falls in — so the boundary
    * sequence, hence every assignment, is a pure function of the
    * corpus, reproducible by any engine.
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a global-order window:
    * the draw's first two hex chars are 256 buckets that are prefixes
    * of the order itself (fixed-width hex sorts like the number), so
    * the running total decomposes into (a) per-bucket token totals → a
    * 256-row cumulative offset table (bounded window, broadcast back)
    * plus (b) a within-bucket running sum whose window partition is
    * ~corpus/256 — the agg-before-window discipline; nothing ever
    * sorts or windows the corpus in one partition. More buckets =
    * a longer draw prefix, same two levels.
    *
    * Output: id, `n_tokens`, `offset_tokens` (tokens strictly before
    * the doc in corpus order), `shard` = offset div budget. */
  def packShardsByBudget(df: DataFrame, idCol: String, tokens: Column,
      budgetTokens: Long, seed: String): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens must be positive")
    val base = df.select(col(idCol), tokens.cast("long").as("n_tokens"),
        hashDraw(col(idCol), seed).as("__draw"))
      .withColumn("__b", substring(col("__draw"), 1, 2))
    val offW = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ 256 rows: the one intentionally-global window, bounded by
    // construction (same contract as ts1/ts2's agg-before-window).
    val offsets = base.groupBy("__b").agg(sum("n_tokens").as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(offW), lit(0L)))
      .select("__b", "__off")
    val w = Window.partitionBy("__b")
      .orderBy(col("__draw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "__b")
      .withColumn("offset_tokens",
        col("__off") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("offset_tokens"),
        expr(s"CAST(offset_tokens div ${budgetTokens}L AS BIGINT)")
          .as("shard"))
  }

  /** Deterministic shard id in [0, numShards): the 32-bit [[hashDraw]]
    * mod the shard count. Stable under repartition/retry/engine (the
    * same hex→int mod is one CAST in DuckDB), uniform to within the
    * 32-bit modulo bias — ≤ numShards/2³² ≈ 1.5e-5 at the 65536 cap
    * (a 16-bit draw would skew 2× whenever numShards doesn't divide
    * 65536) — the assignment step of a training-data export, where a
    * shard must be reconstructible from the id alone (no global
    * shuffle, no counter). */
  def shardAssign(id: Column, numShards: Int, seed: String): Column = {
    require(numShards > 0 && numShards <= 65536,
      s"numShards $numShards outside (0, 65536]")
    conv(hashDraw(id, seed), 16, 10).cast("long") % numShards
  }

  /** Deterministic k-per-group sample — "give me k examples from every
    * language / domain / quality bucket", the inspection-and-eval
    * sampling step of corpus work. Each row draws a 48-bit content-hash
    * rank (same family as [[hashDraw]] — stable under repartition,
    * retries and engines); the k smallest draws per group win through
    * the bounded top-k aggregate — k rows of state per group on every
    * executor, map-side partials, never a window over raw rows. 48 bits
    * fit a double exactly, and fixed-width hex compares like the number
    * it encodes, so an oracle replays the ordering from the same md5
    * hex. Ties (a 48-bit collision) break to the lower id on both
    * sides. Output: group columns + `sample_id`. */
  def samplePerGroup(df: DataFrame, groupCols: Seq[String], id: Column,
      k: Int, seed: String): DataFrame = {
    require(k > 0, s"sample size k=$k must be positive")
    val draw = substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 12)
    // negate: topKByScore keeps the HIGHEST scores; we want smallest draws
    val score = -conv(draw, 16, 10).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.plans.expressions.topKByScore(score, id, k).as("__top"))
      .select(groupCols.map(col) :+ explode(col("__top")).as("__p"): _*)
      .select(groupCols.map(col) :+ col("__p.id").as("sample_id"): _*)
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much more
    * likely its hashed-n-gram bag is under a TARGET distribution than
    * under the raw-corpus distribution — the standard recipe for "select
    * pretraining data that looks like the high-quality target" at corpus
    * scale, where a real LM forward pass per document is unaffordable.
    *
    * Model: unigram + bigram features over the normalized word stream,
    * hashed into `numBuckets` buckets (the paper's hashed generative
    * model); per-bucket add-1-smoothed log-probabilities under the
    * target slice (`isTarget`) and under the whole corpus; a document's
    * log-weight is the sum over its feature OCCURRENCES of
    * `log p_target(b) − log p_raw(b)`. Everything is integer
    * fixed-point: the hash is the md5 family every sampling op here
    * replays cross-engine, the log is [[SearchFunctions.ilog2x1024]]
    * (1/1024ths of a bit), and per-feature terms are integral BEFORE
    * summation — so the weights, and any top-k selection over them, are
    * bit-identical on any engine (the DuckDB oracle replays the whole
    * chain).
    *
    * Scale shape (100 TB): feature explode is map-side; the
    * (doc, bucket) pre-aggregation bounds reducer skew the way the
    * bigram-LM does; bucket statistics are ONE aggregation with
    * `numBuckets`-bounded state; the weight table (≤ numBuckets rows)
    * broadcasts back, so the corpus never shuffles on a feature key;
    * the per-doc sum is the only corpus-scale shuffle. Selection
    * composes as `ORDER BY logw DESC LIMIT k` — TakeOrderedAndProject,
    * never a global sort.
    *
    * Output: passthrough columns + `logw_1024` (fixed-point log₂ weight)
    * + `n_features` (occurrence count). Empty text still carries its
    * single ""-token unigram, so every input row surfaces. */
  def dsirLogWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      numBuckets: Int,
      seed: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets $numBuckets outside (0, 2^20]")
    import SearchFunctions.ilog2x1024
    val keyCols = (idCol +: passthrough).map(col)
    val withB = hashedNgramBuckets(df, textCol,
      keyCols :+ isTarget.as("__t"), numBuckets, seed)
    // (doc, bucket)-level pre-aggregation: bounds reducer skew AND is the
    // input to both the bucket stats and the per-doc weight sum.
    val pf = withB
      .groupBy(keyCols ++ Seq(col("__t"), col("__b")): _*)
      .agg(count(lit(1)).as("__c"))
    val cb = pf.groupBy(col("__b")).agg(
      sum(col("__c")).as("__cr"),
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__ct"))
    val tot = cb.agg(sum(col("__cr")).as("__totr"), sum(col("__ct")).as("__tott"))
    val d = lit(numBuckets.toLong)
    val weights = cb.crossJoin(broadcast(tot)).select(col("__b"),
      ((ilog2x1024(col("__ct") + 1L) - ilog2x1024(col("__tott") + d)) -
        (ilog2x1024(col("__cr") + 1L) - ilog2x1024(col("__totr") + d)))
        .as("__w"))
    pf.join(broadcast(weights), "__b")
      .groupBy(keyCols: _*)
      .agg(sum(col("__c") * col("__w")).as("logw_1024"),
        sum(col("__c")).as("n_features"))
  }

  /** Shared hashed-n-gram featurizer of [[dsirLogWeights]] and
    * [[ClassifierFunctions]]: one row per unigram+bigram OCCURRENCE,
    * `carry` columns plus `__b` = md5-hashed feature bucket. The feature
    * definition (normalize → split; adjacent-pair space-joined bigrams —
    * a one-word doc contributes no bigram, never a wrapped pair; bucket
    * = first 8 md5 hex chars of "seed:feature" mod numBuckets) is a
    * cross-engine contract: every oracle replays it as
    * `CAST(('0x' || substr(md5(seed || ':' || f), 1, 8)) AS BIGINT) % B`.
    * Keep the two spellings in sync. */
  private[functions] def hashedNgramBuckets(df: DataFrame, textCol: String,
      carry: Seq[Column], numBuckets: Int, seed: String): DataFrame = {
    val ws = split(TextFunctions.normalize(col(textCol)), " ")
    val bigrams = when(size(col("__ws")) < 2, array().cast("array<string>"))
      .otherwise(expr(
        "zip_with(slice(__ws, 1, size(__ws) - 1), " +
          "slice(__ws, 2, size(__ws) - 1), (a, b) -> concat(a, ' ', b))"))
    val feats = df.withColumn("__ws", ws)
      .select(carry :+ explode(concat(col("__ws"), bigrams)).as("__f"): _*)
    val bucket =
      conv(substring(md5(concat(lit(seed + ":"), col("__f"))), 1, 8), 16, 10)
        .cast("long") % numBuckets
    feats.withColumn("__b", bucket).drop("__f")
  }
}
