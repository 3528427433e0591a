package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality filtering — the classifier recipe of production corpus
  * curation (CCNet's fastText filter; the "looks like a trusted corpus"
  * classifier of the GPT-3/PaLM data pipelines): train a multinomial
  * Naive Bayes model over md5-hashed unigram+bigram features on a LABELED
  * slice, persist the model as a plain (numBuckets+1)-row table, then
  * score ANY corpus with one broadcast join.
  *
  * Distinct from [[SampleFunctions.dsirLogWeights]], which fits and
  * scores the same corpus in a single pass: here training and inference
  * are separate phases over separate data, and the model is a reusable,
  * persistable artifact — the production shape, where one curated
  * labeled set filters every incoming crawl batch for months. (The
  * featurizer is shared — [[SampleFunctions.hashedNgramBuckets]] — so a
  * DSIR weight table and an NB model speak the same feature space.)
  *
  * Everything is counting plus fixed-point [[SearchFunctions.ilog2x1024]]
  * arithmetic with integral per-occurrence terms, so the model weights,
  * scores and decisions replay bit-for-bit on any engine — no IEEE sums,
  * no training-order dependence (NB has no iterative optimizer: its
  * sufficient statistics are one aggregation).
  *
  * Scale shape (100 TB): training is one map-side-combined aggregation
  * with numBuckets-bounded state over the labeled slice plus a 1-row
  * prior aggregate; the model never exceeds numBuckets+1 rows; inference
  * is map-side feature hashing, a (doc, bucket) pre-aggregation that
  * bounds reducer skew, a broadcast join against the model and one
  * per-doc sum — the corpus never shuffles on a feature key.
  */
object ClassifierFunctions {
  import SearchFunctions.ilog2x1024

  /** Train a multinomial NB log-ratio model on `labeled`.
    *
    * Output table: `(b, w_1024)` for EVERY bucket 0..numBuckets-1 —
    * per-occurrence log-likelihood ratio
    * `log p(b|pos) − log p(b|neg)` with add-1 smoothing over
    * occurrence counts (buckets unseen in training carry their smoothing
    * weight, so inference never special-cases a missing feature) — plus
    * one row `b = -1` whose `w_1024` is the add-1-smoothed log-prior
    * `log((n_pos_docs+1)/(n_neg_docs+1))`. All values are fixed-point
    * 1/1024ths of a bit (log₂). */
  def trainNbLogModel(labeled: DataFrame, textCol: String,
      isPositive: Column, numBuckets: Int, seed: String): DataFrame =
    nbModelFromCounts(
      trainNbCounts(labeled, textCol, isPositive, numBuckets, seed),
      numBuckets)

  /** INCREMENTAL training — NB's sufficient statistics are ADDITIVE, so
    * the count table is a mergeable summary (the inc1/inc2 partial-agg
    * contract applied to the classifier): each labeled batch folds to
    * its own counts with one aggregation, count tables merge by plain
    * summation, and [[nbModelFromCounts]] turns any merged table into
    * the same model [[trainNbLogModel]] would produce on the unioned
    * data — bit-for-bit, because counting commutes and the fixed-point
    * log runs only at derivation time. At 100 TB this is the retrain
    * path: a new labeled batch costs one scan of ITSELF, never of
    * labeled history.
    *
    * Count table: `(b, cp, cn)` per OCCURRENCE for every bucket
    * 0..numBuckets-1, plus row `b = -1` holding per-class DOC counts. */
  def trainNbCounts(labeled: DataFrame, textCol: String,
      isPositive: Column, numBuckets: Int, seed: String): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets $numBuckets outside (0, 2^20]")
    val spark = labeled.sparkSession
    val withB = SampleFunctions.hashedNgramBuckets(labeled, textCol,
      Seq(isPositive.as("__t")), numBuckets, seed)
    val cb = withB.groupBy(col("__b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("__cn"))
    val full = spark.range(numBuckets.toLong).select(col("id").as("b"))
      .join(broadcast(cb), col("b") === col("__b"), "left")
      .select(col("b"),
        coalesce(col("__cp"), lit(0L)).as("cp"),
        coalesce(col("__cn"), lit(0L)).as("cn"))
    val docCounts = labeled.agg(
        sum(when(isPositive, 1L).otherwise(0L)).as("cp"),
        sum(when(isPositive, 0L).otherwise(1L)).as("cn"))
      .select(lit(-1L).as("b"), col("cp"), col("cn"))
    full.unionByName(docCounts)
  }

  /** Merge any number of [[trainNbCounts]] tables: plain per-bucket
    * summation (the doc-count row merges by the same rule). Associative
    * and commutative — fold daily batches, or a tree of them. */
  def mergeNbCounts(counts: Seq[DataFrame]): DataFrame = {
    require(counts.nonEmpty, "nothing to merge")
    counts.reduce(_.unionByName(_)).groupBy(col("b"))
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
  }

  /** Derive the [[trainNbLogModel]]-shaped model from a (possibly
    * merged) count table — identical output to training on the unioned
    * labeled data. */
  def nbModelFromCounts(counts: DataFrame, numBuckets: Int): DataFrame = {
    val buckets = counts.filter(col("b") >= 0)
    val tot = buckets.agg(
      coalesce(sum(col("cp")), lit(0L)).as("__tp"),
      coalesce(sum(col("cn")), lit(0L)).as("__tn"))
    val d = lit(numBuckets.toLong)
    val weights = buckets.crossJoin(broadcast(tot)).select(col("b"),
      ((ilog2x1024(col("cp") + 1L) - ilog2x1024(col("__tp") + d)) -
        (ilog2x1024(col("cn") + 1L) - ilog2x1024(col("__tn") + d)))
        .as("w_1024"))
    val prior = counts.filter(col("b") === -1L).select(lit(-1L).as("b"),
      (ilog2x1024(col("cp") + 1L) - ilog2x1024(col("cn") + 1L))
        .as("w_1024"))
    weights.unionByName(prior)
  }

  /** Score `docs` under a [[trainNbLogModel]] model (passed as a
    * DataFrame — read it back from parquet or pipe it straight through).
    *
    * Output: `idCol` + passthrough + `score_1024` (log-odds in 1/1024ths
    * of a bit: per-occurrence likelihood ratios summed, plus the prior),
    * `n_features` (occurrence count) and `predicted_positive`
    * (score > 0 — the Bayes decision at equal misclassification cost).
    * `numBuckets`/`seed` must match training — the model's feature space
    * is defined by them. Empty text still carries its ""-token unigram,
    * so every input row surfaces. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, numBuckets: Int, seed: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val keyCols = (idCol +: passthrough).map(col)
    val withB = SampleFunctions.hashedNgramBuckets(docs, textCol,
      keyCols, numBuckets, seed)
    // (doc, bucket) pre-aggregation: bounds reducer skew before the
    // model join, same discipline as dsir/bigram-LM.
    val pf = withB.groupBy(keyCols :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = model.filter(col("b") >= 0)
    val prior = model.filter(col("b") === -1)
      .select(col("w_1024").as("__prior"))
    pf.join(broadcast(w), pf("__b") === w("b"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__c") * col("w_1024")).as("__ll"),
        sum(col("__c")).as("n_features"))
      .crossJoin(broadcast(prior))
      .select(keyCols ++ Seq(
        (col("__ll") + col("__prior")).as("score_1024"),
        col("n_features"),
        ((col("__ll") + col("__prior")) > 0).as("predicted_positive")): _*)
  }
}
