package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NB quality classifier: model shape, smoothed-prior math, Bayes
  * decisions on a hand-checkable separable fixture, unseen-feature
  * behavior, repartition stability, and the persistable-model
  * round-trip that distinguishes this operator from the one-pass DSIR
  * scorer. */
class ClassifierFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1024
  private def model(train: DataFrame): DataFrame =
    ClassifierFunctions.trainNbLogModel(train, "text",
      isPositive = col("quality"), numBuckets = B, seed = "t")

  // Balanced, linearly separable: positive and negative vocabularies
  // are disjoint.
  private lazy val train = Seq(
    (1L, "good clean prose sentences", true),
    (2L, "good clean thoughtful prose", true),
    (3L, "spam junk garbage noise", false),
    (4L, "spam junk clickbait noise", false)
  ).toDF("doc_id", "text", "quality")

  test("model is total over the feature space: numBuckets weight rows + one prior row") {
    val m = model(train).collect()
    assert(m.length == B + 1)
    val prior = m.filter(_.getLong(0) == -1L)
    assert(prior.length == 1)
    // Balanced classes (2 vs 2 docs): add-1 prior = il(3) - il(3) = 0.
    assert(prior.head.getLong(1) == 0L)
    assert(m.map(_.getLong(0)).toSet == (-1L until B.toLong).toSet)
  }

  test("Bayes decision separates held-out docs drawn from each vocabulary") {
    val heldout = Seq(
      (10L, "clean thoughtful sentences"),
      (11L, "garbage clickbait junk")
    ).toDF("doc_id", "text")
    val scored = ClassifierFunctions.nbScore(heldout, "doc_id", "text",
        model(train), B, "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(3))).toMap
    assert(scored(10L)._1 > 0 && scored(10L)._2,
      s"positive-vocabulary doc misclassified: ${scored(10L)}")
    assert(scored(11L)._1 < 0 && !scored(11L)._2,
      s"negative-vocabulary doc misclassified: ${scored(11L)}")
  }

  test("unseen features carry the smoothing weight; balanced totals score to the prior") {
    // The balanced fixture has equal per-class occurrence totals
    // (4 words/doc, 2 docs each ⇒ tp = tn), so an entirely-novel doc's
    // buckets all weigh il(1)-il(tp+B) - (il(1)-il(tn+B)) = 0 and its
    // score IS the prior (also 0) — decision falls to not-positive.
    val novel = Seq((20L, "xylophone quasar bumblebee")).toDF("doc_id", "text")
    val r = ClassifierFunctions.nbScore(novel, "doc_id", "text",
      model(train), B, "t").collect().head
    assert(r.getLong(1) == 0L && !r.getBoolean(3))
  }

  test("scores are stable under input repartitioning") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("good prose spam junk word "), col("id") % 17).as("text"))
    val m = model(train)
    def rows(d: DataFrame) = ClassifierFunctions
      .nbScore(d, "doc_id", "text", m, B, "t")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(docs) == rows(docs.repartition(7)))
  }

  test("model round-trips through parquet: persisted model scores identically") {
    val path = tmpDir("nb-model") + "/model"
    model(train).write.parquet(path)
    val persisted = spark.read.parquet(path)
    val docs = Seq((30L, "clean prose junk")).toDF("doc_id", "text")
    def score(m: DataFrame) = ClassifierFunctions
      .nbScore(docs, "doc_id", "text", m, B, "t").collect().head.getLong(1)
    assert(score(persisted) == score(model(train)))
  }

  test("incremental training: merged batch counts yield the exact union model") {
    // NB's sufficient statistics are additive: training per batch and
    // merging count tables must be BIT-IDENTICAL to training once on
    // the union — the retrain-without-history contract.
    val batch1 = train.filter(col("doc_id") <= 2L)
    val batch2 = train.filter(col("doc_id") > 2L)
    def counts(d: DataFrame) = ClassifierFunctions.trainNbCounts(
      d, "text", col("quality"), B, "t")
    val merged = ClassifierFunctions.mergeNbCounts(
      Seq(counts(batch1), counts(batch2)))
    val fromMerged = ClassifierFunctions.nbModelFromCounts(merged, B)
      .collect().map(_.toString).sorted.toSeq
    val fromUnion = model(train)
      .collect().map(_.toString).sorted.toSeq
    assert(fromMerged == fromUnion)
    // The merged counts table stays total: numBuckets + the doc-count row.
    assert(merged.count() == B + 1)
  }

  test("prior reflects class imbalance through add-1 log-odds") {
    val skewed = train.union(Seq(
      (5L, "good extra positive words", true),
      (6L, "more good clean words", true)).toDF("doc_id", "text", "quality"))
    // 4 positive vs 2 negative docs: prior = il(5) - il(3) > 0.
    val prior = model(skewed).filter(col("b") === -1L)
      .collect().head.getLong(1)
    assert(prior > 0L)
  }
}
