package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.expressions

/** Bloom-gated incremental exact dedup (DedupFunctions.bloomGatedNewDocs)
  * and the codegen'd BloomMightContainLong probe. The governing property:
  * the bloom filter is an ACCELERATOR — the answer is exactly
  * batch ∖ corpus by content fingerprint regardless of filter sizing,
  * because false positives are killed by the verify join and false
  * negatives cannot exist. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def antiJoinTruth(batch: Seq[(Long, String)],
      corpus: Seq[(Long, String)]): Set[Long] = {
    val corpusTexts = corpus.map(_._2.trim.toLowerCase.replaceAll("\\s+", " ")).toSet
    batch.filterNot(d =>
      corpusTexts.contains(d._2.trim.toLowerCase.replaceAll("\\s+", " ")))
      .map(_._1).toSet
  }

  private def run(batch: Seq[(Long, String)], corpus: Seq[(Long, String)],
      expectedItems: Long, fpp: Double): Set[Long] = {
    val corpusDf = corpus.toDF("doc_id", "text")
    val batchDf = batch.toDF("doc_id", "text")
    val store = DedupFunctions.fingerprintStore(corpusDf, "doc_id", "text")
    val bloom = DedupFunctions.fingerprintBloom(store, expectedItems, fpp)
    DedupFunctions.bloomGatedNewDocs(batchDf, "doc_id", "text", store, bloom)
      .select("id").as[Long].collect().toSet
  }

  private val corpus = (0L until 50L).map(i => (i, s"corpus document number $i"))
  private val batch =
    (0L until 10L).map(i => (100L + i, s"fresh document number $i")) ++ // new
    (0L until 5L).map(i => (200L + i, s"corpus  DOCUMENT   number ${i * 3}")) // dups modulo normalize

  test("result is exactly batch minus corpus at a well-sized filter") {
    assert(run(batch, corpus, expectedItems = 50, fpp = 0.01) ===
      antiJoinTruth(batch, corpus))
  }

  test("result is unchanged under a degenerate filter full of false positives") {
    // expectedItems=1 over 50 inserted keys saturates the bits: nearly
    // every probe answers "might contain". The verify join must absorb
    // every false positive; the answer cannot change.
    assert(run(batch, corpus, expectedItems = 1, fpp = 0.5) ===
      antiJoinTruth(batch, corpus))
  }

  test("empty corpus accepts the whole batch without a join match") {
    val empty = Seq.empty[(Long, String)]
    assert(run(batch, empty, expectedItems = 1, fpp = 0.01) === batch.map(_._1).toSet)
  }

  test("duplicate within the batch is not a corpus duplicate") {
    // Two batch docs share a fingerprint that the corpus has never seen:
    // both are "new" — cross-batch dedup is a different operator
    // (exactDuplicateGroups / CorpusGate), not this gate's contract.
    val b = Seq((1L, "twin text"), (2L, "twin  TEXT")) // same normalized form
    assert(run(b, corpus, expectedItems = 50, fpp = 0.01) === Set(1L, 2L))
  }

  test("bloomMightContain matches the filter object and null-propagates") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 100L).foreach(i => bf.putLong(i * 7))
    val keys = (0L until 100L).map(i => Some(i)) :+ Option.empty[Long]
    val got = keys.toDF("k")
      .select(col("k"), expressions.bloomMightContain(bf, col("k")).as("m"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got(null.asInstanceOf[Any]) == null, "null key must yield null")
    keys.flatten.foreach { k =>
      assert(got(k) == bf.mightContainLong(k), s"mismatch vs filter at key $k")
    }
    // No false negatives on genuinely inserted keys:
    (0L until 100L).foreach(i => assert(bf.mightContainLong(i * 7)))
  }
}
