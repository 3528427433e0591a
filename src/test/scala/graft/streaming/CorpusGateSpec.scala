package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming corpus curation gate: quality gate → within-batch exact +
  * near dedup → near-dup-vs-corpus via the signature store; survivors
  * accumulate, batches never re-read corpus text, replays are
  * idempotent. */
class CorpusGateSpec extends SparkSpec {

  private def jsonl(docs: Seq[(Long, String)]): String =
    docs.map { case (id, t) =>
      s"""{"doc_id": $id, "text": "$t"}"""
    }.mkString("\n")

  private val longA =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val longANear =
    "the quick brown fox jumps over the lazy dog near the river bank tonight"
  private val longB =
    "completely different content about spark query engines and columnar formats"
  private val longC =
    "der schnelle braune fuchs springt und der hund schläft und die katze auch"

  test("gate: quality filter, batch dedup, corpus dedup across batches, replay-safe accounting") {
    val in = tmpDir("gate-in")
    val store = tmpDir("gate-store")
    val ckpt = tmpDir("gate-ckpt")

    // Batch 1: 1 keeps, 2 is its near-dup (dropped within batch), 3 is
    // too short (quality), 4 is an exact dup of 1 at higher id, 5 keeps.
    Files.write(Paths.get(in, "b1.json"), jsonl(Seq(
      1L -> longA, 2L -> longANear, 3L -> "too short", 4L -> longA,
      5L -> longB)).getBytes("UTF-8"))
    val q1 = CorpusGate.start(spark, in, store, ckpt, availableNow = true)
    assert(q1.awaitTermination(300000), "gate stream 1 did not drain")

    val afterB1 = CorpusGate.corpus(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterB1 == Set(1L, 5L))

    // Batch 2: 20 near-dups ACCEPTED doc 1 (corpus store must catch it —
    // without ever reading corpus text), 21 is fresh and keeps.
    Files.write(Paths.get(in, "b2.json"), jsonl(Seq(
      20L -> longANear, 21L -> longC)).getBytes("UTF-8"))
    val q2 = CorpusGate.start(spark, in, store, ckpt, availableNow = true)
    assert(q2.awaitTermination(300000), "gate stream 2 did not drain")

    val afterB2 = CorpusGate.corpus(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterB2 == Set(1L, 5L, 21L))

    // Funnel accounting rows: one per batch, conserved counts.
    val st = CorpusGate.stats(spark, store).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st.keySet == Set(0L, 1L))
    val b1 = st(0L)
    assert(b1.getAs[Long]("n_in") == 5L)
    assert(b1.getAs[Long]("n_quality_dropped") == 1L)
    assert(b1.getAs[Long]("n_exact_dup") == 1L)
    assert(b1.getAs[Long]("n_batch_near_dup") == 1L)
    assert(b1.getAs[Long]("n_corpus_near_dup") == 0L)
    assert(b1.getAs[Long]("n_survivors") == 2L)
    val b2 = st(1L)
    assert(b2.getAs[Long]("n_corpus_near_dup") == 1L)
    assert(b2.getAs[Long]("n_survivors") == 1L)

    // Replaying batch 1's content through curateBatch (the at-least-once
    // case) overwrites its own partitions with identical content — the
    // corpus does not grow and batch 1 never sees later batches.
    import spark.implicits._
    CorpusGate.curateBatch(
      Seq(1L -> longA, 2L -> longANear, 3L -> "too short", 4L -> longA,
        5L -> longB).toDF("doc_id", "text"),
      store, batchId = 0L)
    val afterReplay = CorpusGate.corpus(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterReplay == Set(1L, 5L, 21L))
  }

  test("docs too short to shingle survive and never mass-match each other") {
    val store = tmpDir("gate-short-store")
    import spark.implicits._
    // minTokens=1 admits one-word docs that produce ZERO 3-shingles; the
    // degenerate empty-set signature must not make them 'near-dups' of
    // each other (or of anything in a later batch).
    val cfg = CorpusGate.Config(minTokens = 1)
    CorpusGate.curateBatch(
      Seq(1L -> "alpha", 2L -> "beta", 3L -> longA).toDF("doc_id", "text"),
      store, batchId = 0L, cfg)
    CorpusGate.curateBatch(
      Seq(10L -> "gamma", 11L -> longANear).toDF("doc_id", "text"),
      store, batchId = 1L, cfg)
    val kept = CorpusGate.corpus(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // all three short docs keep; 11 is caught as a near-dup of corpus 3
    assert(kept == Set(1L, 2L, 3L, 10L))
  }

  test("config validation fails loud on truncating band widths") {
    intercept[IllegalArgumentException] {
      CorpusGate.Config(k = 16, bands = 5)
    }
  }

  test("store listing skips non-numeric batch= directories instead of throwing") {
    val store = tmpDir("gate-badname-store")
    import spark.implicits._
    CorpusGate.curateBatch(
      Seq(1L -> longA, 2L -> longB).toDF("doc_id", "text"),
      store, batchId = 0L)
    // A leftover manual copy / temp dir that matches the prefix but not
    // the numeric suffix must be skipped, not fail every later batch.
    Files.createDirectories(Paths.get(store, "corpus", "batch=0.bak"))
    Files.createDirectories(Paths.get(store, "sigs", "batch=tmp"))
    val kept = CorpusGate.corpus(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
    // and the next batch's store read still works
    CorpusGate.curateBatch(
      Seq(10L -> longC).toDF("doc_id", "text"), store, batchId = 1L)
    val after = CorpusGate.corpus(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 2L, 10L))
  }
}
