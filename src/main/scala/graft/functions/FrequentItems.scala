package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus term-frequency analysis: the vocabulary / boilerplate-discovery
  * pass of a training-data pipeline (which tokens dominate, which
  * navigation strings to scrub, what the head of the Zipf curve looks
  * like).
  *
  * Two tiers, same contract as the engine's other approximate operators
  * (bloom gate, GK percentiles): an EXACT form whose output the DuckDB
  * oracle reproduces bit-for-bit, and a bounded-memory SKETCH for the
  * scale where the distinct-term space itself is the problem. At 100 TB
  * the exact form's groupBy shuffles the full vocabulary (fine — partial
  * map-side combine collapses the heavy head before the exchange, and the
  * final cut is a bounded TakeOrderedAndProject); the Misra-Gries sketch
  * removes even that shuffle: one capacity-m summary per partition, one
  * m-entry merge tree, provable error ≤ N/(m+1). Sketch estimates are
  * merge-order-dependent inside the guarantee band, so the sketch is
  * spec-verified (guarantee assertions under arbitrary repartitioning)
  * rather than hash-gated.
  */
object FrequentItems {

  /** Exact corpus-wide top-k terms of the normalized word stream:
    * explode → two-level count (map-side partial combine on term) →
    * sort+limit, which Catalyst plans as TakeOrderedAndProject
    * (per-partition top-k heap, k-row driver merge — no global sort).
    * Ties break to the lexicographically smaller term. */
  def topTermsExact(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val terms = docs
      .select(explode(split(TextFunctions.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    graft.operators.Relational.topK(
      terms.groupBy("term").agg(count(lit(1)).as("n")),
      Seq(col("n").desc, col("term").asc), k)
  }

  /** Misra-Gries heavy-hitters summary as a typed, MERGEABLE Aggregator
    * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
    * Summaries", PODS'12). Each partition folds its term stream into at
    * most `capacity` counters; merging sums counterparts and then
    * subtracts the (capacity+1)-largest count from every counter,
    * dropping the non-positive ones. Over a stream of N terms, any merge
    * tree yields estimates with
    *
    *   true(t) − N/(capacity+1)  ≤  est(t)  ≤  true(t)
    *
    * and every term with true(t) > N/(capacity+1) survives in the
    * summary. Memory is O(capacity) per task regardless of vocabulary
    * size — the sketch never shuffles the term space at all. */
  final case class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {
    require(capacity > 0, "Misra-Gries capacity must be positive")

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(m: mutable.HashMap[String, Long], term: String): mutable.HashMap[String, Long] = {
      if (term == null) return m
      m.get(term) match {
        case Some(c) => m.update(term, c + 1)
        case None if m.size < capacity => m.update(term, 1L)
        case None =>
          // decrement-all: the classic O(capacity) amortized step
          val dead = mutable.ArrayBuffer.empty[String]
          m.mapValuesInPlace((_, c) => c - 1)
          m.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(m.remove)
      }
      m
    }

    override def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > capacity) {
        // subtract the (capacity+1)-th largest count, drop non-positives
        val counts = a.values.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(a.size - capacity - 1)
        val dead = mutable.ArrayBuffer.empty[String]
        a.mapValuesInPlace((_, c) => c - cut)
        a.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(a.remove)
      }
      a
    }

    override def finish(m: mutable.HashMap[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** The sketch as an aggregate column over a term column: one summary per
    * partition, merged in O(capacity) — `df.agg(misraGries(col("term"), m))`
    * yields an array<struct<_1: term, _2: estimate>> best-first. */
  def misraGries(term: Column, capacity: Int): Column =
    udaf(MisraGries(capacity), Encoders.STRING).apply(term)

  /** Convenience: the sketch over a document column's word stream. */
  def approxTopTerms(docs: DataFrame, textCol: String, capacity: Int): DataFrame =
    docs
      .select(explode(split(TextFunctions.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .agg(misraGries(col("term"), capacity).as("summary"))
}
