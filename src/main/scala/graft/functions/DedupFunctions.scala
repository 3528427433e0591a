package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline layer:
  * exact (content-hash), word/n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Design for 100 TB: everything pairwise is gated behind a *bucketing*
  * step (LSH band buckets / exact-hash groups) so no O(n²) comparison ever
  * happens across the full corpus — candidate pairs only form inside
  * buckets, which is a groupBy-shuffle, then a bucket-local self-join.
  * Hash functions are Spark-native `xxhash64` (codegen'd, seedable via an
  * extra hashed column), so signatures are deterministic across runs —
  * a requirement for incremental dedup (re-run ⇒ same signatures).
  */
object DedupFunctions {
  import TextFunctions.normalize

  /** Distinct word set of normalized text. */
  def wordSet(text: Column): Column =
    array_distinct(split(normalize(text), " "))

  /** Word n-gram (shingle) set. Uses higher-order functions only — no UDF. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(normalize(text), " ")
    val count = greatest(size(words) - (n - 1), lit(0))
    array_distinct(
      transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Word-set Jaccard similarity of two texts (exact). */
  def jaccard(a: Column, b: Column): Column = {
    val sa = wordSet(a)
    val sb = wordSet(b)
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** MinHash signature: k permutations simulated by seeding xxhash64 with
    * the permutation index (standard public construction). Returns
    * array<bigint> of length k. */
  def minHashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(i, s))))

  /** LSH band keys: signature split into `bands` bands of `rows` each;
    * each band hashed to one bucket key. Two docs sharing any band bucket
    * are candidate near-duplicates. Returns array<struct<band:int,key:bigint>>. */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.cast("int").as("band"),
        xxhash64(b, concat_ws(",", slice(signature, b * rows + 1, lit(rows)))).as("key")))

  /** 64-bit SimHash over the word set: bit b of the output is the sign of
    * Σ_w (bit b of xxhash64(w) ? +1 : −1). Near-duplicate texts land within
    * small Hamming distance. Pure higher-order expressions. */
  def simHash(text: Column): Column = {
    val words = wordSet(text)
    val n = size(words)
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => {
        val ones = size(filter(words,
          w => call_function("shiftright", xxhash64(w), b).bitwiseAND(lit(1L)) === lit(1L)))
        acc + when(ones * 2 > n, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
      })
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact-duplicate groups: fingerprint → canonical (min id) + group size.
    * One groupBy shuffle on the 128-bit fingerprint; at 100 TB this is the
    * cheapest dedup pass and always runs first to shrink the corpus. */
  def exactDuplicateGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_docs"))

  /** MinHash/LSH near-duplicate candidate pairs, verified by exact Jaccard.
    *
    * Pipeline: shingle → signature → explode band keys → self-join per
    * bucket (equi-join on (band,key): a shuffle, never a cross join) →
    * distinct pair → verify with exact Jaccard ≥ threshold.
    * At 100 TB the bucket join is the only quadratic-risk step and its
    * blow-up is bounded by bucket size (tune bands/rows); AQE skew-join
    * splits hot buckets.
    */
  def minHashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", shingles(col("text"), shingleN))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), k))
      .withColumn("bk", explode(lshBandKeys(col("sig"), bands, k / bands)))
      .select(col("id"), col("text"), col("bk.band"), col("bk.key"))
    val a = sigs.alias("a")
    val b = sigs.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.text").as("ta"), col("b.text").as("tb"))
      .distinct()
      .withColumn("jaccard_sim", jaccard(col("ta"), col("tb")))
      .filter(col("jaccard_sim") >= threshold)
      .select("id_a", "id_b", "jaccard_sim")
  }
}
