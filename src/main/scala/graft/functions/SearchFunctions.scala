package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.expressions

/** Keyword relevance search over the corpus — the inverted-index TF-IDF
  * top-k that a curation/inspection workbench runs ("show me the k
  * documents most about these terms"). Batch-oriented: a (small) table of
  * queries is answered in one pass over the corpus.
  *
  * Scoring is the ENGINE-PORTABLE integer variant this repo uses wherever
  * a score gates data (same rationale as
  * [[TextFunctions.unigramSurprisal]]): idf in 1/1024ths of a bit via a
  * FIXED-POINT log2 — msb position from binary-string length plus linear
  * interpolation on the next ten bits, all integer multiply/shift, no
  * transcendentals (max error ~0.086 bit, far below ranking resolution;
  * whole-bit flooring would be too coarse: a term in 80% of documents
  * still deserves weight log2(1/0.8) ≈ 0.32 bit, not zero). Scores are
  * bigint-exact, so any engine reproduces the ranking bit-for-bit. A
  * term present in every document weighs exactly 0 (the classic
  * stopword-vanishing property of idf), and only documents with positive
  * evidence rank.
  *
  * Scale shape (100 TB): query terms broadcast and semi-join the exploded
  * corpus BEFORE anything aggregates, so the only rows that ever shuffle
  * are query-term occurrences — the corpus's other words die map-side.
  * Per-query-term document frequencies derive from those hits (a
  * |q-terms| × df table, broadcast back), and the final per-(query, doc)
  * scores fold into the bounded [[expressions.topKByScore]] aggregate —
  * k rows of state per query on every executor, never a window, never a
  * global sort.
  */
object SearchFunctions {
  import TextFunctions.normalize

  /** Fixed-point log2 in 1/1024ths of a bit: `1024·m + (x·1024 >> m) −
    * 1024` where m = msb position = `length(bin(x)) − 1`. Piecewise
    * linear between powers of two, exactly `1024·log2(x)` AT powers of
    * two, strictly monotone, pure integer — bit-identical on any engine
    * with 64-bit integer shifts. Requires x ≥ 1 (df and N always are). */
  private[functions] def ilog2x1024(x: Column): Column = {
    val m = (length(bin(x)) - 1).cast("int")
    lit(1024L) * m.cast("long") +
      call_function("shiftright", x.cast("long") * lit(1024L), m) - lit(1024L)
  }

  /** Top-k per query by INTEGER-PINNED BM25 (k1 = 1.2, b = 0.75), the
    * standard probabilistic ranking function — TF saturation (a 50th
    * occurrence adds almost nothing) and document-length normalization
    * (long documents stop winning on raw term volume), which plain
    * TF-IDF ([[keywordTopK]]) lacks. Every fractional quantity is
    * fixed-point so any engine reproduces the ranking bit-for-bit:
    * Lucene-style always-positive idf log2((N+1)/(df+0.5)) as
    * `ilog2x1024(2N+2) − ilog2x1024(2df+1)` (halves cancel in the
    * ratio), avgdl and the length ratio in thousandths, the saturation
    * denominator in thousandths, ONE integer division per (query, term,
    * doc) — truncation consistent cross-engine because every operand is
    * positive. Same scale shape as [[keywordTopK]]: non-query words die
    * map-side, per-term dims broadcast, ranking is the bounded top-k
    * aggregate. One bound on the bit-for-bit claim: the final top-k
    * routes the long score through a double-keyed aggregate, so scores
    * above 2^53 could collapse adjacent values and mis-rank ties. With
    * idf ≤ ~64·1024 and per-term weights ~tf·idf·2200 that needs a
    * single document repeating one query term ~10^10 times — unreachable
    * for real text, but the pinning guarantee formally holds only for
    * scores < 2^53. Output: (qidCol, rank, idCol, score). */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int): graft.operators.Materialized = {
    // Tokenize ONCE per document, in a projection BELOW the explode: a
    // single select computing both `size(split(..))` and
    // `explode(split(..))` plans the size-projection ABOVE the Generate,
    // so the full document was re-normalized and re-split once per
    // OUTPUT WORD (measured: 21 s of aggTime on the sf0.1 corpus — the
    // whole query's cost). Binding the token array in its own projection
    // makes Generate's child carry it and the length is read from the
    // bound array (guide §2.3: project before the fan-out).
    //
    // PERSISTED (r16, guide §2.4): the tokenized projection feeds BOTH
    // the per-term explode and the corpus-length `stats` aggregate —
    // un-shared, the whole corpus went through the normalize+split regex
    // chain twice (the r15 plan dump shows two independent `Scan parquet
    // documents` → normalize subtrees). The cache is the token arrays
    // (≈ corpus text size, MEMORY_AND_DISK); the caller releases it via
    // the returned handle. At 100 TB the alternative is a second full
    // scan+regex pass — the cache spills to local disk and still wins.
    val toks = corpus
      .select(col(idCol).as("__doc"),
        split(normalize(col(textCol)), " ").as("__ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = toks
      .select(col("__doc"), size(col("__ts")).cast("long").as("__dl"),
        explode(col("__ts")).as("__t"))
    val qTerms = queries.select(col(qidCol).as("__q"),
        explode(split(normalize(col(qTextCol)), " ")).as("__t"))
      .distinct()
    val hitWords = words.join(broadcast(qTerms.select("__t").distinct()),
      Seq("__t"), "left_semi")
    // __dl is functionally dependent on __doc — carrying it as a group
    // key costs nothing and saves a corpus-sized join for lengths.
    val tf = hitWords.groupBy("__doc", "__dl", "__t")
      .agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val stats = toks
      .select(size(col("__ts")).cast("long").as("__l"))
      .agg(count(lit(1)).as("__n"), sum("__l").as("__tl"))
    val out = tf.join(broadcast(qTerms), Seq("__t"))
      .join(broadcast(dfT), Seq("__t"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf1024",
        ilog2x1024(lit(2L) * col("__n") + lit(2L)) -
          ilog2x1024(lit(2L) * col("__df") + lit(1L)))
      .withColumn("__avgdl1000", expr("greatest(__tl * 1000 div __n, 1)"))
      .withColumn("__lr1000", expr("(__dl * 1000000) div __avgdl1000"))
      .withColumn("__norm1000", expr("250 + (750 * __lr1000) div 1000"))
      .withColumn("__den1000", expr("__tf * 1000 + (1200 * __norm1000) div 1000"))
      .withColumn("__w",
        expr("(__idf1024 * __tf * 2200 * 1000) div __den1000"))
      .groupBy("__q", "__doc").agg(sum("__w").as("__s"))
      .filter(col("__s") > 0)
      .groupBy("__q")
      .agg(expressions.topKByScore(col("__s").cast("double"),
        col("__doc"), k).as("__top"))
      .select(col("__q").as(qidCol), posexplode(col("__top")))
      .select(col(qidCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.score").cast("long").as("score"))
    graft.operators.Materialized(out, Seq(toks))
  }

  /** Top-k corpus documents per query by integer TF-IDF; ties broken by
    * ascending document id. Output: (qidCol, rank, idCol, score). */
  def keywordTopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int): DataFrame = {
    val words = corpus.select(col(idCol).as("__doc"),
      explode(split(normalize(col(textCol)), " ")).as("__t"))
    val qTerms = queries.select(col(qidCol).as("__q"),
        explode(split(normalize(col(qTextCol)), " ")).as("__t"))
      .distinct()
    // Kill every non-query word before the first shuffle.
    val hitWords = words.join(broadcast(qTerms.select("__t").distinct()),
      Seq("__t"), "left_semi")
    val tf = hitWords.groupBy("__doc", "__t").agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val nDocs = corpus.agg(count(lit(1)).as("__n"))
    tf.join(broadcast(qTerms), Seq("__t"))
      .join(broadcast(dfT), Seq("__t"))
      .crossJoin(broadcast(nDocs))
      .withColumn("__w",
        col("__tf") * (ilog2x1024(col("__n")) - ilog2x1024(col("__df"))))
      .groupBy("__q", "__doc").agg(sum("__w").as("__s"))
      .filter(col("__s") > 0)
      .groupBy("__q")
      .agg(expressions.topKByScore(col("__s").cast("double"),
        col("__doc"), k).as("__top"))
      .select(col("__q").as(qidCol), posexplode(col("__top")))
      .select(col(qidCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.score").cast("long").as("score"))
  }

  /** Public face of [[ilog2x1024]] for the query layer's fixed-point
    * scoring compositions (KL drift, custom rankers). `x` must be ≥ 1. */
  def ilog2_1024(x: Column): Column = ilog2x1024(x)

  /** Zipf power-law fit of the term-frequency ranking, per group: OLS
    * slope of fixed-point log2(count) vs log2(rank) over each group's
    * `topN` most frequent terms. Natural text follows Zipf with slope
    * ≈ −1; a slope far off it is a published corpus-quality signal
    * (boilerplate/template mass flattens the head, duplication steepens
    * it) — the vocabulary-statistics leg of a corpus report.
    *
    * Everything is integer: ranks and counts go through the shared
    * fixed-point [[ilog2x1024]], the regression is the same
    * moments-as-aggregation formulation as the OLS trend operator, and
    * slope/intercept are milli-pinned with truncating division (Spark
    * `div` ≡ DuckDB `//`, negative slopes included). The intercept is
    * the DEFINED two-step b = (1000·Σy − slope_milli·Σx) div n —
    * evaluating it from the already-truncated slope keeps every operand
    * within i64 (the single-step closed form overflows at Σy·Σxx
    * scale). Groups whose top-N collapses to one rank (degenerate
    * x-variance) report NULL.
    *
    * Scale shape: one hash aggregation to (group, term) counts; the
    * rank Window partitions by GROUP over the *vocabulary-sized*
    * aggregate (bounded like ts1's grid — never a window over corpus
    * rows); the fit is one more hash aggregation. */
  def zipfFit(docs: DataFrame, textCol: String, groupCol: String,
      topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col(groupCol).as("grp"),
        explode(split(TextFunctions.normalize(col(textCol)), " ")).as("t"))
      .groupBy("grp", "t").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp").orderBy(col("cnt").desc, col("t"))
    val pts = terms.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("grp"), ilog2x1024(col("rank")).as("x"),
        ilog2x1024(col("cnt")).as("y"))
    val m = pts.groupBy("grp").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    m.select(col("grp"), col("n").as("n_terms"),
        col("sx"), col("sy"), col("sxx"), col("sxy"),
        when(den === 0, lit(null).cast("long")).otherwise(
          expr("(1000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"))
          .as("slope_milli"))
      .withColumn("intercept_milli",
        when(col("slope_milli").isNull, lit(null).cast("long")).otherwise(
          expr("(1000 * sy - slope_milli * sx) div n_terms")))
  }
}
