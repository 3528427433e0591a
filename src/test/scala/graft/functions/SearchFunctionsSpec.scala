package graft.functions

import graft.SparkSpec

/** Integer TF-IDF keyword top-k (SearchFunctions.keywordTopK): exact
  * whole-bit scores, deterministic tie-break, stopword vanishing. */
class SearchFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // N = 4 docs. "common" appears in every doc → idf bits 0.
  private val corpus = Seq(
    (1L, "apple banana apple common"),
    (2L, "apple cherry common"),
    (3L, "banana banana banana common"),
    (4L, "durian durian common")
  ).toDF("doc_id", "text")

  private def run(queries: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, Long)] =
    SearchFunctions.keywordTopK(corpus, "doc_id", "text",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("exact integer scores and ascending-id tie-break") {
    // idf(apple) = ilog2(4) − ilog2(2) = 2048 − 1024 = 1024 (exactly one
    // bit — both df and N are powers of two); same for banana. Scores:
    // d1 = 2·1024 + 1·1024 = 3072, d3 = 3·1024 = 3072, d2 = 1024.
    // d1 and d3 tie at 3072 → ascending doc_id puts d1 first.
    assert(run(Seq((10L, "apple banana")), k = 3) ===
      Seq((10L, 1L, 1L, 3072L), (10L, 2L, 3L, 3072L), (10L, 3L, 2L, 1024L)))
  }

  test("k truncates below the tie") {
    assert(run(Seq((10L, "apple banana")), k = 2) ===
      Seq((10L, 1L, 1L, 3072L), (10L, 2L, 3L, 3072L)))
  }

  test("a term in every document contributes nothing and alone ranks nothing") {
    // idf(common) = ilog2(4) − ilog2(4) = 0 → all scores 0 →
    // positive-evidence filter leaves no results.
    assert(run(Seq((11L, "common")), k = 5) === Seq.empty)
  }

  test("multiple queries are answered independently in one pass") {
    val got = run(Seq((1L, "cherry"), (2L, "durian")), k = 5)
    // idf(cherry) = ilog2(4) − ilog2(1) = 2048 (df 1); d2 tf 1 → 2048.
    // idf(durian) = 2048; d4 tf 2 → 4096.
    assert(got === Seq((1L, 1L, 2L, 2048L), (2L, 1L, 4L, 4096L)))
  }

  test("unknown query terms simply never match") {
    assert(run(Seq((12L, "zebra quark")), k = 5) === Seq.empty)
  }

  private def bm25(corpus: Seq[(Long, String)], q: String): Map[Long, Long] = {
    val m = SearchFunctions.bm25TopK(corpus.toDF("doc_id", "text"),
      "doc_id", "text",
      Seq((1L, q)).toDF("query_id", "qtext"), "query_id", "qtext", k = 10)
    try m.df.as[(Long, Long, Long, Long)].collect()
      .map { case (_, _, d, s) => d -> s }.toMap
    finally m.release()
  }

  test("bm25: term frequency saturates (doubling tf far less than doubles the score)") {
    // equal-length docs isolate the saturation term from length norm
    val docs = Seq(
      (1L, "apple pad1 pad2 pad3 pad4 pad5 pad6 pad7"),
      (2L, "apple apple pad2 pad3 pad4 pad5 pad6 pad7"),
      (3L, "apple apple apple apple pad4 pad5 pad6 pad7"),
      (4L, "none0 pad1 pad2 pad3 pad4 pad5 pad6 pad7"))
    val s = bm25(docs, "apple")
    assert(s(2L) > s(1L) && s(3L) > s(2L), s"monotone: $s")
    // tf 1→2 must gain MORE than tf 2→4 (diminishing returns), and
    // 4× tf must stay well under 4× score
    assert(s(2L) - s(1L) > s(3L) - s(2L), s"concave: $s")
    assert(s(3L) < 3L * s(1L), s"saturated: $s")
  }

  test("bm25: length normalization ranks the denser document first") {
    // same tf=1, but doc 2 buries the term in 4x the length
    val docs = Seq(
      (1L, "apple pad1 pad2 pad3"),
      (2L, "apple " + (1 to 15).map(i => s"pad$i").mkString(" ")),
      (3L, "zzz zzz zzz zzz"))
    val s = bm25(docs, "apple")
    assert(s(1L) > s(2L), s"shorter doc must score higher: $s")
  }
}
