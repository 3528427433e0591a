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
}
