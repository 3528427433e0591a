package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Domain-level quality gating (DomainFunctions): verdicts are per
  * SOURCE, not per document — a failing source loses its good pages and
  * a passing source keeps its bad ones. */
class DomainFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val long = ("long " * 10).trim // 10 tokens
  private val short = "tiny doc"         //  2 tokens

  // 'bad': 2 of 3 docs short (frac 0.667); 'good': 1 of 4 (frac 0.25)
  private val docs = Seq(
    (1L, "bad", long), (2L, "bad", short), (3L, "bad", short),
    (4L, "good", long), (5L, "good", long), (6L, "good", long),
    (7L, "good", short)
  ).toDF("doc_id", "source", "text")

  test("sourceStats computes exact counts and ratios") {
    val stats = DomainFunctions.sourceStats(docs, "source", "text", minTokens = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(stats("bad") === ((3L, 2L, 2.0 / 3.0, 14.0 / 3.0)))
    assert(stats("good") === ((4L, 1L, 0.25, 8.0)))
  }

  test("a failing source is dropped wholesale, including its long docs") {
    val kept = DomainFunctions.filterBySourceQuality(
        docs, "source", "text", minTokens = 5, maxShortFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(4L, 5L, 6L, 7L), // doc 1 is long but its domain failed
      "bad source must lose every doc; good source keeps its short doc")
  }

  test("the threshold is inclusive: short_frac == maxShortFrac passes") {
    val kept = DomainFunctions.filterBySourceQuality(
        docs, "source", "text", minTokens = 5, maxShortFrac = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(4L, 5L, 6L, 7L))
  }

  test("every source failing yields an empty corpus, not an error") {
    val kept = DomainFunctions.filterBySourceQuality(
      docs, "source", "text", minTokens = 5, maxShortFrac = 0.1)
    assert(kept.count() === 0L)
  }
}
