package graft.functions

import graft.SparkSpec

/** Hand-computed bigram-LM surprisal values (the fixed-point arithmetic
  * is exactly reproducible on paper) + the short-document contract. */
class BigramSurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand computation on a 2-doc corpus") {
    // corpus: "a b a b", "a b" → bigram counts (a,b):3, (b,a):1;
    // history counts a:3, b:1; V = 2 distinct histories.
    // il(5)−il(4) = 2304−2048 = 256;  il(3)−il(2) = 1536−1024 = 512.
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextFunctions.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // doc1: 2·(il(5)−il(4)) + 1·(il(3)−il(2)) = 512 + 512 = 1024 over 3
    assert(r(1L) == ((3L, 1024L, 341L)))
    // doc2: 1·(il(5)−il(4)) = 256 over 1
    assert(r(2L) == ((1L, 256L, 256L)))
  }

  test("documents with fewer than two words surface with zero scores") {
    val docs = Seq((1L, "lonely"), (2L, "two words here")).toDF("doc_id", "text")
    val r = TextFunctions.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 0L)
    assert(r(2L) == 2L)
    assert(r.size == 2)
  }
}
