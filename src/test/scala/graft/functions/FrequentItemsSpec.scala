package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus frequency analysis: exact top-k terms and the Misra-Gries
  * heavy-hitters sketch (guarantee assertions under repartitioning — the
  * sketch's estimates are merge-order-dependent inside the error band, so
  * the guarantee, not a fixed output, is the contract). Plus URL
  * canonicalization rules for crawl-level dedup. */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact top terms: counts and deterministic tie-break") {
    val docs = Seq(
      (1L, "alpha beta alpha  gamma"),
      (2L, "beta alpha delta beta"),
      (3L, "gamma alpha")
    ).toDF("doc_id", "text")
    val top = FrequentItems.topTermsExact(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("alpha", 4L), ("beta", 3L), ("gamma", 2L)))
  }

  test("misra-gries: guarantees hold under any repartitioning") {
    // 6 heavy terms over a long tail of singletons; capacity 16.
    val heavy = Seq("h0" -> 500, "h1" -> 400, "h2" -> 300, "h3" -> 200,
      "h4" -> 150, "h5" -> 120)
    val stream = heavy.flatMap { case (t, c) => Seq.fill(c)(t) } ++
      (0 until 800).map(i => s"noise$i")
    val n = stream.size.toLong
    val cap = 16
    val err = n / (cap + 1) // 2470/17 = 145
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val df = stream.toDF("term").repartition(parts)
      val summary = df.agg(FrequentItems.misraGries(col("term"), cap).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e._1").as("term"), col("e._2").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(summary.size <= cap)
      // every estimate within [true - N/(cap+1), true]
      summary.foreach { case (t, est) =>
        val tru = exact(t)
        assert(est <= tru && est >= tru - err, s"$parts parts: $t est=$est true=$tru")
      }
      // every term with true count > N/(cap+1) must be present
      exact.filter(_._2 > err).keys.foreach { t =>
        assert(summary.contains(t), s"$parts parts: heavy term $t missing")
      }
    }
  }

  test("url canonicalization: case, ports, fragments, tracking params, param order, slash") {
    val urls = Seq(
      (1L, "HTTPS://WWW.Site.COM:443/A/b/?b=2&utm_source=x&a=1#frag"),
      (2L, "https://www.site.com/A/b?a=1&b=2&fbclid=zzz"),   // same page as 1
      (3L, "http://www.site.com:80/A/b?a=1&b=2"),            // http variant: distinct scheme
      (4L, "https://www.site.com:8443/A/b?a=1&b=2"),         // non-default port survives
      (5L, "https://www.site.com/a/B?a=1&b=2")               // path case matters
    ).toDF("doc_id", "url")
    val canon = urls.select(col("doc_id"),
        DomainFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == "https://www.site.com/A/b?a=1&b=2")
    assert(canon(2L) == canon(1L))
    assert(canon(3L) == "http://www.site.com/A/b?a=1&b=2")
    assert(canon(4L) == "https://www.site.com:8443/A/b?a=1&b=2")
    assert(canon(5L) == "https://www.site.com/a/B?a=1&b=2")

    val dedup = DomainFunctions.dedupByCanonicalUrl(urls, "doc_id", "url")
    val row = dedup.filter(col("url_canonical") === canon(1L)).head()
    assert(row.getAs[Long]("kept_id") == 1L && row.getAs[Long]("n_dups") == 1L)
    assert(dedup.count() == 4)

    // idempotence: canonical output re-canonicalizes to itself, so a
    // pipeline stage can run before OR after a store round-trip safely
    val twice = urls.select(
        DomainFunctions.canonicalizeUrl(col("url")).as("c1"))
      .select(col("c1"),
        DomainFunctions.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
