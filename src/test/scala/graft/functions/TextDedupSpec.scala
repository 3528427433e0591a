package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-data pipeline operators on planted inputs: near-dup recovery,
  * simhash locality, langid on real sentences, ANN sanity. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and columnar formats"),
    (4L, "der schnelle braune fuchs springt und der hund schläft und die katze auch"),
    (5L, "el gato y el perro juegan en la casa de la abuela con el niño")
  ).toDF("doc_id", "text")

  test("learnBpeMerges: hand-computed merge sequence, greedy fold, early stop (TXT19)") {
    // Corpus: "aaab"×4 (one via lowercasing "AAAB") and "ab"×2, plus
    // non-ASCII/punctuated words the learner must ignore. Round 1:
    // (a,a) appears 2×4=8 times (overlaps count positionally), (a,b)
    // 4+2=6 → merge (a,a)→aa w=8; the GREEDY fold turns aaab into
    // [aa, a, b] — never the overlapping [aa, aa]. Round 2: (a,b)
    // 4+2=6 beats (aa,a) 4 → merge (a,b) w=6. Round 3: aaab is
    // [aa, ab] → (aa,ab) w=4. Round 4: every word is one symbol —
    // learning STOPS at 3 merges though 5 were asked.
    val corpus = Seq(
      (1L, "aaab AAAB ab héllo x-y"),
      (2L, "aaab ab aaab")
    ).toDF("doc_id", "text")
    val got = TextFunctions.learnBpeMerges(corpus, "text", nMerges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "a", "a", "aa", 8L),
      (2, "a", "b", "ab", 6L),
      (3, "aa", "ab", "aaab", 4L)))
  }

  test("bpeVocabulary: segmentation under the learned merges matches the fold by hand (TXT20)") {
    val corpus = Seq(
      (1L, "aaab AAAB ab héllo x-y"),
      (2L, "aaab ab aaab")
    ).toDF("doc_id", "text")
    // Merges learned: (a,a)→aa, (a,b)→ab, (aa,ab)→aaab (see TXT19
    // test). Applying all three: aaab → [aaab] (1 token), ab → [ab].
    val gotM = TextFunctions.bpeVocabulary(corpus, "text", nMerges = 5)
    val got =
      try gotM.df.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      finally gotM.release()
    assert(got.toSeq == Seq(
      ("aaab", 4L, 1L, "aaab"),
      ("ab", 2L, 1L, "ab")))
  }

  test("learnByteBpeMerges: hand-computed byte-pair sequence over multibyte text (TXT21)") {
    // é = UTF-8 C3 A9. Base vocab: "éé"×3 → C3␟A9␟C3␟A9, "ab"×2 → 61␟62.
    // Round 1: (C3,A9) 2×3=6 beats (A9,C3) 3 and (61,62) 2 → C3A9 w=6
    // (greedy fold: never the overlapping middle pair). Round 2:
    // (C3A9,C3A9) w=3. Round 3: (61,62) w=2. Round 4: every word is one
    // symbol — stops at 3 though 5 were asked.
    val corpus = Seq((1L, "éé éé ab"), (2L, "éé ab")).toDF("doc_id", "text")
    val got = TextFunctions.learnByteBpeMerges(corpus, "text", nMerges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "C3", "A9", "C3A9", 6L),
      (2, "C3A9", "C3A9", "C3A9C3A9", 3L),
      (3, "61", "62", "6162", 2L)))
  }

  test("byteBpeVocabulary: multilingual coverage the ASCII core drops (TXT22)") {
    val corpus = Seq((1L, "éé éé ab"), (2L, "éé ab")).toDF("doc_id", "text")
    val gotM = TextFunctions.byteBpeVocabulary(corpus, "text", nMerges = 5)
    val got =
      try gotM.df.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      finally gotM.release()
    assert(got.toSeq == Seq(
      ("ab", 2L, 1L, "6162"),
      ("éé", 3L, 1L, "C3A9C3A9")))

    // On the multilingual doc fixture: the byte-level vocabulary covers
    // EVERY word (German umlauts, Spanish ñ — and they actually
    // tokenize), where the ASCII-core learner silently drops them.
    val byteM = TextFunctions.byteBpeVocabulary(docs, "text", nMerges = 3)
    val byteWords =
      try byteM.df.select("word").collect().map(_.getString(0)).toSet
      finally byteM.release()
    assert(byteWords.contains("schläft") && byteWords.contains("niño"))
    val asciiM = TextFunctions.bpeVocabulary(docs, "text", nMerges = 3)
    val asciiWords =
      try asciiM.df.select("word").collect().map(_.getString(0)).toSet
      finally asciiM.release()
    assert(!asciiWords.contains("schläft") && !asciiWords.contains("niño"))
    // Every byte-level word round-trips: segmented hex re-decodes to the
    // word itself (lossless byte tokenization — GPT-2's core property).
    val rtM = TextFunctions.byteBpeVocabulary(docs, "text", nMerges = 3)
    val roundTrip =
      try rtM.df.select(col("word"),
          expr("decode(unhex(replace(segmented, ' ', '')), 'UTF-8')").as("rt"))
        .filter(col("word") =!= col("rt")).count()
      finally rtM.release()
    assert(roundTrip == 0L)
  }

  test("html extraction: boilerplate dropped, tags stripped, entities decoded (TXT14)") {
    val page = Seq((1L,
      """<html><head><title>My Page</title><style>p{color:red}</style>
        |<script>var x = 1 < 2;</script></head>
        |<body><NAV><a href="/a">A</a> <a href="/b">B</a></NAV>
        |<div id="main"><p>Tom &amp; Jerry say 1 &lt; 2 &mdash;</p>
        |<a href="/c">read on</a></div>
        |<footer>&copy; 2026</footer></body></html>""".stripMargin))
      .toDF("doc_id", "html")
    val out = page.select(
      TextFunctions.htmlTitle(col("html")).as("title"),
      TextFunctions.htmlMainText(col("html")).as("main"),
      TextFunctions.htmlLinkCount(col("html")).as("links")).head()
    assert(out.getString(0) === "My Page")
    // script/style payload and nav/footer chrome gone (case-insensitive
    // block match), main survives with entities decoded; the unknown
    // entity &mdash; passes through untouched
    assert(out.getString(1) === "Tom & Jerry say 1 < 2 &mdash; read on")
    assert(out.getInt(2) === 3)
  }

  test("minhash LSH recovers the planted near-dup pair, nothing else") {
    val pairs = DedupFunctions.minHashNearDupPairs(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("band-collision false positives are filtered by the exact-Jaccard verify") {
    // k=16, bands=16 (one row per band): ANY agreeing signature component
    // makes a pair a band candidate, so candidates abound at true Jaccard
    // ~0.28 — far below the 0.5 threshold — and every one of them must be
    // killed by the exact verify, not reported.
    val a = (0 until 40).map(i => s"a$i").mkString(" ")
    val lowSim = (0 until 20).map { v =>
      (100L + v,
        ((0 until 18).map(i => s"a$i") ++ (18 until 40).map(i => s"q${v}z$i"))
          .mkString(" "))
    }
    val corpus = (Seq(0L -> a) ++ lowSim).toDF("doc_id", "text")
    val sigs = DedupFunctions.minHashSignatures(corpus, "doc_id", "text",
      shingleN = 3, k = 16)
    // candidates DO exist at this band width…
    val bandRows = sigs.select(col("id"),
      explode(DedupFunctions.lshBandKeys(col("sig"), 16, 1)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val nCand = bandRows.alias("x").join(bandRows.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select("x.id", "y.id").distinct().count()
    assert(nCand > 0, "fixture produced no band collisions to filter")
    // …and none survives the exact verify
    val pairs = DedupFunctions.minHashNearDupPairsFromSignatures(
      sigs, k = 16, bands = 16, threshold = 0.5)
    assert(pairs.isEmpty, pairs.collect().mkString(", "))
  }

  test("allPairsJaccard: complete and precise vs brute force (DD15)") {
    // One block; thresholds chosen so the near-dup pair (1,2) qualifies
    // at tau = 0.6 and nothing else does. Brute force computed over the
    // SAME word sets inside Spark — independent of the prefix path.
    val blocked = docs.withColumn("blk", lit("x"))
    val gotM = DedupFunctions.allPairsJaccard(blocked, "doc_id", "text",
      "blk", tauNum = 3, tauDen = 5)
    val got =
      try gotM.df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      finally gotM.release()
    val sets = blocked.select(col("doc_id"),
      DedupFunctions.wordSet(col("text")).as("ws"))
    val brute = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        size(array_intersect(col("a.ws"), col("b.ws"))).as("i"),
        (size(col("a.ws")) + size(col("b.ws"))).as("s"))
      .filter(col("i") * 5 >= (col("s") - col("i")) * 3)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(got == Set((1L, 2L)))
  }

  test("allPairsJaccard: exact-dup collapse + expansion restores every pair") {
    // 3 identical docs + 1 near-dup + 1 unrelated: the identical trio
    // collapses to one representative internally, but the output must
    // still contain all C(3,2) within-group pairs at J=1 AND the 3
    // cross pairs rep-group × near-dup, each with the same inter/uni.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs5 = Seq(
      (1L, base), (2L, base), (3L, base),
      (4L, base + " extra"), // J = 10/11 ≈ 0.909
      (5L, "totally unrelated words nothing shared here at all now")
    ).toDF("doc_id", "text").withColumn("blk", lit("x"))
    val gotM = DedupFunctions.allPairsJaccard(docs5, "doc_id", "text",
      "blk", tauNum = 4, tauDen = 5)
    val got =
      try gotM.df.select("id_a", "id_b", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      finally gotM.release()
    assert(got == Set(
      (1L, 2L, 10L, 10L), (1L, 3L, 10L, 10L), (2L, 3L, 10L, 10L),
      (1L, 4L, 10L, 11L), (2L, 4L, 10L, 11L), (3L, 4L, 10L, 11L)))
  }

  test("allPairsJaccard: pairs never cross a block boundary") {
    val a = "shared words alpha beta gamma delta epsilon zeta"
    val two = Seq((1L, a, "b1"), (2L, a, "b2"), (3L, a, "b1"))
      .toDF("doc_id", "text", "blk")
    val gotM = DedupFunctions.allPairsJaccard(two, "doc_id", "text",
      "blk", tauNum = 4, tauDen = 5)
    val got =
      try gotM.df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      finally gotM.release()
    assert(got == Set((1L, 3L))) // identical text, but 2 is in another block
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val hs = docs.withColumn("h", DedupFunctions.simHash(col("text")))
      .select("doc_id", "h").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) < 12)
    assert(ham(hs(1L), hs(3L)) > 12)
  }

  test("word jaccard: near-dup pair high, cross-language ~0") {
    val j = DedupFunctions.jaccard(col("a"), col("b"))
    val sim12 = Seq((docs.collect()(0).getString(1), docs.collect()(1).getString(1)))
      .toDF("a", "b").select(j).head().getDouble(0)
    assert(sim12 > 0.8)
    val sim15 = Seq((docs.collect()(0).getString(1), docs.collect()(4).getString(1)))
      .toDF("a", "b").select(j).head().getDouble(0)
    assert(sim15 < 0.1)
  }

  test("langid picks the profile language (TXT2)") {
    val out = docs.withColumn("lang", TextFunctions.langId(col("text")))
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(4L) == "de" && out(5L) == "es")
  }

  test("exact dedup groups identical normalized content") {
    val withDup = docs.union(Seq((99L, "The  quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text"))
    val groups = DedupFunctions.exactDuplicateGroups(withDup, "doc_id", "text")
    assert(groups.filter(col("n_docs") === 2).head().getAs[Long]("canonical_id") == 1L)
  }

  test("cosine top-k: self-similar clusters rank first (SIM1)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs.filter(col("vec_id") === 0), vecs,
      "vec_id", "embedding", "vec_id", "embedding", k = 1)
      .head()
    assert(top.getAs[Long]("neighbor_id") == 1L)
  }

  test("IVF ANN finds the same top-1 as brute force on clustered vectors") {
    // Two tight clusters; IVF with nprobe covering the query's cell must
    // find the brute-force nearest neighbor.
    val base = (0 until 32).map { i =>
      val c = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(c + i * 0.001f, c - i * 0.001f, c, c * 0.5f))
    }
    val vecs = base.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 2)
    val bf = Similarity.cosineTopK(queries, vecs, "vec_id", "embedding",
      "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding",
      "vec_id", "embedding", k = 1, nlist = 2, nprobe = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == bf)
  }

  test("IVF sampled-fit path is deterministic across runs") {
    // Force the sampled path (fitSampleRows < corpus size): two runs must
    // produce identical neighbor sets — the hash-mod filter plus the
    // ordered-limit guard leave nothing to scan order or partition layout.
    val base = (0 until 64).map { i =>
      val c = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(c + i * 0.001f, c - i * 0.001f, c, c * 0.5f))
    }
    val vecs = base.toDF("vec_id", "embedding").repartition(7)
    val queries = vecs.filter(col("vec_id") < 4)
    def run() = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding",
      "vec_id", "embedding", k = 2, nlist = 2, nprobe = 2,
      fitSampleRows = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("star-contraction CC matches min-label propagation on a branchy graph") {
    // three components plus a self-pair-only node (must not vanish in the
    // star path's self-loop filter): a triangle+tail, a pair, a singleton
    // edge, and the reflexive pair (30,30)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L), (20L, 21L), (30L, 30L)).toDF("a", "b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = toMap(DedupFunctions.duplicateClusters(pairs, "a", "b").df)
    val star = toMap(DedupFunctions.duplicateClustersStar(pairs, "a", "b").df)
    assert(star == prop)
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("contamination: near-dup of the benchmark scores high, unrelated ~0") {
    val bench = docs.filter(col("doc_id") === 1L)
    val scores = DedupFunctions
      .contaminationScores(docs, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == 1.0) // the benchmark doc itself
    assert(scores(2L) > 0.7, s"near-dup scored ${scores(2L)}") // one word differs
    assert(scores(3L) == 0.0 && scores(4L) == 0.0 && scores(5L) == 0.0)
    // a doc shorter than n words has no n-grams and scores 0, not NaN/null
    val tiny = Seq((9L, "two words")).toDF("doc_id", "text")
    val s9 = DedupFunctions
      .contaminationScores(tiny, "doc_id", "text", bench, "text", n = 3)
      .collect()
    assert(s9.length == 1 && s9(0).getDouble(1) == 0.0)
  }

  test("repetition signals: dup/top word and dup bigram fractions are exact") {
    val d = Seq(
      (1L, "a a a b"),   // words 4/distinct 2 → dup .5; top 'a' 3/4;
                          // bigrams [a a, a a, a b]: 3/distinct 2 → dup 1/3
      (2L, "x y z"),      // all distinct → dup 0, top 1/3, bigram dup 0
      (3L, "solo")        // one word: no bigrams → dup_bigram 0.0 (not null)
    ).toDF("doc_id", "text")
    val s = TextFunctions.repetitionSignals(d, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(s(1L) == ((0.5, 0.75, 1.0 - 2.0 / 3.0)))
    assert(s(2L) == ((0.0, 1.0 / 3.0, 0.0)))
    assert(s(3L) == ((0.0, 1.0, 0.0)))
  }

  test("dedupCorpus keeps one representative per cluster, singletons survive") {
    val docs = Seq(
      (1L, "aaaa"), (2L, "aaaa!"), // near-dup cluster {1,2}; 2 is longer
      (3L, "bb"), (4L, "cccc")     // singletons, no pair evidence
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = DedupFunctions
      .dedupCorpus(docs, "doc_id", length(col("text")), pairs, "id_a", "id_b")
      .df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster {1,2} labeled by min member 1; representative is doc 2
    // (longest text); 3 and 4 are their own clusters
    assert(kept == Map(2L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("deep-chain component falls back to star contraction in O(log n) rounds", graft.SlowTest) {
    // A 1000-node path has diameter 999: min-label propagation would need
    // 999 rounds (its default cap is 20), and star contraction's own cap
    // of 60 rounds only suffices because its round count is logarithmic —
    // so this passing AT ALL proves both the fallback wiring and the
    // contraction rate.
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = DedupFunctions.duplicateClusters(chain, "a", "b")
      .df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 0L))
  }

  test("native expressions are bit-identical to their HOF formulations") {
    val mh = docs.select(
      DedupFunctions.minHashSignature(DedupFunctions.shingles(col("text"), 3), 16).as("a"),
      DedupFunctions.minHashSignatureHof(DedupFunctions.shingles(col("text"), 3), 16).as("b"))
    assert(mh.filter(col("a") =!= col("b")).count() == 0)

    val sh = docs.select(
      DedupFunctions.simHash(col("text")).as("a"),
      DedupFunctions.simHashHof(col("text")).as("b"))
    assert(sh.filter(col("a") =!= col("b")).count() == 0)

    // k-gram hashes + winnowing positions: native loops vs HOF twins —
    // including short-doc clamping, multi-byte code points, and
    // tie-heavy hash arrays (repeated text) for the leftmost-argmin rule
    val wDocs = docs.select(col("text"))
      .unionByName(Seq("ab", "ünï", "repeat repeat repeat repeat repeat",
        "x".repeat(80)).toDF("text"))
    val wk = wDocs.select(
      TextFunctions.winnowingKgramHashes(col("text"), 5).as("a"),
      TextFunctions.winnowingKgramHashesHof(col("text"), 5).as("b"))
    assert(wk.filter(col("a") =!= col("b")).count() == 0)
    val wp = wDocs.select(
      TextFunctions.winnowingKgramHashes(col("text"), 5).as("kh"))
      .select(
        TextFunctions.winnowingSelectedPositions(col("kh"), 4).as("a"),
        TextFunctions.winnowingSelectedPositionsHof(col("kh"), 4).as("b"))
    assert(wp.filter(col("a") =!= col("b")).count() == 0)
    // the dd12 shape: k=20, w=16
    val wp2 = wDocs.select(
      TextFunctions.winnowingKgramHashes(col("text"), 20).as("kh"))
      .select(
        TextFunctions.winnowingSelectedPositions(col("kh"), 16).as("a"),
        TextFunctions.winnowingSelectedPositionsHof(col("kh"), 16).as("b"))
    assert(wp2.filter(col("a") =!= col("b")).count() == 0)

    // CDC boundaries: native JVM loop vs the HOF fold, including a doc
    // with multi-byte code points and one long enough to hit maxLen
    val cdcDocs = docs.select(col("text"))
      .unionByName(Seq("héllo wörld ünïcode çhars répeated ".repeat(30),
        "x".repeat(1000)).toDF("text"))
    val cb = cdcDocs.select(
      TextFunctions.cdcBoundaries(col("text")).as("a"),
      TextFunctions.cdcBoundariesHof(col("text")).as("b"))
    assert(cb.filter(col("a") =!= col("b")).count() == 0)

    val vecs = Seq((Array(0.3f, -0.7f, 0.64f, 0.11f), Array(0.5f, 0.2f, -0.9f, 0.33f)))
      .toDF("a", "b")
    val cs = vecs.select(
      Similarity.cosine(col("a"), col("b")).as("x"),
      Similarity.cosineHof(col("a"), col("b")).as("y")).head()
    assert(java.lang.Double.doubleToLongBits(cs.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(cs.getDouble(1)))

    // Ragged vectors: HOF null-propagates via zip_with padding; the native
    // expression must agree (null), not silently compute over min length.
    val ragged = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("x"),
        Similarity.cosineHof(col("a"), col("b")).as("y")).head()
    assert(ragged.isNullAt(0) && ragged.isNullAt(1))
  }

  test("winnowing fingerprints: near-dups share most, unrelated share none") {
    val fps = docs.withColumn("fps",
      TextFunctions.winnowingFingerprints(col("text")))
      .select("doc_id", "fps").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def overlap(a: Long, b: Long) =
      fps(a).intersect(fps(b)).size.toDouble / fps(a).union(fps(b)).size
    assert(overlap(1L, 2L) > 0.6) // planted near-dup pair
    assert(overlap(1L, 3L) < 0.05)
  }

  test("bpe-ish token count exceeds whitespace count on punctuated text") {
    val r = Seq(("hello, world! it's 42 degrees (said the fox)."))
      .toDF("text")
      .select(
        TextFunctions.bpeTokenCount(col("text")).as("bpe"),
        TextFunctions.tokenCount(col("text")).cast("long").as("ws"))
      .head()
    assert(r.getLong(0) > r.getLong(1))
  }

  test("native expressions callable from SQL after registration") {
    graft.plans.expressionsRegistry.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_cosine_similarity(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |       graft_simhash64(array('a', 'b')) AS s,
        |       size(graft_minhash_signature(array('x y z'), 8)) AS m""".stripMargin)
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 8)
  }

  test("duplicateClusters: connected components label each component by min id") {
    // chain 1-2-3, triangle 10-11-12, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val cc = DedupFunctions.duplicateClusters(pairs, "id_a", "id_b")
      .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // a deeper chain needs more propagation rounds but still converges
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val cc2 = DedupFunctions.duplicateClusters(chain, "id_a", "id_b")
      .df.collect().map(r => r.getLong(1)).distinct
    assert(cc2.toSeq == Seq(1L))
  }

  test("minhash connectivity edges: identical clusters to the expanded pairs, fewer edges") {
    // three exact-dup groups (sizes 4, 3, 2) + a near-dup bridge between
    // the first two groups' contents + an unrelated singleton: the
    // expanded pair graph carries every member combination (C(n,2)
    // intra cliques + cross products), the connectivity set only stars
    // and rep pairs — components and min-id labels must match exactly
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val aNear = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val b = "completely different content about spark query engines and columnar formats"
    val corpus = (
      (1L to 4L).map(i => (i, a)) ++
      Seq((10L, aNear), (11L, aNear), (12L, aNear)) ++
      Seq((20L, b), (21L, b)) ++
      Seq((30L, "el gato y el perro juegan en la casa de la abuela con el niño"))
    ).toDF("doc_id", "text")
    val sigs = DedupFunctions.minHashSignatures(corpus, "doc_id", "text",
      shingleN = 3, k = 16)
    val expanded = DedupFunctions.minHashNearDupPairsFromSignatures(
      sigs, k = 16, bands = 8, threshold = 0.5)
    val connectivity = DedupFunctions.minHashConnectivityEdges(
      sigs, k = 16, bands = 8, threshold = 0.5)
    // strictly fewer edges (4+3 member group pair expansion collapses)
    assert(connectivity.count() < expanded.count())
    def clusters(edges: org.apache.spark.sql.DataFrame) =
      DedupFunctions.duplicateClusters(edges, "id_a", "id_b")
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpanded = clusters(expanded)
    val viaConnectivity = clusters(connectivity)
    assert(viaConnectivity == viaExpanded)
    // the bridge merges groups a/aNear into one min-id component
    assert(viaConnectivity(10L) == 1L && viaConnectivity(4L) == 1L)
    assert(viaConnectivity(21L) == 20L)
    assert(!viaConnectivity.contains(30L)) // singleton: no edges, no row
  }

  test("multimodal binary pipeline: deterministic fake decode plumbing") {
    import graft.multimodal.BinaryPipeline
    val media = BinaryPipeline.withPayload(docs, "text")
    val decoded = BinaryPipeline.decodeMedia(media)
    val m = decoded.select(col("media_meta.*")).head()
    assert(m.getAs[Long]("n_bytes") > 0)
    assert(m.getAs[String]("content_hash").length == 32)
    assert(m.getAs[Int]("width") >= 64)
    // determinism: same input -> same meta
    val again = BinaryPipeline.decodeMedia(media).select(col("media_meta.*")).head()
    assert(m == again)
  }

  test("wav codec: canonical 44-byte header decoded; junk and truncation yield None") {
    import graft.multimodal.BinaryPipeline.WavCodec
    def bytes(hexStr: String): Array[Byte] =
      hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // canonical PCM header: 44100 Hz stereo 16-bit, data size 400 bytes
    // → 100 samples (blockAlign 4). Little-endian fields throughout.
    val wav = bytes(
      "52494646" + "b4010000" + "57415645" + // RIFF 436 WAVE
        "666d7420" + "10000000" +             // fmt , 16
        "0100" + "0200" + "44ac0000" + "10b10200" + // PCM, 2ch, 44100, 176400
        "0400" + "1000" +                     // blockAlign 4, 16 bits
        "64617461" + "90010000")              // data, 400
    assert(WavCodec.decode(wav) == Some((44100, 2, 16, 100L)))
    // declared data size counts even with no sample bytes attached —
    // header decode, the same contract as image dimensions
    assert(WavCodec.decode(wav ++ Array.fill[Byte](400)(0)) == Some((44100, 2, 16, 100L)))
    // junk/truncation/nulls refuse rather than invent a sample rate
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")) == None)
    assert(WavCodec.decode(wav.take(20)) == None)
    assert(WavCodec.decode("not audio at all".getBytes("UTF-8")) == None)
    assert(WavCodec.decode(null) == None)
    // a zero block-align must not divide-by-zero into an answer
    val zeroAlign = bytes(
      "52494646" + "b4010000" + "57415645" + "666d7420" + "10000000" +
        "0100" + "0200" + "44ac0000" + "10b10200" + "0000" + "1000" +
        "64617461" + "90010000")
    assert(WavCodec.decode(zeroAlign) == None)
    // unsigned chunk sizes ≥ 2^31: with Int math, 0xFFFFFFF7 made the
    // walk increment 0 (infinite loop in an executor task) and 0x7FFFFFFF
    // drove the index negative (ArrayIndexOutOfBounds). Both must
    // terminate with None — structurally broken, never hang or throw.
    val hugeChunk = bytes(
      "52494646" + "b4010000" + "57415645" +
        "6a756e6b" + "f7ffffff" +             // junk chunk, size 0xFFFFFFF7
        "64617461" + "90010000")
    assert(WavCodec.decode(hugeChunk) == None)
    val maxIntChunk = bytes(
      "52494646" + "b4010000" + "57415645" +
        "6a756e6b" + "ffffff7f" +             // junk chunk, size 0x7FFFFFFF
        "64617461" + "90010000")
    assert(WavCodec.decode(maxIntChunk) == None)
    // size exactly 2^31 (0x80000000): the sign bit of a 32-bit int — Int
    // math would jump the index negative; the unsigned-Long walk must
    // step past the declared body and terminate via the loop bound
    val twoPow31Chunk = bytes(
      "52494646" + "b4010000" + "57415645" +
        "6a756e6b" + "00000080" +             // junk chunk, size 2^31
        "64617461" + "90010000")
    assert(WavCodec.decode(twoPow31Chunk) == None)
    // a VALID fmt followed by a 2^31-sized data declaration: the walk
    // must not hang; the declared size is accepted (header contract) and
    // the sample count comes out of unsigned math
    val hugeData = bytes(
      "52494646" + "b4010000" + "57415645" + "666d7420" + "10000000" +
        "0100" + "0200" + "44ac0000" + "10b10200" + "0400" + "1000" +
        "64617461" + "00000080")              // data, size 2^31
    assert(WavCodec.decode(hugeData) == Some((44100, 2, 16, 536870912L)))
    // truncated RIFF shapes: cut inside the 12-byte preamble and cut
    // inside a chunk header — None, never an index error
    assert(WavCodec.decode(wav.take(11)) == None)
    assert(WavCodec.decode(wav.take(30)) == None) // mid fmt chunk body
    assert(WavCodec.decode(wav.take(38)) == None) // mid data-chunk header
  }

  test("header codec: real PNG/JPEG dimensions decoded, other bytes fall back to fake") {
    import graft.multimodal.BinaryPipeline.{FakeCodec, HeaderCodec}
    def bytes(hexStr: String): Array[Byte] =
      hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the canonical 1x1 transparent PNG (public fixture bytes)
    val png1x1 = bytes(
      "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489" +
        "0000000d49444154789c6360000000020001e221bc330000000049454e44ae426082")
    assert(HeaderCodec.decode(png1x1) == ((1, 1, 1, "image/png")))
    // minimal JPEG: SOI, APP0 (JFIF), SOF0 with 300x200 — the walk must
    // skip APP0 by its length field to reach the frame header
    val jpeg = bytes(
      "ffd8ffe000104a46494600010100004800480000" +
        "ffc000110800c8012c03012200021101031101")
    assert(HeaderCodec.decode(jpeg) == ((300, 200, 1, "image/jpeg")))
    // corrupt/truncated/foreign bytes fall back to the deterministic fake
    val truncatedPng = png1x1.take(20)
    assert(HeaderCodec.decode(truncatedPng) == FakeCodec.decode(truncatedPng))
    val truncatedJpeg = jpeg.take(6) // APP0 length overruns the buffer
    assert(HeaderCodec.decode(truncatedJpeg) == FakeCodec.decode(truncatedJpeg))
    val text = "plain old text".getBytes("UTF-8")
    assert(HeaderCodec.decode(text) == FakeCodec.decode(text))
    assert(HeaderCodec.decode(null) == FakeCodec.decode(null))
    // zero dimensions are not trusted (a real decoder would reject them)
    val pngZeroW = bytes(
      "89504e470d0a1a0a0000000d49484452" + "00000000" + "00000001" +
        "080600000000000000")
    assert(HeaderCodec.decode(pngZeroW) == FakeCodec.decode(pngZeroW))
  }

  test("frame sampling: even grid, capped by clip length, no duplicates") {
    import graft.multimodal.BinaryPipeline
    // meta-only frame: n_frames is what sampleFrames reads
    def clip(id: Long, frames: Int) = (id, frames)
    val clips = Seq(clip(1L, 10), clip(2L, 2), clip(3L, 1), clip(4L, 0))
      .toDF("media_id", "nf")
      .withColumn("media_meta", struct(col("nf").as("n_frames")))
    val out = BinaryPipeline.sampleFrames(clips, k = 4)
      .groupBy("media_id").agg(collect_list("frame_idx").as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).sorted.toList).toMap
    assert(out(1L) == List(0L, 2L, 5L, 7L)) // i*10/4 grid
    assert(out(2L) == List(0L, 1L)) // k > frames → every frame, once
    assert(out(3L) == List(0L))
    // a frameless clip (real codecs can return 0) contributes NO rows —
    // frame_idx 0 would index a frame that doesn't exist
    assert(!out.contains(4L))
  }

  test("resize planning: aspect preserved, fit-only (never upscales)") {
    import graft.multimodal.BinaryPipeline
    val imgs = Seq(
      (1L, 640, 480), // wide, must shrink to 256×192
      (2L, 480, 640), // tall → 192×256
      (3L, 100, 50)   // already fits → untouched
    ).toDF("media_id", "w", "h")
      .withColumn("media_meta", struct(col("w").as("width"), col("h").as("height")))
    val out = BinaryPipeline.resizeMeta(imgs, 256, 256)
      .select("media_id", "resize_w", "resize_h").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((256L, 192L)))
    assert(out(2L) == ((192L, 256L)))
    assert(out(3L) == ((100L, 50L)))
  }

  test("resize planning: unmeasurable rows (null/zero dims) plan NULL, not a fabricated size") {
    import graft.multimodal.BinaryPipeline
    val imgs = Seq(
      (1L, Some(640), None),      // partial decode: height unknown
      (2L, None, None),           // decode failed outright
      (3L, Some(0), Some(480)),   // degenerate dimension
      (4L, Some(640), Some(480))  // control: still plans 256×192
    ).toDF("media_id", "w", "h")
      .withColumn("media_meta", struct(col("w").as("width"), col("h").as("height")))
    val out = BinaryPipeline.resizeMeta(imgs, 256, 256)
      .select("media_id", "resize_w", "resize_h").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((Some(256L), Some(192L))))
  }

  test("resize planning: integral div is exact past double precision (2^53)") {
    import graft.multimodal.BinaryPipeline
    // w*maxH = (2^53+1)*1 is not representable as a double; floor(a/b)
    // through double division would round. div must stay exact.
    val w = (1L << 53) + 1L
    val imgs = Seq((1L, w, 3L)).toDF("media_id", "w", "h")
      .withColumn("media_meta", struct(col("w").as("width"), col("h").as("height")))
    val out = BinaryPipeline.resizeMeta(imgs, 1, 1)
      .select("resize_w", "resize_h").head
    // wide image (w/h > maxW/maxH = 1): resize_w = maxW = 1,
    // resize_h = max(1, h*maxW div w) = 1; exactness exercised on the
    // div path by the tall variant below
    assert(out.getLong(0) == 1L && out.getLong(1) == 1L)
    val tall = Seq((1L, 3L, w)).toDF("media_id", "w", "h")
      .withColumn("media_meta", struct(col("w").as("width"), col("h").as("height")))
    val t = BinaryPipeline.resizeMeta(tall, 1, 1)
      .select("resize_w", "resize_h").head
    assert(t.getLong(0) == 1L && t.getLong(1) == 1L)
  }

  test("repetitionSignals withBigrams=false matches the word-level signals of the full form") {
    val d = Seq(
      (1L, "the the the cat"),
      (2L, "all words distinct here"),
      (3L, "a b a b a b")).toDF("doc_id", "text")
    val full = TextFunctions.repetitionSignals(d, "doc_id", "text")
      .select("doc_id", "dup_word_frac", "top_word_frac").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val wordsOnly = TextFunctions.repetitionSignals(
        d, "doc_id", "text", withBigrams = false)
    assert(wordsOnly.columns.toSeq == Seq("doc_id", "dup_word_frac", "top_word_frac"))
    val w = wordsOnly.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(w == full)
  }

  test("dedupLines drops cross-doc boilerplate, keeps order, never loses a doc") {
    val d = Seq(
      (1L, "unique alpha\ncookie banner\nunique beta"),
      (2L, "cookie banner\nown content two"),
      (3L, "three starts\ncookie banner\nthree ends"),
      (4L, "cookie banner"), // all-boilerplate doc must survive, empty
      (5L, "fully original\nlines only")
    ).toDF("doc_id", "text")
    val out = TextFunctions.dedupLines(d, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // "cookie banner" occurs in 4 docs > 2 → scrubbed everywhere
    assert(out(1L) == (("unique alpha\nunique beta", 2L, 1L)))
    assert(out(2L) == (("own content two", 1L, 1L)))
    assert(out(3L) == (("three starts\nthree ends", 2L, 1L)))
    assert(out(4L) == (("", 0L, 1L)))
    assert(out(5L) == (("fully original\nlines only", 2L, 0L)))
  }

  test("dedupLines keeps within-doc repeats when doc frequency is low") {
    val d = Seq((1L, "chorus\nchorus\nverse")).toDF("doc_id", "text")
    val out = TextFunctions.dedupLines(d, "doc_id", "text", maxDocFreq = 1).head()
    // "chorus" is in only ONE distinct doc — both occurrences stay
    assert(out.getString(1) == "chorus\nchorus\nverse")
    assert(out.getLong(2) == 3L && out.getLong(3) == 0L)
  }

  test("dedupLines: NULL text behaves as empty doc, counts stay consistent") {
    // Without the coalesce, size(split(null)) = -1 under the legacy
    // sizeOfNull conf → n_lines_dropped = -1, violating kept+dropped=total.
    val d = Seq((1L, Some("keep me")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextFunctions.dedupLines(d, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("keep me", 1L, 0L)))
    // null → one empty line, df("") = 1 ≤ 2, so it is KEPT as ""
    assert(out(2L) == (("", 1L, 0L)))
    out.values.foreach { case (_, kept, dropped) => assert(kept >= 0 && dropped >= 0) }
  }

  test("unigramSurprisal: hand-computed whole-bit scores") {
    // corpus: a=2, b=2, c=1, N=5; floorlog2: N→2, 2→1, 1→0
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextFunctions.unigramSurprisal(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc1: (2-1)+(2-1)+(2-1) = 3 bits over 3 tokens = 1.0
    assert(out(1L) == 1.0)
    // doc2: (2-1)+(2-0) = 3 bits over 2 tokens = 1.5
    assert(out(2L) == 1.5)
  }

  test("targetMixture: binding domain survives whole, others downsample, rest dropped") {
    val rows = (1L to 100L).map(i => (i, "en")) ++
      (101L to 110L).map(i => (i, "es")) ++
      (111L to 120L).map(i => (i, "fr"))
    val d = rows.toDF("doc_id", "lang")
    val out = SampleFunctions.targetMixture(d, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "es" -> 0.5), seed = "tm")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    // scale = min(100/0.5, 10/0.5) = 20 → es keeps all 10, en ~10 of 100
    assert(byLang("es") == 10)
    assert(byLang.getOrElse("fr", 0) == 0)
    assert(byLang("en") > 0 && byLang("en") < 100)
    // deterministic: second run identical
    val again = SampleFunctions.targetMixture(d, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "es" -> 0.5), seed = "tm")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("targetMixture fails loud on an unachievable mixture") {
    val d = Seq((1L, "en")).toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      SampleFunctions.targetMixture(d, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "zz" -> 0.5), seed = "tm")
    }
    assert(e.getMessage.contains("zz"))
  }

  test("simHashNearDupPairs: exact dup found at hamming 0, unrelated absent") {
    val withDup = docs.union(Seq(
      (99L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text"))
    val pairs = DedupFunctions.simHashNearDupPairs(withDup, "doc_id", "text",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 99L, 0L)))
    // cross-language docs are far in hamming space — no pair with doc 4/5
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L))
  }

  test("simHashNearDupPairs enforces the pigeonhole precondition") {
    intercept[IllegalArgumentException] {
      DedupFunctions.simHashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 4, bands = 4)
    }
  }

  test("luhnValid: known-valid numbers pass, off-by-one fails, separators ignored") {
    val cases = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // off-by-one check digit
      ("4111-1111 1111,1111", true), // separators stripped before checksum
      ("79927398713", true),        // the published Luhn example
      ("79927398714", false),
      ("no digits at all", false)
    ).toDF("s", "expected")
    val wrong = cases
      .withColumn("got", TextFunctions.luhnValid(col("s")))
      .filter(col("got") =!= col("expected"))
    assert(wrong.isEmpty, wrong.collect().mkString(", "))
  }

  test("redactCards: Luhn-valid runs redacted, invalid runs untouched") {
    val out = Seq((1L,
      "pay 4111 1111 1111 1111 ref 1234 5678 9012 3456 order 12345"))
      .toDF("id", "t")
      .select(TextFunctions.redactCards(col("t"))).head().getString(0)
    assert(out == "pay <CARD> ref 1234 5678 9012 3456 order 12345")
  }

  test("redactCards: longest-first fold when one valid candidate prefixes another") {
    // "4111 1111 1111 1111" (16 digits) and "4111 1111 1111 11113"
    // (17 digits) are BOTH Luhn-valid and the shorter is a string prefix
    // of the longer. Extraction order puts the shorter first here; a
    // naive fold in that order would leave "<CARD>3" behind. The explicit
    // longest-first sort makes the outcome order-independent.
    val out = Seq((1L,
      "pay 4111 1111 1111 1111 and 4111 1111 1111 11113 end"))
      .toDF("id", "t")
      .select(TextFunctions.redactCards(col("t"))).head().getString(0)
    assert(out == "pay <CARD> and <CARD> end")
  }

  test("int8 quantization: error bounded by scale/2, constants exact, roundtrip shape") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.5f, 1.0f, -1.0f)),
      (2L, Array(3.0f, 3.0f, 3.0f, 3.0f)), // constant → scale 0, exact
      (3L, Array(-2.5f, 7.25f, 0.0f, 4.125f))
    ).toDF("vec_id", "embedding")
    val out = vecs
      .withColumn("q", Similarity.quantizeInt8(col("embedding")))
      .withColumn("recon", Similarity.dequantizeInt8(col("q")))
      .select(col("vec_id"), col("q.scale"),
        array_max(zip_with(col("recon"), col("embedding").cast("array<double>"),
          (r, x) => abs(r - x))).as("err"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    out.foreach { case (id, (scale, err)) =>
      assert(err <= scale * 0.5 + 1e-12, s"vec $id err $err > scale/2 $scale")
    }
    assert(out(2L) == ((0.0, 0.0))) // constant vector reconstructs exactly
  }

  test("PQ: encode ties to the lowest cell, decode is the coded centroid") {
    // hand-built codebooks: m=2 subspaces of width 2, two centroids each
    val cbs: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(2.0, 2.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 0.0f)), // sub0 EQUIDISTANT → cell 0; sub1 exact → 0
      (2L, Array(2.0f, 2.0f, 0.0f, 1.0f))  // sub0 → 1; sub1 → 1
    ).toDF("vec_id", "embedding")
    val out = vecs
      .withColumn("codes", Similarity.pqEncode(col("embedding"), cbs))
      .withColumn("recon", Similarity.pqDecode(col("codes"), cbs))
      .select("vec_id", "codes", "recon")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toList, r.getSeq[Double](2).toList))).toMap
    assert(out(1L) == ((List(0, 0), List(0.0, 0.0, 1.0, 0.0))))
    assert(out(2L) == ((List(1, 1), List(2.0, 2.0, 0.0, 1.0))))
  }

  test("PQ: training is deterministic and exact when centroids can cover the data") {
    // 4 distinct subvector patterns per subspace, k=4 ⇒ every subvector
    // is its own centroid after convergence: reconstruction error 0.
    val base = Seq(
      Array(0.0f, 0.0f, 9.0f, 9.0f), Array(1.0f, 5.0f, 8.0f, 2.0f),
      Array(6.0f, 1.0f, 3.0f, 7.0f), Array(4.0f, 4.0f, 1.0f, 1.0f))
    val vecs = (0L until 40L).map(i => (i, base((i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val cbs = Similarity.trainPqCodebooks(vecs, "vec_id", "embedding",
      m = 2, k = 4, maxIter = 8)
    assert(cbs.length == 2 && cbs.forall(_.forall(_.length == 2)))
    val errs = vecs
      .withColumn("codes", Similarity.pqEncode(col("embedding"), cbs))
      .withColumn("err", Similarity.l2Sq(col("embedding").cast("array<double>"),
        Similarity.pqDecode(col("codes"), cbs)))
      .select("err").collect().map(_.getDouble(0))
    assert(errs.forall(_ == 0.0), s"max err ${errs.max}")
    // repartitioning the training input must not change the codebooks
    val cbs2 = Similarity.trainPqCodebooks(vecs.repartition(7), "vec_id",
      "embedding", m = 2, k = 4, maxIter = 8)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq == cbs2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PQ ANN: self-match ranks first at distance 0; k bounds the list") {
    val base = Seq(
      Array(0.0f, 0.0f, 9.0f, 9.0f), Array(1.0f, 5.0f, 8.0f, 2.0f),
      Array(6.0f, 1.0f, 3.0f, 7.0f), Array(4.0f, 4.0f, 1.0f, 1.0f))
    val vecs = (0L until 20L).map(i => (i, base((i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val cbs = Similarity.trainPqCodebooks(vecs, "vec_id", "embedding",
      m = 2, k = 4, maxIter = 8)
    val coded = vecs
      .withColumn("codes", Similarity.pqEncode(col("embedding"), cbs))
      .select("vec_id", "codes")
    val res = Similarity.pqTopK(vecs.filter(col("vec_id") < 2), "vec_id",
        "embedding", coded, "vec_id", "codes", cbs, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(res.count(_._1 == 0L) == 6 && res.count(_._1 == 1L) == 6)
    // exact-coverage codebooks ⇒ a query's own pattern reconstructs
    // exactly: its 5 pattern-twins (ids ≡ query mod 4) occupy the first
    // ranks at distance 0, ordered by ascending id (the tie-break)
    val q0 = res.filter(_._1 == 0L).sortBy(_._2)
    assert(q0.take(5).map(_._3).toSeq == Seq(0L, 4L, 8L, 12L, 16L))
    assert(q0.take(5).forall(_._4 == 0.0))
    assert(q0(5)._4 > 0.0, "rank 6 is a different pattern at positive distance")
  }

  test("PQ: indivisible dims fail loud; null vectors don't break training") {
    val vecs = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2)
    }
    val withNull = Seq((1L, Some(Array(1.0f, 2.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val cbs = Similarity.trainPqCodebooks(withNull, "vec_id", "embedding",
      m = 1, k = 2)
    assert(cbs.nonEmpty)
  }

  test("IVF/semanticDedup tolerate null embeddings in the fit sample") {
    val vecs = Seq(
      (1L, Some(Array(1.0f, 0.0f))),
      (2L, None),
      (3L, Some(Array(0.9f, 0.1f)))
    ).toDF("vec_id", "embedding")
    // must not NPE while training; the null row simply can't train
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.99, nlist = 2, maxIter = 3)
    assert(out.count() == 3)
  }

  test("semanticDedup: near-identical vectors collapse to one representative") {
    // Two tight clusters plus one loner; within-cluster cosine ≈ 1.
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)),
      (2L, Array(1.0f, 0.02f, 0.0f)),  // near-dup of 1
      (5L, Array(0.0f, 1.0f, 0.01f)),
      (6L, Array(0.0f, 1.0f, 0.02f)),  // near-dup of 5
      (9L, Array(-1.0f, 0.5f, -0.5f))  // loner
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.99, nlist = 2, maxIter = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 5L, 6L, 9L)) // nothing vanishes
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)))
    assert(out(5L) == ((5L, true)) && out(6L) == ((5L, false)))
    assert(out(9L) == ((9L, true)))
  }

  test("minhash flood of identical docs: collapsed banding still reports every pair (skew guard)") {
    // The 100 TB degenerate input: many documents with IDENTICAL content.
    // The banded self-join must see ONE representative per distinct
    // content (bounded join), while the output still carries the full
    // all-pairs contract: every copy pairs with every copy at Jaccard
    // exactly 1, and a near-dup of the content pairs with EVERY copy.
    val n = 200
    val boiler = "lorem ipsum boilerplate text repeated across the entire crawl corpus every day"
    val near = boiler.replace("day", "night")
    val d = ((1 to n).map(i => (i.toLong, boiler)) ++ Seq(
      (1000L, near),
      (2000L, "completely unrelated content about distributed query planning")))
      .toDF("doc_id", "text")
    val pairs = DedupFunctions.minHashNearDupPairs(d, "doc_id", "text",
      shingleN = 3, k = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val intra = pairs.filter(p => p._1 <= n && p._2 <= n)
    assert(intra.length == n * (n - 1) / 2)
    assert(intra.forall(_._3 == 1.0))
    val cross = pairs.filter(_._2 == 1000L)
    assert(cross.length == n) // the near-dup matched every copy
    assert(cross.map(_._3).distinct.length == 1)
    assert(pairs.forall(p => p._1 < p._2))
    assert(!pairs.exists(p => p._1 == 2000L || p._2 == 2000L))
    assert(pairs.length == intra.length + cross.length)
  }

  test("simhash flood of identical docs: signature collapse preserves the pair set (skew guard)") {
    val n = 150
    val boiler = "the same cookie banner boilerplate sentence appears on every single crawled page"
    val d = ((1 to n).map(i => (i.toLong, boiler)) :+
      (900L -> "spark catalyst rewrites logical plans into physical execution strategies"))
      .toDF("doc_id", "text")
    val pairs = DedupFunctions.simHashNearDupPairs(d, "doc_id", "text",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val intra = pairs.filter(p => p._1 <= n && p._2 <= n)
    assert(intra.length == n * (n - 1) / 2)
    assert(intra.forall(_._3 == 0L)) // identical content = Hamming 0
  }

  test("embedding hot bucket of identical vectors: collapse preserves pairs and kernel values (skew guard)") {
    val m = 120
    val v = Array(0.6f, 0.8f, 0.0f)
    val w = Array(0.6f, 0.79f, 0.01f) // near-dup of v
    val u = Array(-1.0f, 0.3f, 0.9f)  // far from both
    val df = ((1 to m).map(i => (i.toLong, v, "b")) ++
      Seq((500L, w, "b"), (600L, u, "b"))).toDF("vec_id", "embedding", "label")
    val pairsM = Similarity.embeddingNearDupPairs(df, "vec_id", "embedding",
      "label", threshold = 0.9)
    val pairs =
      try pairsM.df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      finally pairsM.release()
    val intra = pairs.filter(p => p._1 <= m && p._2 <= m)
    assert(intra.length == m * (m - 1) / 2)
    // ONE value for every identical pair, computed by the cosine kernel
    // (NOT an assumed 1.0 literal — sqrt(x)·sqrt(x) need not equal x)
    assert(intra.map(_._3).distinct.length == 1)
    assert(intra.head._3 >= 0.9)
    val cross = pairs.filter(p => p._1 == 500L || p._2 == 500L)
    assert(cross.length == m) // the near-dup pairs with every copy
    assert(cross.map(_._3).distinct.length == 1)
    assert(!pairs.exists(p => p._1 == 600L || p._2 == 600L))
  }

  test("semantic dedup on a single-cell-dominant corpus keeps one representative (skew guard)") {
    val m = 150
    val hot = Array(1.0f, 0.0f, 0.0f)
    val df = ((1 to m).map(i => i.toLong -> hot) :+ (901L -> Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val res = Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.9, nlist = 2, maxIter = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(res.length == m + 1)
    val kept = res.filter(_._3).map(_._1).toSet
    assert(kept == Set(1L, 901L))
    assert(res.filter(_._1 <= m).forall(_._2 == 1L)) // one cluster, min-id label
  }

  test("sharedSpanPairs: planted shared span is found, disjoint docs are not paired") {
    val span = "this exact forty-character span is copied verbatim between the two documents"
    val d = Seq(
      (1L, s"unique preamble alpha $span unique coda alpha"),
      (2L, s"a totally different opening beta $span and a different ending beta"),
      (3L, "no shared material here at all just original prose about query engines"))
      .toDF("doc_id", "text")
    val pairsM = DedupFunctions.sharedSpanPairs(d, "doc_id", "text",
      k = 20, w = 16)
    val pairs =
      try pairsM.df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      finally pairsM.release()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 1) // at least one verified shared fingerprint
  }

  test("sharedSpanPairs: winnowing coverage guarantee on spans >= w+k-1") {
    // A shared span of exactly w + k - 1 = 35 normalized characters MUST
    // produce a pair (the window of w k-gram hashes it spans selects at
    // least one fingerprint, identically in both docs).
    val span35 = "abcdefghij0123456789klmnopqrst12345"
    assert(span35.length == 35)
    val d = Seq(
      (10L, s"left-context-one $span35 right-one"),
      (20L, s"other-left-context $span35 other-right"))
      .toDF("doc_id", "text")
    val pairsM = DedupFunctions.sharedSpanPairs(d, "doc_id", "text",
      k = 20, w = 16)
    val pairs =
      try pairsM.df.collect().map(r => (r.getLong(0), r.getLong(1)))
      finally pairsM.release()
    assert(pairs.toSet == Set((10L, 20L)))
  }

  test("sharedSpanPairs: boilerplate in too many docs is dropped, caps bound the bucket (skew guard)") {
    val n = 80 // > maxDocsPerHash = 50
    // fully identical docs: every selected hash lands in all n docs, so
    // the doc-frequency cap drops every one of them — the classic
    // crawl-mirror flood cannot go quadratic
    val boiler = "identical cookie banner boilerplate repeated on every crawled page here"
    val flood = (1 to n).map(i => (i.toLong, boiler))
    // an internally-repetitive doc: the same long phrase looped many times
    val loop = "the very same repeated phrase echoes again and again forever "
    val d = (flood ++ Seq(
      (500L, loop * 40),
      (501L, loop * 40)))
      .toDF("doc_id", "text")
    val pairsM = DedupFunctions.sharedSpanPairs(d, "doc_id", "text",
      k = 20, w = 16, maxDocsPerHash = 50, maxPosPerDocHash = 10)
    val pairs =
      try pairsM.df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      finally pairsM.release()
    // the 80-doc boilerplate hash is over the doc-frequency cap: no
    // quadratic 80×80 pair fan-out from it
    assert(!pairs.exists(p => p._1 <= n && p._2 <= n))
    // the looped pair IS found, but the per-(doc,hash) position cap
    // bounds the count: <= 10×10 per shared hash, never positions²
    val lp = pairs.filter(p => p._1 == 500L && p._2 == 501L)
    assert(lp.length == 1 && lp.head._3 >= 1)
  }

  test("cdcChunks: chunks reassemble the text, respect length bounds, and resist shifts") {
    // deterministic pseudo-random text long enough for many chunks
    val body = (1 to 400).map(i => ((i * 2654435761L) % 997).toString).mkString(" ")
    val shifted = "inserted prefix edit " + body
    val d = Seq((1L, body), (2L, shifted)).toDF("doc_id", "text")
    val ch = DedupFunctions.cdcChunks(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val byDoc = ch.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 1. chunks tile the document exactly: starts/lengths are contiguous
    //    from 1 to the normalized length, no gaps or overlaps
    byDoc.foreach { case (_, cs) =>
      cs.foldLeft(1L) { case (expectStart, (_, _, start, len, _)) =>
        assert(start == expectStart); assert(len > 0); start + len
      }
    }
    // 2. every complete (non-final) chunk obeys [minLen, maxLen]
    byDoc.foreach { case (_, cs) =>
      cs.init.foreach { case (_, _, _, len, _) =>
        assert(len >= 16 && len <= 256)
      }
    }
    // 3. shift-resistance: the insertion perturbs only a bounded prefix —
    //    the two documents share almost all chunk fingerprints, and the
    //    shared count dwarfs what fixed-size blocking would keep (0)
    val h1 = byDoc(1L).map(_._5).toSet
    val h2 = byDoc(2L).map(_._5).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= byDoc(1L).length - 3,
      s"only $shared of ${byDoc(1L).length} chunks survived a prefix insertion")
  }

  test("multi-probe LSH finds the one-bit-away neighbor single-probe misses") {
    // The hyperplanes are hash-derived, so which perturbation flips
    // exactly one sign bit can't be eyeballed — generate a fan of small
    // perturbations of a base vector, compute their signatures, and
    // pick the first that lands EXACTLY one plane away (deterministic:
    // same hashes every run).
    val base = Array(1.0f, 0.02f, 0.0f, 0.1f)
    val fan = (1 to 100).map(i =>
      (i.toLong, Array(1.0f, 0.02f - 0.004f * i, 0.05f * (i % 3), 0.1f)))
    val fanSigs = (fan :+ (0L, base)).toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.rhpSignature(col("embedding"), 6).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneAway = fan.find(v =>
      java.lang.Long.bitCount(fanSigs(v._1) ^ fanSigs(0L)) == 1)
    assert(oneAway.isDefined, "no perturbation landed one plane away")
    val vecs = Seq(
      (1L, base),
      (100L, oneAway.get._2),              // near, exactly one plane flips
      (200L, Array(-0.5f, 0.9f, -0.7f, 0.2f))) // far
      .toDF("vec_id", "embedding")
    val c = vecs.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"))
      .withColumn("sig", Similarity.rhpSignature(col("cv"), 6))
    val q = c.filter(col("neighbor_id") === 1L)
      .select(col("neighbor_id").as("query_id"), col("cv").as("qv"), col("sig"))
    val single = Similarity.lshAnnTopKFromSignatures(q, c, k = 5)
      .collect().map(_.getLong(1)).toSet
    val multi = Similarity.lshMultiProbeTopKFromSignatures(q, c, k = 5, planes = 6)
      .collect().map(_.getLong(1)).toSet
    assert(!single.contains(100L))
    assert(multi.contains(100L))
    assert(single.subsetOf(multi)) // probing only ever ADDS candidates
  }

  test("minHashNearDupAgainst: new batch matches its corpus near-dup only") {
    val corpus = docs.filter(col("doc_id") =!= 2L)
    val batch = docs.filter(col("doc_id") === 2L || col("doc_id") === 3L)
    // doc 2 near-dups corpus doc 1; doc 3 exists in BOTH (self-match at 1.0)
    val out = DedupFunctions.minHashNearDupAgainst(batch, corpus,
      "doc_id", "text", shingleN = 3, k = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists(m => m._1 == 2L && m._2 == 1L && m._3 >= 0.5))
    assert(out.contains((3L, 3L, 1.0)))
    assert(out.length == 2)
  }
}
