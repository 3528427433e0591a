package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/splitting: stability under repartition, split
  * proportions, per-stratum fractions, seed independence. */
class SampleFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("split is deterministic and stable under repartitioning") {
    def labels(parts: Int) = ids.repartition(parts)
      .select(col("id"), SampleFunctions.splitLabel(col("id"), 0.8, "s").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels(1) == labels(13))
  }

  test("split proportions land near the requested fraction") {
    val train = ids
      .filter(SampleFunctions.splitLabel(col("id"), 0.8, "s") === "train")
      .count()
    // 2000 draws at p=0.8: ±5 sigma ≈ ±90
    assert(train > 1510 && train < 1690, s"train=$train")
  }

  test("different seeds give independent draws") {
    val both = ids.filter(
      SampleFunctions.splitLabel(col("id"), 0.5, "a") === "train" &&
        SampleFunctions.splitLabel(col("id"), 0.5, "b") === "train")
      .count()
    // independent halves overlap on ~25%; identical draws would give ~50%
    assert(both > 350 && both < 650, s"overlap=$both")
  }

  test("stratified sample applies per-stratum fractions and the default") {
    val rows = ids.withColumn("s",
      when(col("id") % 2 === 0, "keep_all").otherwise("rare"))
    val kept = SampleFunctions.stratifiedSample(rows, col("id"), col("s"),
      Map("keep_all" -> 1.0, "rare" -> 0.1), default = 0.5, seed = "z")
    val byStratum = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("keep_all") == 1000L) // frac 1.0 keeps EVERY row
    val rare = byStratum.getOrElse("rare", 0L)
    assert(rare > 50 && rare < 160, s"rare=$rare") // 1000 draws at p=0.1
  }

  test("hexThreshold endpoints and width") {
    assert(SampleFunctions.hexThreshold(0.0) == "00000000")
    // 1.0 must sort above every possible 8-hex draw — a clamped ffffffff
    // would drop the draw==max rows under the strict '<'
    assert(SampleFunctions.hexThreshold(1.0) == "g")
    assert(SampleFunctions.hexThreshold(0.8) == "cccccccc")
    assert(SampleFunctions.hexThreshold(0.5) == "80000000")
  }

  test("packSequences: shard, sequence index and offset are exact") {
    // one shard so the running layout is easy to state: docs 0,1,2,3 with
    // 3,4,5,2 tokens concat to starts 0,3,7,12; budget 5 cuts at 5,10,...
    val docs = Seq((0L, 3L), (1L, 4L), (2L, 5L), (3L, 2L)).toDF("id", "tok")
    val out = SampleFunctions
      .packSequences(docs, "id", col("tok"), budgetTokens = 5L, numShards = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      0L -> ((0L, 0L)), // starts at token 0 → seq 0, offset 0
      1L -> ((0L, 3L)), // starts at 3 → seq 0, offset 3 (straddles the cut)
      2L -> ((1L, 2L)), // starts at 7 → seq 1, offset 2
      3L -> ((2L, 2L)))) // starts at 12 → seq 2, offset 2
    // sharding: id mod numShards, layout independent per shard
    val sharded = SampleFunctions
      .packSequences(docs, "id", col("tok"), budgetTokens = 5L, numShards = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sharded == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("samplePerGroup: k per group by hash rank, matching a driver reference") {
    import java.security.MessageDigest
    def draw(id: Long): String = MessageDigest.getInstance("MD5")
      .digest(s"g5:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val rows = (0L until 40L).map(i => (if (i % 2 == 0) "a" else "b", i))
    val expected = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sortBy(i => (draw(i), i)).take(3).toSet
    }
    val got = SampleFunctions.samplePerGroup(
        rows.toDF("g", "id"), Seq("g"), col("id"), k = 3, seed = "g5")
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    assert(got === expected)
    // repartitioning must not change the selection
    val gotShuffled = SampleFunctions.samplePerGroup(
        rows.toDF("g", "id").repartition(7), Seq("g"), col("id"), k = 3, seed = "g5")
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    assert(gotShuffled === expected)
  }

  test("samplePerGroup: groups smaller than k return whole groups") {
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L))
    val got = SampleFunctions.samplePerGroup(
        rows.toDF("g", "id"), Seq("g"), col("id"), k = 5, seed = "s")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === rows.toSet)
  }

  test("shardAssign: stable under repartition, in range, roughly uniform") {
    def shards(parts: Int) = ids.repartition(parts)
      .select(col("id"), SampleFunctions.shardAssign(col("id"), 16, "sh").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = shards(1)
    assert(s1 == shards(17))
    assert(s1.values.forall(s => s >= 0 && s < 16))
    // 2000 ids over 16 shards: every shard populated, none dominant
    val sizes = s1.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 16 && sizes.min > 60 && sizes.max < 200)
  }

  test("shard xor checksum flags a dropped document, ignores order") {
    val fps = (0L until 50L).map(i => i -> f"${i * 2654435761L}%015x")
    def xorOf(rows: Seq[(Long, String)]) = rows.map { case (_, h) =>
      java.lang.Long.parseLong(h, 16)
    }.foldLeft(0L)(_ ^ _)
    assert(xorOf(fps) == xorOf(scala.util.Random.shuffle(fps)))
    // drop a doc with a NON-ZERO hash (id 0 hashes to 0, invisible to xor
    // — the one blind spot of the checksum, also true of any additive one)
    assert(xorOf(fps) != xorOf(fps.filterNot(_._1 == 7L)))
  }

  test("null id: split lands on 'test', stratified sample never keeps it") {
    val rows = Seq(Some(1L), None).toDF("id")
    val labels = rows
      .select(col("id"), SampleFunctions.splitLabel(col("id"), 0.9999, "s").as("l"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1))
      .toMap
    // the null draw null-propagates (as 'seed:' || id would in SQL), so the
    // null id falls to the otherwise branch rather than hashing "seed:"
    assert(labels(-1L) == "test")
    val kept = SampleFunctions.stratifiedSample(
      rows.withColumn("s", lit("x")), col("id"), col("s"),
      Map("x" -> 0.9999), default = 0.5, seed = "z").collect()
    assert(kept.forall(!_.isNullAt(0)))
  }

  test("packShardsByBudget: two-level prefix sum equals the global cumsum; budgets respected") {
    // 2,000 docs with deterministic pseudo-random token counts; the
    // operator's bucket-decomposed running total must equal a direct
    // driver-side cumulative sum over the same (draw, id) order.
    val docs = ids.select(col("id"),
      (pmod(xxhash64(col("id")), lit(97L)) + 1L).as("tok"))
    val out = SampleFunctions.packShardsByBudget(docs, "id", col("tok"),
        budgetTokens = 1000L, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): String = md.digest(s"t:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val ordered = out.sortBy(x => (draw(x._1), x._1))
    var cum = 0L
    ordered.foreach { case (_, tok, offset, shard) =>
      assert(offset == cum, s"offset $offset != driver cumsum $cum")
      assert(shard == cum / 1000L)
      cum += tok
    }
    // Interior shards hold ≥ budget − max_tok tokens: no premature cut.
    val byShard = ordered.groupBy(_._4).toSeq.sortBy(_._1)
    val maxTok = ordered.map(_._2).max
    byShard.dropRight(1).foreach { case (s, rows) =>
      val tot = rows.map(_._2).sum
      assert(tot + maxTok >= 1000L, s"shard $s undersized: $tot")
    }
    // Stability under repartition (the prefix sum must not depend on
    // physical layout).
    val again = SampleFunctions.packShardsByBudget(docs.repartition(13),
        "id", col("tok"), budgetTokens = 1000L, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.forall { case (id, _, off, _) => again(id) == off })
  }

  test("dsirLogWeights matches a driver-side integer replay exactly") {
    // Independent reference: same model re-derived in plain Scala with
    // its own md5 + integer-log code — any drift in hashing, smoothing,
    // explode shape or fixed-point math breaks the equality.
    val docs = Seq(
      (0L, "the cat sat on the mat", true),
      (1L, "the dog sat on the log", true),
      (2L, "der hund sitzt auf dem", false),
      (3L, "le chat est sur le tapis", false),
      (4L, "the cat sat", false), // target-like words, non-target doc
      (5L, "", false) // empty text → single "" unigram
    ).toDF("doc_id", "text", "tgt")
    val d = 64
    def ilog(x: Long): Long = {
      val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
      1024L * m + ((x * 1024L) >> m) - 1024L
    }
    def feats(text: String): Seq[String] = {
      val ws = text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$f".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % d
    }
    val rows = Seq((0L, true), (1L, true), (2L, false), (3L, false),
      (4L, false), (5L, false))
    val texts = Map(0L -> "the cat sat on the mat",
      1L -> "the dog sat on the log", 2L -> "der hund sitzt auf dem",
      3L -> "le chat est sur le tapis", 4L -> "the cat sat", 5L -> "")
    val occ = rows.flatMap { case (id, t) =>
      feats(texts(id)).map(f => (id, t, bucket(f))) }
    val cr = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val totr = occ.size.toLong
    val tott = occ.count(_._2).toLong
    val w: Map[Long, Long] = cr.map { case (b, r) =>
      b -> ((ilog(ct.getOrElse(b, 0L) + 1) - ilog(tott + d)) -
        (ilog(r + 1) - ilog(totr + d))) }
    val expected = occ.groupBy(_._1).view.mapValues { os =>
      (os.map(o => w(o._3)).sum, os.size.toLong) }.toMap

    val got = SampleFunctions.dsirLogWeights(docs, "doc_id", "text",
        col("tgt"), numBuckets = d, seed = "dsir")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // Target-vocabulary doc 4 must outscore the non-target-vocabulary
    // docs — the selection property the operator exists for.
    assert(got(4L)._1 > got(2L)._1 && got(4L)._1 > got(3L)._1)
    // Stable under repartition (content hashing, no RNG state).
    val re = SampleFunctions.dsirLogWeights(docs.repartition(7), "doc_id",
        "text", col("tgt"), numBuckets = d, seed = "dsir")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(re == expected)
  }
}
