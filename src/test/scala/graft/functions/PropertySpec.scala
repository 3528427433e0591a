package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.Relational

/** Randomized properties checked against independent driver-side
  * reference implementations (union-find, sorted quantiles, a literal
  * Scala reimplementation of line-dedup) — the strongest evidence the
  * distributed formulations compute the mathematical object they claim.
  * ScalaCheck generators sampled with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache), so failures reproduce exactly. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---------------------------------------------------------------- CC

  /** Driver-side union-find: component min-id per member. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val members = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    members.map(m => m -> find(m)).toMap
  }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 30)
    m <- Gen.chooseNum(1, 60)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, n.toLong)
      b <- Gen.chooseNum(0L, n.toLong)
    } yield (a, b))
  } yield edges

  test("as-of time-bucketing is purely physical: bucketed == key-only on random data incl. pre-1970 times") {
    // Random (key, time) corpora with hot keys, ties, and NEGATIVE epoch
    // micros (pre-1970): the truncating `div` bucket function still
    // satisfies the probe-coverage theorem (trunc(x/L) is monotone and
    // shifts by exactly 1 per ±L), so the candidate sets — and therefore
    // the rn = 1 winners — must be identical in all four
    // (nearest|before) × (inner|left) combinations.
    val gen = for {
      n <- Gen.chooseNum(30, 120)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 3L) // few keys: dense collisions
        t <- Gen.chooseNum(-5000000000L, 5000000000L) // ±5000 s around epoch
        } yield (k, t))
    } yield rows
    def frame(rows: Seq[(Long, Long)], idOff: Long) =
      rows.zipWithIndex.map { case ((k, t), i) =>
        (idOff + i, k, new java.sql.Timestamp(t / 1000L)) // µs → ms grain
      }.toDF("id", "key", "ts")
    Seq(7L, 23L, 51L).foreach { seed =>
      val l = frame(sample(gen, seed), 0L)
      val r = frame(sample(gen, seed + 1000), 1000000L)
      Seq("inner", "left").foreach { jt =>
        def pick(df: org.apache.spark.sql.DataFrame, d: String) =
          df.select(col("l.id"), col("r.id").as("rid"), col(d))
        val nB = pick(graft.operators.AsOfJoin.nearest(l, r, Seq("key"),
          Seq("key"), "ts", "ts", 600L, "id", "id", jt), "__delta_us")
        val nU = pick(graft.operators.AsOfJoin.nearest(l, r, Seq("key"),
          Seq("key"), "ts", "ts", 600L, "id", "id", jt,
          timeBucketed = false), "__delta_us")
        assert(nB.exceptAll(nU).isEmpty && nU.exceptAll(nB).isEmpty,
          s"nearest/$jt seed=$seed diverged")
        val bB = pick(graft.operators.AsOfJoin.before(l, r, Seq("key"),
          Seq("key"), "ts", "ts", 600L, "id", "id", jt), "__lag_us")
        val bU = pick(graft.operators.AsOfJoin.before(l, r, Seq("key"),
          Seq("key"), "ts", "ts", 600L, "id", "id", jt,
          timeBucketed = false), "__lag_us")
        assert(bB.exceptAll(bU).isEmpty && bU.exceptAll(bB).isEmpty,
          s"before/$jt seed=$seed diverged")
      }
    }
  }

  test("duplicateClusters == union-find on random graphs (both algorithms)", graft.SlowTest) {
    (1L to 5L).foreach { seed =>
      val edges = sample(graphGen, seed)
      val expected = unionFind(edges)
      val pairs = edges.toDF("id_a", "id_b")
      val minLabel = DedupFunctions.duplicateClusters(pairs, "id_a", "id_b")
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = DedupFunctions.duplicateClustersStar(pairs, "id_a", "id_b")
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(minLabel == expected, s"min-label mismatch on graph seed=$seed")
      assert(star == expected, s"star-contraction mismatch on graph seed=$seed")
    }
  }

  // ---------------------------------------------------------------- quantize

  private val vecGen: Gen[Array[Float]] = for {
    d <- Gen.chooseNum(1, 8)
    v <- Gen.listOfN(d, Gen.chooseNum(-1000.0f, 1000.0f))
  } yield v.toArray

  test("int8 quantization: reconstruction error <= scale/2 on random vectors") {
    val vecs = (1L to 20L).map(s => (s, sample(vecGen, s)))
    val out = vecs.toDF("vec_id", "embedding")
      .withColumn("q", Similarity.quantizeInt8(col("embedding")))
      .withColumn("recon", Similarity.dequantizeInt8(col("q")))
      .select(col("vec_id"), col("q.scale"),
        array_max(zip_with(col("recon"), col("embedding").cast("array<double>"),
          (r, x) => abs(r - x))).as("err"))
      .collect()
    out.foreach { r =>
      val (scale, err) = (r.getDouble(1), r.getDouble(2))
      assert(err <= scale * 0.5 + 1e-9,
        s"vec ${r.getLong(0)}: err $err > scale/2 of $scale")
    }
  }

  // ---------------------------------------------------------------- percentiles

  test("discretePercentiles == sorted lower quantile on random data") {
    val dataGen = Gen.listOfN(60, for {
      g <- Gen.oneOf("x", "y", "z")
      v <- Gen.chooseNum(0L, 20L)
    } yield (g, v))
    (1L to 4L).foreach { seed =>
      val rows = sample(dataGen, seed)
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
      val got = Relational.discretePercentiles(rows.toDF("g", "v"), Seq("g"), "v", ps)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        // decimal-exact rank, same convention as the operator
        def ref(p: Double) = sorted(
          (BigDecimal(sorted.size) * BigDecimal.valueOf(p))
            .setScale(0, BigDecimal.RoundingMode.CEILING).toInt - 1)
        assert(got(g) == ((ref(0.25), ref(0.5), ref(0.99))),
          s"group $g seed=$seed: ${got(g)} vs sorted $sorted")
      }
    }
  }

  // ---------------------------------------------------------------- line dedup

  test("dedupLines == literal per-doc filter of over-frequent lines") {
    val docGen = Gen.listOfN(12, for {
      id <- Gen.chooseNum(0L, 11L)
      nLines <- Gen.chooseNum(1, 5)
      lines <- Gen.listOfN(nLines, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    } yield (id, lines.mkString("\n")))
    (1L to 3L).foreach { seed =>
      val docs = sample(docGen, seed).groupBy(_._1).map { case (id, g) => (id, g.head._2) }.toSeq
      val maxDf = 2
      val docFreq = docs.flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val expected = docs.map { case (id, t) =>
        val kept = t.split("\n", -1).filter(l => docFreq(l) <= maxDf)
        id -> ((kept.mkString("\n"), kept.length.toLong,
          (t.split("\n", -1).length - kept.length).toLong))
      }.toMap
      val got = TextFunctions.dedupLines(docs.toDF("doc_id", "text"),
          "doc_id", "text", maxDf)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("winnowingFromHashes == sliding window-min reference on random hash arrays") {
    def winnowRef(hs: Seq[Long], w: Int): Seq[Long] = {
      val nWin = math.max(hs.length - w + 1, 1)
      (0 until nWin).map(j => hs.slice(j, j + w).min).distinct.sorted
    }
    val arrGen = Gen.listOfN(20, for {
      n <- Gen.chooseNum(1, 25) // incl. arrays shorter than the window
      hs <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield hs)
    (1L to 3L).foreach { seed =>
      val arrays = sample(arrGen, seed).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val expected = arrays.map { case (i, h) => i -> winnowRef(h, 4) }.toMap
      val got = arrays.toDF("id", "hs")
        .select(col("id"), TextFunctions.winnowingFromHashes(col("hs"), 4).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("MIPS norm-augmentation: cosine order in augmented space == inner-product order (random vectors)") {
    // The asymmetric-transform identity the ANN scale path rests on:
    // with corpus x -> [x; sqrt(M^2 - |x|^2)] and query q -> [q; 0],
    // cosine(q', x') = (q . x) / (|q| . M) — strictly monotone in q . x,
    // so the neighbor RANKING is identical.
    val vecGen = for {
      d <- Gen.const(6)
      q <- Gen.listOfN(d, Gen.chooseNum(-5.0, 5.0).map(_.toFloat))
      n <- Gen.chooseNum(8, 16)
      xs <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-5.0, 5.0).map(_.toFloat)))
    } yield (q, xs)
    (1L to 3L).foreach { seed =>
      val (qv, xs) = sample(Gen.listOfN(1, vecGen), seed).head
      val corpus = xs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val queries = Seq((1000L, qv.toArray)).toDF("vec_id", "embedding")
      val maxNorm = math.sqrt(xs.map(v => v.map(x => x.toDouble * x).sum).max)
      val byDot = Similarity.mipsTopK(queries, corpus,
          "vec_id", "embedding", "vec_id", "embedding", k = xs.length)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      val aug = corpus.select(col("vec_id"),
        Similarity.mipsAugmentCorpus(col("embedding"), lit(maxNorm)).as("embedding"))
      val qAug = queries.select(col("vec_id"),
        Similarity.mipsAugmentQuery(col("embedding")).as("embedding"))
      val byCos = Similarity.cosineTopK(qAug, aug,
          "vec_id", "embedding", "vec_id", "embedding", k = xs.length)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      assert(byDot == byCos, s"seed=$seed")
    }
  }

  test("winnowingSelectedPositions: values at selected positions == selected fingerprints; leftmost argmin reference") {
    // Two invariants on random hash arrays:
    //  1. equivalence — the hash VALUES at the selected positions are
    //     exactly winnowingFromHashes' selected fingerprint set;
    //  2. reference — positions match a literal leftmost-window-argmin.
    def posRef(hs: Seq[Long], w: Int): Seq[Int] = {
      val nWin = math.max(hs.length - w + 1, 1)
      (0 until nWin).map { j =>
        val win = hs.slice(j, j + w)
        j + win.indexOf(win.min) + 1 // 1-based absolute
      }.distinct.sorted
    }
    val arrGen = Gen.listOfN(20, for {
      n <- Gen.chooseNum(1, 25)
      // narrow hash domain so ties/repeats actually occur
      hs <- Gen.listOfN(n, Gen.chooseNum(0L, 6L))
    } yield hs)
    (1L to 3L).foreach { seed =>
      val arrays = sample(arrGen, seed).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val got = arrays.toDF("id", "hs")
        .select(col("id"),
          TextFunctions.winnowingSelectedPositions(col("hs"), 4).as("ps"),
          TextFunctions.winnowingFromHashes(col("hs"), 4).as("fps"))
        .collect().map(r => r.getLong(0) ->
          ((r.getSeq[Int](1).toSeq, r.getSeq[Long](2).toSeq))).toMap
      arrays.foreach { case (i, hs) =>
        val (ps, fps) = got(i)
        assert(ps.sorted == posRef(hs, 4), s"seed=$seed id=$i positions")
        assert(ps.map(p => hs(p - 1)).distinct.sorted == fps,
          s"seed=$seed id=$i values-at-positions != fingerprints")
      }
    }
  }

  test("header codec: random encoded dimensions round-trip; random bytes fall back") {
    import graft.multimodal.BinaryPipeline.{FakeCodec, HeaderCodec}
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def hex(v: Long, digits: Int): String =
      ("%0" + digits + "x").format(v)
    val pngDims = Gen.listOfN(25, for {
      w <- Gen.chooseNum(1, Int.MaxValue)
      h <- Gen.chooseNum(1, Int.MaxValue)
    } yield (w, h))
    sample(pngDims, 7L).foreach { case (w, h) =>
      val b = hexBytes("89504e470d0a1a0a0000000d49484452" +
        hex(w.toLong, 8) + hex(h.toLong, 8) + "080600000000000000")
      assert(HeaderCodec.decode(b) == ((w, h, 1, "image/png")), s"png $w x $h")
    }
    val jpgDims = Gen.listOfN(25, for {
      w <- Gen.chooseNum(1, 65535)
      h <- Gen.chooseNum(1, 65535)
    } yield (w, h))
    sample(jpgDims, 8L).foreach { case (w, h) =>
      val b = hexBytes("ffd8ffe000104a46494600010100004800480000ffc0001108" +
        hex(h.toLong, 4) + hex(w.toLong, 4) + "03012200021101031101")
      assert(HeaderCodec.decode(b) == ((w, h, 1, "image/jpeg")), s"jpeg $w x $h")
    }
    val junkGen = Gen.listOfN(40, for {
      n <- Gen.chooseNum(0, 64)
      bs <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray)
    sample(junkGen, 9L).foreach { b =>
      val d = HeaderCodec.decode(b)
      // junk must never crash and, unless it happens to be a well-formed
      // header, must equal the deterministic fake
      if (!b.startsWith(Array[Byte](0x89.toByte, 0x50)) &&
        !(b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte))
        assert(d == FakeCodec.decode(b))
    }
  }

  // ------------------------------------------- fixed-point log2 (search)

  test("fixed-point ilog2 tracks log2 within 0.09 bit and is monotone") {
    def ilRef(x: Long): Long = {
      val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
      1024L * m + ((x * 1024L) >> m) - 1024L
    }
    val xs = sample(Gen.listOfN(300, Gen.chooseNum(1L, 1L << 52)), 10L).distinct.sorted
    // Spark column formulation == driver reference, element for element
    val spark = xs.toDF("x").select(
        col("x"),
        (lit(1024L) * (length(bin(col("x"))) - 1).cast("long") +
          call_function("shiftright", col("x") * lit(1024L),
            (length(bin(col("x"))) - 1).cast("int")) - lit(1024L)).as("il"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(spark(x) == ilRef(x), s"column vs reference at $x")
      // linear-interpolation max error 1 − (1 + ln ln 2)/ln 2 ≈ 0.08607,
      // plus up to 1/1024 from the fixed-point grid
      val err = math.abs(ilRef(x) / 1024.0 - math.log(x.toDouble) / math.log(2.0))
      assert(err <= 0.0871, s"approximation error $err at $x")
    }
    // non-decreasing (above m = 10 the 1/1024-bit grid quantizes
    // neighbouring integers onto the same step, so not strictly so)
    xs.zip(xs.tail).foreach { case (a, b) =>
      assert(ilRef(a) <= ilRef(b), s"monotonicity broken at ($a, $b)")
    }
    // exact at powers of two
    (0 to 52).foreach(m => assert(ilRef(1L << m) == 1024L * m))
  }

  // ----------------------------------------------------------- NFC compose

  test("NFC expression == JDK Normalizer on random combining sequences") {
    val marks = Seq('\u0301', '\u0308', '\u0300', '\u0327', '\u030A')
    val gen = Gen.listOfN(200, for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.oneOf("aeiouncs AEOU".toSeq), Gen.oneOf(marks)))
    } yield cs.mkString)
    val xs = sample(gen, 14L)
    val got = xs.toDF("s")
      .select(col("s"), TextFunctions.nfc(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    xs.foreach { s =>
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(s) == want, s"NFC mismatch on ${s.map(_.toInt.toHexString)}")
      // idempotence: normalizing normalized text is the identity
      assert(java.text.Normalizer.normalize(want, java.text.Normalizer.Form.NFC) == want)
    }
  }

  // --------------------------------------------------- bloom (no false neg)

  test("bloom filter never false-negatives inserted keys (random sets)") {
    val keysGen = Gen.listOfN(500, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    (11L to 13L).foreach { seed =>
      val keys = sample(keysGen, seed)
      val bf = org.apache.spark.util.sketch.BloomFilter.create(64, 0.3) // undersized on purpose
      keys.foreach(bf.putLong)
      keys.foreach(k => assert(bf.mightContainLong(k), s"false negative at $k"))
    }
  }
}
