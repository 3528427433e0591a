package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (exact baseline)
  * and random-hyperplane LSH bucketing (the scale path).
  *
  * Vectors are `array<float>` columns; all arithmetic is done in double via
  * higher-order functions (`zip_with` + `aggregate`) — native expressions,
  * no UDF, strictly left-to-right accumulation so results are deterministic
  * and engine-portable.
  *
  * Scale notes (100 TB / billions of vectors):
  *  - brute force is a broadcast of the (small) query set against the full
  *    corpus: one scan, no shuffle, per-partition top-k then k-row merge;
  *  - LSH first buckets both sides by signature (a groupBy shuffle), then
  *    only reranks within buckets — the classic IVF/LSH trade of recall for
  *    a ~buckets× cut in compared pairs.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Codegen'd native expression (graft.plans.expressions): bit-identical
    * to the HOF formulation [[cosineHof]], ~10x less per-row overhead. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.expressions.cosineSimilarity(a, b)

  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Rank scored candidates to top-k per query via the bounded
    * [[graft.plans.expressions.TopKByScore]] aggregate. Unlike
    * `row_number over (partition by query_id)` — which shuffles EVERY scored
    * candidate of a query into a single reducer partition (a scale-killer at
    * a 1B-row corpus) — this is map-side-combined: each input partition
    * keeps a k-heap per query, the shuffle carries ≤ k rows per (partition,
    * query), and the final merge folds k-row arrays. Order inside the array
    * (score desc, id asc) matches the window's (desc, asc) tie-break, so
    * results are identical. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.plans.expressions.topKByScore(col("cos_sim"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("col.score").as("cos_sim"))

  /** Exact top-k neighbors for each query vector (brute force baseline).
    * `queries` must be small enough to broadcast: the plan is one corpus
    * scan, no shuffle before the bounded per-partition top-k. */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** Exact maximum-inner-product top-k (MIPS) — the retrieval scoring for
    * un-normalized embeddings (recommendation / learned-retrieval models,
    * where vector magnitude IS part of the score and cosine would be
    * wrong). Same scale shape as [[cosineTopK]]: queries broadcast, one
    * corpus scan, bounded per-partition k-heaps — no shuffle of scored
    * candidates. Output column `dot` is the raw inner product. */
  def mipsTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qv"), col("cv")))
    topKPerQuery(scored, k).withColumnRenamed("cos_sim", "dot")
  }

  /** Norm-augmented MIPS→cosine reduction (the public asymmetric
    * transform: Neyshabur & Srebro 2015): corpus vectors gain the
    * coordinate sqrt(M² − ‖x‖²) (M ≥ every corpus norm), queries gain a
    * literal 0. In the augmented space all corpus vectors have norm M,
    * so cosine ORDER against an augmented query equals inner-product
    * order in the original space — which plugs MIPS into any
    * cosine-based ANN index ([[rhpSignature]] buckets, IVF cells). */
  def mipsAugmentCorpus(vec: Column, maxNorm: Column): Column =
    concat(transform(vec, x => x.cast("float")),
      array(sqrt(greatest(maxNorm * maxNorm - dot(vec, vec), lit(0.0)))
        .cast("float")))

  def mipsAugmentQuery(vec: Column): Column =
    concat(transform(vec, x => x.cast("float")), array(lit(0.0f)))

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a hash-derived value in [-0.5, 0.5). Public random-projection LSH
    * construction with hash-based planes so no RNG state is needed. */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(p, i), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** Random-hyperplane signature: `planes` sign bits packed into a bigint. */
  def rhpSignature(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") * planeComponent(p, i)),
          lit(0.0), (a, v) => a + v)
        acc + when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      })

  /** ANN via LSH bucketing: bucket corpus and queries by signature, rerank
    * within buckets only. Recall < 1; `planes` tunes bucket granularity. */
  def lshAnnTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, planes: Int = 12): DataFrame =
    lshAnnTopKFromSignatures(
      queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
        .withColumn("sig", rhpSignature(col("qv"), planes)),
      corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
        .withColumn("sig", rhpSignature(col("cv"), planes)),
      k)

  /** [[lshAnnTopK]] over pre-signed sides — `q` as (query_id, qv, sig),
    * `c` as (neighbor_id, cv, sig). At scale the corpus side's signatures
    * are computed once and stored; this is everything downstream of them:
    * bucket equi-join, rerank, bounded top-k. */
  def lshAnnTopKFromSignatures(q: DataFrame, c: DataFrame, k: Int): DataFrame = {
    val scored = c.join(broadcast(q), Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** Multi-probe LSH (the public Lv et al. 2007 idea, 1-bit probing):
    * besides its own bucket, each query probes the `planes` neighboring
    * buckets whose signature differs in exactly one hyperplane bit —
    * the buckets a near neighbor most likely fell into when it landed
    * just on the other side of one plane. Recall rises roughly
    * (planes+1)-fold in candidates WITHOUT rebuilding the index or
    * coarsening it for everyone; cost stays bucket-local and the probe
    * set is pure integer signature arithmetic (replayable by any
    * engine). A candidate reachable via several probes is deduplicated
    * before the rerank, so the top-k contract is unchanged. */
  def lshMultiProbeTopKFromSignatures(q: DataFrame, c: DataFrame,
      k: Int, planes: Int): DataFrame = {
    val probes = q.select(col("query_id"), col("qv"),
        explode(concat(array(col("sig")),
          transform(sequence(lit(0), lit(planes - 1)),
            b => col("sig").bitwiseXOR(call_function("shiftleft", lit(1L), b)))))
          .as("sig"))
    val scored = c.join(broadcast(probes), Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus into
    * cells; a query scans only its `nprobe` nearest cells. The classic
    * trade: recall grows with nprobe, cost with cells scanned.
    *
    * The coarse quantizer is trained on a bounded deterministic sample
    * (≤ `fitSampleRows` rows AND ≤ `fitSampleBudgetDoubles` total doubles,
    * so the driver collect stays ~constant-memory as the vector dim grows)
    * ON THE DRIVER — the standard IVF pattern: a
    * quantizer needs a few thousand vectors per cell, never the corpus, so
    * a sample that small is a sequential in-memory Lloyd's loop, not
    * `maxIter` rounds of distributed jobs whose per-round scheduling
    * overhead dwarfs the arithmetic. The DATA passes stay distributed and
    * scale-shaped: one codegen'd argmax scan assigns cells (16·dim flops
    * per row, no shuffle), and queries touch nprobe/nlist of the corpus
    * via a broadcast equi-join on the cell id.
    *
    * Spherical k-means (unit centroids, max-dot assignment), so the
    * quantizer's geometry is the same cosine used for the final ranking.
    * Everything is seeded and sequentially folded — bit-stable across
    * runs, partitionings and retries. */
  /** Train spherical k-means centroids on a bounded deterministic sample
    * collected to the driver — the shared coarse quantizer of [[ivfTopK]]
    * and [[semanticDedup]]. Returns up to `nlist` UNIT centroids; empty
    * for a degenerate corpus (no rows / all-zero vectors). Seeded and
    * sequentially folded — bit-stable across runs, partitionings and
    * retries. */
  /** Deterministic bounded fit sample, collected in id order (the
    * sequential trainer folds must see a fixed operand order — float
    * addition is not associative, and bit-stable centroids are what make
    * the quantizer operators replay-identical). The rate comes from a
    * count(*) over the raw corpus (metadata-weight, column-pruned); the
    * seeded hash-mod filter is stable across runs (no RNG state, unlike
    * df.sample) and prunes below the vector projection, so only sampled
    * rows are decoded and collected. The collect is bounded by rows×dim,
    * not rows alone: the dim is probed with a limit-1 scan and the row
    * cap shrinks to the doubles budget (default 16M ≈ 128 MB raw), so
    * 768-1536-dim embeddings cannot OOM the driver. */
  private def fitSampleVectors(corpus: DataFrame, cId: String, cVec: String,
      minRows: Int, seed: Long, fitSampleRows: Int,
      fitSampleBudgetDoubles: Long): Array[Array[Double]] = {
    val corpusSel = corpus.select(col(cId).as("__id"), col(cVec).as("__v"))
    // ONE aggregation job for (row count, dimension probe) — previously a
    // count() plus a separate head(1) scan (r16, guide §1/§5: every
    // driver action over the corpus is a full job; the fit path runs
    // before EVERY quantizer-backed query). max(size) ignores nulls and
    // is deterministic, unlike the old scan-order head(1); dimensions are
    // uniform per the embedding-table contract, so the probed value is
    // unchanged.
    val probe = corpusSel
      .agg(count(lit(1)).as("n"), max(size(col("__v"))).as("d")).head()
    val n = probe.getLong(0)
    val probedDim = if (probe.isNullAt(1)) 0 else probe.getInt(1)
    val effSampleRows =
      if (probedDim <= 0) fitSampleRows
      else math.max(minRows, math.min(
        fitSampleRows.toLong, fitSampleBudgetDoubles / probedDim).toInt)
    val sampled =
      if (n <= effSampleRows) corpusSel
      else {
        // Ceil division lands the filter alone at/under the cap in
        // expectation; the ordered limit is a deterministic guard over the
        // (sample-sized) hash-variance overshoot, not an arbitrary
        // scan-order pick.
        val keepOneIn = (n + effSampleRows - 1) / effSampleRows
        val h = xxhash64(col("__id"), lit(seed))
        corpusSel.filter(pmod(h, lit(keepOneIn)) === 0)
          .orderBy(h.asc, col("__id").asc)
          .limit(effSampleRows)
      }
    sampled
      .orderBy("__id")
      .select(col("__v").cast("array<double>"))
      .collect()
      .filter(!_.isNullAt(0)) // null vectors can't train (before getSeq!)
      .map(_.getSeq[Double](0).toArray)
  }

  def trainSphericalCentroids(
      corpus: DataFrame, cId: String, cVec: String,
      nlist: Int, seed: Long = 42L, maxIter: Int = 10,
      fitSampleRows: Int = 100000,
      fitSampleBudgetDoubles: Long = 16000000L): Array[Array[Double]] = {
    val sampleVecs: Array[Array[Double]] =
      fitSampleVectors(corpus, cId, cVec, nlist, seed, fitSampleRows,
        fitSampleBudgetDoubles)
      .filter(_.exists(_ != 0.0))
      .map { v =>
        val nrm = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nrm)
      }
      // DEDUP the normalized sample before Lloyd's — the fit-side twin of
      // the operators' exact-duplicate collapse. A duplicate-heavy corpus
      // (millions of identical default/failed-encode vectors) otherwise
      // drags most centroids onto ONE point and funnels every distinct
      // vector into a single residual cell, whose within-cell pair join
      // is then quadratic in the corpus's whole distinct density — the
      // straggler the stress harness measured (42 s max task on the
      // degenerate corpus; balanced cells after this collapse). Cell
      // BALANCE wants centroids spread over distinct directions, not
      // copy mass; downstream semantics are unaffected because centroids
      // are always echoed and cell assignment replays from them.
      .distinctBy(_.toSeq)
    if (sampleVecs.isEmpty) return Array.empty

    // Seeded driver-side spherical Lloyd's: assign by max dot (== cosine,
    // inputs are unit), recenter to the normalized mean, keep the previous
    // centroid for cells that empty out. Ties break to the lowest cell id.
    val kk = math.min(nlist, sampleVecs.length)
    val dim = sampleVecs.head.length
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(sampleVecs.indices.toVector).take(kk)
      .map(sampleVecs(_)).toArray
    var assign = Array.fill(sampleVecs.length)(-1)
    var iter = 0
    var moved = true
    while (moved && iter < maxIter) {
      moved = false
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Int](kk)
      var vi = 0
      while (vi < sampleVecs.length) {
        val v = sampleVecs(vi)
        var best = 0; var bestDot = Double.NegativeInfinity
        var ci = 0
        while (ci < kk) {
          var d = 0.0; var j = 0
          while (j < dim) { d += v(j) * centroids(ci)(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = ci }
          ci += 1
        }
        if (assign(vi) != best) { assign(vi) = best; moved = true }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        cnts(best) += 1
        vi += 1
      }
      centroids = centroids.indices.map { ci =>
        if (cnts(ci) == 0) centroids(ci)
        else {
          val s = sums(ci)
          val nrm = math.sqrt(s.map(x => x * x).sum)
          if (nrm == 0.0) centroids(ci) else s.map(_ / nrm)
        }
      }.toArray
      iter += 1
    }
    centroids
  }

  /** Per-vector similarities to every centroid, as one literal-backed
    * codegen'd map expression (no shuffle, no join). NaN cosines
    * (zero-norm rows) are floored below the cosine range so downstream
    * argmax/sorts stay total and deterministic. */
  private def centroidSims(vec: Column, centroids: Array[Array[Double]]): Column = {
    val centroidArr = array(centroids.toIndexedSeq.map(c => lit(c.map(_.toFloat))): _*)
    transform(centroidArr, ct => nanvl(cosine(vec, ct), lit(-2.0)))
  }

  /** Nearest-centroid cell id (argmax cosine, ties to the lowest cell) —
    * the quantizer's assignment expression: per-row map work, the only
    * full-corpus pass a cell-partitioned operator needs. */
  def assignCell(vec: Column, centroids: Array[Array[Double]]): Column =
    ExprUtils.evalOnce(centroidSims(vec, centroids)) { sims =>
      (array_position(sims, array_max(sims)) - 1).cast("int")
    }

  /** [[assignCell]] plus the winning similarity, as one struct from one
    * sims evaluation — the assignment-QUALITY observation an index
    * maintenance pass aggregates (mean in-cell similarity dropping on a
    * new batch = distribution drift; the quantizer needs a refit). */
  def assignCellWithSim(vec: Column, centroids: Array[Array[Double]]): Column =
    ExprUtils.evalOnce(centroidSims(vec, centroids)) { sims =>
      ExprUtils.evalOnce(array_max(sims)) { best =>
        struct((array_position(sims, best) - 1).cast("int").as("cell"),
          best.as("sim"))
      }
    }

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      maxIter: Int = 10, fitSampleRows: Int = 100000): DataFrame = {
    val centroids = trainSphericalCentroids(corpus, cId, cVec,
      nlist, seed, maxIter, fitSampleRows)
    if (centroids.isEmpty)
      // Degenerate corpus (empty or all-zero vectors): no quantizer can be
      // trained; exact brute force is both correct and the same cost.
      return cosineTopK(queries, corpus, qId, qVec, cId, cVec, k)
    ivfTopKWithCentroids(queries, corpus, qId, qVec, cId, cVec,
      centroids, k, nprobe)
  }

  /** [[ivfTopK]] with an externally-trained quantizer — everything
    * downstream of the centroids: cell assignment, probe selection,
    * in-cell rerank, bounded top-k. `centroids` must be non-empty unit
    * vectors (the [[trainSphericalCentroids]] contract). */
  def ivfTopKWithCentroids(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      centroids: Array[Array[Double]], k: Int, nprobe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfTopKWithCentroids needs a trained quantizer")
    val corpusSel = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
    val kk = centroids.length
    val assigned = corpusSel.withColumn("cell", assignCell(col("cv"), centroids))

    // Query side: rank all kk cells with the same kernel inside one row
    // (sort by (-sim, cell) — desc sim, asc cell tie-break), explode the
    // top-nprobe. No window, no shuffle; queries are small by contract.
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
    val probedCells = ExprUtils.evalOnce(centroidSims(col("qv"), centroids)) { sims =>
      transform(
        slice(array_sort(zip_with(sims, sequence(lit(0), lit(kk - 1)),
          (s, i) => struct((-s).as("ns"), i.as("i")))), 1, math.min(nprobe, kk)),
        x => x.getField("i").cast("int"))
    }
    val probed = q.select(col("query_id"), col("qv"),
      explode(probedCells).as("cell"))

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** Shared core of the embedding near-dup paths: the exact-duplicate
    * collapse plus the rep-level within-bucket cosine pair graph.
    * Returns (reps, mem, repPairs) where reps is one row per distinct
    * (bucket, vector) with its min-id representative and group size, mem
    * maps every id to its representative, and repPairs is the verified
    * rep-level pair set. The collapse key is a 128-bit content
    * fingerprint of the vector (md5 of its canonical JSON — the same
    * md5-as-identity contract as exact text dedup), NOT the raw vector:
    * at 768 float dims the vector is a ~3 KB join key, and hashing and
    * comparing it in the groupBy and membership join would dominate the
    * shuffle. -0.0/0.0 render differently and stay distinct — a missed
    * collapse is only a little extra work, never a wrong pair. */
  private final case class EmbRepGraph(reps: DataFrame, mem: DataFrame,
      repPairs: DataFrame, cached: Seq[DataFrame])

  private def nearDupRepGraph(
      corpus: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      threshold: Double): EmbRepGraph = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // PERSISTED (r16; the minHashRepGraph discipline applied to the
    // embedding twin — VERDICT r15 item 5): un-persisted, `base` was
    // evaluated twice and `reps` up to four times inside one consumption
    // of the derived edge set (mem join, both pair sides, the self-dup
    // filter), re-running the md5(to_json(vector)) collapse-key kernel —
    // the most expensive per-row expression here — 5-6× per query
    // (measured at sf0.1: eight ~32-task corpus-scale stages, 5-35 s of
    // summed executor time each, for q_dd10). Callers release via the
    // returned handle.
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        col(bucketCol).as("bk"))
      .withColumn("vkey", md5(to_json(col("v")).cast("binary")))
      .persist(lvl)
    val reps = base.groupBy(col("bk"), col("vkey"))
      .agg(min(col("id")).as("id"), first(col("v")).as("v"),
        count(lit(1)).as("gsz"))
      .persist(lvl)
    val mem = base.select(col("id"), col("bk"), col("vkey"))
      .join(reps.select(col("bk"), col("vkey"), col("id").as("rid"),
        col("gsz")), Seq("bk", "vkey"))
      .select(col("id"), col("rid"), col("gsz"))
      .persist(lvl)
    val a = reps.select(col("id").as("id_a"), col("v").as("va"), col("bk"))
    val b = reps.select(col("id").as("id_b"), col("v").as("vb"), col("bk"))
    val repPairs = a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
    EmbRepGraph(reps, mem, repPairs, Seq(base, reps, mem))
  }

  /** CONNECTIVITY-sufficient near-dup edge set — what a keep-one consumer
    * (connected components) needs, WITHOUT the member-level expansion
    * whose output is inherently quadratic in duplicate-group size
    * (C(n,2) edges from one n-copy group; the stress harness measured a
    * 40 s CC straggler feeding the expanded graph of a 6,000-copy group
    * into semanticDedup). Edges: the rep-level verified pairs, plus one
    * STAR edge member→representative for every member of (a) any group
    * whose rep appears in a verified pair — in the expanded graph those
    * members reach the partner group through any member pair, so the
    * star preserves exactly the same components — and (b) any
    * multi-member group whose self-cosine passes the threshold (the
    * expanded graph's intra-group clique; one hub edge per member keeps
    * the component identical). Component sets — and therefore
    * min-id cluster ids and keep-one decisions — match
    * [[embeddingNearDupPairs]] + CC exactly, at O(reps² per bucket +
    * members) instead of O(total pair count). */
  private[graft] def nearDupConnectivityEdges(
      corpus: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      threshold: Double): graft.operators.Materialized = {
    val g = nearDupRepGraph(corpus, idCol, vecCol, bucketCol, threshold)
    val pairedReps = g.repPairs.select(col("id_a").as("rid"))
      .unionByName(g.repPairs.select(col("id_b").as("rid")))
    val selfDupReps = g.reps.filter(col("gsz") > 1)
      .filter(cosine(col("v"), col("v")) >= threshold)
      .select(col("id").as("rid"))
    val starReps = pairedReps.unionByName(selfDupReps).distinct()
    val star = g.mem.join(starReps, Seq("rid"))
      .filter(col("id") =!= col("rid"))
      .select(least(col("id"), col("rid")).as("id_a"),
        greatest(col("id"), col("rid")).as("id_b"))
    graft.operators.Materialized(
      g.repPairs.select("id_a", "id_b").unionByName(star), g.cached)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, restricted to
    * an equi-bucket (e.g. a label or LSH signature) to avoid O(n²).
    *
    * Hot-bucket skew guard: identical embeddings (zero vectors, default or
    * failed encodes, exact re-submissions) pile into ONE bucket and would
    * make the self-join quadratic in copy count at corpus scale. Rows with
    * an identical (bucket, vector) are collapsed to one representative
    * (min id) BEFORE the join, and member pairs are expanded back after —
    * semantics-preserving because cosine is a pure function of the two
    * vectors: every expanded pair carries exactly the value the direct
    * join would have computed, and intra-group pairs carry the kernel's
    * own cos(v,v) (computed, not a 1.0 literal — the oracle replays the
    * same IEEE arithmetic and sqrt(x)·sqrt(x) ≠ x in general). The join
    * is thereby bounded by DISTINCT vector density per bucket; output
    * size is the true pair count, inherent to the contract — a keep-one
    * consumer that only needs connectivity should use
    * [[nearDupConnectivityEdges]] instead. */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      threshold: Double): graft.operators.Materialized = {
    val g = nearDupRepGraph(corpus, idCol, vecCol, bucketCol, threshold)
    val cross = g.repPairs
      .join(g.mem.select(col("rid").as("id_a"), col("id").as("ma")), Seq("id_a"))
      .join(g.mem.select(col("rid").as("id_b"), col("id").as("mb")), Seq("id_b"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("cos_sim"))
    val dupReps = g.reps.filter(col("gsz") > 1)
      .withColumn("self_sim", cosine(col("v"), col("v")))
      .filter(col("self_sim") >= threshold)
      .select(col("id").as("rid"), col("self_sim"))
    val dupMembers = g.mem.filter(col("gsz") > 1)
    val intra = dupMembers.alias("x")
      .join(dupMembers.alias("y"),
        col("x.rid") === col("y.rid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.rid").as("rid"))
      .join(dupReps, Seq("rid"))
      .select(col("id_a"), col("id_b"), col("self_sim").as("cos_sim"))
    graft.operators.Materialized(cross.unionByName(intra), g.cached)
  }

  /** SemDeDup-style semantic dedup: quantizer cells bucket the corpus,
    * within-cell cosine pairs above `threshold` form the near-dup graph,
    * connected components pick one surviving representative per semantic
    * cluster (lowest id — deterministic). The published recipe: embedding
    * clustering makes the pairwise step tractable (pairs only form inside
    * a cell, never across the corpus) at the price of missing cross-cell
    * near-dups — the standard recall/cost trade, same as IVF's nprobe.
    * Returns (id, cluster_id, kept) for every corpus row. */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, seed: Long = 42L,
      maxIter: Int = 10, fitSampleRows: Int = 100000): DataFrame = {
    val centroids = trainSphericalCentroids(corpus, idCol, vecCol,
      nlist, seed, maxIter, fitSampleRows)
    semanticDedupWithCentroids(corpus, idCol, vecCol, threshold, centroids)
      .drop("cell")
  }

  /** [[semanticDedup]] with an externally-trained quantizer — everything
    * downstream of the centroids: cell assignment, within-cell near-dup
    * graph, connected components, keep-one decision. Returns
    * (id, cell, cluster_id, kept); empty `centroids` (degenerate corpus)
    * falls back to a single cell. */
  def semanticDedupWithCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, centroids: Array[Array[Double]]): DataFrame = {
    // Persisted: the pair self-join consumes it on both sides, and the
    // argmax assignment kernel must stay the ONE full-corpus pass it is
    // documented to be, not one per join side.
    val withCell = (
      if (centroids.isEmpty)
        // Degenerate corpus: one bucket; the pairwise step is tiny anyway.
        corpus.select(col(idCol), col(vecCol)).withColumn("cell", lit(0))
      else
        corpus.select(col(idCol), col(vecCol))
          .withColumn("cell", assignCell(col(vecCol), centroids))
      ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Connectivity edges, not the all-pairs expansion: CC only needs the
    // same COMPONENTS, and the expanded pair set is quadratic in
    // duplicate-group size (the stress harness measured a 40 s CC
    // straggler from one 6,000-copy group's 18M intra edges). Rep-level
    // pairs + member→rep star edges yield identical components — and
    // identical min-id cluster ids — at O(members) edge volume.
    val pairs = nearDupConnectivityEdges(
      withCell, idCol, vecCol, "cell", threshold)
    // duplicateClusters materializes its edge set eagerly, so pairs is
    // fully consumed when it returns — the rep-graph caches release
    // right after; withCell stays persisted for the final cell
    // projection below and is released after it materializes.
    val cm = DedupFunctions.duplicateClusters(pairs.df, "id_a", "id_b")
    pairs.release()
    // Materialize with lineage intact (persist, not localCheckpoint — an
    // executor loss recomputes instead of failing the job), then release
    // the cell-assignment cache AND the cluster-label cache — the result
    // is already materialized, so neither is needed again.
    val result = withCell.select(col(idCol), col("cell"))
      .join(cm.df, col(idCol) === col("member"), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("kept", col(idCol) === col("cluster_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    withCell.unpersist()
    cm.release()
    result
  }

  /** Per-vector affine int8 quantization — the storage lever for
    * billion-vector stores (4 bytes/dim float → 1 byte/dim + 2 doubles):
    * codes c_i = round((x_i − min)/scale) − 128 packed as tinyint, with
    * scale = (max − min)/255. Dequantization is min + (c+128)·scale.
    * Pure codegen'd array expressions; every arithmetic step is plain
    * IEEE double with an explicit floor(x+0.5) rounding, so any engine
    * reproduces codes AND reconstruction bit-for-bit (the q_sim4 oracle
    * replays it in DuckDB). Constant vectors (scale 0) code to -128 and
    * reconstruct exactly to the constant. */
  def quantizeInt8(vec: Column): Column =
    ExprUtils.evalOnce(vec.cast("array<double>")) { v =>
      ExprUtils.evalOnce(array_min(v)) { mn =>
        ExprUtils.evalOnce((array_max(v) - mn) / lit(255.0)) { sc =>
          struct(
            sc.as("scale"),
            mn.as("zero"),
            transform(v, x =>
              when(sc === 0.0, lit(-128))
                .otherwise(least(floor((x - mn) / sc + 0.5), lit(255.0)) - 128)
                .cast("tinyint")).as("codes"))
        }
      }
    }

  /** Reconstruct an [[quantizeInt8]] struct back to array<double>. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c =>
      q.getField("zero") +
        (c.cast("double") + 128.0) * q.getField("scale"))

  // ------------------------------------------------- product quantization

  /** Squared L2 distance over double arrays, strict left-to-right fold
    * (engine-replayable for the same reason as [[dot]]). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Product-quantization codebooks — the storage lever PAST int8:
    * the vector splits into `m` subspaces and each subvector is replaced
    * by the id of its nearest of `k` per-subspace centroids, so a
    * 64-dim float vector (256 B) becomes m=4 codes (4 B) — 64×. The
    * PQ approximation `||q − decode(codes)||²` equals the classic
    * asymmetric-distance (ADC) sum by construction, so search over codes
    * needs only the codebooks (tiny, broadcast) and the code columns.
    *
    * Training is per-subspace seeded L2 Lloyd's ON THE DRIVER over the
    * same bounded deterministic sample discipline as
    * [[trainSphericalCentroids]] — no distributed fit jobs; the
    * corpus-sized encode pass is one codegen-friendly argmin scan,
    * shuffle-free. Returns m × k' × (dim/m) (k' ≤ k when the sample is
    * small); empty when the corpus has no usable vectors. */
  def trainPqCodebooks(corpus: DataFrame, cId: String, cVec: String,
      m: Int = 4, k: Int = 16, seed: Long = 42L, maxIter: Int = 10,
      fitSampleRows: Int = 100000,
      fitSampleBudgetDoubles: Long = 16000000L): Array[Array[Array[Double]]] = {
    require(m > 0 && k > 0, s"m=$m, k=$k must be positive")
    val sample = fitSampleVectors(corpus, cId, cVec, k, seed, fitSampleRows,
      fitSampleBudgetDoubles)
    if (sample.isEmpty) return Array.empty
    val dim = sample.head.length
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val vecs = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      kMeansL2(vecs, k, seed + s, maxIter)
    }
  }

  /** Seeded driver-side plain-L2 Lloyd's (assignment by min squared
    * distance, ties to the lowest cell; recenter to the mean; empty
    * cells keep their previous centroid). */
  private def kMeansL2(vecs: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    // Seed from DISTINCT vectors: duplicate seeds would tie every
    // assignment to the lower cell, starve the twin forever, and waste a
    // centroid. k' shrinks when the data has fewer distinct points.
    val distinctIdx = vecs.zipWithIndex
      .groupBy(_._1.toSeq).map(_._2.head._2).toVector.sorted
    val kk = math.min(k, distinctIdx.length)
    val dim = vecs.head.length
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(distinctIdx).take(kk)
      .map(vecs(_)).toArray
    var assign = Array.fill(vecs.length)(-1)
    var iter = 0
    var moved = true
    while (moved && iter < maxIter) {
      moved = false
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Int](kk)
      var vi = 0
      while (vi < vecs.length) {
        val v = vecs(vi)
        var best = 0; var bestD = Double.PositiveInfinity
        var ci = 0
        while (ci < kk) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - centroids(ci)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        if (assign(vi) != best) { assign(vi) = best; moved = true }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        cnts(best) += 1
        vi += 1
      }
      centroids = centroids.indices.map { ci =>
        if (cnts(ci) == 0) centroids(ci)
        else sums(ci).map(_ / cnts(ci))
      }.toArray
      iter += 1
    }
    centroids
  }

  /** PQ encode: per subspace, the id of the L2-nearest centroid (ties to
    * the lowest id — `array_position` finds the FIRST minimum). One
    * literal-backed map pass per row, no shuffle, no join. Output
    * array<int> of length m. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty, "empty codebooks")
    val sub = codebooks.head.head.length
    val codes = codebooks.zipWithIndex.map { case (cb, s) =>
      val cbLit = array(cb.toIndexedSeq.map(c => lit(c)): _*)
      ExprUtils.evalOnce(slice(vec.cast("array<double>"), s * sub + 1, sub)) { sv =>
        ExprUtils.evalOnce(transform(cbLit, ct => l2Sq(sv, ct))) { dists =>
          (array_position(dists, array_min(dists)) - 1).cast("int")
        }
      }
    }
    array(codes.toIndexedSeq: _*)
  }

  /** PQ decode: concatenate the coded centroids back into a full vector
    * (the ADC reference point — `l2Sq(query, pqDecode(...))` IS the
    * asymmetric distance). */
  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty, "empty codebooks")
    val parts = codebooks.zipWithIndex.map { case (cb, s) =>
      val cbLit = array(cb.toIndexedSeq.map(c => lit(c)): _*)
      element_at(cbLit, element_at(codes, s + 1) + 1)
    }
    flatten(array(parts.toIndexedSeq: _*))
  }

  /** ANN top-k over PQ codes by asymmetric distance: each (small,
    * broadcast) query scans the coded corpus once — the corpus
    * contributes 4-byte codes, never its float vectors — and ranking
    * folds into the bounded top-k aggregate (k rows of state per query
    * per executor, map-side partials, no window, no sort of raw
    * distances). Ties break to the lower neighbor id. The distance here
    * is literally `l2Sq(q, decode(codes))`; a production kernel
    * precomputes the per-query k×m lookup table and sums table entries —
    * the SAME value by construction, so this formulation is the
    * replayable semantic spec of that kernel. */
  def pqTopK(queries: DataFrame, qId: String, qVec: String,
      codedCorpus: DataFrame, cId: String, codesCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(qVec).cast("array<double>").as("__qv")))
    codedCorpus.select(col(cId).as("__cid"), col(codesCol).as("__codes"))
      .crossJoin(q)
      .withColumn("__dist", l2Sq(col("__qv"), pqDecode(col("__codes"), codebooks)))
      .groupBy("query_id")
      .agg(graft.plans.expressions.topKByScore(-col("__dist"), col("__cid"), k)
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), (-col("col.score")).as("dist"))
  }
}
