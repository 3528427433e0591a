package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
      k: Int, planes: Int = 12): DataFrame = {
    val q = broadcast(
      queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
        .withColumn("sig", rhpSignature(col("qv"), planes)))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
      .withColumn("sig", rhpSignature(col("cv"), planes))
    val scored = c.join(q, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus into
    * cells; a query scans only its `nprobe` nearest cells. The classic
    * trade: recall grows with nprobe, cost with cells scanned. Centroids
    * are trained once (seeded KMeans on a sample) and reused — at 100 TB
    * the assignment pass is one scan and queries touch nprobe/nlist of the
    * corpus. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      maxIter: Int = 10, fitSampleRows: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val corpusVec = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
      .withColumn("features", array_to_vector(col("cv").cast("array<double>")))
    // Random init: k-means|| costs several extra passes and adds nothing
    // for IVF cell quality at these k values.
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    // Train on a capped deterministic sample: centroid quality needs a few
    // thousand vectors per cell, not the corpus — a full-corpus fit is
    // maxIter complete passes before the first query, which is the one
    // cost here that would grow with data volume. The seeded hash-mod
    // filter is stable across runs (no RNG state, unlike df.sample).
    val fitSet = {
      // The sampling rate comes from the UN-projected corpus: count(*)
      // over the raw scan column-prunes to metadata weight, instead of
      // paying a full vector-decode pass just to pick the rate. The filter
      // sits below the array_to_vector projection, so the fit path decodes
      // vectors only for sampled rows.
      val n = corpus.count()
      if (n <= fitSampleRows) corpusVec
      else {
        // Ceil division lands the filter alone at/under the cap in
        // expectation; the ordered limit is a deterministic guard over the
        // (sample-sized) hash-variance overshoot, not an arbitrary
        // scan-order pick.
        val keepOneIn = (n + fitSampleRows - 1) / fitSampleRows
        val h = xxhash64(col("neighbor_id"), lit(seed))
        corpusVec
          .filter(pmod(h, lit(keepOneIn)) === 0)
          .orderBy(h.asc, col("neighbor_id").asc)
          .limit(fitSampleRows)
      }
    }
    val model = km.fit(fitSet)
    val assigned = model.transform(corpusVec).select("neighbor_id", "cv", "cell")

    // Broadcast centroids as array<array<float>> and rank cells per query
    // with the same cosine kernel; explode the top-nprobe cells.
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    val centroidDf = broadcast(
      corpus.sparkSession.createDataFrame(centroids).toDF("cell", "centroid"))
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
    val qCells = q.crossJoin(centroidDf)
      .withColumn("cell_sim", cosine(col("qv"), col("centroid")))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_sim").desc, col("cell").asc)
    val probed = qCells.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select("query_id", "qv", "cell")

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, restricted to
    * an equi-bucket (e.g. a label or LSH signature) to avoid O(n²). */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"), col(bucketCol).as("bk"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col(bucketCol).as("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
