package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.{DedupFunctions, TextFunctions}
import graft.operators.{LocalTableIO, Relational, TableIO}

/** Streaming corpus curation gate — the continuously-fed form of the
  * batch curation funnel (q_cur1): documents arrive as a stream, each
  * micro-batch is quality-gated, deduplicated within itself, and checked
  * for near-duplicates against everything the corpus has already
  * accepted; survivors are appended to the corpus store together with
  * their MinHash signatures.
  *
  * The per-batch cost is the design point. The standing corpus is
  * consulted ONLY through its signature store — `k` longs per accepted
  * document, ~3 orders of magnitude smaller than the text — so a batch
  * pays: one scan of itself, a band-key equi-join against the stored
  * band keys, and a signature-agreement verify on the candidates.
  * Exact re-submits don't even reach that machinery: an incrementally
  * maintained bloom filter over accepted fingerprints (one small
  * artifact per batch, previous filter ∪ new survivors — never a corpus
  * scan) drops them map-side, with bloom-positives verified on the full
  * fingerprint against the fingerprint store.
  *
  * Near-dup decisions are two-tier: the signature-agreement estimate of
  * Jaccard decides candidates that are CLEARLY above or below the
  * threshold (beyond `verifyMargin`), and only the borderline band —
  * where a k-component estimate has real variance — is re-verified with
  * EXACT Jaccard. Within a batch the texts are already in hand; against
  * the corpus, only the borderline candidates' texts are fetched back
  * from the store via an id semi-join (on a doc_id-bucketed store this
  * prunes to candidate buckets), so the fetch scales with the borderline
  * collision count, never with corpus size.
  *
  * Replay safety: every write lands in `<table>/batch=<id>` (overwritten
  * whole on replay, deterministic content), and a batch reads only store
  * partitions with `batch < id` — a crash between the writes of batch N
  * can leave partial N-output, but the re-run of N never sees it as
  * corpus and overwrites it wholesale. Effective exactly-once on top of
  * foreachBatch's at-least-once, the same contract as the block-ingest
  * merge.
  */
object CorpusGate {

  /** Curation knobs. `threshold` is the Jaccard near-dup threshold;
    * candidates whose signature-agreement ESTIMATE lands within
    * `verifyMargin` of it are re-verified with exact Jaccard (estimates
    * beyond the margin decide directly). `verifyMargin = 0` disables the
    * exact tier (pure-estimate decisions); a margin ≥ max(threshold,
    * 1 - threshold) verifies every candidate.
    *
    * `bloomExpectedItems`/`bloomFpp` size the incrementally-maintained
    * exact-dedup bloom filter (see step 2b). Sizing is FIXED by config so
    * per-batch filters stay merge-compatible; a corpus outgrowing
    * `bloomExpectedItems` only degrades the false-positive rate (more
    * verify-join work), never correctness. */
  final case class Config(
      minTokens: Int = 3,
      maxTokens: Int = 100000,
      shingleN: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      verifyMargin: Double = 0.25,
      bloomExpectedItems: Long = 1L << 20,
      bloomFpp: Double = 0.01) {
    require(k % bands == 0,
      s"k $k must be divisible by bands $bands — a truncated band width " +
        "silently drops signature components from every band key")
    require(minTokens >= 1 && maxTokens >= minTokens,
      s"token band [$minTokens, $maxTokens] is not a valid range")
    require(verifyMargin >= 0.0,
      s"verifyMargin $verifyMargin must be non-negative")
  }

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Fraction of agreeing MinHash components — the standard unbiased
    * estimator of Jaccard similarity between the underlying sets. */
  def sigAgreement(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a).cast("double")

  /** Store partitions strictly BELOW `beforeBatch` — replay isolation.
    * Listing goes through the [[TableIO]] seam (same portability seam as
    * MergeWriter: swap for an HDFS/object-store implementation at
    * cluster scale). */
  private def readStore(spark: SparkSession, dir: String, schema: StructType,
      beforeBatch: Long, io: TableIO = LocalTableIO): DataFrame = {
    // toLongOption: a non-numeric suffix (leftover temp dir, a manual
    // "batch=0.bak" copy) must be skipped, not throw and poison every
    // subsequent micro-batch of the gate.
    val batchDirs = io.listDir(dir).collect {
      case (name, true) if name.startsWith("batch=") &&
        name.stripPrefix("batch=").toLongOption.exists(_ < beforeBatch) =>
        s"$dir/$name"
    }
    if (batchDirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(batchDirs: _*)
  }

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType))))

  private val fpsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fp64", LongType),
    StructField("fp", StringType)))

  private val statsSchema = StructType(Seq(
    StructField("batch_id", LongType), StructField("n_in", LongType),
    StructField("n_quality_dropped", LongType), StructField("n_exact_dup", LongType),
    StructField("n_corpus_exact_dup", LongType),
    StructField("n_batch_near_dup", LongType), StructField("n_corpus_near_dup", LongType),
    StructField("n_survivors", LongType)))

  /** The accepted corpus's exact-dedup bloom filter as of the largest
    * batch BELOW `beforeBatch` — the incremental artifact chain: batch N
    * writes (filter of N−1) ∪ (N's survivors), so reading one small file
    * replaces any corpus-sized scan. Missing chain (first batch, or a
    * replay of batch 0) starts fresh from config sizing. */
  private def readBloom(storeDir: String, beforeBatch: Long, cfg: Config,
      io: TableIO): org.apache.spark.util.sketch.BloomFilter = {
    val prev = io.listDir(s"$storeDir/bloom").collect {
      case (name, false) if name.startsWith("batch=") &&
        name.stripPrefix("batch=").toLongOption.exists(_ < beforeBatch) =>
        name.stripPrefix("batch=").toLong
    }.maxOption
    prev.flatMap(id => io.readBytes(s"$storeDir/bloom/batch=$id"))
      .map(b => org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b)))
      .getOrElse(org.apache.spark.util.sketch.BloomFilter.create(
        cfg.bloomExpectedItems, cfg.bloomFpp))
  }

  /** One micro-batch through the gate. Also the BATCH-mode entry point —
    * a backfill calls this directly with increasing batch ids. */
  def curateBatch(batch: DataFrame, storeDir: String, batchId: Long,
      cfg: Config = Config(), io: TableIO = LocalTableIO): Unit = {
    val spark = batch.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Finish any compaction swap a crash interrupted BEFORE reading the
    // stores (four marker probes — cheap when nothing is pending).
    Seq("corpus", "sigs", "fps", "stats")
      .foreach(sub => healCompaction(s"$storeDir/$sub", io))

    // 1. Quality gates — cheap per-row filters first, so everything
    //    downstream (shingling, signatures, joins) runs on the survivors.
    //    The gate predicate is evaluated ONCE per row; in/out counts for
    //    the stats row fall out of the same scan instead of re-running
    //    the filter per counter.
    val toks = TextFunctions.tokenCount(col("text"))
    // Validity is part of the gate: a crawl feed ALWAYS contains
    // undecodable records (malformed JSON lines surface from a
    // PERMISSIVE source as all-null rows; schema drift surfaces as a
    // null column), and a null doc_id would otherwise ride the whole
    // pipeline into the store where it can never be deduplicated or
    // fetched back by id. Dropped here, counted as quality-dropped —
    // the explicit contract, not an accident of null-predicate
    // semantics.
    val gatePred = col("doc_id").isNotNull && col("text").isNotNull &&
      toks >= cfg.minTokens && toks <= cfg.maxTokens
    val gateCounts = batch.agg(
      count(lit(1)).as("n_in"),
      count(when(gatePred, 1)).as("n_gated")).head()
    val nIn = gateCounts.getLong(0)
    val nGated = gateCounts.getLong(1)
    val gated = batch.filter(gatePred)

    // 2. Exact dedup within the batch (lowest id survives).
    val exact = Relational.latestPerGroup(
        gated.withColumn("__fp", TextFunctions.fingerprint(col("text"))),
        Seq("__fp"), Seq(col("doc_id").asc))
      .withColumn("__fp64", DedupFunctions.fingerprint64(col("text")))
      .persist(lvl)

    // 2b. Exact dedup AGAINST the corpus — the bloom tier. The
    //    incrementally-maintained filter (previous batch's artifact ∪
    //    its survivors, one small file) proves most rows were never
    //    accepted before: bloom-negatives pass map-side with NO join
    //    (no false negatives), and only bloom-positives — true re-submits
    //    plus fpp false positives — verify on the full 128-bit
    //    fingerprint against the fingerprint store. Catching exact
    //    re-submits here keeps them out of shingling, signatures and the
    //    band joins entirely; the near-dup machinery below only ever
    //    works on genuinely new content.
    val bloom = readBloom(storeDir, batchId, cfg, io)
    val mightDup = graft.plans.expressions.bloomMightContain(bloom, col("__fp64"))
    val fpsStore = readStore(spark, s"$storeDir/fps", fpsSchema, batchId, io)
    val freshRows = exact.filter(!mightDup)
    val verifiedRows = exact.filter(mightDup)
      .join(fpsStore.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
    val newContent = freshRows.unionByName(verifiedRows.select(freshRows.columns.toIndexedSeq.map(col): _*))

    // 3. Signatures once per batch — every later step is signature-only.
    //    Documents too short to shingle (fewer than shingleN words —
    //    possible whenever minTokens < shingleN) get NO signature: they
    //    can't be near-dup-checked, they bypass the near-dup stages as
    //    their own survivors, and their degenerate all-MaxValue signature
    //    must never reach the band join where every such doc would
    //    mass-match every other at estimate 1.0.
    val signed = newContent
      .withColumn("sh", DedupFunctions.shingles(col("text"), cfg.shingleN))
      .withColumn("sig",
        when(size(col("sh")) > 0,
          DedupFunctions.minHashSignature(col("sh"), cfg.k)))
      .persist(lvl)
    val bandRows = signed.filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        explode(DedupFunctions.lshBandKeys(col("sig"), cfg.bands, cfg.k / cfg.bands)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
      .persist(lvl)

    // 4. Within-batch near-dup: any document with a SMALLER near-dup in
    //    the same batch is dropped (the aggressive streaming variant —
    //    one anti-join, no connected-components loop per micro-batch;
    //    the batch-mode keep-one-per-cluster decision is dedupCorpus).
    //    Two-tier decision: the estimate decides clear cases; borderline
    //    estimates are re-verified with exact Jaccard over the shingle
    //    sets already in hand (the pair shuffle stays narrow — ids and
    //    one double — and shingles join back only for borderline pairs).
    val batchPairs = bandRows.alias("a")
      .join(bandRows.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        sigAgreement(col("a.sig"), col("b.sig")).as("est"))
    val batchClear = batchPairs
      .filter(col("est") >= cfg.threshold + cfg.verifyMargin)
      .select(col("id_b").as("doc_id"))
    val batchBorder = batchPairs
      .filter(col("est") >= cfg.threshold - cfg.verifyMargin &&
        col("est") < cfg.threshold + cfg.verifyMargin)
      .select("id_a", "id_b").distinct()
    val batchVerified = batchBorder
      .join(signed.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(signed.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .filter(DedupFunctions.jaccardOfSets(col("sh_a"), col("sh_b")) >= cfg.threshold)
      .select(col("id_b").as("doc_id"))
    val batchDupIds = batchClear.union(batchVerified).distinct()

    // 5. Near-dup against the standing corpus via the signature store:
    //    band-key equi-join, then signature agreement on candidates.
    //    Clear estimates decide; borderline candidates fetch ONLY their
    //    matched corpus documents' texts back (an id semi-join — pruned
    //    to candidate buckets on a doc_id-bucketed store) and re-verify
    //    with exact Jaccard. The fetch scales with the borderline
    //    collision count, never with corpus size.
    val storeSigs = readStore(spark, s"$storeDir/sigs", sigSchema, batchId, io)
      .persist(lvl)
    val storeBands = storeSigs.filter(col("sig").isNotNull)
      .select(col("doc_id").as("corpus_id"), col("sig").as("corpus_sig"),
        explode(DedupFunctions.lshBandKeys(col("sig"), cfg.bands, cfg.k / cfg.bands)).as("bk"))
      .select(col("corpus_id"), col("corpus_sig"), col("bk.band"), col("bk.key"))
    val corpusCand = bandRows
      .join(storeBands, Seq("band", "key"))
      .select(col("doc_id"), col("corpus_id"),
        sigAgreement(col("sig"), col("corpus_sig")).as("est"))
    val corpusClear = corpusCand
      .filter(col("est") >= cfg.threshold + cfg.verifyMargin)
      .select("doc_id")
    val corpusBorder = corpusCand
      .filter(col("est") >= cfg.threshold - cfg.verifyMargin &&
        col("est") < cfg.threshold + cfg.verifyMargin)
      .select("doc_id", "corpus_id").distinct()
      .persist(lvl)
    val borderTexts = readStore(spark, s"$storeDir/corpus", docSchema, batchId, io)
      .join(corpusBorder.select(col("corpus_id")).distinct(),
        col("doc_id") === col("corpus_id"), "left_semi")
    val corpusVerified = corpusBorder
      .join(signed.select(col("doc_id"), col("sh")), Seq("doc_id"))
      .join(borderTexts.select(col("doc_id").as("corpus_id"),
          DedupFunctions.shingles(col("text"), cfg.shingleN).as("sh_c")),
        Seq("corpus_id"))
      .filter(DedupFunctions.jaccardOfSets(col("sh"), col("sh_c")) >= cfg.threshold)
      .select("doc_id")
    val corpusDupIds = corpusClear.union(corpusVerified).distinct()

    val survivors = signed
      .join(batchDupIds, Seq("doc_id"), "left_anti")
      .join(corpusDupIds, Seq("doc_id"), "left_anti")
      .persist(lvl)

    // 6. Replay-idempotent writes: whole-partition overwrite per batch id.
    survivors.select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$storeDir/corpus/batch=$batchId")
    // Unsigned (too-short) survivors contribute nothing to future band
    // joins — don't store their null signatures.
    survivors.filter(col("sig").isNotNull).select("doc_id", "sig")
      .write.mode("overwrite").parquet(s"$storeDir/sigs/batch=$batchId")
    // Fingerprints feed the NEXT batches' bloom-positive verify joins.
    survivors.select(col("doc_id"), col("__fp64").as("fp64"), col("__fp").as("fp"))
      .write.mode("overwrite").parquet(s"$storeDir/fps/batch=$batchId")
    // Advance the incremental filter chain: (filter of batch-1) ∪ (this
    // batch's survivors). One distributed pass over the SURVIVORS only —
    // never the corpus — then one small artifact write; sizing is pinned
    // by config so the per-batch partials stay merge-compatible. Replays
    // rebuild the identical artifact from the identical inputs.
    val nSurvivors = survivors.count()
    val merged =
      if (nSurvivors == 0) bloom
      else bloom.mergeInPlace(survivors.stat.bloomFilter(
        col("__fp64"), cfg.bloomExpectedItems, cfg.bloomFpp))
    val bos = new java.io.ByteArrayOutputStream()
    merged.writeTo(bos)
    io.createDirectories(s"$storeDir/bloom")
    io.writeBytesAtomic(s"$storeDir/bloom/batch=$batchId", bos.toByteArray)

    // 7. Funnel accounting — what the batch came in as and where rows
    //    fell out; one tiny row per batch, the operational surface a
    //    pipeline owner actually watches. Counts come from the persisted
    //    frames / the single gate scan above — no stage is re-run for a
    //    counter.
    val nAfterExact = exact.count()
    val nAfterCorpusExact = signed.count()
    val nAfterBatchDedup = nAfterCorpusExact - batchDupIds.count()
    import spark.implicits._
    Seq((batchId, nIn, nIn - nGated, nGated - nAfterExact,
        nAfterExact - nAfterCorpusExact,
        nAfterCorpusExact - nAfterBatchDedup, nAfterBatchDedup - nSurvivors,
        nSurvivors))
      .toDF("batch_id", "n_in", "n_quality_dropped", "n_exact_dup",
        "n_corpus_exact_dup", "n_batch_near_dup", "n_corpus_near_dup",
        "n_survivors")
      .write.mode("overwrite").parquet(s"$storeDir/stats/batch=$batchId")

    exact.unpersist()
    signed.unpersist()
    bandRows.unpersist()
    storeSigs.unpersist()
    corpusBorder.unpersist()
    survivors.unpersist()
  }

  /** Stream JSONL documents from `inDir` through the gate into
    * `storeDir`, checkpointed at `ckptDir`. `maxFilesPerTrigger` caps the
    * files per micro-batch (source-order replay — the stream-vs-batch
    * parity harness uses 1 so the micro-batch boundaries are exactly the
    * input files); None lets the source take everything available. */
  def start(spark: SparkSession, inDir: String, storeDir: String,
      ckptDir: String, cfg: Config = Config(),
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(docSchema)
    val stream = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader).json(inDir)
    val writer = stream.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: DataFrame, id: Long) => curateBatch(b, storeDir, id, cfg) }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  // ------------------------------------------------------------ compaction

  /** Numeric batch ids present under `dir`. */
  private def batchIds(dir: String, io: TableIO): Seq[Long] =
    io.listDir(dir).flatMap { case (name, _) =>
      if (name.startsWith("batch=")) name.stripPrefix("batch=").toLongOption
      else None
    }

  /** Compact every per-batch partition with id ≤ `upToBatch` into ONE
    * partition named `batch=<upToBatch>` — the small-files answer for a
    * long-running gate (thousands of micro-batches = thousands of tiny
    * parquet directories; scan cost and file-listing latency grow with
    * file count, not data size). Batch ids above `upToBatch` are
    * untouched, so the `batch < id` replay contract still holds for
    * every future batch; the bloom chain keeps only its newest artifact
    * ≤ `upToBatch` (which by construction contains all of them).
    *
    * `upToBatch` is CLAMPED strictly below the newest stored batch id:
    * after a crash between the foreachBatch write and the checkpoint
    * commit, Structured Streaming REPLAYS that newest id on restart —
    * the replay overwrites `batch=<id>` (fine: idempotent rewrite of its
    * own partition) and reads the store strictly below `<id>`. Had the
    * consolidated partition been named `batch=<id>`, the replay would
    * overwrite ALL prior history with one batch's survivors and read an
    * empty store, silently re-admitting duplicates. Consolidating only
    * up to `<newest> - 1` makes compaction safe to run at ANY point
    * between batches, including the restart window.
    *
    * Crash safety is the MergeWriter sidecar discipline per sub-store:
    * the consolidated partition is fully written under a non-numeric
    * name (readers SKIP non-numeric suffixes), a `compact.pending`
    * marker commits the intent, and only then are source partitions
    * dropped and the new partition swapped in; [[curateBatch]] heals an
    * interrupted swap before reading anything. MUST run between batches
    * (the gate is a sequential foreachBatch pipeline — there is no
    * concurrent reader to race).
    *
    * `numFiles` sizes the consolidated partition (1 is right locally;
    * at cluster scale pick ≈ consolidated-bytes / 128 MB). */
  def compact(spark: SparkSession, storeDir: String, upToBatch: Long,
      numFiles: Int = 1, io: TableIO = LocalTableIO): Unit = {
    val subs = Seq("corpus" -> docSchema, "sigs" -> sigSchema,
      "fps" -> fpsSchema, "stats" -> statsSchema)
    val newest = subs.map(_._1)
      .flatMap(sub => batchIds(s"$storeDir/$sub", io)) match {
      case Nil => return // empty store: nothing to consolidate
      case ids => ids.max
    }
    val safeUpTo = math.min(upToBatch, newest - 1) // see scaladoc: replay safety
    if (safeUpTo < 0) return
    subs.foreach { case (sub, schema) =>
      compactTable(spark, s"$storeDir/$sub", schema, safeUpTo, numFiles, io)
    }
    // bloom chain: the newest artifact ≤ safeUpTo subsumes the older ones
    val blooms = batchIds(s"$storeDir/bloom", io).filter(_ <= safeUpTo)
    if (blooms.nonEmpty) {
      val keep = blooms.max
      blooms.filter(_ != keep).foreach(id =>
        io.deleteRecursively(s"$storeDir/bloom/batch=$id"))
    }
  }

  private def compactTable(spark: SparkSession, dir: String,
      schema: StructType, upTo: Long, numFiles: Int, io: TableIO): Unit = {
    healCompaction(dir, io)
    val srcs = batchIds(dir, io).filter(_ <= upTo).sorted
    if (srcs.size <= 1) return // nothing to consolidate
    val tmp = s"$dir/batch=$upTo.compacting" // non-numeric suffix: invisible
    io.deleteRecursively(tmp)
    spark.read.schema(schema)
      .parquet(srcs.map(id => s"$dir/batch=$id"): _*)
      .coalesce(math.max(numFiles, 1))
      .write.mode("overwrite").parquet(tmp)
    // Commit point: from here the swap must complete (heal finishes it).
    io.writeStringAtomic(s"$dir/compact.pending", upTo.toString)
    finishCompaction(dir, upTo, io)
  }

  /** The post-commit half of the swap; idempotent, so heal can re-run it
    * from any crash point. */
  private def finishCompaction(dir: String, upTo: Long, io: TableIO): Unit = {
    val tmp = s"$dir/batch=$upTo.compacting"
    if (io.exists(tmp)) {
      batchIds(dir, io).filter(_ <= upTo).foreach(id =>
        io.deleteRecursively(s"$dir/batch=$id"))
      io.atomicMove(tmp, s"$dir/batch=$upTo")
    } else {
      // the move already happened; only stale sources may remain
      batchIds(dir, io).filter(_ < upTo).foreach(id =>
        io.deleteRecursively(s"$dir/batch=$id"))
    }
    io.deleteRecursively(s"$dir/compact.pending")
  }

  /** Complete an interrupted compaction swap (no-op when none pending). */
  private def healCompaction(dir: String, io: TableIO): Unit =
    io.readString(s"$dir/compact.pending").flatMap(_.trim.toLongOption)
      .foreach(upTo => finishCompaction(dir, upTo, io))

  /** The accepted corpus as a DataFrame (all batches). */
  def corpus(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, s"$storeDir/corpus", docSchema, Long.MaxValue)

  def stats(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, s"$storeDir/stats", statsSchema, Long.MaxValue)
}
