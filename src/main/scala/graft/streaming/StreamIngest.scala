package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{Schemas, SilverStore}

/** Structured-Streaming ingest plane (S1/S2; SURVEY §2.9).
  *
  * The reference runs a strictly sequential asyncio loop over NEAR-Lake S3
  * blocks with a Postgres BlockHeight cursor (indexer_app/tasks.py:28-111).
  * Here: `readStream` over a directory of block-message JSON (the lake
  * landing zone) → `foreachBatch(SilverStore.applyBatch)`.
  *
  *  - Checkpointing: Spark's checkpointLocation replaces the BlockHeight
  *    cursor; a parity `block_height` table row is still maintained by
  *    applyBatch for API compatibility.
  *  - Exactly-once: at-least-once delivery + the idempotent LWW merge on
  *    natural keys = the same effective guarantee as the reference's
  *    update_or_create (re-processing a block is a no-op).
  *  - Ordering: micro-batches may interleave blocks; per-key ordering is
  *    recovered at merge time via the carried ingest-seq, which reproduces
  *    the reference's sequential effects without sacrificing parallelism.
  */
object StreamIngest {

  /** Start the streaming ingest. `Trigger.AvailableNow` drains what's
    * present and stops (the batch-backfill mode, S3); omit for continuous
    * micro-batches. */
  def start(
      spark: SparkSession,
      inputDir: String,
      silverDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val silver = new SilverStore(spark, silverDir)
    val reader = spark.readStream
      .schema(Schemas.blockMessage)
    val stream = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader)
      .json(inputDir)

    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { silver.applyBatch(batch); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One-shot batch backfill over a block-range directory (S3: the
    * reference's spot indexer, tasks.py:114-126). Same transform body as
    * the stream — partition-pruned by the lake's block-height layout. */
  def backfill(spark: SparkSession, inputDir: String, silverDir: String): Map[String, Long] = {
    val blocks = spark.read.schema(Schemas.blockMessage).json(inputDir)
    new SilverStore(spark, silverDir).applyBatch(blocks)
  }

  /** Streaming ingest through [[LakeSource]] — the cursor-true adapter
    * shape: offsets ARE block heights (the reference's Postgres
    * BlockHeight cursor, indexer_app/tasks.py:95-111), block fetch
    * parallelizes across executors behind the [[BlockFetcher]] seam, and
    * the payload is parsed with the same block-message schema as the
    * file path. `fetcherOptions` must carry the fetcher config (e.g.
    * `fetcher.dir`, or `fetcher.class` for an S3 implementation) and may
    * set `startHeight` / `maxBlocksPerTrigger` / `fetchPartitions`. */
  def startFromLake(
      spark: SparkSession,
      fetcherOptions: Map[String, String],
      silverDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      goldBeatEveryBlocks: Option[Long] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, from_json, max, min}
    val silver = new SilverStore(spark, silverDir)
    val stream = spark.readStream
      .format(classOf[LakeSourceProvider].getName)
      .options(fetcherOptions)
      .load()
      .select(from_json(col("value"), Schemas.blockMessage).as("b"))
      .select("b.*")
    // Gold-beat cadence state (driver-side; micro-batches run
    // sequentially per stream). The reference runs its stats job on a
    // crontab (*/5 min, base/celery.py:27-43); a block-HEIGHT cadence is
    // the stream-native equivalent at NEAR's ~1 block/s — deterministic
    // under replay, and resume-safe: the first batch seeds the baseline
    // from its own low end, so a restart never re-beats for already-seen
    // heights.
    var lastBeatBucket = Long.MinValue
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          silver.applyBatch(batch)
          goldBeatEveryBlocks.foreach { every =>
            // The WHOLE cadence leg rides the beat's failure envelope —
            // the height aggregation included: the merge already
            // committed and the stream's cursor must advance, so nothing
            // here (a null height in a malformed block, the refresh
            // itself) may fail the BATCH. Gold goes stale until the next
            // cadence boundary retries — the same failure envelope as
            // the reference's crontab job.
            try {
              val hs = batch.agg(
                min(col("block.header.height")).as("lo"),
                max(col("block.header.height")).as("hi")).head()
              if (!hs.isNullAt(0) && !hs.isNullAt(1)) {
                if (lastBeatBucket == Long.MinValue)
                  lastBeatBucket = (hs.getLong(0) - 1) / every
                val bucket = hs.getLong(1) / every
                if (bucket > lastBeatBucket) {
                  lastBeatBucket = bucket
                  graft.gold.GoldRefresh.refresh(spark, silverDir): Unit
                }
              }
            } catch {
              case scala.util.control.NonFatal(e) =>
                println(s"[stream-ingest] gold beat failed (stale until " +
                  s"next boundary): ${e.getMessage}")
            }
          }
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
