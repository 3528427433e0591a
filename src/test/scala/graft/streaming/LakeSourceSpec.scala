package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.ingest.{Fixtures, SilverStore}

/** Test fetcher: delegates to [[DirBlockFetcher]] but throws on the
  * first `flaky.failures` attempts of every HEIGHT (per-height counters,
  * so the behavior is deterministic under parallel partition readers) —
  * the transient-outage case the reader's retry loop must absorb. */
class FlakyDirFetcher(options: java.util.Map[String, String])
    extends BlockFetcher {
  private val inner = new DirBlockFetcher(options)
  private val failures = options.get("flaky.failures").toInt
  override def latestHeight(): Option[Long] = inner.latestHeight()
  override def fetch(height: Long): Option[String] = {
    val n = FlakyDirFetcher.attempts
      .computeIfAbsent(height, _ => new AtomicInteger(0)).getAndIncrement()
    if (n < failures) throw new RuntimeException("transient lake outage")
    inner.fetch(height)
  }
}
object FlakyDirFetcher {
  val attempts = new java.util.concurrent.ConcurrentHashMap[Long, AtomicInteger]()
}

/** DataSource V2 lake source: height offsets, gap tolerance, checkpoint
  * resume, admission control, retry-on-transient-failure. */
@org.scalatest.tags.Slow
class LakeSourceSpec extends SparkSpec {
  import Fixtures._

  private def donationBlock(height: Long, id: Long, donor: String): String =
    block(height, height * 1000000000L, Seq(
      receipt("donate.potlock.near", "donate", "{}",
        resultJson = Some(directDonationResult(id, donor,
          "1000000000000000000000000", "0", "proj.near", height)),
        receiptId = s"r$height")))

  private def writeBlock(dir: String, height: Long, json: String): Unit =
    Files.write(Paths.get(dir, f"$height%012d.json"), json.getBytes("UTF-8"))

  test("lake stream: height offsets, chain gaps skipped, checkpoint resume") {
    val lake = tmpDir("lake-in")
    val silverDir = tmpDir("lake-silver")
    val ckpt = tmpDir("lake-ckpt")
    val silver = new SilverStore(spark, silverDir)

    writeBlock(lake, 300L, donationBlock(300, 1, "a.near"))
    writeBlock(lake, 301L, donationBlock(301, 2, "b.near"))
    // height 302 skipped — a normal chain gap
    writeBlock(lake, 303L, donationBlock(303, 3, "c.near"))
    val opts = Map("fetcher.dir" -> lake, "startHeight" -> "300")

    val q1 = StreamIngest.startFromLake(spark, opts, silverDir, ckpt,
      availableNow = true)
    assert(q1.awaitTermination(300000), "lake stream 1 did not drain")
    assert(silver.table("donations").count() == 3)
    assert(silver.table("block_height").head().getAs[Long]("block_height") == 303)

    // restart: only the new block enters; the stored height offset is
    // the cursor, exactly like the reference's BlockHeight row
    writeBlock(lake, 304L, donationBlock(304, 4, "d.near"))
    val q2 = StreamIngest.startFromLake(spark, opts, silverDir, ckpt,
      availableNow = true)
    assert(q2.awaitTermination(300000), "lake stream 2 did not drain")
    assert(silver.table("donations").count() == 4)
    assert(silver.table("block_height").head().getAs[Long]("block_height") == 304)
  }

  test("admission control: maxBlocksPerTrigger pages the drain, all blocks land") {
    val lake = tmpDir("lake-paged-in")
    val silverDir = tmpDir("lake-paged-silver")
    val ckpt = tmpDir("lake-paged-ckpt")
    (400L to 409L).foreach(h => writeBlock(lake, h, donationBlock(h, h, s"u$h.near")))
    val q = StreamIngest.startFromLake(spark,
      Map("fetcher.dir" -> lake, "startHeight" -> "400",
        "maxBlocksPerTrigger" -> "3", "fetchPartitions" -> "2"),
      silverDir, ckpt, availableNow = true)
    assert(q.awaitTermination(300000), "paged lake stream did not drain")
    val silver = new SilverStore(spark, silverDir)
    assert(silver.table("donations").count() == 10)
    assert(silver.table("block_height").head().getAs[Long]("block_height") == 409)
    // AvailableNow over 10 blocks at 3/trigger must have taken >1 batch
    assert(q.recentProgress.length > 1)
  }

  test("transient fetch failures are retried; exhausted retries propagate") {
    val lake = tmpDir("lake-flaky-in")
    writeBlock(lake, 500L, donationBlock(500, 50, "e.near"))
    val opts = new java.util.HashMap[String, String]()
    opts.put("fetcher.dir", lake)
    opts.put("flaky.failures", "2")
    FlakyDirFetcher.attempts.clear()
    val flaky = new FlakyDirFetcher(opts)
    // two throws absorbed, third attempt lands
    assert(BlockFetcher.fetchWithRetry(flaky, 500L, attempts = 3,
      backoffMs = 1).nonEmpty)
    // retries exhausted → the failure must propagate (block loss is
    // never acceptable; the task retry is)
    FlakyDirFetcher.attempts.clear()
    intercept[RuntimeException] {
      BlockFetcher.fetchWithRetry(flaky, 500L, attempts = 2, backoffMs = 1)
    }
  }

  test("end-to-end through a flaky lake: the stream still lands every block") {
    val lake = tmpDir("lake-flaky2-in")
    val silverDir = tmpDir("lake-flaky2-silver")
    val ckpt = tmpDir("lake-flaky2-ckpt")
    (600L to 602L).foreach(h => writeBlock(lake, h, donationBlock(h, h, s"f$h.near")))
    FlakyDirFetcher.attempts.clear()
    val q = StreamIngest.startFromLake(spark,
      Map("fetcher.dir" -> lake, "startHeight" -> "600",
        "fetcher.class" -> classOf[FlakyDirFetcher].getName,
        "flaky.failures" -> "1", "fetchRetries" -> "3", "fetchBackoffMs" -> "1"),
      silverDir, ckpt, availableNow = true)
    assert(q.awaitTermination(300000), "flaky lake stream did not drain")
    assert(new SilverStore(spark, silverDir).table("donations").count() == 3)
  }

  test("planInputPartitions: contiguous, disjoint, covering ranges") {
    val opts = new java.util.HashMap[String, String]()
    opts.put("fetchPartitions", "4")
    val stream = new LakeMicroBatchStream(opts)
    val parts = stream.planInputPartitions(LakeOffset(9), LakeOffset(20))
      .map(_.asInstanceOf[LakeInputPartition])
    assert(parts.length == 4)
    val heights = parts.flatMap(p => p.lo to p.hi)
    assert(heights.sorted.toSeq == (10L to 20L))
    // empty range plans nothing
    assert(stream.planInputPartitions(LakeOffset(5), LakeOffset(5)).isEmpty)
    // fewer heights than slices → one partition per height
    val tiny = stream.planInputPartitions(LakeOffset(0), LakeOffset(2))
      .map(_.asInstanceOf[LakeInputPartition])
    assert(tiny.flatMap(p => p.lo to p.hi).sorted.toSeq == Seq(1L, 2L))
  }
}
