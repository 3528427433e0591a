package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ingest.{BlockIngest, Fixtures, SilverStore}

/** [[LakeFsBlockFetcher]] — the Hadoop-FS NEAR-Lake adapter: per-height
  * `block.json` + `shard_*.json` assembly, numeric shard order, chain
  * gaps, flat-layout compatibility, and the full LakeSource stream over
  * a `file://` URI (the same code path an `s3a://` deployment runs). */
@org.scalatest.tags.Slow
class LakeFsBlockFetcherSpec extends SparkSpec {
  import Fixtures._

  /** Write one height in the real lake key layout:
    * `{height:012d}/block.json` + `shard_{id}.json`. */
  private def writeLakeBlock(dir: String, height: Long, tsNs: Long,
      shards: Seq[(Long, Seq[String])]): Unit = {
    val d = Paths.get(dir, f"$height%012d")
    Files.createDirectories(d)
    Files.write(d.resolve("block.json"),
      s"""{"header": {"height": $height, "timestamp": $tsNs}}"""
        .getBytes("UTF-8"))
    shards.foreach { case (id, receipts) =>
      Files.write(d.resolve(s"shard_$id.json"),
        s"""{"shard_id": $id, "receipt_execution_outcomes": [${receipts.mkString(",")}]}"""
          .getBytes("UTF-8"))
    }
  }

  private def fetcher(url: String,
      extra: (String, String)*): LakeFsBlockFetcher = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("fetcher.url", url)
    extra.foreach { case (k, v) => opts.put(k, v) }
    new LakeFsBlockFetcher(opts)
  }

  test("lake layout assembles {block, shards}; parse-parity with the flat message") {
    val dir = tmpDir("lakefs-parity")
    val r = receipt("donate.potlock.near", "donate", "{}",
      resultJson = Some(directDonationResult(7, "a.near",
        "1000000000000000000000000", "0", "proj.near", 100)),
      receiptId = "r100")
    writeLakeBlock(dir, 100L, 100000000000L, Seq(0L -> Seq(r)))

    val f = fetcher("file://" + dir)
    val assembled = f.fetch(100L).get
    val flat = block(100L, 100000000000L, Seq(r))

    import spark.implicits._
    val fromLake = BlockIngest.receipts(
      spark.read.schema(graft.ingest.Schemas.blockMessage)
        .json(Seq(assembled).toDS()))
    val fromFlat = BlockIngest.receipts(
      spark.read.schema(graft.ingest.Schemas.blockMessage)
        .json(Seq(flat).toDS()))
    assert(fromLake.schema == fromFlat.schema)
    assert(fromLake.collect().toSeq == fromFlat.collect().toSeq)
  }

  test("shards order numerically: shard_10 follows shard_2") {
    val dir = tmpDir("lakefs-order")
    def r(i: Long) = receipt("donate.potlock.near", "donate", "{}",
      resultJson = Some(directDonationResult(i, s"u$i.near",
        "1000000000000000000000000", "0", "proj.near", 200)),
      receiptId = s"shard$i")
    // written out of order; ids 0,2,10 exercise the lexicographic trap
    writeLakeBlock(dir, 200L, 200000000000L,
      Seq(10L -> Seq(r(10)), 0L -> Seq(r(0)), 2L -> Seq(r(2))))

    import spark.implicits._
    val msg = fetcher("file://" + dir).fetch(200L).get
    val rows = BlockIngest.receipts(
      spark.read.schema(graft.ingest.Schemas.blockMessage)
        .json(Seq(msg).toDS()))
      .select("shard_index", "receipt_id").collect()
      .map(x => (x.getLong(0), x.getString(1))).sortBy(_._1)
    // positions 0,1,2 must hold shard ids 0,2,10 in that order
    assert(rows.toSeq == Seq((0L, "shard0"), (1L, "shard2"), (2L, "shard10")))
  }

  test("chain gap → None; shard-less height → empty shards; latestHeight ignores junk") {
    val dir = tmpDir("lakefs-gaps")
    writeLakeBlock(dir, 300L, 1L, Seq(0L -> Nil))
    // height 301 absent (gap); 302 has a block but no shard objects
    val d302 = Paths.get(dir, f"${302L}%012d")
    Files.createDirectories(d302)
    Files.write(d302.resolve("block.json"),
      """{"header": {"height": 302, "timestamp": 2}}""".getBytes("UTF-8"))
    // junk entries the lister must skip
    Files.createDirectories(Paths.get(dir, "not-a-height"))
    Files.write(Paths.get(dir, "stray.txt"), "x".getBytes("UTF-8"))

    val f = fetcher("file://" + dir)
    assert(f.latestHeight().contains(302L))
    assert(f.fetch(301L).isEmpty)
    assert(f.fetch(302L).get.endsWith("\"shards\": []}"))
    assert(f.fetch(300L).nonEmpty)
  }

  test("flat layout matches DirBlockFetcher byte-for-byte") {
    val dir = tmpDir("lakefs-flat")
    val msg = block(400L, 4L, Nil)
    Files.write(Paths.get(dir, f"${400L}%012d.json"), msg.getBytes("UTF-8"))
    val hadoop = fetcher("file://" + dir, "fetcher.layout" -> "flat")
    val dOpts = new java.util.HashMap[String, String]()
    dOpts.put("fetcher.dir", dir)
    val local = new DirBlockFetcher(dOpts)
    assert(hadoop.fetch(400L) == local.fetch(400L))
    assert(hadoop.latestHeight() == local.latestHeight())
    assert(hadoop.fetch(401L).isEmpty)
  }

  // ------------------------- S3-semantics fault injection -------------------------
  // Real egress is sandbox-blocked; these simulate the object-store
  // failure modes over the same FS seam the s3a:// deployment runs:
  // throttling storms, listing a height whose objects are still
  // uploading, and partial multi-shard visibility.

  test("throttling storm within the retry budget is absorbed; past it the batch FAILS, never skips") {
    val lake = tmpDir("lakefs-flaky")
    val r = receipt("donate.potlock.near", "donate", "{}",
      resultJson = Some(directDonationResult(41, "a.near",
        "1000000000000000000000000", "0", "proj.near", 700)),
      receiptId = "r700")
    writeLakeBlock(lake, 700L, 700000000000L, Seq(0L -> Seq(r)))
    writeLakeBlock(lake, 701L, 701000000000L, Seq(0L -> Nil))

    def opts(failures: Int, retries: Int) = Map(
      "fetcher.class" -> classOf[FlakyBlockFetcher].getName,
      "flaky.delegate" -> classOf[LakeFsBlockFetcher].getName,
      "flaky.failures" -> failures.toString,
      "fetcher.url" -> ("file://" + lake), "startHeight" -> "700",
      "fetchRetries" -> retries.toString, "fetchBackoffMs" -> "10")

    // 2 failures per height, 4 attempts: the storm is absorbed.
    FlakyBlockFetcher.reset()
    val silverOk = tmpDir("lakefs-flaky-silver")
    val q1 = StreamIngest.startFromLake(spark, opts(failures = 2, retries = 4),
      silverOk, tmpDir("lakefs-flaky-ckpt"), availableNow = true)
    assert(q1.awaitTermination(300000), "flaky stream did not drain")
    val silver = new SilverStore(spark, silverOk)
    assert(silver.table("donations").count() == 1)
    assert(silver.table("block_height").head()
      .getAs[Long]("block_height") == 701)

    // 10 failures per height, 3 attempts (and Spark task retries are 1
    // in local mode): the batch must FAIL LOUDLY — a skipped block would
    // be silent data loss, which is the one unacceptable outcome.
    FlakyBlockFetcher.reset()
    val silverBad = tmpDir("lakefs-flaky2-silver")
    val q2 = StreamIngest.startFromLake(spark, opts(failures = 10, retries = 3),
      silverBad, tmpDir("lakefs-flaky2-ckpt"), availableNow = true)
    val failed =
      try { q2.awaitTermination(300000); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    assert(failed, "storm past the retry budget must fail the query")
    // Nothing was silently committed as complete.
    assert(!new SilverStore(spark, silverBad).exists("block_height") ||
      new SilverStore(spark, silverBad).table("donations").count() == 0)
    FlakyBlockFetcher.reset()
  }

  test("an in-flight head height (no block.json yet) is not admitted by latestHeight") {
    val dir = tmpDir("lakefs-inflight")
    writeLakeBlock(dir, 800L, 1L, Seq(0L -> Nil))
    // heights 801..803 appear in the listing but their block.json has
    // not landed (multi-object upload in flight) — admitting any of them
    // would let the reader mark an in-flight block as a chain gap and
    // skip it forever.
    Seq(801L, 802L, 803L).foreach { h =>
      Files.createDirectories(Paths.get(dir, f"$h%012d"))
    }
    val f = fetcher("file://" + dir)
    assert(f.latestHeight().contains(800L))
    // the upload completes → the head advances
    Files.write(Paths.get(dir, f"${803L}%012d").resolve("block.json"),
      """{"header": {"height": 803, "timestamp": 3}}""".getBytes("UTF-8"))
    assert(f.latestHeight().contains(803L))
  }

  test("partial multi-shard block: expectShards makes fetch throw retryably until the upload completes") {
    val dir = tmpDir("lakefs-partial")
    val d = Paths.get(dir, f"${900L}%012d")
    Files.createDirectories(d)
    Files.write(d.resolve("block.json"),
      """{"header": {"height": 900, "timestamp": 9}}""".getBytes("UTF-8"))
    Files.write(d.resolve("shard_0.json"),
      """{"shard_id": 0, "receipt_execution_outcomes": []}""".getBytes("UTF-8"))

    val strict = fetcher("file://" + dir, "fetcher.expectShards" -> "2")
    intercept[java.io.IOException] { strict.fetch(900L) }
    // retry wrapper: still throws after the budget (the LAST failure
    // propagates — a failed batch is a retry, a skipped shard is loss)
    intercept[java.io.IOException] {
      BlockFetcher.fetchWithRetry(strict, 900L, attempts = 2, backoffMs = 1)
    }
    // the second shard lands → the same fetcher serves the full block
    Files.write(d.resolve("shard_1.json"),
      """{"shard_id": 1, "receipt_execution_outcomes": []}""".getBytes("UTF-8"))
    val msg = BlockFetcher.fetchWithRetry(strict, 900L, attempts = 2,
      backoffMs = 1).get
    assert(msg.contains("\"shard_id\": 0") && msg.contains("\"shard_id\": 1"))
    // permissive default (fixtures/backfills): partial assembly allowed
    val lax = fetcher("file://" + dir)
    assert(lax.fetch(900L).nonEmpty)
  }

  test("end-to-end: LakeSource stream over file:// lake layout, gap skipped, cursor lands") {
    val lake = tmpDir("lakefs-stream-in")
    val silverDir = tmpDir("lakefs-stream-silver")
    val ckpt = tmpDir("lakefs-stream-ckpt")
    def donation(h: Long, id: Long, donor: String) =
      receipt("donate.potlock.near", "donate", "{}",
        resultJson = Some(directDonationResult(id, donor,
          "1000000000000000000000000", "0", "proj.near", h)),
        receiptId = s"r$h")
    writeLakeBlock(lake, 500L, 500000000000L, Seq(0L -> Seq(donation(500, 1, "a.near"))))
    writeLakeBlock(lake, 501L, 501000000000L, Seq(0L -> Seq(donation(501, 2, "b.near"))))
    // 502 skipped — chain gap
    writeLakeBlock(lake, 503L, 503000000000L,
      Seq(0L -> Seq(donation(503, 3, "c.near")),
          1L -> Seq(donation(503, 4, "d.near"))))

    val q = StreamIngest.startFromLake(spark,
      Map("fetcher.class" -> classOf[LakeFsBlockFetcher].getName,
        "fetcher.url" -> ("file://" + lake), "startHeight" -> "500"),
      silverDir, ckpt, availableNow = true)
    assert(q.awaitTermination(300000), "lake-fs stream did not drain")
    val silver = new SilverStore(spark, silverDir)
    assert(silver.table("donations").count() == 4)
    assert(silver.table("block_height").head()
      .getAs[Long]("block_height") == 503)
  }
}
