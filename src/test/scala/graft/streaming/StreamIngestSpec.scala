package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.{Fixtures, SilverStore}

/** Structured-Streaming ingest: drain with AvailableNow, then restart from
  * checkpoint with new files — only new blocks processed, merge stays
  * idempotent (S1/S2, SURVEY §2.9). */
@org.scalatest.tags.Slow
class StreamIngestSpec extends SparkSpec {
  import Fixtures._

  test("stream drains, checkpoints, and resumes on new data") {
    val in = tmpDir("stream-in")
    val silverDir = tmpDir("stream-silver")
    val ckpt = tmpDir("stream-ckpt")
    val silver = new SilverStore(spark, silverDir)

    def donationBlock(height: Long, id: Long, donor: String): String =
      block(height, height * 1000000000L, Seq(
        receipt("donate.potlock.near", "donate", "{}",
          resultJson = Some(directDonationResult(id, donor,
            "1000000000000000000000000", "0", "proj.near", height)),
          receiptId = s"r$height")))

    Files.write(Paths.get(in, "b1.json"), donationBlock(201, 1, "a.near").getBytes)
    val q1 = StreamIngest.start(spark, in, silverDir, ckpt, availableNow = true)
    // awaitTermination returns false on timeout — a loaded machine must
    // fail the wait loudly, not let the asserts read a half-written dir.
    assert(q1.awaitTermination(300000), "stream 1 did not drain in time")
    assert(silver.table("donations").count() == 1)
    assert(silver.table("block_height").head().getAs[Long]("block_height") == 201)

    // New file + an overlapping replay of block 201 (at-least-once case).
    Files.write(Paths.get(in, "b2.json"),
      (donationBlock(201, 1, "a.near") + "\n" +
        donationBlock(202, 2, "b.near")).getBytes)
    val q2 = StreamIngest.start(spark, in, silverDir, ckpt, availableNow = true)
    assert(q2.awaitTermination(300000), "stream 2 did not drain in time")

    val dons = silver.table("donations")
    assert(dons.count() == 2) // replayed donation merged, not duplicated
    assert(silver.table("block_height").head().getAs[Long]("block_height") == 202)
    assert(silver.table("accounts").filter(col("id") === "b.near").count() == 1)
  }
}
