package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ingest.{Fixtures, SilverStore}

/** The in-stream gold beat (StreamIngest goldBeatEveryBlocks — the
  * reference's every-5-minutes crontab beat at block-height cadence):
  * beats fire as the stream crosses cadence boundaries, gold tables
  * exist and advance generations DURING the stream (no external
  * scheduler), and after the cadence-remainder settle the gold plane
  * equals a beat-less stream + full rebuild of the same lake. */
@org.scalatest.tags.Slow
class StreamGoldBeatSpec extends SparkSpec {
  import Fixtures._

  private def writeLakeBlock(dir: String, height: Long,
      receipts: Seq[String]): Unit = {
    val d = Paths.get(dir, f"$height%012d")
    Files.createDirectories(d)
    Files.write(d.resolve("block.json"),
      s"""{"header": {"height": $height, "timestamp": ${height * 1000000000L}}}"""
        .getBytes("UTF-8")): Unit
    Files.write(d.resolve("shard_0.json"),
      s"""{"shard_id": 0, "receipt_execution_outcomes": [${receipts.mkString(",")}]}"""
        .getBytes("UTF-8")): Unit
  }

  private def generationOf(dir: String): Long =
    graft.operators.MergeWriter.io.readString(s"$dir/gold_meta")
      .flatMap(_.split('\n').find(_.startsWith("generation="))
        .map(_.stripPrefix("generation=").toLong)).getOrElse(-1L)

  test("beats fire on cadence boundaries; settled gold equals the beat-less oracle") {
    val lake = tmpDir("beat-lake")
    val live = tmpDir("beat-live")
    val liveCkpt = tmpDir("beat-live-ckpt")
    val oracle = tmpDir("beat-oracle")
    val oracleCkpt = tmpDir("beat-oracle-ckpt")
    def donation(h: Long) =
      receipt("donate.potlock.near", "donate", "{}",
        resultJson = Some(directDonationResult(h, s"donor${h % 3}.near",
          "1000000000000000000000000", "0", s"proj${h % 2}.near",
          1718000000000L + h)),
        receiptId = s"r$h")
    (600L to 611L).foreach(h => writeLakeBlock(lake, h, Seq(donation(h))))

    val opts = Map(
      "fetcher.class" -> classOf[LakeFsBlockFetcher].getName,
      "fetcher.url" -> ("file://" + lake), "startHeight" -> "600",
      "maxBlocksPerTrigger" -> "2")
    val q = StreamIngest.startFromLake(spark, opts, live, liveCkpt,
      availableNow = true, goldBeatEveryBlocks = Some(4L))
    assert(q.awaitTermination(300000), "beat stream did not drain")

    // Beats ran IN-STREAM: gold exists and several generations landed
    // without any external refresh call (trigger 2 over 12 blocks with
    // cadence 4 crosses three boundaries).
    val genAfterStream = generationOf(live)
    assert(genAfterStream >= 3,
      s"expected ≥3 in-stream beats, generation=$genAfterStream")
    assert(graft.operators.MergeWriter.io.exists(s"$live/account_stats"))

    // Settle the cadence remainder (the production beat's next firing),
    // then compare against a beat-less stream + one full rebuild.
    graft.gold.GoldRefresh.refresh(spark, live): Unit
    val oq = StreamIngest.startFromLake(spark, opts, oracle, oracleCkpt,
      availableNow = true)
    assert(oq.awaitTermination(300000), "oracle stream did not drain")
    graft.gold.GoldRefresh.refreshFull(spark, oracle): Unit
    def rows(dir: String, t: String): Seq[String] = {
      val df0 = spark.read.parquet(s"$dir/$t")
      val df = df0.drop("__gen", "__pdate")
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    for (t <- Seq("donations_enriched", "account_stats", "pot_stats",
        "global_stats"))
      assert(rows(live, t) == rows(oracle, t), s"gold table $t diverged")
  }
}
