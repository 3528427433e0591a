package graft.gold

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Fixtures
import graft.streaming.StreamIngest

/** Gold refresh end-to-end: ingest a donation, provide a price row within
  * the ±24h window, refresh, and check the USD-enriched values flow into
  * the stats tables (the reference's fetch_usd_prices +
  * update_account_statistics beat jobs, tasks.py:153-327). */
class GoldSpec extends SparkSpec {
  import Fixtures._
  import spark.implicits._

  test("usd enrichment + stats refresh from silver") {
    val in = tmpDir("gold-bronze")
    val silverDir = tmpDir("gold-silver")
    // 100 NEAR donation (1e26 yocto), no fees, at t=1718000000001 ms.
    val blocks = Seq(block(500, 1718000000000000000L, Seq(
      receipt("donate.potlock.near", "donate", "{}",
        resultJson = Some(directDonationResult(
          9, "whale.near", "100000000000000000000000000", "0",
          "sea.near", 1718000000001L)),
        receiptId = "rg"),
      // A donation in a token with NO price row: must survive enrichment
      // with null USD, not vanish (left as-of join).
      receipt("donate.potlock.near", "donate", "{}",
        resultJson = Some(directDonationResult(
          10, "minnow.near", "1000000", "0",
          "sea.near", 1718000000002L, ft = "odd.token.near")),
        receiptId = "rh"))))
    Files.write(Paths.get(in, "b.json"), blocks.mkString("\n").getBytes)
    StreamIngest.backfill(spark, in, silverDir)

    // Price: 5 USD/NEAR one hour after the donation (inside ±24h).
    Seq(("near", new java.sql.Timestamp(1718000000001L + 3600000L),
        new java.math.BigDecimal("5.00")))
      .toDF("token", "timestamp", "price_usd")
      .write.mode("overwrite").parquet(s"$silverDir/token_prices")

    GoldRefresh.refresh(spark, silverDir)

    val enriched = spark.read.parquet(s"$silverDir/donations_enriched")
    assert(enriched.count() == 2) // the priceless donation survived
    val d = enriched.filter(col("on_chain_id") === 9).head()
    assert(d.getAs[java.math.BigDecimal]("total_amount_usd").doubleValue() == 500.0)
    assert(d.getAs[java.math.BigDecimal]("net_amount_usd").doubleValue() == 500.0)
    val priceless = enriched.filter(col("on_chain_id") === 10).head()
    assert(priceless.isNullAt(priceless.fieldIndex("total_amount_usd")))

    val acct = spark.read.parquet(s"$silverDir/account_stats")
    val whale = acct.filter(col("id") === "whale.near").head()
    assert(whale.getAs[java.math.BigDecimal]("total_donations_out_usd").doubleValue() == 500.0)
    val sea = acct.filter(col("id") === "sea.near").head()
    assert(sea.getAs[Long]("donors_count") == 2) // whale + minnow

    val global = spark.read.parquet(s"$silverDir/global_stats").head()
    assert(global.getAs[Long]("total_donations_count") == 2) // incl. priceless
    assert(global.getAs[java.math.BigDecimal]("total_donations_usd").doubleValue() == 500.0)
  }

  test("unknown token decimals null the USD; ft_metadata snapshot enables it") {
    val in = tmpDir("gold-bronze2")
    val silverDir = tmpDir("gold-silver2")
    def usdcBlock(height: Long, id: Long) =
      block(height, height * 10000000000000000L, Seq(
        receipt("donate.potlock.near", "donate", "{}",
          resultJson = Some(directDonationResult(
            id, "u.near", "1000000", "0", "sea.near", 1718000000003L,
            ft = "usdc.near")),
          receiptId = s"ru$height")))
    Files.write(Paths.get(in, "b.json"), usdcBlock(500, 11).getBytes)
    StreamIngest.backfill(spark, in, silverDir)

    // A price row IS present — only the decimals are unknown.
    Seq(("usdc.near", new java.sql.Timestamp(1718000000003L + 3600000L),
        new java.math.BigDecimal("1.00")))
      .toDF("token", "timestamp", "price_usd")
      .write.mode("overwrite").parquet(s"$silverDir/token_prices")

    GoldRefresh.refresh(spark, silverDir)
    val before = spark.read.parquet(s"$silverDir/donations_enriched")
      .filter(col("on_chain_id") === 11).head()
    // 1e6 raw units: assuming 24 decimals would yield 1e-18 USD — silently
    // wrong. Unknown decimals must null-propagate instead.
    assert(before.isNullAt(before.fieldIndex("total_amount_usd")))

    // Load ft_metadata (decimals 6) and re-refresh: 1e6 / 10^6 * 1.00 = 1.
    val meta = tmpDir("gold-meta")
    Files.write(Paths.get(meta, "tokens.json"),
      """{"account": "usdc.near", "name": "USD Coin", "symbol": "USDC", "decimals": 6}"""
        .getBytes)
    graft.ingest.SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "tokens" -> (graft.ingest.SnapshotBackfill.tokenMetadata(
        spark, s"$meta/tokens.json", 600L),
        graft.ingest.SnapshotBackfill.naturalKeys("tokens"))))
    GoldRefresh.refresh(spark, silverDir)
    val after = spark.read.parquet(s"$silverDir/donations_enriched")
      .filter(col("on_chain_id") === 11).head()
    assert(after.getAs[java.math.BigDecimal]("total_amount_usd").doubleValue() == 1.0)

    // A LATER stub (new donation in the same token) must not erase the
    // loaded metadata: LWW winner's nulls backfill from the metadata row.
    val in2 = tmpDir("gold-bronze3")
    Files.write(Paths.get(in2, "b.json"), usdcBlock(700, 12).getBytes)
    StreamIngest.backfill(spark, in2, silverDir)
    val tok = spark.read.parquet(s"$silverDir/tokens")
      .filter(col("account") === "usdc.near").head()
    assert(tok.getAs[Int]("decimals") == 6)
    assert(tok.getAs[String]("symbol") == "USDC")
  }
}
