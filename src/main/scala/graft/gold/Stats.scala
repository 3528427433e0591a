package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Schemas
import graft.operators.AsOfJoin

/** Gold-layer derived aggregates — the Spark equivalent of the reference's
  * Celery beat jobs (base/celery.py:27-49; indexer_app/tasks.py:153-327).
  * Where the reference loops accounts/pots in Python issuing per-row SQL
  * (O(N) round trips), each job here is a constant number of shuffles.
  */
object Stats {

  /** `/v1/stats` global aggregate (A1; base/api.py:60-89). One job, two
    * single-row aggregates joined — at any scale this is a full-scan
    * map-side partial aggregation. */
  def globalStats(donations: DataFrame, payouts: DataFrame): DataFrame = {
    val d = donations.agg(
      count(lit(1)).as("total_donations_count"),
      sum(col("total_amount_usd")).as("total_donations_usd"),
      countDistinct(col("donor")).as("total_donors_count"),
      countDistinct(col("recipient")).as("total_recipients_count"))
    val p = payouts.filter(col("paid_at").isNotNull)
      .agg(sum(col("amount_paid_usd")).as("total_payouts_usd"))
    d.crossJoin(p)
  }

  /** Per-account stats (A2; tasks.py:275-327). The reference issues 4
    * aggregate queries per account; here: three group-bys outer-joined
    * into one stats table keyed by account id. */
  def accountStats(accounts: DataFrame, donations: DataFrame, payouts: DataFrame): DataFrame = {
    val received = donations.groupBy(col("recipient").as("id"))
      .agg(
        countDistinct(col("donor")).as("donors_count"),
        sum(col("total_amount_usd")).as("total_donations_in_usd"))
    val sent = donations.groupBy(col("donor").as("id"))
      .agg(sum(col("total_amount_usd")).as("total_donations_out_usd"))
    val matched = donations.filter(col("matching_pool"))
      .groupBy(col("donor").as("id"))
      .agg(sum(col("total_amount_usd")).as("total_matching_pool_allocations_usd"))
    val paid = payouts.filter(col("paid_at").isNotNull)
      .groupBy(col("recipient").as("id"))
      .agg(sum(col("amount_paid_usd")).as("total_payouts_received_usd"))

    accounts.select(col("id"))
      .join(received, Seq("id"), "left")
      .join(sent, Seq("id"), "left")
      .join(matched, Seq("id"), "left")
      .join(paid, Seq("id"), "left")
      .na.fill(0, Seq("donors_count"))
  }

  /** Per-pot stats (A3; tasks.py:188-272): matching-pool vs public split in
    * one grouped conditional aggregation instead of per-pot Python sums. */
  def potStats(donations: DataFrame): DataFrame =
    donations.filter(col("pot").isNotNull)
      .groupBy(col("pot"))
      .agg(
        sum(when(col("matching_pool"), col("total_amount_dec"))).as("total_matching_pool_dec"),
        sum(when(col("matching_pool"), col("total_amount_usd"))).as("total_matching_pool_usd"),
        count(when(col("matching_pool"), 1)).as("matching_pool_donations_count"),
        sum(when(!col("matching_pool"), col("total_amount_dec"))).as("total_public_donations_dec"),
        sum(when(!col("matching_pool"), col("total_amount_usd"))).as("total_public_donations_usd"),
        count(when(!col("matching_pool"), 1)).as("public_donations_count"))

  /** USD enrichment (J6 + F1/F3; tasks.py:155-176,
    * donations/models.py:210-247): as-of join each donation to the nearest
    * token price within ±24 h (we pin "first in window" to "nearest" —
    * SURVEY §7.4-4), then scale u128 by token decimals and multiply.
    * The price table is small → broadcast; the fact side never shuffles. */
  def enrichDonationsUsd(
      donations: DataFrame,
      prices: DataFrame,
      tokens: DataFrame,
      toleranceHours: Int = 24): DataFrame = {
    val withId = donations.withColumn("__did",
      concat_ws("|", col("on_chain_id"), coalesce(col("pot"), lit(""))))
    val joined = AsOfJoin.nearest(
      withId, broadcast(prices),
      Seq("ft"), Seq("token"), "donated_at", "timestamp",
      tolerance = toleranceHours * 3600L,
      leftId = "__did", rightTieBreak = "timestamp",
      joinType = "left") // donations without an in-window price keep null USD

    // Unknown decimals must null the USD out, not assume 24: a 6-decimal
    // USDC-style amount divided by 10^24 is silently wrong by 18 orders of
    // magnitude. Only the native token is pinned to 24 (utils.py:919-921);
    // other tokens get decimals from the ft_metadata snapshot loader
    // (SnapshotBackfill.tokenMetadata) and stay null-USD until loaded.
    val dec = coalesce(col("decimals"), when(col("ft") === "near", lit(24)))
    // Exact decimal path: Amounts.scaleByDecimals keeps the u128 amounts
    // out of double space (a pow(10,d) double route is lossy from 10^23
    // and for any amount above 2^53 yocto).
    def usd(amountDec: org.apache.spark.sql.Column) =
      graft.functions.Amounts
        .toUsd(graft.functions.Amounts.scaleByDecimals(amountDec, dec),
          col("price_usd"))
        .cast(Schemas.Usd)

    joined
      .join(broadcast(tokens.select(col("account").as("ft"), col("decimals"))),
        Seq("ft"), "left")
      .withColumn("total_amount_usd", usd(col("total_amount_dec")))
      .withColumn("net_amount_usd", usd(col("net_amount_dec")))
      .withColumn("protocol_fee_usd", usd(col("protocol_fee_dec")))
      .withColumn("referrer_fee_usd", usd(col("referrer_fee_dec")))
      .withColumn("chef_fee_usd", usd(col("chef_fee_dec")))
      .drop("__did", "__delta_us", "token", "timestamp", "price_usd", "decimals")
  }
}
