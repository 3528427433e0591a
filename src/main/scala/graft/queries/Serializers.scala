package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DRF-serializer-shaped JSON output (S8; SURVEY §7.4-5).
  *
  * The reference's REST responses have a fixed field order and render USD
  * decimals as two-decimal-place STRINGS (`TwoDecimalPlacesField`,
  * pots/serializers.py:12-13) and amounts as their original digit strings.
  * Spark's `to_json` drops null fields by default and doesn't format
  * decimals as strings, so the shim builds the JSON explicitly:
  * `to_json(struct(...))` with pre-formatted string columns and
  * ignoreNullFields=false for parity with DRF's explicit nulls.
  */
object Serializers {

  /** DecimalType column → "1234.56" string with exactly two decimals,
    * null-preserving (DRF TwoDecimalPlacesField). */
  def twoDecimalString(c: Column): Column =
    when(c.isNotNull, format_number(c.cast("decimal(38,2)"), 2))
      // format_number inserts thousands separators; DRF does not.
      .otherwise(lit(null))

  /** Strip grouping commas that format_number adds. */
  private def plain(c: Column): Column = regexp_replace(c, ",", "")

  def usdString(c: Column): Column = plain(twoDecimalString(c))

  /** ISO-8601 with UTC offset, DRF's default datetime rendering. */
  def isoTs(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

  /** Donation row → DRF-shaped JSON object string in DonationSerializer's
    * Meta.fields order (donations/serializers.py:18-49). Nested objects —
    * donor/recipient/referrer/chef account structs, token struct, pot
    * struct — are pre-expanded by QueryService.donationExpanded and pass
    * through; a flat (unexpanded) frame degrades to the raw FK strings
    * (`ft` serialized under the `token` key). The reference's surrogate DB
    * pk (`id`) has no engine equivalent and is omitted — `on_chain_id` is
    * the chain identity. */
  def donationJson(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    val token = if (cols.contains("token")) col("token") else col("ft")
    df.withColumn("json", to_json(struct(
      col("on_chain_id"),
      col("total_amount"),
      usdString(col("total_amount_usd")).as("total_amount_usd"),
      col("net_amount"),
      usdString(col("net_amount_usd")).as("net_amount_usd"),
      col("matching_pool"),
      col("message"),
      isoTs(col("donated_at")).as("donated_at"),
      col("protocol_fee"),
      usdString(col("protocol_fee_usd")).as("protocol_fee_usd"),
      col("referrer_fee"),
      usdString(col("referrer_fee_usd")).as("referrer_fee_usd"),
      col("chef_fee"),
      usdString(col("chef_fee_usd")).as("chef_fee_usd"),
      col("tx_hash"),
      col("donor"),
      token.as("token"),
      col("pot"),
      col("recipient"),
      col("referrer"),
      col("chef")),
      Map("ignoreNullFields" -> "false")))
  }

  /** Pagination envelope as a single JSON document (README.md:110-119
    * {count, next, previous, results}). */
  def envelopeJson(count: Long, next: Option[String], previous: Option[String],
      resultsJson: Seq[String]): String = {
    def opt(s: Option[String]) = s.map("\"" + _ + "\"").getOrElse("null")
    s"""{"count": $count, "next": ${opt(next)}, "previous": ${opt(previous)}, "results": [${resultsJson.mkString(",")}]}"""
  }
}
