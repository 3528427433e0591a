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

  /** Donation row → DRF-shaped JSON object string
    * (donations/serializers.py:15-49 field order; nested account objects
    * pre-expanded by QueryService.expandAccount). */
  def donationJson(df: DataFrame): DataFrame =
    df.withColumn("json", to_json(struct(
      col("on_chain_id"),
      col("donor"),
      col("total_amount"),
      usdString(col("total_amount_usd")).as("total_amount_usd"),
      col("net_amount"),
      usdString(col("net_amount_usd")).as("net_amount_usd"),
      col("ft").as("token"),
      col("pot"),
      col("matching_pool"),
      col("message"),
      isoTs(col("donated_at")).as("donated_at"),
      col("recipient"),
      col("protocol_fee"),
      usdString(col("protocol_fee_usd")).as("protocol_fee_usd"),
      col("referrer"),
      col("referrer_fee"),
      usdString(col("referrer_fee_usd")).as("referrer_fee_usd"),
      col("chef"),
      col("chef_fee"),
      usdString(col("chef_fee_usd")).as("chef_fee_usd"),
      col("tx_hash")),
      Map("ignoreNullFields" -> "false")))

  /** Pagination envelope as a single JSON document (README.md:110-119
    * {count, next, previous, results}). */
  def envelopeJson(count: Long, next: Option[String], previous: Option[String],
      resultsJson: Seq[String]): String = {
    def opt(s: Option[String]) = s.map("\"" + _ + "\"").getOrElse("null")
    s"""{"count": $count, "next": ${opt(next)}, "previous": ${opt(previous)}, "results": [${resultsJson.mkString(",")}]}"""
  }
}
