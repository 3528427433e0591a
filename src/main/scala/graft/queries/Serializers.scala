package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Rewrite a nested embed struct to DRF's rendering rules, preserving
    * field order: every decimal field becomes a two-decimal-place STRING
    * (the API's decimals are all TwoDecimalPlacesField USD values,
    * accounts/serializers.py:67-78, pots/serializers.py:12-13), every
    * timestamp becomes DRF ISO-8601, arrays-of-structs (pot admins) and
    * nested structs (source_metadata) recurse. A null embed stays an
    * explicit null, never a struct of nulls. Known deviation: the
    * `near_social_profile_data` JSON blob is stored and re-emitted as a
    * STRING, where DRF inlines it as an object — the schemaless blob has
    * no Spark type to round-trip through. */
  def drfStruct(c: Column, st: StructType): Column =
    when(c.isNotNull,
      struct(st.fields.toSeq.map(f =>
        drfValue(c.getField(f.name), f.dataType).as(f.name)): _*))
      .otherwise(lit(null).cast(drfType(st)))

  private def drfValue(c: Column, dt: DataType): Column = dt match {
    case _: DecimalType => usdString(c)
    case TimestampType | TimestampNTZType => isoTs(c)
    case st: StructType => drfStruct(c, st)
    case ArrayType(st: StructType, _) =>
      when(c.isNotNull, transform(c, x => drfStruct(x, st)))
    case _ => c
  }

  /** The post-rewrite type (decimals/timestamps → string) so null embeds
    * cast to the SAME struct type as present ones. */
  private def drfType(dt: DataType): DataType = dt match {
    case _: DecimalType | TimestampType | TimestampNTZType => StringType
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = drfType(f.dataType))))
    case ArrayType(e, n) => ArrayType(drfType(e), n)
    case other => other
  }

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
    // STRUCT embeds render through the DRF rewrite (string decimals, ISO
    // timestamps, recursive); flat FK strings pass through unchanged.
    def embed(name: String): Column = df.schema(name).dataType match {
      case st: StructType => drfStruct(col(name), st).as(name)
      case _ => col(name)
    }
    val token =
      if (cols.contains("token")) embed("token") else col("ft").as("token")
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
      embed("donor"),
      token,
      embed("pot"),
      embed("recipient"),
      embed("referrer"),
      embed("chef")),
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
