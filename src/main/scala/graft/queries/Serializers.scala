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

  /** ISO-8601 with UTC offset, DRF's default datetime rendering.
    * Python's `isoformat()` (DRF DateTimeField) OMITS the fractional
    * part entirely when microseconds are zero — a whole-second timestamp
    * must render "…T00:00:00Z", not "…T00:00:00.000000Z". */
  def isoTs(c: Column): Column =
    when(unix_micros(c) % 1000000L === 0L,
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .otherwise(date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))

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
  /** DonationSerializer's field set in Meta.fields order
    * (donations/serializers.py:18-49) — the keys [[donationJson]] emits,
    * in order. The OpenAPI document's Donation schema is generated from
    * this list, and the server spec's field-level audit closes the loop
    * by asserting a LIVE donation row's JSON keys equal the documented
    * properties — so this val, the builder below and the published
    * schema cannot drift apart silently. */
  val donationFields: Seq[String] = Seq(
    "on_chain_id", "total_amount", "total_amount_usd", "net_amount",
    "net_amount_usd", "matching_pool", "message", "donated_at",
    "protocol_fee", "protocol_fee_usd", "referrer_fee", "referrer_fee_usd",
    "chef_fee", "chef_fee_usd", "tx_hash", "donor", "token", "pot",
    "recipient", "referrer", "chef")

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

  /** One field of a flat entity frame rendered under DRF rules: struct
    * embeds and arrays-of-structs recurse through [[drfStruct]], decimals
    * become two-decimal strings, timestamps become ISO-8601; everything
    * else passes through. */
  private def drfField(df: DataFrame)(name: String): Column =
    df.schema(name).dataType match {
      case st: StructType => drfStruct(col(name), st).as(name)
      case ArrayType(st: StructType, _) =>
        when(col(name).isNotNull, transform(col(name), x => drfStruct(x, st)))
          .as(name)
      case _: DecimalType => usdString(col(name)).as(name)
      case TimestampType | TimestampNTZType => isoTs(col(name)).as(name)
      case _ => col(name)
    }

  /** Entity row → DRF-shaped JSON object string with an explicit field
    * order (a serializer's Meta.fields) — the generic engine behind the
    * per-entity serializers below. Explicit nulls, string decimals, ISO
    * timestamps, recursive embeds. */
  def entityJson(df: DataFrame, fields: Seq[String]): DataFrame =
    df.withColumn("json", to_json(struct(fields.map(drfField(df)): _*),
      Map("ignoreNullFields" -> "false")))

  /** PotSerializer Meta.fields (pots/serializers.py:15-53) minus the DB
    * surrogate `id` the engine never materializes — `account` is the
    * chain identity. DRF renders in declaration order; the hand-written
    * SIMPLE_POT_EXAMPLE reorders the embeds to the tail, but the API's
    * actual responses follow Meta.fields. */
  val potFields: Seq[String] = Seq(
    "account", "pot_factory", "deployer", "deployed_at", "source_metadata",
    "owner", "admins", "chef", "name", "description",
    "max_approved_applicants", "base_currency", "application_start",
    "application_end", "matching_round_start", "matching_round_end",
    "registry_provider", "min_matching_pool_donation_amount",
    "sybil_wrapper_provider", "custom_sybil_checks",
    "custom_min_threshold_score", "referral_fee_matching_pool_basis_points",
    "referral_fee_public_round_basis_points", "chef_fee_basis_points",
    "total_matching_pool", "total_matching_pool_usd",
    "matching_pool_balance", "matching_pool_donations_count",
    "total_public_donations", "total_public_donations_usd",
    "public_donations_count", "cooldown_end", "cooldown_period_ms",
    "all_paid_out", "protocol_config_provider")

  /** Pot row → PotSerializer-shaped JSON (pots/serializers.py:11-58). */
  def potJson(df: DataFrame): DataFrame = entityJson(df, potFields)

  /** ListSerializer Meta.fields (lists/serializers.py:9-33) minus the DB
    * surrogate `id` — List.id is an AutoField that "does not necessarily
    * correspond to on-chain ID" (lists/models.py:16-20); `on_chain_id`
    * is the chain identity, the same deviation as every other entity
    * serializer here. owner embeds as an account object, admins as an
    * account array (lists/serializers.py:26-27). */
  val listFields: Seq[String] = Seq(
    "on_chain_id", "owner", "admins", "name", "description",
    "cover_image_url", "admin_only_registrations",
    "default_registration_status", "created_at", "updated_at")

  /** List row → ListSerializer-shaped JSON. */
  def listJson(df: DataFrame): DataFrame = entityJson(df, listFields)

  /** PotApplicationSerializer Meta.fields (pots/serializers.py:83-99)
    * minus the DB surrogate `id` (applications carry no on-chain id —
    * the chain identity is the (pot, applicant) pair); `pot` embeds the
    * FULL PotSerializer object and `applicant` an account object
    * (pots/serializers.py:97-99). */
  val potApplicationFields: Seq[String] = Seq(
    "pot", "applicant", "message", "status", "submitted_at", "updated_at",
    "tx_hash")

  /** Pot-application row → PotApplicationSerializer-shaped JSON. */
  def potApplicationJson(df: DataFrame): DataFrame =
    entityJson(df, potApplicationFields)

  /** PotFactorySerializer Meta.fields (pots/serializers.py:61-80):
    * owner/protocol_fee_recipient embed as account objects,
    * admins/whitelisted_deployers as account arrays
    * (pots/serializers.py:75-79). No surrogate-id deviation — the
    * factory's pk IS the `account` field. */
  val potFactoryFields: Seq[String] = Seq(
    "account", "owner", "admins", "whitelisted_deployers",
    "source_metadata", "deployed_at", "protocol_fee_basis_points",
    "require_whitelist", "protocol_fee_recipient")

  /** Pot-factory row → PotFactorySerializer-shaped JSON. */
  def potFactoryJson(df: DataFrame): DataFrame =
    entityJson(df, potFactoryFields)

  /** /v1/stats document in the reference's dict-literal field order
    * (base/api.py:81-89). The USD sums coalesce to 0 (the handler's
    * `or 0`). Documented deviation: the reference renders the Decimal
    * sums through rest_framework's JSONEncoder, which float()s them
    * (740.00 → 740.0); the engine keeps them exact decimal(38,2) JSON
    * numbers (740.00) — trailing-zero rendering differs, values do not,
    * and exact beats float drift on 100 TB sums. */
  /** The /v1/stats document's field set (base/api.py:81-89), mirrored by
    * [[statsJson]] and the OpenAPI Stats schema. */
  val statsFields: Seq[String] = Seq(
    "total_donations_usd", "total_payouts_usd", "total_donations_count",
    "total_donors_count", "total_recipients_count")

  def statsJson(df: DataFrame): DataFrame = {
    def usd(n: String): Column =
      coalesce(col(n).cast("decimal(38,2)"), lit(0).cast("decimal(38,2)")).as(n)
    df.withColumn("json", to_json(struct(
      usd("total_donations_usd"),
      usd("total_payouts_usd"),
      col("total_donations_count"),
      col("total_donors_count"),
      col("total_recipients_count")),
      Map("ignoreNullFields" -> "false")))
  }

  /** ListRegistrationSerializer Meta.fields (lists/serializers.py:36-55)
    * with on_chain_id standing in for the DB surrogate `id` (same
    * deviation as donationJson). */
  val listRegistrationFields: Seq[String] = Seq(
    "on_chain_id", "list", "registrant", "registered_by", "status",
    "submitted_at", "updated_at", "registrant_notes", "admin_notes",
    "tx_hash")

  /** List-registration row → ListRegistrationSerializer-shaped JSON; the
    * `list` embed recurses through ListSerializer's shape
    * (lists/serializers.py:9-27). */
  def listRegistrationJson(df: DataFrame): DataFrame =
    entityJson(withAlias(df, "list", "list_id"), listRegistrationFields)

  /** PotPayoutSerializer Meta.fields (pots/serializers.py:100-117) minus
    * the DB surrogate `id`; pot/recipient/token embed as full objects
    * (the serializer declares AccountSerializer for recipient even
    * though the hand-written example shows a bare string). */
  val potPayoutFields: Seq[String] = Seq(
    "pot", "recipient", "amount", "amount_paid_usd", "token", "paid_at",
    "tx_hash")

  /** Payout row → PotPayoutSerializer-shaped JSON. */
  def potPayoutJson(df: DataFrame): DataFrame =
    entityJson(withAlias(df, "token", "ft"), potPayoutFields)

  /** Serializer-field tolerance for the silver column names: routes emit
    * the storage schema (`list_id`, `ft`) where the DRF serializer
    * declares the FK field name (`list`, `token`); an unexpanded flat
    * frame degrades to the raw FK under the serializer's name instead of
    * throwing UNRESOLVED_COLUMN on its own route's output. */
  private def withAlias(df: DataFrame, field: String, alt: String): DataFrame =
    if (!df.columns.contains(field) && df.columns.contains(alt))
      df.withColumn(field, col(alt)) else df

  /** Account row → AccountSerializer-shaped JSON (accounts/
    * serializers.py:55-78): id, the four gold stat fields, then the
    * `near_social_profile_data` blob INLINED AS A RAW OBJECT. DRF
    * renders the stored dict in insertion order with compact
    * separators; the engine stores the chain-provided compact JSON
    * verbatim, so splicing the stored bytes after the typed prefix IS
    * DRF's rendering — this closes the deviation drfStruct documents
    * for the schemaless blob (there a profile inside an embed still
    * renders as a string, because a struct field has to have a type).
    * A null blob renders as explicit `null`.
    *
    * Raw splice is gated on the blob LOOKING like a JSON object/array:
    * the upstream `get_json_object($.…profile)` extraction UNQUOTES a
    * string-scalar profile (`"profile":"hello"` arrives as bare
    * `hello`), and any account can submit one via the social contract —
    * spliced verbatim it would corrupt the whole JSON document. Non-
    * object blobs are re-escaped as JSON strings instead (a deliberate
    * deviation for scalar profiles: safe output over byte parity). */
  /** AccountSerializer's field set (accounts/serializers.py:55-78),
    * mirrored by [[accountJson]]'s spliced document and the OpenAPI
    * Account schema. */
  val accountFields: Seq[String] = Seq(
    "id", "total_donations_in_usd", "total_donations_out_usd",
    "total_matching_pool_allocations_usd", "donors_count",
    "near_social_profile_data")

  def accountJson(df: DataFrame): DataFrame = {
    val prefix = to_json(struct(
      col("id"),
      usdString(col("total_donations_in_usd")).as("total_donations_in_usd"),
      usdString(col("total_donations_out_usd")).as("total_donations_out_usd"),
      usdString(col("total_matching_pool_allocations_usd"))
        .as("total_matching_pool_allocations_usd"),
      col("donors_count")), Map("ignoreNullFields" -> "false"))
    // {"v":X} with Spark's own escaping; substring strips the 5-char
    // `{"v":` prefix and trailing `}`, leaving a valid JSON value —
    // `null` for a null blob, a quoted escaped string otherwise.
    val wrapped = to_json(struct(col("near_social_profile_data").as("v")),
      Map("ignoreNullFields" -> "false"))
    df.withColumn("__prefix", prefix)
      .withColumn("__wrapped", wrapped)
      .withColumn("json", concat(
        expr("substring(__prefix, 1, length(__prefix) - 1)"),
        lit(",\"near_social_profile_data\":"),
        // Splice only VALID JSON: the first-char check alone is
        // bypassable ("{oops" is a string-scalar profile the upstream
        // extraction unquoted); get_json_object("$") is null on
        // malformed input, so invalid blobs take the re-escape branch.
        when(substring(trim(col("near_social_profile_data")), 1, 1)
            .isin("{", "[") &&
            get_json_object(col("near_social_profile_data"), "$").isNotNull,
          col("near_social_profile_data"))
          .otherwise(expr("substring(__wrapped, 6, length(__wrapped) - 6)")),
        lit("}")))
      .drop("__prefix", "__wrapped")
  }

  /** Pagination envelope as a single JSON document (README.md:110-119
    * {count, next, previous, results}). */
  def envelopeJson(count: Long, next: Option[String], previous: Option[String],
      resultsJson: Seq[String]): String = {
    // next/previous echo user-driven request URLs — escape them like
    // errorJson escapes messages, or a quote in a query param corrupts
    // the envelope document.
    def opt(s: Option[String]) = s.map("\"" + escapeJson(_) + "\"").getOrElse("null")
    s"""{"count": $count, "next": ${opt(next)}, "previous": ${opt(previous)}, "results": [${resultsJson.mkString(",")}]}"""
  }

  /** Keyset-continuation envelope (the engine's ?after= extension): same
    * document shape as [[envelopeJson]] but `count` and `previous` are
    * null — a keyset page deliberately never pays the total-count job
    * (that job is what deep offset pagination makes unaffordable at
    * scale) and carries no backward cursor. */
  def keysetEnvelopeJson(next: Option[String],
      resultsJson: Seq[String]): String = {
    def opt(s: Option[String]) = s.map("\"" + escapeJson(_) + "\"").getOrElse("null")
    s"""{"count": null, "next": ${opt(next)}, "previous": null, "results": [${resultsJson.mkString(",")}]}"""
  }

  /** The reference's error body — `Response({"message": ...})` rendered
    * as one JSON document (accounts/api.py:157,267; lists/api.py:95,154;
    * pots/api.py:137). Pairs with [[graft.queries.QueryService.Page]]'s
    * envelope the way DRF pairs its error Responses with paginated ones;
    * the message is escaped so ids containing quotes/control characters
    * cannot break the document. */
  def errorJson(message: String): String =
    s"""{"message": "${escapeJson(message)}"}"""

  /** DRF framework-level error document — {"detail": …}. The reference's
    * HANDLER errors use {"message": …} (errorJson above), but errors DRF
    * itself raises (pagination NotFound: "Invalid page.",
    * rest_framework/pagination.py) render through its exception handler
    * with the `detail` key; byte-parity needs both shapes. */
  def detailJson(message: String): String =
    s"""{"detail": "${escapeJson(message)}"}"""

  private def escapeJson(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < 0x20 => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
