package graft.ingest

import org.apache.spark.sql.types._

/** Explicit schemas for the engine's three layers (SURVEY §1.2-§1.3).
  * Schema style is fixed/declared (the reference uses Django migrations);
  * we never infer schemas in production paths.
  *
  * Type mapping (SURVEY §1.3): u128 amounts → DecimalType(38,0) with the
  * original string kept for byte-identical serialization; USD →
  * DecimalType(20,2); block ns / payload ms → TimestampType (UTC);
  * JSON blobs → StringType parsed on read; M2M sets → array<string>.
  */
object Schemas {

  val U128: DecimalType = DecimalType(38, 0)
  val Usd: DecimalType = DecimalType(20, 2)

  // ------------------------------------------------------------ bronze

  /** NEAR-Lake streamer message (FIXTURES §1.1; reference
    * indexer_app/handler.py:46-98). Raw JSON shape of one block with its
    * shards and receipt execution outcomes. Timestamp is nanoseconds. */
  val blockMessage: StructType = DataType.fromDDL(
    """block STRUCT<header STRUCT<height BIGINT, timestamp BIGINT>>,
      |shards ARRAY<STRUCT<
      |  shard_id BIGINT,
      |  receipt_execution_outcomes ARRAY<STRUCT<
      |    receipt STRUCT<
      |      receipt_id STRING,
      |      receiver_id STRING,
      |      predecessor_id STRING,
      |      receipt STRUCT<`Action` STRUCT<
      |        signer_id STRING,
      |        actions ARRAY<STRUCT<`FunctionCall` STRUCT<
      |          method_name STRING, args STRING>>>>>>,
      |    execution_outcome STRUCT<outcome STRUCT<
      |      status STRUCT<`SuccessValue` STRING, `SuccessReceiptId` STRING,
      |                    `Failure` STRING>,
      |      logs ARRAY<STRING>>>>>>>""".stripMargin)
    .asInstanceOf[StructType]

  // ------------------------------------------------------------ silver

  /** Ingest sequence columns present on every silver row: they define the
    * last-writer-wins order reproducing the reference's strictly
    * sequential block processing (SURVEY §2.9). */
  val ingestSeq: Seq[StructField] = Seq(
    StructField("block_height", LongType),
    StructField("shard_index", LongType),
    StructField("receipt_index", IntegerType),
    StructField("action_index", IntegerType))

  private def withSeq(fields: Seq[StructField]): StructType =
    StructType(fields ++ ingestSeq)

  /** accounts/models.py:12-62. */
  val account: StructType = withSeq(Seq(
    StructField("id", StringType, nullable = false),
    StructField("chain", StringType),
    StructField("near_social_profile_data", StringType), // JSON
    StructField("total_donations_in_usd", Usd),
    StructField("total_donations_out_usd", Usd),
    StructField("total_matching_pool_allocations_usd", Usd),
    StructField("donors_count", IntegerType)))

  /** tokens/models.py:16-54. */
  val token: StructType = withSeq(Seq(
    StructField("account", StringType, nullable = false),
    StructField("name", StringType),
    StructField("symbol", StringType),
    StructField("icon", StringType),
    StructField("decimals", IntegerType),
    StructField("coingecko_id", StringType)))

  /** tokens/models.py:131-152. */
  val tokenHistoricalPrice: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("price_usd", Usd)))

  /** donations/models.py:19-200; upsert key (on_chain_id, pot). */
  val donation: StructType = withSeq(Seq(
    StructField("on_chain_id", LongType, nullable = false),
    StructField("donor", StringType),
    StructField("total_amount", StringType),   // u128 string, verbatim
    StructField("total_amount_dec", U128),
    StructField("total_amount_usd", Usd),
    StructField("net_amount", StringType),
    StructField("net_amount_dec", U128),
    StructField("net_amount_usd", Usd),
    StructField("ft", StringType),             // token account
    StructField("pot", StringType),            // null = direct donation
    StructField("matching_pool", BooleanType),
    StructField("message", StringType),
    StructField("donated_at", TimestampType),
    StructField("recipient", StringType),
    StructField("protocol_fee", StringType),
    StructField("protocol_fee_dec", U128),
    StructField("protocol_fee_usd", Usd),
    StructField("referrer", StringType),
    StructField("referrer_fee", StringType),
    StructField("referrer_fee_dec", U128),
    StructField("referrer_fee_usd", Usd),
    StructField("chef", StringType),
    StructField("chef_fee", StringType),
    StructField("chef_fee_dec", U128),
    StructField("chef_fee_usd", Usd),
    StructField("tx_hash", StringType)))

  /** pots/models.py:108-323 (core columns + Δ-stats). */
  val pot: StructType = withSeq(Seq(
    StructField("account", StringType, nullable = false),
    StructField("pot_factory", StringType),
    StructField("deployer", StringType),
    StructField("deployed_at", TimestampType),
    StructField("source_metadata", StringType),
    StructField("owner", StringType),
    StructField("admins", ArrayType(StringType)),
    StructField("chef", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("max_approved_applicants", IntegerType),
    StructField("base_currency", StringType),
    StructField("application_start", TimestampType),
    StructField("application_end", TimestampType),
    StructField("matching_round_start", TimestampType),
    StructField("matching_round_end", TimestampType),
    StructField("registry_provider", StringType),
    StructField("min_matching_pool_donation_amount", StringType),
    StructField("sybil_wrapper_provider", StringType),
    StructField("custom_sybil_checks", StringType),
    StructField("custom_min_threshold_score", IntegerType),
    StructField("referral_fee_matching_pool_basis_points", IntegerType),
    StructField("referral_fee_public_round_basis_points", IntegerType),
    StructField("chef_fee_basis_points", IntegerType),
    StructField("total_matching_pool", StringType),
    StructField("total_matching_pool_usd", Usd),
    StructField("matching_pool_balance", StringType),
    StructField("matching_pool_donations_count", IntegerType),
    StructField("total_public_donations", StringType),
    StructField("total_public_donations_usd", Usd),
    StructField("public_donations_count", IntegerType),
    StructField("cooldown_end", TimestampType),
    StructField("cooldown_period_ms", LongType),
    StructField("all_paid_out", BooleanType),
    StructField("protocol_config_provider", StringType)))

  /** pots/models.py:15-70. */
  val potFactory: StructType = withSeq(Seq(
    StructField("account", StringType, nullable = false),
    StructField("owner", StringType),
    StructField("admins", ArrayType(StringType)),
    StructField("whitelisted_deployers", ArrayType(StringType)),
    StructField("deployed_at", TimestampType),
    StructField("source_metadata", StringType),
    StructField("protocol_fee_basis_points", IntegerType),
    StructField("protocol_fee_recipient", StringType),
    StructField("require_whitelist", BooleanType)))

  /** pots/models.py:397-458; unique (pot, applicant). */
  val potApplication: StructType = withSeq(Seq(
    StructField("pot", StringType, nullable = false),
    StructField("applicant", StringType, nullable = false),
    StructField("message", StringType),
    StructField("status", StringType),
    StructField("submitted_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("tx_hash", StringType)))

  /** pots/models.py:461-510; unique (application, reviewer, reviewed_at). */
  val potApplicationReview: StructType = withSeq(Seq(
    StructField("pot", StringType, nullable = false),
    StructField("applicant", StringType, nullable = false),
    StructField("reviewer", StringType, nullable = false),
    StructField("notes", StringType),
    StructField("status", StringType),
    StructField("reviewed_at", TimestampType),
    StructField("tx_hash", StringType)))

  /** pots/models.py:513-567. */
  val potPayout: StructType = withSeq(Seq(
    StructField("pot", StringType, nullable = false),
    StructField("recipient", StringType, nullable = false),
    StructField("amount", StringType),
    StructField("amount_dec", U128),
    StructField("amount_paid_usd", Usd),
    StructField("ft", StringType),
    StructField("paid_at", TimestampType),   // null = scheduled
    StructField("tx_hash", StringType)))

  /** pots/models.py:589-635; unique (challenger, pot). */
  val potPayoutChallenge: StructType = withSeq(Seq(
    StructField("challenger", StringType, nullable = false),
    StructField("pot", StringType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("message", StringType),
    StructField("tx_hash", StringType)))

  /** pots/models.py:638-695. */
  val potPayoutChallengeAdminResponse: StructType = withSeq(Seq(
    StructField("challenger", StringType, nullable = false),
    StructField("pot", StringType, nullable = false),
    StructField("admin", StringType),
    StructField("created_at", TimestampType),
    StructField("message", StringType),
    StructField("resolved", BooleanType),
    StructField("tx_hash", StringType)))

  /** lists/models.py:15-83; on_chain_id unique. */
  val list: StructType = withSeq(Seq(
    StructField("on_chain_id", LongType, nullable = false),
    StructField("owner", StringType),
    StructField("admins", ArrayType(StringType)),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("cover_image_url", StringType),
    StructField("admin_only_registrations", BooleanType),
    StructField("default_registration_status", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** lists/models.py:86-115; unique (list, account). */
  val listUpvote: StructType = withSeq(Seq(
    StructField("list_id", LongType, nullable = false),
    StructField("account", StringType, nullable = false),
    StructField("created_at", TimestampType)))

  /** lists/models.py:118-187; unique (list, registrant). */
  val listRegistration: StructType = withSeq(Seq(
    StructField("on_chain_id", LongType),
    StructField("list_id", LongType, nullable = false),
    StructField("registrant", StringType, nullable = false),
    StructField("registered_by", StringType),
    StructField("status", StringType),
    StructField("submitted_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("registrant_notes", StringType),
    StructField("admin_notes", StringType),
    StructField("tx_hash", StringType)))

  /** activities/models.py:22-72. */
  val activity: StructType = withSeq(Seq(
    StructField("signer", StringType),
    StructField("receiver", StringType),
    StructField("timestamp", TimestampType),
    StructField("action_result", StringType), // JSON
    StructField("tx_hash", StringType),
    StructField("type", StringType)))

  /** activities/models.py:7-19. */
  val activityTypes: Seq[String] = Seq(
    "Donate_Direct", "Donate_Pot_Public", "Donate_Pot_Matching_Pool",
    "Register", "Register_Batch", "Deploy_Pot", "Process_Payouts",
    "Challenge_Payout", "Submit_Application", "Update_Pot_Config",
    "Add_List_Admin", "Remove_List_Admin", "Upvote")

  /** pots/models.py:390-394 + lists/models.py:7-12. */
  val applicationStatuses: Seq[String] =
    Seq("Pending", "Approved", "Rejected", "InReview")
  val registrationStatuses: Seq[String] =
    Seq("Pending", "Approved", "Rejected", "Graylisted", "Blacklisted")

  /** nadabot/models.py:22-65. */
  val nadabotRegistry: StructType = withSeq(Seq(
    StructField("account", StringType, nullable = false),
    StructField("owner", StringType),
    StructField("default_human_threshold", IntegerType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("admins", ArrayType(StringType)),
    StructField("source_metadata", StringType)))

  /** nadabot/models.py:68-96; unique (registry, account). */
  val blacklist: StructType = withSeq(Seq(
    StructField("registry", StringType, nullable = false),
    StructField("account", StringType, nullable = false),
    StructField("reason", StringType),
    StructField("date_blacklisted", TimestampType),
    StructField("active", BooleanType))) // false after unblacklist

  /** nadabot/models.py:98-219. */
  val provider: StructType = withSeq(Seq(
    StructField("on_chain_id", LongType, nullable = false),
    StructField("registry", StringType, nullable = false),
    StructField("contract", StringType),
    StructField("method_name", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("status", StringType),
    StructField("admin_notes", StringType),
    StructField("default_weight", IntegerType),
    StructField("gas", LongType),
    StructField("tags", StringType),
    StructField("icon_url", StringType),
    StructField("external_url", StringType),
    StructField("submitted_by", StringType),
    StructField("submitted_at", TimestampType),
    StructField("stamp_validity_ms", LongType),
    StructField("account_id_arg_name", StringType),
    StructField("custom_args", StringType)))

  /** nadabot/models.py:221-239. */
  val stamp: StructType = withSeq(Seq(
    StructField("user", StringType, nullable = false),
    StructField("provider_id", LongType, nullable = false),
    StructField("registry", StringType),
    StructField("verified_at", TimestampType)))

  /** nadabot/models.py:241-280; rule is enum-or-{enum: value}. */
  val group: StructType = withSeq(Seq(
    StructField("on_chain_id", LongType, nullable = false),
    StructField("registry", StringType),
    StructField("name", StringType),
    StructField("rule_type", StringType),
    StructField("rule_val", IntegerType),
    StructField("providers", ArrayType(LongType)),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** indexer_app/models.py:5-24 — stream-cursor parity row. */
  val blockHeight: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("block_height", LongType),
    StructField("block_timestamp", TimestampType),
    StructField("updated_at", TimestampType)))
}
