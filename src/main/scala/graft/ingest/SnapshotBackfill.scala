package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Amounts

/** Backfill from contract-state snapshots — the engine-side equivalent of
  * the reference's `populatedata` management command
  * (indexer_app/management/commands/populatedata.py:26-547), which
  * regenerates the database from paged view-calls (`get_donations`,
  * `get_lists`, `get_registrations_for_list`, `get_applications`,
  * `get_config.payouts`).
  *
  * The HTTP fetch loop itself stays a thin out-of-engine script (SURVEY
  * §2.1 S4); the engine consumes the fetched JSON snapshots (JSON-lines or
  * pretty-printed array files — both parse) and LWW-merges them into
  * silver with a synthetic ingest-seq at the snapshot's block height — so
  * later stream rows override snapshot rows and vice versa, exactly as
  * block order dictates. Snapshot seq uses shard_index = -1 so a REAL
  * stream row at the same height deterministically wins ties.
  *
  * Scope: donations, lists, registrations, applications (+reviews), pots
  * (get_pots × per-pot get_config — including the payouts embedded in the
  * config), payout challenges (+admin responses), factory configs, token
  * metadata, and account discovery.
  */
object SnapshotBackfill {

  private def ddl(s: String): org.apache.spark.sql.types.StructType =
    EntityTransforms.ddl(s)

  /** Synthetic ingest-seq for snapshot rows: at the snapshot height with
    * shard_index = -1, so a real stream row at the same height (shard >= 0)
    * deterministically wins LWW ties. */
  private def withSeq(df: DataFrame, height: Long): DataFrame =
    df.withColumn("block_height", lit(height))
      .withColumn("shard_index", lit(-1L))
      .withColumn("receipt_index", lit(0))
      .withColumn("action_index", lit(0))

  /** Read a snapshot file tolerant of both JSON-lines and pretty-printed
    * array layouts: a per-line read of an indented array yields all-null
    * rows under a user schema, which would silently no-op the backfill —
    * detect that and fall back to multiLine. */
  private[ingest] def readSnapshot(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType, keyCol: String): DataFrame = {
    val lineMode = spark.read.schema(schema).json(path)
      .filter(col(keyCol).isNotNull)
    if (!lineMode.isEmpty) lineMode
    else spark.read.schema(schema).option("multiLine", true).json(path)
      .filter(col(keyCol).isNotNull)
  }

  /** `get_donations` snapshot (direct variant: populatedata.py:121-194) or
    * a pot's `get_donations` (populatedata.py:391-453) when `pot` is set.
    * Input: JSON-lines (or array) of DonationExternal objects. */
  def donations(spark: SparkSession, path: String, snapshotHeight: Long,
      pot: Option[String] = None): DataFrame = {
    val raw = readSnapshot(spark, path, EntityTransforms.donationPayload, "id")
    val totalDec = Amounts.u128(col("total_amount"))
    val givenNet = Amounts.u128(col("net_amount"))
    val netDec = when(givenNet.isNotNull && givenNet =!= 0, givenNet)
      .otherwise(Amounts.netAmount(col("total_amount"),
        col("protocol_fee"), col("referrer_fee"), col("chef_fee")))
    withSeq(raw.select(
      col("id").as("on_chain_id"),
      col("donor_id").as("donor"),
      col("total_amount"),
      totalDec.as("total_amount_dec"),
      lit(null).cast(Schemas.Usd).as("total_amount_usd"),
      netDec.cast("string").as("net_amount"),
      netDec.as("net_amount_dec"),
      lit(null).cast(Schemas.Usd).as("net_amount_usd"),
      coalesce(col("ft_id"), lit("near")).as("ft"),
      pot.map(lit(_)).getOrElse(lit(null).cast("string")).as("pot"),
      coalesce(col("matching_pool"), lit(false)).as("matching_pool"),
      col("message"),
      timestamp_millis(coalesce(col("donated_at"), col("donated_at_ms")).cast("long"))
        .as("donated_at"),
      coalesce(col("recipient_id"), col("project_id")).as("recipient"),
      col("protocol_fee"),
      Amounts.u128(col("protocol_fee")).as("protocol_fee_dec"),
      lit(null).cast(Schemas.Usd).as("protocol_fee_usd"),
      col("referrer_id").as("referrer"),
      col("referrer_fee"),
      Amounts.u128(col("referrer_fee")).as("referrer_fee_dec"),
      lit(null).cast(Schemas.Usd).as("referrer_fee_usd"),
      col("chef_id").as("chef"),
      col("chef_fee"),
      Amounts.u128(col("chef_fee")).as("chef_fee_dec"),
      lit(null).cast(Schemas.Usd).as("chef_fee_usd"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** `get_lists` snapshot (populatedata.py:29-52). */
  def lists(spark: SparkSession, path: String, snapshotHeight: Long): DataFrame = {
    val raw = readSnapshot(spark, path, EntityTransforms.listPayload, "id")
    withSeq(raw.select(
      col("id").as("on_chain_id"),
      col("owner"),
      col("admins"),
      col("name"),
      col("description"),
      col("cover_image_url"),
      coalesce(col("admin_only_registrations"), lit(false)).as("admin_only_registrations"),
      col("default_registration_status"),
      timestamp_millis(col("created_at").cast("long")).as("created_at"),
      timestamp_millis(col("updated_at").cast("long")).as("updated_at")), snapshotHeight)
  }

  /** `get_registrations_for_list` snapshot (populatedata.py:66-108). */
  def listRegistrations(spark: SparkSession, path: String, snapshotHeight: Long): DataFrame = {
    val raw = readSnapshot(spark, path, EntityTransforms.registrationPayload, "id")
    withSeq(raw.select(
      col("id").as("on_chain_id"),
      col("list_id"),
      col("registrant_id").as("registrant"),
      col("registered_by"),
      col("status"),
      timestamp_millis(col("submitted_ms").cast("long")).as("submitted_at"),
      timestamp_millis(col("updated_ms").cast("long")).as("updated_at"),
      col("registrant_notes"),
      col("admin_notes"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** A pot's `get_applications` snapshot (populatedata.py:336-381). The
    * snapshot carries updated_at/review_notes beyond the event payload, so
    * it gets its own schema rather than reusing applicationPayload. */
  private val applicationSnapshotPayload =
    org.apache.spark.sql.types.DataType.fromDDL(
      """project_id STRING, message STRING, status STRING,
        |submitted_at BIGINT, updated_at BIGINT, review_notes STRING"""
        .stripMargin).asInstanceOf[org.apache.spark.sql.types.StructType]

  /** Shared parsed read of an applications dump — [[potApplications]] and
    * [[potApplicationReviews]] consume the SAME file; the overloads taking
    * this frame avoid a second probe + parse per pot (the
    * readPotSnapshot pattern). */
  def readApplicationSnapshot(spark: SparkSession, path: String): DataFrame =
    readSnapshot(spark, path, applicationSnapshotPayload, "project_id")

  def potApplications(spark: SparkSession, path: String, pot: String,
      snapshotHeight: Long): DataFrame =
    potApplications(readApplicationSnapshot(spark, path), pot, snapshotHeight)

  def potApplications(raw: DataFrame, pot: String,
      snapshotHeight: Long): DataFrame = {
    withSeq(raw.select(
      lit(pot).as("pot"),
      col("project_id").as("applicant"),
      col("message"),
      col("status"),
      timestamp_millis(col("submitted_at").cast("long")).as("submitted_at"),
      timestamp_millis(coalesce(col("updated_at"), col("submitted_at")).cast("long"))
        .as("updated_at"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** Review rows for non-Pending snapshot applications (reference
    * populatedata.py:368-381: reviewer defaults to the POT OWNER, notes
    * from review_notes, reviewed_at = updated_at). */
  def potApplicationReviews(spark: SparkSession, path: String, pot: String,
      potOwner: String, snapshotHeight: Long): DataFrame =
    potApplicationReviews(readApplicationSnapshot(spark, path), pot,
      potOwner, snapshotHeight)

  def potApplicationReviews(raw: DataFrame, pot: String,
      potOwner: String, snapshotHeight: Long): DataFrame = {
    withSeq(raw.filter(col("status") =!= "Pending").select(
      lit(pot).as("pot"),
      col("project_id").as("applicant"),
      lit(potOwner).as("reviewer"),
      col("review_notes").as("notes"),
      col("status"),
      timestamp_millis(coalesce(col("updated_at"), col("submitted_at")).cast("long"))
        .as("reviewed_at"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** Account discovery from snapshot rows — the engine-side counterpart of
    * populatedata's get_or_create of every referenced account
    * (populatedata.py:40, 83-90, 133-141). Pass the already-built snapshot
    * DataFrames; returns rows for the `accounts` table. */
  def accounts(sources: Seq[(DataFrame, Seq[String])], snapshotHeight: Long): DataFrame = {
    val ids = sources.map { case (df, cols) =>
      df.select(explode(array(cols.map(col): _*)).as("id"))
    }.reduce(_ unionByName _)
      .filter(col("id").isNotNull).distinct()
      .withColumn("near_social_profile_data", lit(null).cast("string"))
    withSeq(ids, snapshotHeight)
  }

  /** One object per pot: the get_pots row (id → account, deployed_by,
    * deployed_at_ms — populatedata.py:229-236) merged with that pot's
    * get_config response (populatedata.py:239-246, field map 262-331) and
    * its get_contract_source_metadata (populatedata.py:247-255). The
    * config's embedded `payouts` array (populatedata.py:476-498) rides
    * along for [[potPayouts]]. */
  private val potSnapshotPayload = ddl(
    """account STRING, deployed_by STRING, deployed_at_ms BIGINT,
      |owner STRING, admins ARRAY<STRING>, chef STRING, pot_name STRING,
      |pot_description STRING, max_projects INT, base_currency STRING,
      |application_start_ms BIGINT, application_end_ms BIGINT,
      |public_round_start_ms BIGINT, public_round_end_ms BIGINT,
      |registry_provider STRING, min_matching_pool_donation_amount STRING,
      |sybil_wrapper_provider STRING, custom_sybil_checks STRING,
      |custom_min_threshold_score INT,
      |referral_fee_matching_pool_basis_points INT,
      |referral_fee_public_round_basis_points INT,
      |chef_fee_basis_points INT, cooldown_end_ms BIGINT,
      |cooldown_period_ms BIGINT, matching_pool_balance STRING,
      |total_public_donations STRING, public_donations_count INT,
      |all_paid_out BOOLEAN, protocol_config_provider STRING,
      |source_metadata STRUCT<commit_hash STRING, link STRING, version STRING>,
      |payouts ARRAY<STRUCT<project_id STRING, amount STRING, paid_at BIGINT>>"""
      .stripMargin)

  /** One parsed read of a pot snapshot dump, shareable across [[pots]] and
    * [[potPayouts]] — a backfill that feeds both should parse (and
    * line/multiLine-probe) each file once, not per projection. */
  def readPotSnapshot(spark: SparkSession, path: String): DataFrame =
    readSnapshot(spark, path, potSnapshotPayload, "account")

  /** get_pots × get_config snapshot → `pots` rows (populatedata.py:220-334;
    * the same loader also serves config REFRESH: re-dumping configs at a
    * later height LWW-updates the config fields of existing pots, closing
    * the RPC side of handle_pot_config_update, utils.py:219-282). */
  def pots(spark: SparkSession, path: String, snapshotHeight: Long): DataFrame =
    pots(readPotSnapshot(spark, path), snapshotHeight)

  def pots(raw: DataFrame, snapshotHeight: Long): DataFrame = {
    withSeq(raw.select(
      col("account"),
      regexp_extract(col("account"), """\.(v\d+\.potfactory\.potlock\.near)$""", 1)
        .as("pot_factory"),
      col("deployed_by").as("deployer"),
      timestamp_millis(col("deployed_at_ms")).as("deployed_at"),
      to_json(col("source_metadata")).as("source_metadata"),
      col("owner"),
      col("admins"),
      col("chef"),
      col("pot_name").as("name"),
      col("pot_description").as("description"),
      col("max_projects").as("max_approved_applicants"),
      col("base_currency"),
      timestamp_millis(col("application_start_ms")).as("application_start"),
      timestamp_millis(col("application_end_ms")).as("application_end"),
      timestamp_millis(col("public_round_start_ms")).as("matching_round_start"),
      timestamp_millis(col("public_round_end_ms")).as("matching_round_end"),
      col("registry_provider"),
      col("min_matching_pool_donation_amount"),
      col("sybil_wrapper_provider"),
      col("custom_sybil_checks"),
      col("custom_min_threshold_score"),
      col("referral_fee_matching_pool_basis_points"),
      col("referral_fee_public_round_basis_points"),
      col("chef_fee_basis_points"),
      timestamp_millis(col("cooldown_end_ms")).as("cooldown_end"),
      // get_config's running totals ride along like they do on the event
      // path (populatedata zeroes them at CREATE, populatedata.py:300-305,
      // but a refresh dump carries live values; absent fields stay null
      // and coalesce from the existing row)
      col("cooldown_period_ms"),
      col("matching_pool_balance"),
      col("total_public_donations"),
      col("public_donations_count"),
      col("all_paid_out"),
      col("protocol_config_provider"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** Payout rows embedded in the pot config snapshot
    * (populatedata.py:476-498): keyed (pot, recipient), NEAR-only, null
    * tx_hash — exactly the reference's update_or_create defaults. Seq is
    * extended with `payout_index` to match the streaming merge. */
  def potPayouts(spark: SparkSession, path: String, snapshotHeight: Long): DataFrame =
    potPayouts(readPotSnapshot(spark, path), snapshotHeight)

  def potPayouts(raw: DataFrame, snapshotHeight: Long): DataFrame = {
    withSeq(raw
      .filter(col("payouts").isNotNull)
      .select(col("account").as("pot"),
        posexplode(col("payouts")).as(Seq("payout_index", "po")))
      .select(
        col("pot"),
        col("po.project_id").as("recipient"),
        col("po.amount").as("amount"),
        Amounts.u128(col("po.amount")).as("amount_dec"),
        lit(null).cast(Schemas.Usd).as("amount_paid_usd"),
        lit("near").as("ft"),
        timestamp_millis(col("po.paid_at")).as("paid_at"),
        lit(null).cast("string").as("tx_hash"),
        col("payout_index").cast("int").as("payout_index")), snapshotHeight)
  }

  private val challengeSnapshotPayload = ddl(
    """challenger_id STRING, reason STRING, created_at BIGINT,
      |admin_notes STRING, resolved BOOLEAN""".stripMargin)

  /** One parsed read of a challenges dump, shareable across
    * [[payoutChallenges]] and [[challengeAdminResponses]]. */
  def readChallengeSnapshot(spark: SparkSession, path: String): DataFrame =
    readSnapshot(spark, path, challengeSnapshotPayload, "challenger_id")

  /** A pot's `get_payouts_challenges` snapshot (populatedata.py:504-530):
    * keyed (challenger, pot). */
  def payoutChallenges(spark: SparkSession, path: String, pot: String,
      snapshotHeight: Long): DataFrame =
    payoutChallenges(readChallengeSnapshot(spark, path), pot, snapshotHeight)

  def payoutChallenges(raw: DataFrame, pot: String,
      snapshotHeight: Long): DataFrame = {
    withSeq(raw.select(
      col("challenger_id").as("challenger"),
      lit(pot).as("pot"),
      timestamp_millis(col("created_at")).as("created_at"),
      col("reason").as("message"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** Admin-response rows for answered snapshot challenges
    * (populatedata.py:531-543: emitted when admin_notes is non-empty or
    * resolved — Python truthiness — with admin defaulted to the POT OWNER
    * and created_at reused from the challenge). */
  def challengeAdminResponses(spark: SparkSession, path: String, pot: String,
      potOwner: String, snapshotHeight: Long): DataFrame =
    challengeAdminResponses(readChallengeSnapshot(spark, path), pot, potOwner,
      snapshotHeight)

  def challengeAdminResponses(raw: DataFrame, pot: String,
      potOwner: String, snapshotHeight: Long): DataFrame = {
    withSeq(raw
      .filter((col("admin_notes").isNotNull && col("admin_notes") =!= "") ||
        col("resolved") === true)
      .select(
        col("challenger_id").as("challenger"),
        lit(pot).as("pot"),
        lit(potOwner).as("admin"),
        timestamp_millis(col("created_at")).as("created_at"),
        col("admin_notes").as("message"),
        coalesce(col("resolved"), lit(false)).as("resolved"),
        lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  private val factoryConfigPayload = ddl(
    """account STRING, owner STRING, admins ARRAY<STRING>,
      |whitelisted_deployers ARRAY<STRING>, protocol_fee_basis_points INT,
      |protocol_fee_recipient_account STRING, require_whitelist BOOLEAN,
      |deployed_at_ms BIGINT,
      |source_metadata STRUCT<commit_hash STRING, link STRING, version STRING>"""
      .stripMargin)

  /** Factory get_config dump → `pot_factories` rows — the no-RPC
    * counterpart of PotFactory.update_configs (pots/models.py:72-105):
    * owner/admins/whitelisted_deployers/fee fields overwrite, anything the
    * dump omits stays null and backfills from the existing row in the
    * coalescing LWW merge. */
  def factoryConfig(spark: SparkSession, path: String, snapshotHeight: Long): DataFrame =
    withSeq(readSnapshot(spark, path, factoryConfigPayload, "account")
      .select(
        col("account"),
        col("owner"),
        col("admins"),
        col("whitelisted_deployers"),
        timestamp_millis(col("deployed_at_ms")).as("deployed_at"),
        to_json(col("source_metadata")).as("source_metadata"),
        col("protocol_fee_basis_points"),
        col("protocol_fee_recipient_account").as("protocol_fee_recipient"),
        col("require_whitelist")), snapshotHeight)

  private val tokenMetadataPayload = ddl(
    """account STRING, name STRING, symbol STRING, icon STRING,
      |decimals INT, coingecko_id STRING""".stripMargin)

  /** ft_metadata snapshot → full token rows (S6). The reference fetches
    * `ft_metadata` over RPC per newly seen FT token (utils.py:925-941);
    * the engine consumes a fetched dump — one JSON object per token
    * carrying the account id plus the metadata fields — and LWW-merges it
    * into `tokens`. Without this, non-near tokens keep null decimals and
    * their donations stay null-USD (gold.Stats never guesses decimals). */
  def tokenMetadata(spark: SparkSession, path: String, snapshotHeight: Long): DataFrame =
    withSeq(readSnapshot(spark, path, tokenMetadataPayload, "account")
      .select(col("account"), col("name"), col("symbol"), col("icon"),
        col("decimals"), col("coingecko_id")), snapshotHeight)

  /** Token stubs from snapshot donations (ft references). */
  def tokens(donations: DataFrame, snapshotHeight: Long): DataFrame =
    withSeq(
      donations.select(col("ft").as("account")).filter(col("account").isNotNull)
        .distinct()
        .withColumn("name", lit(null).cast("string"))
        .withColumn("symbol", lit(null).cast("string"))
        .withColumn("icon", lit(null).cast("string"))
        .withColumn("decimals", when(col("account") === "near", lit(24)).cast("int"))
        .withColumn("coingecko_id", lit(null).cast("string")),
      snapshotHeight)

  /** Merge snapshot DataFrames into the silver store (same natural keys and
    * LWW semantics as the stream). Re-running a backfill is a no-op. */
  def mergeInto(spark: SparkSession, silverDir: String,
      tables: Map[String, (DataFrame, Seq[String])]): Map[String, Long] = {
    val seq = Seq("block_height", "shard_index", "receipt_index", "action_index")
    tables.map { case (name, (df, keys)) =>
      // Shared dispatch with the streaming path: a snapshot backfill of a
      // partitioned table (donations) merges partition-scoped too, instead
      // of flattening the layout the stream relies on. pot_payouts extends
      // the seq with payout_index exactly like the stream merge, so the
      // two paths arbitrate the same way.
      val seqFor = if (name == "pot_payouts") seq :+ "payout_index" else seq
      name -> SilverStore.mergeEntity(spark, silverDir, name, df, keys, seqFor)
    }
  }

  /** Standard key mapping for [[mergeInto]] — the single shared source of
    * truth also used by the streaming path (SilverStore). */
  val naturalKeys: Map[String, Seq[String]] = SilverStore.naturalKeys
}
