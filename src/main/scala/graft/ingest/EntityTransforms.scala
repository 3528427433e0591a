package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.functions.Amounts

/** Silver-layer entity extractors: each reproduces one handler family of
  * the reference's 30-way dispatch (indexer_app/utils.py, SURVEY §2.10) as
  * a filtered projection over the exploded action/event stream.
  *
  * All extractors are stateless narrow transforms; ordering semantics come
  * from the carried ingest-seq columns, applied by the LWW merge writer
  * (operators.MergeWriter). Side-effecting RPC enrichment in the reference
  * (ft_metadata, social profiles, pot get_config) is *not* done here —
  * it's modeled as separate lookup tables (SURVEY §2.9).
  */
object EntityTransforms {
  import BlockIngest.contracts

  private val seqCols: Seq[Column] = Seq(
    col("block_height"), col("shard_index"), col("receipt_index"),
    col("action_index"))

  /** DDL→StructType shorthand — shared by the other ingest loaders
    * (SnapshotBackfill, Chains) so the boilerplate lives once. */
  private[ingest] def ddl(s: String): StructType =
    DataType.fromDDL(s).asInstanceOf[StructType]

  private def msTs(c: Column): Column =
    timestamp_millis(c.cast("long"))

  private val isPotSub: Column =
    col("receiver_id").rlike(contracts.potSubPattern)
  private val isFactory: Column =
    col("receiver_id").rlike(contracts.potFactoryPattern)
  private val isNadabot: Column =
    col("receiver_id").rlike(contracts.nadabotPattern) ||
      col("receiver_id").rlike(contracts.nadabotSubPattern)

  // ------------------------------------------------------------ donations

  /** Union payload of the pot (examples.txt:3-33) and direct
    * (examples.txt:35-56) donation result shapes. */
  private[ingest] val donationPayload = ddl(
    """id BIGINT, donor_id STRING, total_amount STRING, net_amount STRING,
      |message STRING, donated_at BIGINT, donated_at_ms BIGINT,
      |project_id STRING, recipient_id STRING, referrer_id STRING,
      |referrer_fee STRING, protocol_fee STRING, matching_pool BOOLEAN,
      |chef_id STRING, chef_fee STRING, ft_id STRING""".stripMargin)

  /** handle_new_donation (utils.py:864-1076; trigger handler.py:279-318).
    * Pot-vs-direct decided by receiver (handler.py:285-287); literal
    * "null" results skipped (handler.py:298-302); net recomputed when
    * missing/zero (utils.py:875-884, F2). */
  def donations(actions: DataFrame): DataFrame = {
    val src = parsedDonations(actions)

    val totalDec = Amounts.u128(col("p.total_amount"))
    val protoDec = Amounts.u128(col("p.protocol_fee"))
    val refDec = Amounts.u128(col("p.referrer_fee"))
    val chefDec = Amounts.u128(col("p.chef_fee"))
    val givenNet = Amounts.u128(col("p.net_amount"))
    val netDec = when(givenNet.isNotNull && givenNet =!= 0, givenNet)
      .otherwise(Amounts.netAmount(col("p.total_amount"),
        col("p.protocol_fee"), col("p.referrer_fee"), col("p.chef_fee")))

    src.select(Seq(
      col("p.id").as("on_chain_id"),
      col("p.donor_id").as("donor"),
      col("p.total_amount").as("total_amount"),
      totalDec.as("total_amount_dec"),
      lit(null).cast(Schemas.Usd).as("total_amount_usd"),
      netDec.cast("string").as("net_amount"),
      netDec.as("net_amount_dec"),
      lit(null).cast(Schemas.Usd).as("net_amount_usd"),
      coalesce(col("p.ft_id"), lit("near")).as("ft"),
      when(isPotSub, col("receiver_id")).as("pot"),
      coalesce(col("p.matching_pool"), lit(false)).as("matching_pool"),
      col("p.message").as("message"),
      msTs(coalesce(col("p.donated_at"), col("p.donated_at_ms"))).as("donated_at"),
      coalesce(col("p.recipient_id"), col("p.project_id")).as("recipient"),
      col("p.protocol_fee").as("protocol_fee"),
      protoDec.as("protocol_fee_dec"),
      lit(null).cast(Schemas.Usd).as("protocol_fee_usd"),
      col("p.referrer_id").as("referrer"),
      col("p.referrer_fee").as("referrer_fee"),
      refDec.as("referrer_fee_dec"),
      lit(null).cast(Schemas.Usd).as("referrer_fee_usd"),
      col("p.chef_id").as("chef"),
      col("p.chef_fee").as("chef_fee"),
      chefDec.as("chef_fee_dec"),
      lit(null).cast(Schemas.Usd).as("chef_fee_usd"),
      col("receipt_id").as("tx_hash"),
      // Receipt receiver, for account discovery only (utils.py:891
      // get_or_creates receiver_id — donate.potlock.near for direct
      // donations); dropped before the silver merge.
      col("receiver_id").as("__receiver")) ++ seqCols: _*)
  }

  /** Donation activity rows (utils.py:999-1014): typed feed entries.
    * signer/receiver come from the RECEIPT (reference stores the receipt's
    * signer_id/receiver_id, not the donation's donor/project — they differ
    * for callback-driven donations and direct donations). */
  def donationActivities(actions: DataFrame): DataFrame =
    parsedDonations(actions)
      .select(Seq(
        col("signer_id").as("signer"),
        col("receiver_id").as("receiver"),
        msTs(coalesce(col("p.donated_at"), col("p.donated_at_ms"))).as("timestamp"),
        to_json(struct(
          col("p.id").as("on_chain_id"),
          col("p.total_amount").as("total_amount"),
          when(isPotSub, col("receiver_id")).as("pot"),
          coalesce(col("p.recipient_id"), col("p.project_id")).as("recipient"),
          coalesce(col("p.matching_pool"), lit(false)).as("matching_pool"))).as("action_result"),
        col("receipt_id").as("tx_hash"),
        when(!isPotSub, "Donate_Direct")
          .when(coalesce(col("p.matching_pool"), lit(false)), "Donate_Pot_Matching_Pool")
          .otherwise("Donate_Pot_Public").as("type")) ++ seqCols: _*)

  /** The donate-family gate + payload parse shared by [[donations]] and
    * [[donationActivities]] — ONE source of truth for which receipts
    * count as donations (a rule added to one consumer but not the other
    * would silently desynchronize the donations table from the activity
    * feed). */
  private def parsedDonations(actions: DataFrame): DataFrame = {
    val donateMethods = Seq(
      "donate", "handle_protocol_fee_callback", "sybil_callback",
      "transfer_funds_callback")
    actions
      .filter(col("method_name").isin(donateMethods: _*))
      .filter(isPotSub || col("receiver_id") === contracts.donate)
      .filter(col("result_json").isNotNull &&
        trim(col("result_json")) =!= "null" && trim(col("result_json")) =!= "")
      .withColumn("p", from_json(col("result_json"), donationPayload))
      .filter(col("p.id").isNotNull)
  }

  /** Activity rows for the non-donation handlers (SURVEY §2.10 "Entities
    * written" column: Deploy_Pot, Submit_Application, Register_Batch,
    * Upvote, Process_Payouts, Challenge_Payout, Remove_List_Admin). Each is
    * a typed feed entry keyed by (type, action_result) —
    * activities/models.py:69-72. */
  def handlerActivities(actions: DataFrame): DataFrame = {
    def act(src: DataFrame, tpe: String, resultCols: Seq[String]): DataFrame =
      src.select(Seq(
        col("signer_id").as("signer"),
        col("receiver_id").as("receiver"),
        col("block_timestamp").as("timestamp"),
        to_json(struct(resultCols.map(col): _*)).as("action_result"),
        col("receipt_id").as("tx_hash"),
        lit(tpe).as("type")) ++ seqCols: _*)

    val deploys = act(
      actions.filter(col("method_name") === "new" && isPotSub),
      "Deploy_Pot", Seq("receiver_id"))
    val applications = act(
      actions.filter(col("method_name").isin("apply", "assert_can_apply_callback") && isPotSub)
        .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null"),
      "Submit_Application", Seq("receiver_id", "result_json"))
    val registerBatches = act(
      actions.filter(col("method_name") === "register_batch" &&
        col("receiver_id") === contracts.lists)
        .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null"),
      "Register_Batch", Seq("result_json"))
    val upvotes = act(
      actions.filter(col("method_name") === "upvote" &&
        col("receiver_id") === contracts.lists),
      "Upvote", Seq("args_json"))
    val payoutSets = act(
      actions.filter(col("method_name") === "chef_set_payouts" && isPotSub),
      "Process_Payouts", Seq("receiver_id", "args_json"))
    val challenges = act(
      actions.filter(col("method_name") === "challenge_payouts" && isPotSub),
      "Challenge_Payout", Seq("receiver_id", "args_json"))
    val adminRemovals = act(
      actions.filter(col("method_name") === "owner_remove_admins" &&
        col("receiver_id") === contracts.lists),
      "Remove_List_Admin", Seq("args_json"))

    Seq(applications, registerBatches, upvotes, payoutSets, challenges,
      adminRemovals).foldLeft(deploys)(_ unionByName _)
  }

  /** Account discovery (J8; utils.py:892-918): every referenced account id
    * becomes a row; the merge writer's anti-join keeps only new ones. */
  def donationAccounts(donations: DataFrame): DataFrame =
    donations
      .select(Seq(explode(array(col("donor"), col("recipient"), col("referrer"),
        col("chef"), col("pot"), col("ft"), col("__receiver"))).as("id")) ++ seqCols: _*)
      .filter(col("id").isNotNull)

  // ------------------------------------------------------------ pots

  private val potConfigPayload = ddl(
    """owner STRING, admins ARRAY<STRING>, chef STRING, pot_name STRING,
      |pot_description STRING, max_projects INT, base_currency STRING,
      |application_start_ms BIGINT, application_end_ms BIGINT,
      |public_round_start_ms BIGINT, public_round_end_ms BIGINT,
      |registry_provider STRING, min_matching_pool_donation_amount STRING,
      |sybil_wrapper_provider STRING, custom_sybil_checks STRING,
      |custom_min_threshold_score INT,
      |referral_fee_matching_pool_basis_points INT,
      |referral_fee_public_round_basis_points INT,
      |chef_fee_basis_points INT, cooldown_period_ms BIGINT,
      |source_metadata STRUCT<commit_hash STRING, link STRING, version STRING>""".stripMargin)

  /** handle_new_pot (utils.py:117-216): `new` on a pot subaccount. */
  def potDeploys(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "new" && isPotSub)
      .withColumn("p", from_json(col("args_json"), potConfigPayload))
      .select(Seq(
        col("receiver_id").as("account"),
        regexp_extract(col("receiver_id"), """\.(v\d+\.potfactory\.potlock\.near)$""", 1)
          .as("pot_factory"),
        col("signer_id").as("deployer"),
        col("block_timestamp").as("deployed_at"),
        to_json(col("p.source_metadata")).as("source_metadata"),
        coalesce(col("p.owner"), col("signer_id")).as("owner"),
        col("p.admins").as("admins"),
        col("p.chef").as("chef"),
        col("p.pot_name").as("name"),
        col("p.pot_description").as("description"),
        col("p.max_projects").as("max_approved_applicants"),
        col("p.base_currency").as("base_currency"),
        msTs(col("p.application_start_ms")).as("application_start"),
        msTs(col("p.application_end_ms")).as("application_end"),
        msTs(col("p.public_round_start_ms")).as("matching_round_start"),
        msTs(col("p.public_round_end_ms")).as("matching_round_end"),
        col("p.registry_provider").as("registry_provider"),
        col("p.min_matching_pool_donation_amount").as("min_matching_pool_donation_amount"),
        col("p.sybil_wrapper_provider").as("sybil_wrapper_provider"),
        col("p.custom_sybil_checks").as("custom_sybil_checks"),
        col("p.custom_min_threshold_score").as("custom_min_threshold_score"),
        col("p.referral_fee_matching_pool_basis_points").as("referral_fee_matching_pool_basis_points"),
        col("p.referral_fee_public_round_basis_points").as("referral_fee_public_round_basis_points"),
        col("p.chef_fee_basis_points").as("chef_fee_basis_points"),
        col("p.cooldown_period_ms").as("cooldown_period_ms"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  /** get_config-shaped payload carried by the `update_pot_config` event:
    * the deploy-time config fields plus the running totals the view also
    * returns (reference utils.py:229-276 — the handler's field map —
    * and pots/models.py:325-388 update_configs). */
  private[ingest] val potConfigEventPayload = ddl(
    """owner STRING, admins ARRAY<STRING>, chef STRING, pot_name STRING,
      |pot_description STRING, max_projects INT, base_currency STRING,
      |application_start_ms BIGINT, application_end_ms BIGINT,
      |public_round_start_ms BIGINT, public_round_end_ms BIGINT,
      |registry_provider STRING, min_matching_pool_donation_amount STRING,
      |sybil_wrapper_provider STRING, custom_sybil_checks STRING,
      |custom_min_threshold_score INT,
      |referral_fee_matching_pool_basis_points INT,
      |referral_fee_public_round_basis_points INT,
      |chef_fee_basis_points INT, cooldown_period_ms BIGINT,
      |cooldown_end_ms BIGINT, matching_pool_balance STRING,
      |total_public_donations STRING, public_donations_count INT,
      |all_paid_out BOOLEAN, protocol_config_provider STRING""".stripMargin)

  /** handle_pot_config_update (utils.py:219-282; trigger handler.py:105-108,
    * event `update_pot_config`): the reference re-fetches the pot's
    * get_config over RPC and overwrites the config fields, leaving
    * deployer/deployed_at/source_metadata untouched. The engine is no-RPC
    * by design: the event payload itself carries the full updated config
    * (the same shape get_config returns — see the handler's own field map,
    * utils.py:229-276), so the fields are applied straight from the event.
    * Untouched columns stay null here and backfill from the existing row
    * via the coalescing LWW merge. Pots that don't exist are dropped by the
    * caller's semi-join (reference afirst() no-ops, utils.py:224-227). */
  def potConfigUpdates(events: DataFrame): DataFrame =
    events
      .filter(col("event_name") === potConfigEvent)
      .withColumn("d", explode(from_json(col("event_data"),
        org.apache.spark.sql.types.ArrayType(potConfigEventPayload))))
      .filter(col("d").isNotNull && col("d.owner").isNotNull)
      .select(Seq(
        col("receiver_id").as("account"),
        col("d.owner").as("owner"),
        col("d.admins").as("admins"),
        col("d.chef").as("chef"),
        col("d.pot_name").as("name"),
        col("d.pot_description").as("description"),
        col("d.max_projects").as("max_approved_applicants"),
        col("d.base_currency").as("base_currency"),
        msTs(col("d.application_start_ms")).as("application_start"),
        msTs(col("d.application_end_ms")).as("application_end"),
        msTs(col("d.public_round_start_ms")).as("matching_round_start"),
        msTs(col("d.public_round_end_ms")).as("matching_round_end"),
        col("d.registry_provider").as("registry_provider"),
        col("d.min_matching_pool_donation_amount").as("min_matching_pool_donation_amount"),
        col("d.sybil_wrapper_provider").as("sybil_wrapper_provider"),
        col("d.custom_sybil_checks").as("custom_sybil_checks"),
        col("d.custom_min_threshold_score").as("custom_min_threshold_score"),
        col("d.referral_fee_matching_pool_basis_points").as("referral_fee_matching_pool_basis_points"),
        col("d.referral_fee_public_round_basis_points").as("referral_fee_public_round_basis_points"),
        col("d.chef_fee_basis_points").as("chef_fee_basis_points"),
        col("d.cooldown_period_ms").as("cooldown_period_ms"),
        msTs(col("d.cooldown_end_ms")).as("cooldown_end"),
        col("d.matching_pool_balance").as("matching_pool_balance"),
        col("d.total_public_donations").as("total_public_donations"),
        col("d.public_donations_count").as("public_donations_count"),
        col("d.all_paid_out").as("all_paid_out"),
        col("d.protocol_config_provider").as("protocol_config_provider"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  /** Account-discovery rows from a pot config update — the reference
    * get_or_creates owner, chef and each admin (pots/models.py:337-346). */
  def potConfigAccounts(cfg: DataFrame): DataFrame =
    cfg.select(Seq(explode(concat(
      array(col("owner"), col("chef")),
      coalesce(col("admins"), array().cast("array<string>")))).as("id")) ++ seqCols: _*)
      .filter(col("id").isNotNull)

  private val factoryPayload = ddl(
    """owner STRING, admins ARRAY<STRING>, protocol_fee_basis_points INT,
      |protocol_fee_recipient_account STRING,
      |whitelisted_deployers ARRAY<STRING>, require_whitelist BOOLEAN,
      |source_metadata STRUCT<commit_hash STRING, link STRING, version STRING>""".stripMargin)

  /** handle_new_pot_factory (utils.py:285-330). */
  def potFactories(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "new" && isFactory)
      .withColumn("p", from_json(col("args_json"), factoryPayload))
      .select(Seq(
        col("receiver_id").as("account"),
        coalesce(col("p.owner"), col("signer_id")).as("owner"),
        col("p.admins").as("admins"),
        col("p.whitelisted_deployers").as("whitelisted_deployers"),
        col("block_timestamp").as("deployed_at"),
        to_json(col("p.source_metadata")).as("source_metadata"),
        col("p.protocol_fee_basis_points").as("protocol_fee_basis_points"),
        col("p.protocol_fee_recipient_account").as("protocol_fee_recipient"),
        coalesce(col("p.require_whitelist"), lit(false)).as("require_whitelist"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  private[ingest] val applicationPayload = ddl(
    "project_id STRING, message STRING, status STRING, submitted_at BIGINT")

  /** handle_pot_application (utils.py:474-539): `apply` on a pot. */
  def potApplications(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name").isin("apply", "assert_can_apply_callback") && isPotSub)
      .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null")
      .withColumn("p", from_json(col("result_json"), applicationPayload))
      .filter(col("p.project_id").isNotNull)
      .select(Seq(
        col("receiver_id").as("pot"),
        col("p.project_id").as("applicant"),
        col("p.message").as("message"),
        col("p.status").as("status"),
        msTs(col("p.submitted_at")).as("submitted_at"),
        msTs(col("p.submitted_at")).as("updated_at"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  private val statusChangePayload = ddl(
    "status STRING, review_notes STRING, updated_at BIGINT")

  /** handle_pot_application_status_change (utils.py:542-595): review row +
    * application status update. */
  def applicationReviews(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "chef_set_application_status" && isPotSub)
      .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null")
      .withColumn("a", from_json(col("args_json"), ddl("project_id STRING")))
      .withColumn("p", from_json(col("result_json"), statusChangePayload))
      .select(Seq(
        col("receiver_id").as("pot"),
        col("a.project_id").as("applicant"),
        col("signer_id").as("reviewer"),
        col("p.review_notes").as("notes"),
        col("p.status").as("status"),
        msTs(col("p.updated_at")).as("reviewed_at"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  /** The application-side status mutation from a review — merged into
    * pot_applications by natural key (pot, applicant): reproduces the
    * reference's sequential row update (utils.py:589-591). */
  def applicationStatusUpdates(reviews: DataFrame): DataFrame =
    reviews.select(Seq(
      col("pot"), col("applicant"),
      lit(null).cast("string").as("message"),
      col("status"),
      lit(null).cast("timestamp").as("submitted_at"),
      col("reviewed_at").as("updated_at"),
      col("tx_hash")) ++ seqCols: _*)

  /** handle_set_payouts (utils.py:667-702): one pending payout per entry.
    * `payout_index` extends the ingest seq so same-key entries within one
    * action merge deterministically. Merge key is (pot, recipient): a
    * post-challenge re-set updates the row in place, and a transfer
    * (utils.py:719-721 aupdate on recipient) lands on the same row. The
    * reference's unconstrained bulk_create can leave duplicate history
    * rows per recipient; we keep the latest — the shape every query
    * actually wants. */
  def payoutsSet(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "chef_set_payouts" && isPotSub)
      .withColumn("p", from_json(col("args_json"),
        ddl("payouts ARRAY<STRUCT<project_id STRING, amount STRING>>")))
      .select(Seq(col("receiver_id").as("pot"),
        posexplode(col("p.payouts")).as(Seq("payout_index", "po")),
        col("receipt_id"), col("block_timestamp")) ++ seqCols: _*)
      .select(Seq(
        col("pot"),
        col("po.project_id").as("recipient"),
        col("po.amount").as("amount"),
        Amounts.u128(col("po.amount")).as("amount_dec"),
        lit(null).cast(Schemas.Usd).as("amount_paid_usd"),
        lit("near").as("ft"),
        lit(null).cast("timestamp").as("paid_at"),
        col("receipt_id").as("tx_hash"),
        col("payout_index").cast("int").as("payout_index")) ++ seqCols: _*)

  /** handle_transfer_payout (utils.py:705-732): sets paid_at/amount/tx_hash
    * on the matching (pot, recipient) payout row. */
  def payoutTransfers(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "transfer_payout_callback" && isPotSub)
      .withColumn("p", from_json(col("args_json"),
        ddl("payout STRUCT<project_id STRING, amount STRING, paid_at BIGINT>")))
      .filter(col("p.payout").isNotNull)
      .select(Seq(
        col("receiver_id").as("pot"),
        col("p.payout.project_id").as("recipient"),
        col("p.payout.amount").as("amount"),
        Amounts.u128(col("p.payout.amount")).as("amount_dec"),
        lit(null).cast(Schemas.Usd).as("amount_paid_usd"),
        lit("near").as("ft"),
        coalesce(msTs(col("p.payout.paid_at")), col("block_timestamp")).as("paid_at"),
        col("receipt_id").as("tx_hash"),
        lit(0).as("payout_index")) ++ seqCols: _*)

  /** handle_payout_challenge (utils.py:735-761). */
  def payoutChallenges(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "challenge_payouts" && isPotSub)
      .withColumn("p", from_json(col("args_json"), ddl("reason STRING")))
      .select(Seq(
        col("signer_id").as("challenger"),
        col("receiver_id").as("pot"),
        col("block_timestamp").as("created_at"),
        col("p.reason").as("message"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  /** handle_payout_challenge_response (utils.py:764-782). */
  def challengeResponses(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "admin_update_payouts_challenge" && isPotSub)
      .withColumn("p", from_json(col("args_json"),
        ddl("challenger_id STRING, notes STRING, resolve_challenge BOOLEAN")))
      .select(Seq(
        col("p.challenger_id").as("challenger"),
        col("receiver_id").as("pot"),
        col("signer_id").as("admin"),
        col("block_timestamp").as("created_at"),
        col("p.notes").as("message"),
        coalesce(col("p.resolve_challenge"), lit(false)).as("resolved"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  // ------------------------------------------------------------ lists

  private[ingest] val listPayload = ddl(
    """id BIGINT, owner STRING, name STRING, description STRING,
      |cover_image_url STRING, admin_only_registrations BOOLEAN,
      |default_registration_status STRING, admins ARRAY<STRING>,
      |created_at BIGINT, updated_at BIGINT""".stripMargin)

  /** handle_new_list (utils.py:333-374). */
  def listCreates(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "create_list" &&
        col("receiver_id") === contracts.lists)
      .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null")
      .withColumn("p", from_json(col("result_json"), listPayload))
      .filter(col("p.id").isNotNull)
      .select(Seq(
        col("p.id").as("on_chain_id"),
        col("p.owner").as("owner"),
        col("p.admins").as("admins"),
        col("p.name").as("name"),
        col("p.description").as("description"),
        col("p.cover_image_url").as("cover_image_url"),
        coalesce(col("p.admin_only_registrations"), lit(false)).as("admin_only_registrations"),
        col("p.default_registration_status").as("default_registration_status"),
        msTs(col("p.created_at")).as("created_at"),
        msTs(col("p.updated_at")).as("updated_at")) ++ seqCols: _*)

  private[ingest] val registrationPayload = ddl(
    """id BIGINT, registrant_id STRING, list_id BIGINT, status STRING,
      |submitted_ms BIGINT, updated_ms BIGINT, registered_by STRING,
      |registrant_notes STRING, admin_notes STRING""".stripMargin)

  /** handle_new_list_registration (utils.py:377-446): result is an ARRAY of
    * registrations (register_batch). */
  def listRegistrations(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "register_batch" &&
        col("receiver_id") === contracts.lists)
      .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null")
      .withColumn("r", explode(from_json(col("result_json"),
        org.apache.spark.sql.types.ArrayType(registrationPayload))))
      .filter(col("r.id").isNotNull)
      .select(Seq(
        col("r.id").as("on_chain_id"),
        col("r.list_id").as("list_id"),
        col("r.registrant_id").as("registrant"),
        col("r.registered_by").as("registered_by"),
        col("r.status").as("status"),
        msTs(col("r.submitted_ms")).as("submitted_at"),
        msTs(col("r.updated_ms")).as("updated_at"),
        col("r.registrant_notes").as("registrant_notes"),
        col("r.admin_notes").as("admin_notes"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  /** Account-discovery rows from the lists contract: create_list
    * get_or_creates owner, signer, receiver and each admin
    * (utils.py:361-369); register_batch bulk-creates every registrant plus
    * the signer (utils.py:396-422 — registered_by is persisted as an
    * Account FK on the row, so it is discovered too). */
  def listAccounts(actions: DataFrame): DataFrame = {
    val onLists = actions.filter(col("receiver_id") === contracts.lists &&
      col("result_json").isNotNull && trim(col("result_json")) =!= "null")
    val creates = onLists
      .filter(col("method_name") === "create_list")
      .withColumn("p", from_json(col("result_json"), listPayload))
      .filter(col("p.id").isNotNull)
      .select(Seq(explode(concat(
        array(col("p.owner"), col("signer_id"), col("receiver_id")),
        coalesce(col("p.admins"), array().cast("array<string>")))).as("id"))
        ++ seqCols: _*)
    val regs = onLists
      .filter(col("method_name") === "register_batch")
      .withColumn("r", explode(from_json(col("result_json"),
        org.apache.spark.sql.types.ArrayType(registrationPayload))))
      .filter(col("r.id").isNotNull)
      .select(Seq(explode(array(col("r.registrant_id"),
        col("r.registered_by"), col("signer_id"))).as("id")) ++ seqCols: _*)
    creates.unionByName(regs).filter(col("id").isNotNull)
  }

  /** handle_list_registration_update (utils.py:449-471). */
  def registrationUpdates(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "update_registration" &&
        col("receiver_id") === contracts.lists)
      .withColumn("a", from_json(col("args_json"),
        ddl("registration_id BIGINT, status STRING, notes STRING")))
      .withColumn("p", from_json(col("result_json"), registrationPayload))
      // Both payloads unparseable -> no key -> no row (the listStatusChanges
      // guard; a NULL-keyed junk row would otherwise merge and surface).
      .filter(coalesce(col("p.id"), col("a.registration_id")).isNotNull)
      .select(Seq(
        coalesce(col("p.id"), col("a.registration_id")).as("on_chain_id"),
        col("p.list_id").as("list_id"),
        col("p.registrant_id").as("registrant"),
        col("p.registered_by").as("registered_by"),
        coalesce(col("p.status"), col("a.status")).as("status"),
        msTs(col("p.submitted_ms")).as("submitted_at"),
        coalesce(msTs(col("p.updated_ms")), col("block_timestamp")).as("updated_at"),
        col("p.registrant_notes").as("registrant_notes"),
        coalesce(col("p.admin_notes"), col("a.notes")).as("admin_notes"),
        col("receipt_id").as("tx_hash")) ++ seqCols: _*)

  /** handle_default_list_status_change (utils.py:598-628):
    * `admin_set_default_project_status`'s SuccessValue is the updated List
    * object. name/owner/default_registration_status/admin_only_registrations/
    * updated_at are set unconditionally; description/cover_image_url only
    * when present (the coalescing merge keeps the previous value for
    * nulls). admins and created_at are NOT touched by this handler. The
    * list id comes from args.registration_id (the reference's key), with
    * the result's own id as fallback. */
  def listStatusChanges(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "admin_set_default_project_status" &&
        col("receiver_id") === contracts.lists)
      .filter(col("result_json").isNotNull && trim(col("result_json")) =!= "null")
      .withColumn("a", from_json(col("args_json"), ddl("registration_id BIGINT")))
      .withColumn("p", from_json(col("result_json"), listPayload))
      .filter(coalesce(col("a.registration_id"), col("p.id")).isNotNull)
      .select(Seq(
        coalesce(col("a.registration_id"), col("p.id")).as("on_chain_id"),
        col("p.owner").as("owner"),
        lit(null).cast("array<string>").as("admins"),
        col("p.name").as("name"),
        col("p.description").as("description"),
        col("p.cover_image_url").as("cover_image_url"),
        col("p.admin_only_registrations").as("admin_only_registrations"),
        col("p.default_registration_status").as("default_registration_status"),
        lit(null).cast("timestamp").as("created_at"),
        msTs(col("p.updated_at")).as("updated_at")) ++ seqCols: _*)

  /** handle_list_admin_removal (utils.py:785-805): `owner_remove_admins` on
    * the lists contract removes args.admins from List.admins. Emitted as an
    * array-delta patch row (SilverStore.patchArrayColumn applies it); the
    * Activity row comes from handlerActivities. */
  def listAdminRemovals(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "owner_remove_admins" &&
        col("receiver_id") === contracts.lists)
      .withColumn("a", from_json(col("args_json"),
        ddl("list_id BIGINT, admins ARRAY<STRING>")))
      .filter(col("a.list_id").isNotNull && col("a.admins").isNotNull)
      .select(Seq(
        col("a.list_id").as("on_chain_id"),
        lit(null).cast("array<string>").as("patch_add"),
        col("a.admins").as("patch_remove")) ++ seqCols: _*)

  /** handle_add_nadabot_admin (utils.py:808-817): `owner_add_admins` on a
    * nadabot registry adds args.account_ids to NadabotRegistry.admins
    * (each added account also gets an accounts-table discovery row). */
  def nadabotAdminAdds(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "owner_add_admins" && isNadabot)
      .withColumn("a", from_json(col("args_json"), ddl("account_ids ARRAY<STRING>")))
      .filter(col("a.account_ids").isNotNull)
      .select(Seq(
        col("receiver_id").as("account"),
        col("a.account_ids").as("patch_add"),
        lit(null).cast("array<string>").as("patch_remove")) ++ seqCols: _*)

  /** handle_add_factory_deployers (utils.py:820-828):
    * `admin_add_whitelisted_deployers` on a pot factory adds
    * args.whitelisted_deployers to PotFactory.whitelisted_deployers. */
  def factoryDeployerAdds(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "admin_add_whitelisted_deployers" && isFactory)
      .withColumn("a", from_json(col("args_json"),
        ddl("whitelisted_deployers ARRAY<STRING>")))
      .filter(col("a.whitelisted_deployers").isNotNull)
      .select(Seq(
        col("receiver_id").as("account"),
        col("a.whitelisted_deployers").as("patch_add"),
        lit(null).cast("array<string>").as("patch_remove")) ++ seqCols: _*)

  /** handle_set_factory_configs (utils.py:831-838; trigger
    * handler.py:428-443): the reference re-fetches the factory's
    * get_config over RPC on every admin/owner mutation
    * (pots/models.py:72-105). The engine is no-RPC by design and applies
    * each method's own args instead — every one of these methods sets
    * exactly the field(s) its args carry, so the net row state matches the
    * reference's refreshed config. Scalar setters and whole-array
    * replacements land here as partial LWW rows (nulls backfill from the
    * existing row); incremental owner_add/remove_admins are array deltas
    * and go through [[factoryAdminPatches]]. `owner_clear_admins` emits an
    * EMPTY (non-null) array so the coalescing merge replaces rather than
    * keeps. Arg-name tolerance: admin lists arrive as `admins` or
    * `account_ids` depending on contract version. */

  /** The factory config-setter methods — ONE list shared with
    * SilverStore's per-batch trigger probe, so the filter and the gate
    * can never drift apart (a method present here but not in the gate
    * would be silently dropped). */
  val factoryConfigMethods: Seq[String] = Seq(
    "admin_set_require_whitelist", "admin_set_protocol_config",
    "admin_set_protocol_fee_recipient_account",
    "admin_set_protocol_fee_basis_points",
    "owner_set_admins", "owner_clear_admins")

  /** The pot config-refresh event name — shared with SilverStore's event
    * probe for the same no-drift reason. */
  val potConfigEvent: String = "update_pot_config"
  def factoryConfigUpdates(actions: DataFrame): DataFrame = {
    val m = col("method_name")
    actions
      .filter(isFactory && m.isin(factoryConfigMethods: _*))
      .withColumn("a", from_json(col("args_json"), ddl(
        """require_whitelist BOOLEAN, protocol_fee_basis_points INT,
          |protocol_fee_recipient_account STRING, account_id STRING,
          |admins ARRAY<STRING>, account_ids ARRAY<STRING>""".stripMargin)))
      .select(Seq(
        col("receiver_id").as("account"),
        when(m === "admin_set_require_whitelist", col("a.require_whitelist"))
          .as("require_whitelist"),
        when(m.isin("admin_set_protocol_config", "admin_set_protocol_fee_basis_points"),
          col("a.protocol_fee_basis_points")).as("protocol_fee_basis_points"),
        when(m.isin("admin_set_protocol_config", "admin_set_protocol_fee_recipient_account"),
          coalesce(col("a.protocol_fee_recipient_account"), col("a.account_id")))
          .as("protocol_fee_recipient"),
        when(m === "owner_set_admins", coalesce(col("a.admins"), col("a.account_ids")))
          .when(m === "owner_clear_admins", array().cast("array<string>"))
          .as("admins")) ++ seqCols: _*)
  }

  /** Factory admins M2M deltas (`owner_add_admins` / `owner_remove_admins`
    * on a factory — handler.py:432-443 routes both to the config refresh;
    * the args carry the delta, applied via patchArrayColumn like the other
    * M2M mutations). Disambiguated from the lists/nadabot methods of the
    * same name by the receiver pattern (handler.py's match_* guards). */
  def factoryAdminPatches(actions: DataFrame): DataFrame = {
    def delta(method: String, asAdd: Boolean): DataFrame = {
      val ids = coalesce(col("a.admins"), col("a.account_ids"))
      actions
        .filter(col("method_name") === method && isFactory)
        .withColumn("a", from_json(col("args_json"),
          ddl("admins ARRAY<STRING>, account_ids ARRAY<STRING>")))
        .filter(ids.isNotNull)
        .select(Seq(
          col("receiver_id").as("account"),
          (if (asAdd) ids else lit(null).cast("array<string>")).as("patch_add"),
          (if (asAdd) lit(null).cast("array<string>") else ids).as("patch_remove")) ++ seqCols: _*)
    }
    delta("owner_add_admins", asAdd = true)
      .unionByName(delta("owner_remove_admins", asAdd = false))
  }

  /** Account-discovery rows from a factory config update — the
    * reference's update_configs get_or_creates each admin and the fee
    * recipient account (pots/models.py:72-105; factory owner/admin parity
    * with the pot-side [[potConfigAccounts]]). */
  def factoryConfigAccounts(cfg: DataFrame): DataFrame =
    cfg.select(Seq(explode(concat(
      coalesce(col("admins"), array().cast("array<string>")),
      array(col("protocol_fee_recipient")))).as("id")) ++ seqCols: _*)
      .filter(col("id").isNotNull)

  /** Accounts-table discovery rows for admins/deployers added via array
    * patches (reference aget_or_creates each: utils.py:813-814, 824-825). */
  def patchAccounts(patches: DataFrame): DataFrame =
    patches
      .select(Seq(explode(col("patch_add")).as("id")) ++ seqCols: _*)
      .filter(col("id").isNotNull)

  /** handle_list_upvote (utils.py:631-664). */
  def listUpvotes(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "upvote" &&
        col("receiver_id") === contracts.lists)
      .withColumn("a", from_json(col("args_json"), ddl("list_id BIGINT")))
      .filter(col("a.list_id").isNotNull)
      .select(Seq(
        col("a.list_id").as("list_id"),
        col("signer_id").as("account"),
        col("block_timestamp").as("created_at")) ++ seqCols: _*)

  // ------------------------------------------------------------ social

  /** handle_social_profile_update (utils.py:36-52): `set` on social.near.
    * The profile lives at args.data.<signer>.profile — account ids contain
    * dots, so the JSON path uses bracket syntax. */
  def socialProfileUpdates(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "set" &&
        col("receiver_id") === contracts.social)
      .withColumn("profile_json", call_function("get_json_object", col("args_json"),
        concat(lit("$.data['"), col("signer_id"), lit("'].profile"))))
      .filter(col("profile_json").isNotNull)
      .select(Seq(
        col("signer_id").as("id"),
        col("profile_json").as("near_social_profile_data")) ++ seqCols: _*)

  // ------------------------------------------------------------ nadabot

  /** handle_new_nadabot_registry (utils.py:55-76). */
  def nadabotRegistries(actions: DataFrame): DataFrame =
    actions
      .filter(col("method_name") === "new" && isNadabot)
      .withColumn("p", from_json(col("args_json"), ddl(
        """owner STRING, admins ARRAY<STRING>, default_human_threshold INT,
          |source_metadata STRUCT<commit_hash STRING, link STRING, version STRING>""".stripMargin)))
      .select(Seq(
        col("receiver_id").as("account"),
        coalesce(col("p.owner"), col("signer_id")).as("owner"),
        col("p.default_human_threshold").as("default_human_threshold"),
        col("block_timestamp").as("created_at"),
        col("block_timestamp").as("updated_at"),
        col("p.admins").as("admins"),
        to_json(col("p.source_metadata")).as("source_metadata")) ++ seqCols: _*)

  private def eventRows(events: DataFrame, name: String, elementDdl: String): DataFrame =
    events
      .filter(col("event_name") === name)
      .withColumn("d", explode(from_json(col("event_data"),
        org.apache.spark.sql.types.ArrayType(ddl(elementDdl)))))

  /** handle_new_provider (utils.py:1092-1138; event add_or_update_provider). */
  def providers(events: DataFrame): DataFrame =
    eventRows(events, "add_or_update_provider",
      """provider STRUCT<id BIGINT, contract_id STRING, method_name STRING,
        |provider_name STRING, description STRING, status STRING,
        |admin_notes STRING, default_weight INT, gas BIGINT,
        |tags ARRAY<STRING>, icon_url STRING, external_url STRING,
        |submitted_by STRING, submitted_at_ms BIGINT,
        |stamp_validity_ms BIGINT, account_id_arg_name STRING,
        |custom_args STRING>""".stripMargin)
      .filter(col("d.provider").isNotNull)
      .select(Seq(
        col("d.provider.id").as("on_chain_id"),
        col("receiver_id").as("registry"),
        col("d.provider.contract_id").as("contract"),
        col("d.provider.method_name").as("method_name"),
        col("d.provider.provider_name").as("name"),
        col("d.provider.description").as("description"),
        col("d.provider.status").as("status"),
        col("d.provider.admin_notes").as("admin_notes"),
        col("d.provider.default_weight").as("default_weight"),
        col("d.provider.gas").as("gas"),
        to_json(col("d.provider.tags")).as("tags"),
        col("d.provider.icon_url").as("icon_url"),
        col("d.provider.external_url").as("external_url"),
        col("d.provider.submitted_by").as("submitted_by"),
        msTs(col("d.provider.submitted_at_ms")).as("submitted_at"),
        col("d.provider.stamp_validity_ms").as("stamp_validity_ms"),
        col("d.provider.account_id_arg_name").as("account_id_arg_name"),
        col("d.provider.custom_args").as("custom_args")) ++ seqCols: _*)

  /** handle_add_stamp (utils.py:1141-1157; event add_stamp). */
  def stamps(events: DataFrame): DataFrame =
    eventRows(events, "add_stamp",
      "stamp STRUCT<user_id STRING, provider_id BIGINT, validated_at_ms BIGINT>")
      .filter(col("d.stamp").isNotNull)
      .select(Seq(
        col("d.stamp.user_id").as("user"),
        col("d.stamp.provider_id").as("provider_id"),
        col("receiver_id").as("registry"),
        msTs(col("d.stamp.validated_at_ms")).as("verified_at")) ++ seqCols: _*)

  /** handle_new_group (utils.py:1160-1191; event add_or_update_group).
    * `rule` is either a bare enum string ("Highest") or an enum-with-value
    * object ({"IncreasingReturns": 10}) — utils.py:1164-1172 (F8). */
  def groups(events: DataFrame): DataFrame =
    eventRows(events, "add_or_update_group",
      """group STRUCT<id BIGINT, name STRING, providers ARRAY<BIGINT>,
        |rule STRING, created_at_ms BIGINT, updated_at_ms BIGINT>""".stripMargin)
      .filter(col("d.group").isNotNull)
      .withColumn("rule_map", from_json(col("d.group.rule"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)))
      .select(Seq(
        col("d.group.id").as("on_chain_id"),
        col("receiver_id").as("registry"),
        col("d.group.name").as("name"),
        when(col("rule_map").isNotNull && size(map_keys(col("rule_map"))) > 0,
          element_at(map_keys(col("rule_map")), 1))
          .otherwise(regexp_replace(col("d.group.rule"), "\"", "")).as("rule_type"),
        when(col("rule_map").isNotNull && size(map_keys(col("rule_map"))) > 0,
          element_at(map_values(col("rule_map")), 1)).as("rule_val"),
        col("d.group.providers").as("providers"),
        coalesce(msTs(col("d.group.created_at_ms")), col("block_timestamp")).as("created_at"),
        coalesce(msTs(col("d.group.updated_at_ms")), col("block_timestamp")).as("updated_at")) ++ seqCols: _*)

  /** handle_registry_blacklist_action / unblacklist (utils.py:79-114):
    * explode accounts; unblacklist emits active=false rows that the LWW
    * merge applies as a soft delete. */
  def blacklistActions(events: DataFrame): DataFrame = {
    val bl = eventRows(events, "blacklist_account",
      "accounts ARRAY<STRING>, reason STRING")
      .withColumn("active", lit(true))
    val ubl = eventRows(events, "unblacklist_account",
      "accounts ARRAY<STRING>, reason STRING")
      .withColumn("active", lit(false))
    bl.unionByName(ubl)
      .select(Seq(
        col("receiver_id").as("registry"),
        explode(col("d.accounts")).as("account"),
        col("d.reason").as("reason"),
        col("block_timestamp").as("date_blacklisted"),
        col("active")) ++ seqCols: _*)
  }

  /** handle_update_default_human_threshold (utils.py:1079-1089). */
  def humanThresholdUpdates(events: DataFrame): DataFrame =
    eventRows(events, "update_default_human_threshold",
      "default_human_threshold INT")
      .select(Seq(
        col("receiver_id").as("account"),
        col("d.default_human_threshold").as("default_human_threshold"),
        col("block_timestamp").as("updated_at")) ++ seqCols: _*)
}
