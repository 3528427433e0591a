package graft.ingest

import java.util.Base64

/** Block-message fixture builders following FIXTURES.md §1 (shapes mined
  * from reference indexer_app/examples.txt and utils.py handlers). */
object Fixtures {

  def b64(s: String): String = Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  /** One receipt-execution outcome with a single FunctionCall. */
  def receipt(
      receiver: String,
      method: String,
      argsJson: String,
      resultJson: Option[String],
      signer: String = "user.near",
      receiptId: String = "r1",
      logs: Seq[String] = Nil): String = {
    val status = resultJson match {
      case Some(r) => s"""{"SuccessValue": "${b64(r)}"}"""
      case None => s"""{"SuccessReceiptId": "srid"}"""
    }
    val logsJson = logs.map(l => "\"" + l.replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
    s"""{
       |  "receipt": {
       |    "receipt_id": "$receiptId",
       |    "receiver_id": "$receiver",
       |    "predecessor_id": "$signer",
       |    "receipt": {"Action": {"signer_id": "$signer",
       |      "actions": [{"FunctionCall": {"method_name": "$method", "args": "${b64(argsJson)}"}}]}}
       |  },
       |  "execution_outcome": {"outcome": {"status": $status, "logs": $logsJson}}
       |}""".stripMargin
  }

  /** A block message (one shard) — single line JSON for spark.read.json. */
  def block(height: Long, tsNs: Long, receipts: Seq[String]): String =
    s"""{"block": {"header": {"height": $height, "timestamp": $tsNs}},
       | "shards": [{"shard_id": 0, "receipt_execution_outcomes": [${receipts.mkString(",")}]}]}"""
      .stripMargin.replace("\n", " ")

  // ------------------------------------------------- canonical payloads

  /** Pot-variant DonationExternal (examples.txt:3-33). */
  def potDonationResult(id: Long, donor: String, total: String,
      net: String, protocolFee: String, matchingPool: Boolean,
      projectId: Option[String], donatedAtMs: Long,
      referrer: Option[String] = None, referrerFee: Option[String] = None): String = {
    val proj = projectId.map(p => s""""project_id": "$p",""").getOrElse("\"project_id\": null,")
    val ref = referrer.map(r => s""""referrer_id": "$r",""").getOrElse("")
    val refFee = referrerFee.map(f => s""""referrer_fee": "$f",""").getOrElse("")
    s"""{"id": $id, "donor_id": "$donor", "total_amount": "$total",
       | "net_amount": "$net", "message": "gm", "donated_at": $donatedAtMs,
       | $proj $ref $refFee
       | "protocol_fee": "$protocolFee", "matching_pool": $matchingPool}"""
      .stripMargin.replace("\n", " ")
  }

  /** Direct-variant DonationExternal (examples.txt:35-56): no net_amount /
    * matching_pool, has ft_id + recipient_id + donated_at_ms. */
  def directDonationResult(id: Long, donor: String, total: String,
      protocolFee: String, recipient: String, donatedAtMs: Long,
      ft: String = "near"): String =
    s"""{"id": $id, "donor_id": "$donor", "total_amount": "$total",
       | "ft_id": "$ft", "message": null, "donated_at_ms": $donatedAtMs,
       | "recipient_id": "$recipient",
       | "protocol_fee": "$protocolFee"}""".stripMargin.replace(" \n", " ").replace("\n", " ")

  val potAccount = "mypot.v1.potfactory.potlock.near"
  val otherPotAccount = "otherpot.v1.potfactory.potlock.near"
  val factoryAccount = "v1.potfactory.potlock.near"
  val nadabotAccount = "v1.nadabot.near"

  def potNewArgs(owner: String, admins: Seq[String], name: String): String =
    s"""{"owner": "$owner", "admins": [${admins.map("\"" + _ + "\"").mkString(",")}],
       | "chef": "chef.near", "pot_name": "$name", "pot_description": "d",
       | "max_projects": 25, "application_start_ms": 1718000000000,
       | "application_end_ms": 1718100000000, "public_round_start_ms": 1718200000000,
       | "public_round_end_ms": 1718300000000, "referral_fee_matching_pool_basis_points": 100,
       | "referral_fee_public_round_basis_points": 50, "chef_fee_basis_points": 200,
       | "source_metadata": {"link": "l", "version": "v", "commit_hash": "c"}}"""
      .stripMargin.replace("\n", " ")

  def listCreateResult(id: Long, owner: String,
      admins: Seq[String] = Nil): String = {
    val adminList = (if (admins.isEmpty) Seq(owner) else admins)
      .map("\"" + _ + "\"").mkString(",")
    s"""{"id": $id, "owner": "$owner", "name": "L", "description": "D",
       | "cover_image_url": null, "admin_only_registrations": false,
       | "default_registration_status": "Approved",
       | "admins": [$adminList], "created_at": 1718000000000, "updated_at": 1718000000000}"""
      .stripMargin.replace("\n", " ")
  }

  /** Updated-List SuccessValue for admin_set_default_project_status
    * (utils.py:598-628); description/cover_image_url intentionally absent
    * to exercise the keep-old-value path. */
  def listStatusChangeResult(id: Long, owner: String, name: String,
      status: String, updatedAtMs: Long): String =
    s"""{"id": $id, "owner": "$owner", "name": "$name",
       | "admin_only_registrations": true,
       | "default_registration_status": "$status",
       | "admins": ["$owner"], "updated_at": $updatedAtMs}"""
      .stripMargin.replace("\n", " ")

  def nadabotNewArgs(owner: String, admins: Seq[String]): String =
    s"""{"owner": "$owner", "admins": [${admins.map("\"" + _ + "\"").mkString(",")}],
       | "default_human_threshold": 20,
       | "source_metadata": {"link": "l", "version": "v", "commit_hash": "c"}}"""
      .stripMargin.replace("\n", " ")

  def factoryNewArgs(owner: String, deployers: Seq[String]): String =
    s"""{"owner": "$owner", "admins": ["$owner"], "protocol_fee_basis_points": 200,
       | "protocol_fee_recipient_account": "$owner",
       | "whitelisted_deployers": [${deployers.map("\"" + _ + "\"").mkString(",")}],
       | "require_whitelist": true,
       | "source_metadata": {"link": "l", "version": "v", "commit_hash": "c"}}"""
      .stripMargin.replace("\n", " ")

  def registerBatchResult(listId: Long, regs: Seq[(Long, String, String)]): String =
    regs.map { case (id, registrant, status) =>
      s"""{"id": $id, "registrant_id": "$registrant", "list_id": $listId,
         | "status": "$status", "submitted_ms": 1718000001000,
         | "updated_ms": 1718000001000, "registered_by": "$registrant"}"""
        .stripMargin.replace("\n", " ")
    }.mkString("[", ",", "]")

  def applyResult(projectId: String): String =
    s"""{"project_id": "$projectId", "message": "pick me", "status": "Pending",
       | "submitted_at": 1718000002000}""".stripMargin.replace("\n", " ")

  def stampEventLog(user: String, providerId: Long): String =
    s"""EVENT_JSON:{"standard":"nadabot","version":"1.0.0","event":"add_stamp",""" +
      s""""data":[{"stamp":{"user_id":"$user","provider_id":$providerId,"validated_at_ms":1718000003000}}]}"""

  def groupEventLog(id: Long, name: String, rule: String, providers: Seq[Long]): String =
    s"""EVENT_JSON:{"standard":"nadabot","version":"1.0.0","event":"add_or_update_group",""" +
      s""""data":[{"group":{"id":$id,"name":"$name","providers":[${providers.mkString(",")}],"rule":$rule}}]}"""

  def providerEventLog(id: Long, name: String): String =
    s"""EVENT_JSON:{"standard":"nadabot","version":"1.0.0","event":"add_or_update_provider",""" +
      s""""data":[{"provider":{"id":$id,"contract_id":"c.near","method_name":"is_human",""" +
      s""""provider_name":"$name","status":"Active","default_weight":20,""" +
      s""""submitted_by":"sub.near","submitted_at_ms":1718000003000}}]}"""

  /** `update_pot_config` EVENT_JSON (trigger handler.py:105-108): the data
    * element carries the pot's full updated get_config shape
    * (utils.py:229-276 field map). */
  def potConfigUpdateEventLog(owner: String, chef: String, name: String,
      chefFeeBps: Int, roundStartMs: Long, roundEndMs: Long,
      admins: Seq[String] = Nil, allPaidOut: Boolean = false,
      matchingPoolBalance: String = "0"): String =
    s"""EVENT_JSON:{"standard":"potlock","version":"1.0.0","event":"update_pot_config",""" +
      s""""data":[{"owner":"$owner","admins":[${admins.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""chef":"$chef","pot_name":"$name","pot_description":"d2","max_projects":30,""" +
      s""""base_currency":"near","application_start_ms":1718000000000,""" +
      s""""application_end_ms":1718100000000,"public_round_start_ms":$roundStartMs,""" +
      s""""public_round_end_ms":$roundEndMs,"referral_fee_matching_pool_basis_points":100,""" +
      s""""referral_fee_public_round_basis_points":50,"chef_fee_basis_points":$chefFeeBps,""" +
      s""""matching_pool_balance":"$matchingPoolBalance","total_public_donations":"0",""" +
      s""""public_donations_count":0,"all_paid_out":$allPaidOut}]}"""

  def blacklistEventLog(accounts: Seq[String], reason: String): String =
    s"""EVENT_JSON:{"standard":"nadabot","version":"1.0.0","event":"blacklist_account",""" +
      s""""data":[{"accounts":[${accounts.map("\"" + _ + "\"").mkString(",")}],"reason":"$reason"}]}"""

  def unblacklistEventLog(accounts: Seq[String]): String =
    s"""EVENT_JSON:{"standard":"nadabot","version":"1.0.0","event":"unblacklist_account",""" +
      s""""data":[{"accounts":[${accounts.map("\"" + _ + "\"").mkString(",")}]}]}"""
}
