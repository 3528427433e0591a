package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamIngest

/** End-to-end ingest: fixture blocks (FIXTURES §1 shapes) → backfill →
  * silver tables, replaying the reference handler scenarios of SURVEY
  * §2.10, including sequential-effect reproduction (later blocks mutate
  * earlier rows) and replay idempotence (FIXTURES §5). */
class IngestSpec extends SparkSpec {
  import Fixtures._

  private def writeBlocks(dir: String, blocks: Seq[String]): Unit =
    Files.write(Paths.get(dir, "blocks.json"),
      blocks.mkString("\n").getBytes("UTF-8"))

  private lazy val silverDir = tmpDir("silver")
  private lazy val silver = new SilverStore(spark, silverDir)

  /** Block timestamps follow height so new fixture blocks never need a
    * hand-computed constant. */
  private def tsOf(h: Long): Long =
    1718000000000000000L + (h - 100) * 100000000000L

  /** The fixture as (height, receipts) so derived facts — e.g. the S2
    * cursor's expected value — come from the list itself and can't go
    * stale when a block is added. */
  private lazy val fixtureBlocks: Seq[(Long, Seq[String])] = Seq(
      // block 99: factory + nadabot registry deploys (patch targets)
      99L -> (Seq(
        receipt(factoryAccount, "new", factoryNewArgs("fowner.near", Seq("dep1.near")),
          resultJson = Some("\"ok\""), receiptId = "rY", signer = "fowner.near"),
        receipt(nadabotAccount, "new", nadabotNewArgs("nowner.near", Seq("nadm.near")),
          resultJson = Some("\"ok\""), receiptId = "rZ", signer = "nowner.near"))),
      // block 100: pot deploy + direct donation (net must be derived)
      100L -> (Seq(
        receipt(potAccount, "new", potNewArgs("owner.near", Seq("a1.near", "a2.near"), "My Pot"),
          resultJson = Some("\"ok\""), receiptId = "rA"),
        // a second pot that receives NO later config updates, so deploy
        // parsing stays assertable after block 108 rewrites mypot's config
        receipt(otherPotAccount, "new", potNewArgs("owner2.near", Seq("b1.near"), "Other Pot"),
          resultJson = Some("\"ok\""), receiptId = "rA2"),
        receipt("donate.potlock.near", "donate", "{}",
          resultJson = Some(directDonationResult(1, "donor1.near", "100000000000000000000000000",
            "2500000000000000000000000", "proj1.near", 1718000000001L)),
          receiptId = "rB"))),
      // block 101: pot donation (matching pool) + list create + batch regs
      101L -> (Seq(
        receipt(potAccount, "donate", "{}",
          resultJson = Some(potDonationResult(7, "donor2.near", "50000000000000000000000000",
            "49000000000000000000000000", "1000000000000000000000000",
            matchingPool = true, projectId = None, donatedAtMs = 1718000100001L)),
          receiptId = "rC"),
        receipt("lists.potlock.near", "create_list", "{}",
          resultJson = Some(listCreateResult(5, "owner.near",
            admins = Seq("owner.near", "helper.near"))), receiptId = "rD"),
        receipt("lists.potlock.near", "register_batch", "{}",
          resultJson = Some(registerBatchResult(5,
            Seq((11, "proj1.near", "Approved"), (12, "proj2.near", "Pending")))),
          receiptId = "rE"))),
      // block 102: application, then status change in block 103 (sequential effect)
      102L -> (Seq(
        receipt(potAccount, "apply", "{}",
          resultJson = Some(applyResult("proj1.near")), receiptId = "rF",
          signer = "proj1.near"))),
      103L -> (Seq(
        receipt(potAccount, "chef_set_application_status",
          """{"project_id": "proj1.near"}""",
          resultJson = Some(
            """{"status": "Approved", "review_notes": "lgtm", "updated_at": 1718000300000}"""),
          receiptId = "rG", signer = "chef.near"),
        // payouts set (pending), then transfer in 104
        receipt(potAccount, "chef_set_payouts",
          """{"payouts": [{"project_id": "proj1.near", "amount": "7000000000000000000000000"}]}""",
          resultJson = Some("\"ok\""), receiptId = "rH", signer = "chef.near"))),
      104L -> (Seq(
        receipt(potAccount, "transfer_payout_callback",
          """{"payout": {"project_id": "proj1.near", "amount": "7000000000000000000000000", "paid_at": 1718000400000}}""",
          resultJson = Some("\"ok\""), receiptId = "rI", signer = "chef.near"),
        receipt("lists.potlock.near", "upvote", """{"list_id": 5}""",
          resultJson = Some("\"ok\""), receiptId = "rJ", signer = "fan.near"),
        // nadabot events via logs
        receipt(nadabotAccount, "whatever", "{}", resultJson = Some("\"ok\""),
          receiptId = "rK", logs = Seq(
            stampEventLog("human1.near", 13),
            groupEventLog(3, "G", "\"Highest\"", Seq(1, 2)),
            groupEventLog(4, "H", """{"IncreasingReturns": 10}""", Seq(2)),
            blacklistEventLog(Seq("bad.near"), "spam"),
            blacklistEventLog(Seq("temp.near"), "oops"),
            // the contract id-13 bug: two distinct providers, same emitted
            // id, plus one well-behaved provider (utils.py:1104-1111)
            providerEventLog(13, "P-first"),
            providerEventLog(13, "P-second"),
            providerEventLog(7, "P-real"))))),
      // block 106: entity-side mutations after creation (§2.10 gap fixes):
      // list default-status change (known + unknown id), list admin
      // removal, nadabot admin add, factory deployer add
      106L -> (Seq(
        receipt("lists.potlock.near", "admin_set_default_project_status",
          """{"registration_id": 5}""",
          resultJson = Some(listStatusChangeResult(5, "owner.near", "L renamed",
            "Pending", 1718000600000L)),
          receiptId = "rL", signer = "owner.near"),
        receipt("lists.potlock.near", "admin_set_default_project_status",
          """{"registration_id": 999}""",
          resultJson = Some(listStatusChangeResult(999, "ghost.near", "Ghost",
            "Pending", 1718000600000L)),
          receiptId = "rM", signer = "ghost.near"),
        receipt("lists.potlock.near", "owner_remove_admins",
          """{"list_id": 5, "admins": ["helper.near"]}""",
          resultJson = Some("\"ok\""), receiptId = "rN", signer = "owner.near"),
        receipt(nadabotAccount, "owner_add_admins",
          """{"account_ids": ["newadmin.near"]}""",
          resultJson = Some("\"ok\""), receiptId = "rO", signer = "nowner.near"),
        receipt(factoryAccount, "admin_add_whitelisted_deployers",
          """{"whitelisted_deployers": ["dep2.near"]}""",
          resultJson = Some("\"ok\""), receiptId = "rP", signer = "fowner.near"))),
      // block 107: a base-row update at a LATER seq than the block-106
      // admin-removal patch, in the same backfill batch — the patched row
      // must still win (regression: patchArrayColumn used to stamp only
      // the patch seq, so this update silently reverted the removal)
      107L -> (Seq(
        receipt("lists.potlock.near", "admin_set_default_project_status",
          """{"registration_id": 5}""",
          resultJson = Some(listStatusChangeResult(5, "owner.near", "L final",
            "Approved", 1718000700000L)),
          receiptId = "rQ", signer = "owner.near"))),
      // block 108: config refresh (§2.10 handle_pot_config_update /
      // handle_set_factory_configs): pot config update via EVENT_JSON on
      // the deployed pot, the same event on an UNDEPLOYED pot (must
      // no-op), factory scalar setter + whole-array admins set
      108L -> (Seq(
        receipt(potAccount, "owner_change_config", "{}",
          resultJson = Some("\"ok\""), receiptId = "rR", signer = "owner.near",
          logs = Seq(potConfigUpdateEventLog("owner.near", "newchef.near",
            "My Pot v2", 321, 1718250000000L, 1718350000000L,
            admins = Seq("a1.near", "a3.near"), allPaidOut = true,
            matchingPoolBalance = "12345"))),
        receipt("ghost.v1.potfactory.potlock.near", "owner_change_config", "{}",
          resultJson = Some("\"ok\""), receiptId = "rS2", signer = "x.near",
          logs = Seq(potConfigUpdateEventLog("x.near", "c.near", "Ghost",
            1, 1718000000000L, 1718000000001L))),
        receipt(factoryAccount, "admin_set_protocol_fee_basis_points",
          """{"protocol_fee_basis_points": 250}""",
          resultJson = Some("\"ok\""), receiptId = "rT", signer = "fowner.near"),
        receipt(factoryAccount, "owner_set_admins",
          """{"admins": ["fadm1.near", "fadm2.near"]}""",
          resultJson = Some("\"ok\""), receiptId = "rU", signer = "fowner.near"))),
      // block 109: factory admin DELTAS on top of the 108 whole-array set,
      // plus a scalar flip — final admins = set ∪ add ∖ remove
      109L -> (Seq(
        receipt(factoryAccount, "owner_add_admins",
          """{"account_ids": ["fadm3.near"]}""",
          resultJson = Some("\"ok\""), receiptId = "rV", signer = "fowner.near"),
        receipt(factoryAccount, "owner_remove_admins",
          """{"admins": ["fadm1.near"]}""",
          resultJson = Some("\"ok\""), receiptId = "rW", signer = "fowner.near"),
        receipt(factoryAccount, "admin_set_require_whitelist",
          """{"require_whitelist": false}""",
          resultJson = Some("\"ok\""), receiptId = "rX", signer = "fowner.near"))),
      // block 110: unblacklist of the block-104 temp.near entry
      // (handle_registry_unblacklist_action, utils.py:104-114)
      110L -> (Seq(
        receipt(nadabotAccount, "whatever", "{}", resultJson = Some("\"ok\""),
          receiptId = "rBL", logs = Seq(
            unblacklistEventLog(Seq("temp.near")))))))

  private lazy val counts: Map[String, Long] = {
    val in = tmpDir("bronze")
    writeBlocks(in, fixtureBlocks.map { case (h, rs) => block(h, tsOf(h), rs) })
    StreamIngest.backfill(spark, in, silverDir)
  }

  test("donations: direct variant derives net amount (F2 invariant)") {
    counts
    // the synthetic partition column must not leak to readers
    assert(!silver.table("donations").columns.contains("__pdate"))
    assert(!silver.table("activities").columns.contains("__pbucket"))
    val d = silver.table("donations").filter(col("pot").isNull).head()
    assert(d.getAs[Long]("on_chain_id") == 1)
    // net = total - protocol (referrer/chef absent) — utils.py:875-884
    assert(d.getAs[java.math.BigDecimal]("net_amount_dec").toBigInteger.toString ==
      "97500000000000000000000000")
    assert(d.getAs[String]("ft") == "near")
    assert(d.getAs[String]("recipient") == "proj1.near")
  }

  test("donations: pot variant keeps provided net, matching pool flag") {
    counts
    val d = silver.table("donations").filter(col("pot").isNotNull).head()
    assert(d.getAs[String]("pot") == potAccount)
    assert(d.getAs[Boolean]("matching_pool"))
    assert(d.getAs[java.math.BigDecimal]("net_amount_dec").toBigInteger.toString ==
      "49000000000000000000000000")
  }

  test("accounts discovered from donation references (J8)") {
    counts
    val ids = silver.table("accounts").select("id").collect().map(_.getString(0)).toSet
    assert(Set("donor1.near", "donor2.near", "proj1.near", "near", potAccount)
      .subsetOf(ids))
  }

  test("pot deploy parsed (§2.10 handle_new_pot)") {
    counts
    val p = silver.table("pots").filter(col("account") === otherPotAccount).head()
    assert(p.getAs[String]("owner") == "owner2.near")
    assert(p.getAs[scala.collection.Seq[String]]("admins").toSeq == Seq("b1.near"))
    assert(p.getAs[String]("name") == "Other Pot")
    assert(p.getAs[Int]("chef_fee_basis_points") == 200)
  }

  test("pot config update event refreshes config, keeps deploy fields (utils.py:219-282)") {
    counts
    val p = silver.table("pots").filter(col("account") === potAccount).head()
    // config fields overwritten from the event payload
    assert(p.getAs[String]("chef") == "newchef.near")
    assert(p.getAs[String]("name") == "My Pot v2")
    assert(p.getAs[Int]("chef_fee_basis_points") == 321)
    assert(p.getAs[scala.collection.Seq[String]]("admins").toSeq == Seq("a1.near", "a3.near"))
    assert(p.getAs[java.sql.Timestamp]("matching_round_start").getTime == 1718250000000L)
    assert(p.getAs[java.sql.Timestamp]("matching_round_end").getTime == 1718350000000L)
    assert(p.getAs[Boolean]("all_paid_out"))
    assert(p.getAs[String]("matching_pool_balance") == "12345")
    // deploy-time fields survive (update_configs never touches them)
    assert(p.getAs[String]("deployer") == "user.near")
    assert(p.getAs[java.sql.Timestamp]("deployed_at") != null)
    assert(p.getAs[String]("source_metadata").contains("commit_hash"))
    // the same event on an undeployed pot must not create a row
    // (reference afirst() no-op, utils.py:224-227)
    assert(silver.table("pots")
      .filter(col("account") === "ghost.v1.potfactory.potlock.near").count() == 0)
    // chef discovered as an account (pots/models.py:344-346)
    assert(silver.table("accounts").filter(col("id") === "newchef.near").count() == 1)
    // and the query plane serves the refreshed config (GET /v1/pots/{id})
    val qs = new graft.queries.QueryService(silver.table(_))
    val pd = qs.potDetail(potAccount).head()
    assert(pd.getAs[org.apache.spark.sql.Row]("chef").getAs[String]("id") == "newchef.near")
    assert(pd.getAs[Int]("chef_fee_basis_points") == 321)
    assert(pd.getAs[java.sql.Timestamp]("matching_round_end").getTime == 1718350000000L)
  }

  test("factory admin/owner methods refresh factory config (utils.py:831-838)") {
    counts
    val f = silver.table("pot_factories")
      .filter(col("account") === factoryAccount).head()
    // scalar setters applied from each method's args
    assert(f.getAs[Int]("protocol_fee_basis_points") == 250)
    assert(!f.getAs[Boolean]("require_whitelist"))
    // whole-array set at 108, then add/remove deltas at 109
    assert(f.getAs[scala.collection.Seq[String]]("admins").toSeq ==
      Seq("fadm2.near", "fadm3.near"))
    // untouched fields survive the partial updates
    assert(f.getAs[String]("owner") == "fowner.near")
    assert(f.getAs[String]("protocol_fee_recipient") == "fowner.near")
    assert(f.getAs[scala.collection.Seq[String]]("whitelisted_deployers").toSeq ==
      Seq("dep1.near", "dep2.near"))
    // account discovery parity with the reference's update_configs
    // (pots/models.py:72-105): BOTH the whole-array owner_set_admins
    // admins (fadm1/fadm2, block 108) and the delta-added admin (fadm3,
    // block 109) get accounts rows — the whole-array path used to
    // produce none
    assert(silver.table("accounts")
      .filter(col("id").isin("fadm1.near", "fadm2.near", "fadm3.near"))
      .count() == 3)
  }

  test("application status updated by later review (sequential effect §7.4-2)") {
    counts
    val app = silver.table("pot_applications")
      .filter(col("applicant") === "proj1.near").head()
    assert(app.getAs[String]("status") == "Approved")
    // submitted_at survives the partial update (coalesce semantics)
    assert(app.getAs[java.sql.Timestamp]("submitted_at") != null)
    assert(silver.table("pot_application_reviews").count() == 1)
  }

  test("payout transfer fills paid_at while amount survives (S7 partial update)") {
    counts
    val po = silver.table("pot_payouts").head()
    assert(po.getAs[String]("amount") == "7000000000000000000000000")
    assert(po.getAs[java.sql.Timestamp]("paid_at") != null)
  }

  test("lists, registrations, upvotes") {
    counts
    assert(silver.table("lists").head().getAs[Long]("on_chain_id") == 5)
    val regs = silver.table("list_registrations")
    assert(regs.count() == 2)
    assert(regs.filter(col("status") === "Approved").count() == 1)
    val uv = silver.table("list_upvotes").head()
    assert(uv.getAs[String]("account") == "fan.near")
  }

  test("nadabot events: stamps, groups (rule enum-with-value), blacklist") {
    counts
    assert(silver.table("nadabot_stamps").head().getAs[Long]("provider_id") == 13)
    val gs = silver.table("nadabot_groups").orderBy("on_chain_id").collect()
    assert(gs(0).getAs[String]("rule_type") == "Highest")
    assert(gs(0).isNullAt(gs(0).fieldIndex("rule_val")))
    assert(gs(1).getAs[String]("rule_type") == "IncreasingReturns")
    assert(gs(1).getAs[Int]("rule_val") == 10)
    val bl = silver.table("nadabot_blacklist")
      .filter(col("account") === "bad.near").head()
    assert(bl.getAs[Boolean]("active"))
  }

  test("unblacklist: query surface matches the reference's hard delete") {
    counts
    // The reference DELETES the BlackList row (utils.py:104-114); the
    // engine soft-deletes via LWW (active=false) and exposes the
    // reference-equivalent state through the tombstone-aware reader.
    // temp.near was blacklisted in block 104 and unblacklisted in 110.
    val all = silver.table("nadabot_blacklist")
    val temp = all.filter(col("account") === "temp.near").head()
    assert(!temp.getAs[Boolean]("active")) // audit row retained, inactive
    val active = silver.activeBlacklist().select("account")
      .collect().map(_.getString(0)).toSet
    assert(active == Set("bad.near")) // what the reference DB would contain
  }

  test("block_height cursor parity row (S2)") {
    counts
    val bh = silver.table("block_height").head()
    // derived from the fixture itself: the cursor tracks the top ingested
    // block, whatever the fixture's current top is
    assert(bh.getAs[Long]("block_height") == fixtureBlocks.map(_._1).max)
  }

  test("activities typed from donations and handlers (§2.10)") {
    counts
    val types = silver.table("activities").select("type").collect().map(_.getString(0)).toSet
    assert(types == Set(
      "Donate_Direct", "Donate_Pot_Matching_Pool",
      "Deploy_Pot", "Submit_Application", "Register_Batch", "Upvote",
      "Process_Payouts", "Remove_List_Admin"))
  }

  test("list status change rewrites fields, keeps untouched ones (utils.py:598-628)") {
    counts
    val lists = silver.table("lists")
    // the unknown-id update (registration_id 999) must NOT create a row
    assert(lists.count() == 1)
    val l = lists.head()
    assert(l.getAs[String]("name") == "L final")
    assert(l.getAs[String]("default_registration_status") == "Approved")
    assert(l.getAs[Boolean]("admin_only_registrations"))
    // absent description keeps the created value; created_at survives
    assert(l.getAs[String]("description") == "D")
    assert(l.getAs[java.sql.Timestamp]("created_at") != null)
  }

  test("list admin removal mutates List.admins (utils.py:785-805)") {
    counts
    val l = silver.table("lists").head()
    assert(l.getAs[scala.collection.Seq[String]]("admins").toSeq == Seq("owner.near"))
  }

  test("nadabot admin add mutates registry admins + discovers account (utils.py:808-817)") {
    counts
    val r = silver.table("nadabot_registries")
      .filter(col("account") === nadabotAccount).head()
    assert(r.getAs[scala.collection.Seq[String]]("admins").toSeq ==
      Seq("nadm.near", "newadmin.near"))
    assert(silver.table("accounts").filter(col("id") === "newadmin.near").count() == 1)
  }

  test("factory deployer add mutates whitelisted_deployers (utils.py:820-828)") {
    counts
    val f = silver.table("pot_factories")
      .filter(col("account") === factoryAccount).head()
    assert(f.getAs[scala.collection.Seq[String]]("whitelisted_deployers").toSeq ==
      Seq("dep1.near", "dep2.near"))
    assert(silver.table("accounts").filter(col("id") === "dep2.near").count() == 1)
  }

  test("provider id-13 rewrite: sequential ids, genuine ids untouched (utils.py:1104-1111)") {
    counts
    val ps = silver.table("nadabot_providers")
      .select("on_chain_id", "name", "id_rewritten").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("on_chain_id"),
        r.getAs[Boolean]("id_rewritten"))).toSet
    assert(ps == Set(("P-first", 1L, true), ("P-second", 2L, true),
      ("P-real", 7L, false)))
  }

  test("provider id-13 rewrite is replay-idempotent (same identity reuses its id)") {
    counts
    val in5 = tmpDir("bronze5")
    writeBlocks(in5, Seq(block(104, 1718000400000000000L, Seq(
      receipt(nadabotAccount, "whatever", "{}", resultJson = Some("\"ok\""),
        receiptId = "rK", logs = Seq(
          providerEventLog(13, "P-first"),
          providerEventLog(13, "P-second")))))))
    StreamIngest.backfill(spark, in5, silverDir)
    val ps = silver.table("nadabot_providers")
      .filter(col("id_rewritten"))
      .select("on_chain_id", "name").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("on_chain_id"))).toSet
    assert(ps == Set(("P-first", 1L), ("P-second", 2L)))
  }

  test("array patches are replay-idempotent (FIXTURES §5)") {
    counts
    val in4 = tmpDir("bronze4")
    writeBlocks(in4, Seq(block(106, 1718000600000000000L, Seq(
      receipt("lists.potlock.near", "owner_remove_admins",
        """{"list_id": 5, "admins": ["helper.near"]}""",
        resultJson = Some("\"ok\""), receiptId = "rN", signer = "owner.near"),
      receipt(nadabotAccount, "owner_add_admins",
        """{"account_ids": ["newadmin.near"]}""",
        resultJson = Some("\"ok\""), receiptId = "rO", signer = "nowner.near")))))
    StreamIngest.backfill(spark, in4, silverDir)
    assert(silver.table("lists").head()
      .getAs[scala.collection.Seq[String]]("admins").toSeq == Seq("owner.near"))
    assert(silver.table("nadabot_registries")
      .filter(col("account") === nadabotAccount).head()
      .getAs[scala.collection.Seq[String]]("admins").toSeq ==
      Seq("nadm.near", "newadmin.near"))
  }

  test("malformed payloads land in quarantine, not silently dropped (§2.9)") {
    counts
    val in3 = tmpDir("bronze3")
    val badReceipt =
      s"""{"receipt": {"receipt_id": "qbad", "receiver_id": "donate.potlock.near",
         | "predecessor_id": "x.near", "receipt": {"Action": {"signer_id": "x.near",
         | "actions": [{"FunctionCall": {"method_name": "donate", "args": "!!!"}}]}}},
         | "execution_outcome": {"outcome": {"status": {"SuccessValue": "${b64("{\"truncated\"")}"},
         | "logs": []}}}""".stripMargin.replace("\n", " ")
    writeBlocks(in3, Seq(block(105, 1718000500000000000L, Seq(badReceipt))))
    StreamIngest.backfill(spark, in3, silverDir)
    val q = silver.table("quarantine").filter(col("receipt_id") === "qbad")
    assert(q.count() == 1)
  }

  test("replay idempotence: re-applying all blocks changes nothing (FIXTURES §5)") {
    val before = counts
    val in2 = tmpDir("bronze2")
    // replay only block 101 (subset replay, as after a checkpoint restart)
    writeBlocks(in2, Seq(block(101, 1718000100000000000L, Seq(
      receipt(potAccount, "donate", "{}",
        resultJson = Some(potDonationResult(7, "donor2.near", "50000000000000000000000000",
          "49000000000000000000000000", "1000000000000000000000000",
          matchingPool = true, projectId = None, donatedAtMs = 1718000100001L)),
        receiptId = "rC")))))
    val after = StreamIngest.backfill(spark, in2, silverDir)
    assert(after("donations") == before("donations"))
    assert(silver.table("donations").count() == before("donations"))
  }

  // Declared LAST: this batch mutates state earlier tests assert on.
  test("config refresh against EXISTING tables in a later batch (swap-race regression)") {
    counts
    // A batch that (a) semi-joins potCfg/factoryCfg against the existing
    // pots/pot_factories tables AND (b) merge-swaps those same tables,
    // with (c) a phase-2 admin patch executing the factoryCfg plan after
    // the swap. Before the eager localCheckpoint, the patch phase replayed
    // the pre-swap file listing of pot_factories → FileNotFoundException.
    val in6 = tmpDir("bronze6")
    writeBlocks(in6, Seq(block(110, tsOf(110), Seq(
      receipt(potAccount, "owner_change_config", "{}",
        resultJson = Some("\"ok\""), receiptId = "rY2", signer = "owner.near",
        logs = Seq(potConfigUpdateEventLog("owner.near", "chef3.near",
          "My Pot v3", 333, 1718260000000L, 1718360000000L,
          admins = Seq("a1.near")))),
      receipt(factoryAccount, "owner_set_admins",
        """{"admins": ["fadm9.near"]}""",
        resultJson = Some("\"ok\""), receiptId = "rY3", signer = "fowner.near"),
      receipt(factoryAccount, "owner_add_admins",
        """{"account_ids": ["fadm10.near"]}""",
        resultJson = Some("\"ok\""), receiptId = "rY4", signer = "fowner.near")))))
    StreamIngest.backfill(spark, in6, silverDir)
    val p = silver.table("pots").filter(col("account") === potAccount).head()
    assert(p.getAs[String]("chef") == "chef3.near")
    assert(p.getAs[Int]("chef_fee_basis_points") == 333)
    val f = silver.table("pot_factories")
      .filter(col("account") === factoryAccount).head()
    assert(f.getAs[scala.collection.Seq[String]]("admins").toSeq ==
      Seq("fadm9.near", "fadm10.near"))
    // chains dimension seeded on the FIRST batch, untouched afterwards
    val c = silver.table("chains").collect()
    assert(c.length == 1 && c(0).getAs[String]("name") == "NEAR")
  }

  test("updates for unknown entities no-op, never insert skeleton rows") {
    // Reference semantics: handle_pot_application_status_change afirst()s
    // the application and returns on None (utils.py:561-569);
    // handle_list_registration_update's filter(id=…).aupdate() matches
    // nothing for an unknown id (utils.py:469). A stream started
    // mid-history must not materialize half-null rows from these.
    val dir = tmpDir("unknown-updates")
    val in = tmpDir("unknown-updates-in")
    writeBlocks(in, Seq(block(900, tsOf(900), Seq(
      receipt(potAccount, "chef_set_application_status",
        """{"project_id": "ghost.near"}""",
        resultJson = Some(
          """{"status": "Approved", "review_notes": "x", "updated_at": 1718000300000}"""),
        receiptId = "rZ1", signer = "chef.near"),
      receipt("lists.potlock.near", "update_registration",
        """{"registration_id": 999, "status": "Approved"}""",
        resultJson = Some("null"), receiptId = "rZ2", signer = "adm.near")))))
    StreamIngest.backfill(spark, in, dir)
    val s = new SilverStore(spark, dir)
    assert(s.table("pot_applications")
      .filter(col("applicant") === "ghost.near").count() == 0)
    assert(s.table("list_registrations")
      .filter(col("on_chain_id") === 999).count() == 0)
    assert(s.table("pot_applications").count() == 0)
  }
}
