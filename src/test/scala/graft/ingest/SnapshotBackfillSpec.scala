package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamIngest

/** populatedata-equivalent backfill: snapshots land in silver with the
  * right shapes, re-running is a no-op, and LWW arbitration against the
  * stream follows block height in both directions. */
@org.scalatest.tags.Slow
class SnapshotBackfillSpec extends SparkSpec {
  import Fixtures._

  test("snapshot backfill merges and interleaves with the stream by height") {
    val silverDir = tmpDir("snap-silver")
    val snapDir = tmpDir("snap-json")

    // Snapshot at height 1000: one direct donation (id 5) + one list.
    Files.write(Paths.get(snapDir, "donations.json"),
      ("""{"id": 5, "donor_id": "old.near", "total_amount": "1000000", "ft_id": "near",""" +
        """ "donated_at_ms": 1718000000000, "recipient_id": "p.near", "protocol_fee": "0"}""")
        .getBytes)
    Files.write(Paths.get(snapDir, "lists.json"),
      """{"id": 5, "owner": "owner.near", "name": "SnapList", "description": "d", "admins": ["owner.near"], "admin_only_registrations": false, "default_registration_status": "Approved", "created_at": 1718000000000, "updated_at": 1718000000000}"""
        .getBytes)

    val snapDons = SnapshotBackfill.donations(spark, s"$snapDir/donations.json", 1000)
    val snapLists = SnapshotBackfill.lists(spark, s"$snapDir/lists.json", 1000)
    val n1 = SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "donations" -> (snapDons, SnapshotBackfill.naturalKeys("donations")),
      "lists" -> (snapLists, SnapshotBackfill.naturalKeys("lists")),
      "accounts" -> (SnapshotBackfill.accounts(Seq(
        snapDons -> Seq("donor", "recipient"),
        snapLists -> Seq("owner")), 1000),
        SnapshotBackfill.naturalKeys("accounts")),
      "tokens" -> (SnapshotBackfill.tokens(snapDons, 1000),
        SnapshotBackfill.naturalKeys("tokens"))))
    assert(n1 == Map("donations" -> 1, "lists" -> 1, "accounts" -> 3, "tokens" -> 1))

    // Idempotence: re-running the same backfill changes nothing.
    val n2 = SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "donations" -> (SnapshotBackfill.donations(spark, s"$snapDir/donations.json", 1000),
        SnapshotBackfill.naturalKeys("donations"))))
    assert(n2("donations") == 1)

    // A stream row for the same donation at a LATER height overrides the
    // snapshot (donor corrected), and the snapshot's list row survives.
    val in = tmpDir("snap-bronze")
    Files.write(Paths.get(in, "b.json"),
      block(2000, 2000000000000L, Seq(
        receipt("donate.potlock.near", "donate", "{}",
          resultJson = Some(directDonationResult(5, "new.near", "1000000", "0",
            "p.near", 1718000000000L)),
          receiptId = "rS"))).getBytes)
    StreamIngest.backfill(spark, in, silverDir)

    val silver = new SilverStore(spark, silverDir)
    val d = silver.table("donations").filter(col("on_chain_id") === 5).head()
    assert(d.getAs[String]("donor") == "new.near") // height 2000 > 1000
    assert(silver.table("lists").count() == 1)

    // And an EARLIER-height snapshot does NOT override the stream row.
    Files.write(Paths.get(snapDir, "donations2.json"),
      ("""{"id": 5, "donor_id": "stale.near", "total_amount": "1000000", "ft_id": "near",""" +
        """ "donated_at_ms": 1718000000000, "recipient_id": "p.near", "protocol_fee": "0"}""")
        .getBytes)
    SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "donations" -> (SnapshotBackfill.donations(spark, s"$snapDir/donations2.json", 1500),
        SnapshotBackfill.naturalKeys("donations"))))
    val d2 = silver.table("donations").filter(col("on_chain_id") === 5).head()
    assert(d2.getAs[String]("donor") == "new.near") // stream at 2000 still wins
  }

  test("non-Pending snapshot applications also produce review rows (reviewer = pot owner)") {
    val snapDir = tmpDir("snap-apps")
    Files.write(Paths.get(snapDir, "apps.json"),
      ("""{"project_id": "a.near", "status": "Approved", "message": "m", "submitted_at": 1718000000000, "updated_at": 1718000600000, "review_notes": "ok"}""" + "\n" +
        """{"project_id": "b.near", "status": "Pending", "message": "m2", "submitted_at": 1718000000000}""").getBytes)
    val apps = SnapshotBackfill.potApplications(spark, s"$snapDir/apps.json",
      "pot.x.near", 1000)
    assert(apps.count() == 2)
    val upd = apps.filter(col("applicant") === "a.near").head()
    assert(upd.getAs[java.sql.Timestamp]("updated_at").getTime == 1718000600000L)
    val reviews = SnapshotBackfill.potApplicationReviews(spark,
      s"$snapDir/apps.json", "pot.x.near", "owner.near", 1000)
    val r = reviews.collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("reviewer") == "owner.near")
    assert(r(0).getAs[String]("notes") == "ok")
    assert(r(0).getAs[String]("status") == "Approved")
  }

  test("pot/payout/challenge snapshots backfill and arbitrate with the stream (S4)") {
    val silverDir = tmpDir("snap-pots-silver")
    val snapDir = tmpDir("snap-pots-json")
    val oldPot = "old.v1.potfactory.potlock.near"

    // get_pots × get_config dump: one pre-stream pot, config payouts riding
    // along (populatedata.py:220-334, 476-498)
    Files.write(Paths.get(snapDir, "pots.json"),
      ("""{"account": "old.v1.potfactory.potlock.near", "deployed_by": "dep.near",""" +
        """ "deployed_at_ms": 1717000000000, "owner": "own.near", "admins": ["adm.near"],""" +
        """ "chef": "chef0.near", "pot_name": "OldPot", "pot_description": "d",""" +
        """ "max_projects": 10, "application_start_ms": 1717100000000,""" +
        """ "application_end_ms": 1717200000000, "public_round_start_ms": 1717300000000,""" +
        """ "public_round_end_ms": 1717400000000, "chef_fee_basis_points": 111,""" +
        """ "all_paid_out": false,""" +
        """ "source_metadata": {"commit_hash": "c", "link": "l", "version": "v"},""" +
        """ "payouts": [{"project_id": "p1.near", "amount": "5000", "paid_at": 1717500000000},""" +
        """ {"project_id": "p2.near", "amount": "6000"}]}""").getBytes)
    // get_payouts_challenges dump (populatedata.py:504-547): one answered,
    // one pending
    Files.write(Paths.get(snapDir, "challenges.json"),
      ("""{"challenger_id": "c1.near", "reason": "r1", "created_at": 1717600000000, "admin_notes": "fixed", "resolved": true}""" + "\n" +
        """{"challenger_id": "c2.near", "reason": "r2", "created_at": 1717700000000, "admin_notes": "", "resolved": false}""").getBytes)

    // one parse per dump file, shared across the projections that feed
    // different tables
    val potRaw = SnapshotBackfill.readPotSnapshot(spark, s"$snapDir/pots.json")
    val chRaw = SnapshotBackfill.readChallengeSnapshot(spark, s"$snapDir/challenges.json")
    val snapPots = SnapshotBackfill.pots(potRaw, 1000)
    val n1 = SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "pots" -> (snapPots, SnapshotBackfill.naturalKeys("pots")),
      "pot_payouts" -> (SnapshotBackfill.potPayouts(potRaw, 1000),
        SnapshotBackfill.naturalKeys("pot_payouts")),
      "pot_payout_challenges" -> (SnapshotBackfill.payoutChallenges(
        chRaw, oldPot, 1000),
        SnapshotBackfill.naturalKeys("pot_payout_challenges")),
      "pot_payout_challenge_admin_responses" -> (SnapshotBackfill.challengeAdminResponses(
        chRaw, oldPot, "own.near", 1000),
        SnapshotBackfill.naturalKeys("pot_payout_challenge_admin_responses")),
      "accounts" -> (SnapshotBackfill.accounts(Seq(
        snapPots -> Seq("deployer", "owner", "chef")), 1000),
        SnapshotBackfill.naturalKeys("accounts"))))
    assert(n1("pots") == 1 && n1("pot_payouts") == 2 &&
      n1("pot_payout_challenges") == 2 &&
      n1("pot_payout_challenge_admin_responses") == 1)

    val silver = new SilverStore(spark, silverDir)
    val p = silver.table("pots").head()
    assert(p.getAs[String]("name") == "OldPot")
    assert(p.getAs[String]("pot_factory") == "v1.potfactory.potlock.near")
    assert(p.getAs[Int]("chef_fee_basis_points") == 111)
    assert(p.getAs[java.sql.Timestamp]("deployed_at").getTime == 1717000000000L)
    val po = silver.table("pot_payouts").orderBy("recipient").collect()
    assert(po(0).getAs[String]("recipient") == "p1.near" &&
      po(0).getAs[java.sql.Timestamp]("paid_at") != null)
    assert(po(1).getAs[String]("recipient") == "p2.near" &&
      po(1).isNullAt(po(1).fieldIndex("paid_at")))
    // Python-truthiness filter: empty admin_notes + unresolved → no response
    val resp = silver.table("pot_payout_challenge_admin_responses").collect()
    assert(resp.length == 1 && resp(0).getAs[String]("challenger") == "c1.near" &&
      resp(0).getAs[String]("admin") == "own.near" && resp(0).getAs[Boolean]("resolved"))

    // Idempotence: re-running the same backfill changes nothing.
    val n2 = SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "pot_payouts" -> (SnapshotBackfill.potPayouts(spark, s"$snapDir/pots.json", 1000),
        SnapshotBackfill.naturalKeys("pot_payouts"))))
    assert(n2("pot_payouts") == 2)

    // A stream config update at a LATER height wins over the snapshot…
    val in = tmpDir("snap-pots-bronze")
    Files.write(Paths.get(in, "b.json"),
      block(2000, 2000000000000L, Seq(
        receipt(oldPot, "owner_change_config", "{}",
          resultJson = Some("\"ok\""), receiptId = "rC1", signer = "own.near",
          logs = Seq(potConfigUpdateEventLog("own.near", "streamchef.near",
            "OldPot v2", 222, 1717300000000L, 1717400000000L))))).getBytes)
    StreamIngest.backfill(spark, in, silverDir)
    val p2 = silver.table("pots").head()
    assert(p2.getAs[String]("chef") == "streamchef.near")
    assert(p2.getAs[Int]("chef_fee_basis_points") == 222)
    // …deploy-time fields still survive from the snapshot
    assert(p2.getAs[String]("deployer") == "dep.near")

    // …and an EARLIER-height snapshot does NOT override the stream.
    Files.write(Paths.get(snapDir, "pots2.json"),
      new String(Files.readAllBytes(Paths.get(snapDir, "pots.json")), "UTF-8")
        .replace("chef0.near", "stale.near").getBytes)
    SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "pots" -> (SnapshotBackfill.pots(spark, s"$snapDir/pots2.json", 1500),
        SnapshotBackfill.naturalKeys("pots"))))
    assert(silver.table("pots").head().getAs[String]("chef") == "streamchef.near")
  }

  test("factory get_config snapshot refreshes factory rows (no-RPC update_configs)") {
    val silverDir = tmpDir("snap-factory-silver")
    val snapDir = tmpDir("snap-factory-json")
    // Stream deploys the factory first…
    val in = tmpDir("snap-factory-bronze")
    Files.write(Paths.get(in, "b.json"),
      block(100, 1718000000000000000L, Seq(
        receipt(factoryAccount, "new", factoryNewArgs("fowner.near", Seq("dep1.near")),
          resultJson = Some("\"ok\""), receiptId = "rF1", signer = "fowner.near"))).getBytes)
    StreamIngest.backfill(spark, in, silverDir)
    // …then a later get_config dump refreshes fees and replaces admins.
    Files.write(Paths.get(snapDir, "factory.json"),
      ("""{"account": "v1.potfactory.potlock.near", "owner": "fowner.near",""" +
        """ "admins": ["fa1.near"], "whitelisted_deployers": ["dep1.near", "dep9.near"],""" +
        """ "protocol_fee_basis_points": 333,""" +
        """ "protocol_fee_recipient_account": "fees.near", "require_whitelist": false}""").getBytes)
    SnapshotBackfill.mergeInto(spark, silverDir, Map(
      "pot_factories" -> (SnapshotBackfill.factoryConfig(
        spark, s"$snapDir/factory.json", 2000),
        SnapshotBackfill.naturalKeys("pot_factories"))))
    val f = new SilverStore(spark, silverDir).table("pot_factories").head()
    assert(f.getAs[Int]("protocol_fee_basis_points") == 333)
    assert(f.getAs[String]("protocol_fee_recipient") == "fees.near")
    assert(!f.getAs[Boolean]("require_whitelist"))
    assert(f.getAs[scala.collection.Seq[String]]("admins").toSeq == Seq("fa1.near"))
    assert(f.getAs[scala.collection.Seq[String]]("whitelisted_deployers").toSeq ==
      Seq("dep1.near", "dep9.near"))
    // deploy-time fields survive the config-only dump (coalescing merge)
    assert(f.getAs[java.sql.Timestamp]("deployed_at") != null)
    assert(f.getAs[String]("source_metadata").contains("commit_hash"))
  }

  test("pretty-printed array snapshot parses via multiLine fallback") {
    val snapDir = tmpDir("snap-pretty")
    Files.write(Paths.get(snapDir, "lists.json"),
      """[
        |  {
        |    "id": 9,
        |    "owner": "o.near",
        |    "name": "Pretty",
        |    "admins": ["o.near"],
        |    "created_at": 1718000000000,
        |    "updated_at": 1718000000000
        |  }
        |]""".stripMargin.getBytes)
    val df = SnapshotBackfill.lists(spark, s"$snapDir/lists.json", 1000)
    assert(df.count() == 1)
    assert(df.head().getAs[Long]("on_chain_id") == 9)
  }
}
