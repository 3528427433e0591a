package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamIngest

/** populatedata-equivalent backfill: snapshots land in silver with the
  * right shapes, re-running is a no-op, and LWW arbitration against the
  * stream follows block height in both directions. */
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
