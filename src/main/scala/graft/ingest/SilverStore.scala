package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeWriter

/** The silver entity store: applies one (micro-)batch of block messages to
  * the entity tables via the LWW merge writer. This is the single body
  * shared by the batch backfill path (S3: `spark.read` over a block range)
  * and the streaming path (S1/S2: `foreachBatch`), exactly the SURVEY §7.1
  * architecture.
  *
  * Natural keys per entity come from the reference's unique constraints
  * (FIXTURES §5): replaying a block is a no-op by construction.
  */
object SilverStore {
  /** Natural keys per entity (the reference's unique constraints,
    * FIXTURES §5) — shared by the streaming merge and SnapshotBackfill so
    * the two write paths can never drift onto different keys. */
  val naturalKeys: Map[String, Seq[String]] = Map(
    "donations" -> Seq("on_chain_id", "pot"),
    "accounts" -> Seq("id"),
    "lists" -> Seq("on_chain_id"),
    "list_registrations" -> Seq("on_chain_id"),
    "pot_applications" -> Seq("pot", "applicant"),
    "pot_application_reviews" -> Seq("pot", "applicant", "reviewer", "reviewed_at"),
    "pot_payouts" -> Seq("pot", "recipient"),
    "tokens" -> Seq("account"))
}

final class SilverStore(spark: SparkSession, dir: String) {
  import SilverStore.naturalKeys

  private val seq = Seq("block_height", "shard_index", "receipt_index", "action_index")
  def path(name: String): String = s"$dir/$name"

  def table(name: String): DataFrame = spark.read.parquet(path(name))
  def exists(name: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path(name)))

  /** Apply add/remove deltas to an array column — the engine's form of the
    * reference's M2M `aadd`/`remove` (utils.py:785-805, 808-817, 820-828),
    * which LWW row-replace cannot express. `patches` rows carry the entity
    * key, `patch_add`/`patch_remove` string arrays, and the ingest seq.
    *
    * Mechanics: fold all patches per key in seq order (broadcast — patch
    * sets are event-sized, never table-sized), inner-join the CURRENT table
    * row (a patch for a nonexistent key is dropped, as the reference's
    * aget() failure no-ops the handler), and LWW-merge the updated full
    * rows back carrying the last patch's seq. Replay-idempotent: re-adding
    * a present element and re-removing an absent one are set no-ops.
    * Returns the merged table count when patches applied. */
  private def patchArrayColumn(name: String, keys: Seq[String],
      arrayCol: String, patches: DataFrame): Option[Long] = {
    if (!exists(name) || patches.isEmpty) return None
    val emptyArr = array().cast("array<string>")
    val folded = patches
      .groupBy(keys.map(col): _*)
      .agg(
        sort_array(collect_list(struct(
          struct(seq.map(col): _*).as("k"),
          col("patch_add").as("add"),
          col("patch_remove").as("rm")))).as("__patches"),
        max(struct(seq.map(col): _*)).as("__seq"))
    val patched = table(name)
      .drop(seq: _*)
      .join(broadcast(folded), keys, "inner")
      .withColumn(arrayCol,
        aggregate(col("__patches"), coalesce(col(arrayCol), emptyArr),
          (acc, p) => array_except(
            array_union(acc, coalesce(p.getField("add"), emptyArr)),
            coalesce(p.getField("rm"), emptyArr))))
    val withSeq = seq.foldLeft(patched)((df, c) => df.withColumn(c, col(s"__seq.$c")))
      .drop("__patches", "__seq")
    Some(MergeWriter.merge(spark, withSeq, path(name), keys, seq))
  }

  /** Apply one batch of raw block messages (bronze) to every silver table.
    * Returns per-entity merged row counts. */
  def applyBatch(blocks: DataFrame): Map[String, Long] = {
    import EntityTransforms._
    val receipts = BlockIngest.receipts(blocks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val acts = BlockIngest.actions(receipts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evts = BlockIngest.events(receipts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      val dons = donations(acts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val reviews = applicationReviews(acts)

      val counts = scala.collection.mutable.Map[String, Long]()
      def lww(name: String, df: DataFrame, keys: Seq[String],
          seqCols: Seq[String] = seq): Unit =
        counts(name) = MergeWriter.merge(spark, df, path(name), keys, seqCols)
      def first(name: String, df: DataFrame, keys: Seq[String]): Unit =
        counts(name) = MergeWriter.insertIgnoreConflicts(spark, df, path(name), keys, seq)

      lww("donations", dons.drop("__receiver"), naturalKeys("donations"))
      // Accounts: discovery rows (id only) + social-profile updates merge
      // into one table; coalesce keeps the profile across later discovery
      // rows (reference stores the profile ON Account, accounts/models.py:57-62).
      lww("accounts",
        donationAccounts(dons)
          .unionByName(patchAccounts(nadabotAdminAdds(acts)))
          .unionByName(patchAccounts(factoryDeployerAdds(acts)))
          .withColumn("near_social_profile_data", lit(null).cast("string"))
          .unionByName(socialProfileUpdates(acts)),
        naturalKeys("accounts"))
      // Reference semantics: aupdate_or_create on (action_result, type) —
      // a repeated key UPDATES signer/timestamp/tx_hash (last writer wins).
      lww("activities",
        donationActivities(acts).unionByName(handlerActivities(acts)),
        Seq("type", "action_result"))
      // Token stubs from first sight of an ft reference (the reference
      // creates Token rows on first donation and enriches metadata via RPC
      // later — utils.py:917-943; metadata refresh stays out-of-engine).
      first("tokens",
        dons.select(col("ft").as("account"),
          lit(null).cast("string").as("name"),
          lit(null).cast("string").as("symbol"),
          lit(null).cast("string").as("icon"),
          when(col("ft") === "near", lit(24)).cast("int").as("decimals"),
          lit(null).cast("string").as("coingecko_id"),
          col("block_height"), col("shard_index"), col("receipt_index"),
          col("action_index"))
          .filter(col("account").isNotNull),
        naturalKeys("tokens"))
      lww("pots", potDeploys(acts), Seq("account"))
      lww("pot_factories", potFactories(acts), Seq("account"))
      lww("pot_applications",
        potApplications(acts).unionByName(applicationStatusUpdates(reviews)),
        naturalKeys("pot_applications"))
      first("pot_application_reviews", reviews,
        naturalKeys("pot_application_reviews"))
      // Keyed (pot, recipient): a transfer updates the matching set-payout
      // row in place (utils.py:719-721 aupdate on recipient); seq extended
      // with payout_index for within-action determinism.
      lww("pot_payouts", payoutsSet(acts).unionByName(payoutTransfers(acts)),
        naturalKeys("pot_payouts"), seq :+ "payout_index")
      // Repeated challenge by the same challenger updates
      // created_at/message/tx_hash (utils.py:746-748 aupdate_or_create) —
      // last writer wins, not keep-first.
      lww("pot_payout_challenges", payoutChallenges(acts),
        Seq("challenger", "pot"))
      first("pot_payout_challenge_admin_responses", challengeResponses(acts),
        Seq("challenger", "pot", "created_at"))
      // List updates (admin_set_default_project_status) apply only to lists
      // that exist — reference filter().aupdate() no-ops on unknown ids
      // (utils.py:624) — so semi-join against this batch's creates plus the
      // existing table.
      val creates = listCreates(acts)
      val updates = {
        val upd = listStatusChanges(acts)
        val known = creates.select("on_chain_id").unionByName(
          if (exists("lists")) table("lists").select("on_chain_id")
          else spark.emptyDataFrame.select(lit(0L).as("on_chain_id")).limit(0))
        upd.join(known, Seq("on_chain_id"), "left_semi")
      }
      lww("lists", creates.unionByName(updates), naturalKeys("lists"))
      lww("list_registrations",
        listRegistrations(acts).unionByName(registrationUpdates(acts)),
        naturalKeys("list_registrations"))
      first("list_upvotes", listUpvotes(acts), Seq("list_id", "account"))
      lww("nadabot_registries",
        nadabotRegistries(acts).unionByName(
          humanThresholdUpdates(evts)
            .select(col("account"), col("default_human_threshold"),
              col("updated_at"),
              lit(null).cast("string").as("owner"),
              lit(null).cast("timestamp").as("created_at"),
              lit(null).cast("array<string>").as("admins"),
              lit(null).cast("string").as("source_metadata"),
              col("block_height"), col("shard_index"), col("receipt_index"),
              col("action_index")),
          allowMissingColumns = true),
        Seq("account"))
      lww("nadabot_providers", providers(evts), Seq("registry", "on_chain_id"))
      // Stamp has no unique constraint in the reference
      // (nadabot/models.py:221-239; aupdate_or_create keys user+provider+
      // verified_at) — each distinct verification date is its own row.
      first("nadabot_stamps", stamps(evts), Seq("user", "provider_id", "verified_at"))
      lww("nadabot_groups", groups(evts), Seq("registry", "on_chain_id"))
      lww("nadabot_blacklist", blacklistActions(evts), Seq("registry", "account"))

      // Array-delta patches (M2M admins/deployers mutations,
      // utils.py:785-828) run AFTER the base merges so same-batch creates
      // are visible to the read-modify-write.
      patchArrayColumn("lists", naturalKeys("lists"), "admins",
        listAdminRemovals(acts)).foreach(counts("lists") = _)
      patchArrayColumn("nadabot_registries", Seq("account"), "admins",
        nadabotAdminAdds(acts)).foreach(counts("nadabot_registries") = _)
      patchArrayColumn("pot_factories", Seq("account"), "whitelisted_deployers",
        factoryDeployerAdds(acts)).foreach(counts("pot_factories") = _)

      // Per-record error quarantine (SURVEY §2.9): decode/parse failures
      // are kept inspectable instead of silently dropped.
      first("quarantine", BlockIngest.quarantine(receipts),
        Seq("receipt_id", "action_index"))

      // Stream-cursor parity row (S2; reference BlockHeight singleton,
      // indexer_app/models.py:5-24).
      val bh = blocks.agg(
        max(col("block.header.height")).as("block_height"),
        max(timestamp_micros(call_function("div", col("block.header.timestamp"), lit(1000L)).cast("long")))
          .as("block_timestamp"))
        .select(lit(1).as("id"), col("block_height"), col("block_timestamp"),
          current_timestamp().as("updated_at"),
          col("block_height").as("__seq"))
      counts("block_height") = MergeWriter.merge(
        spark, bh, path("block_height"), Seq("id"), Seq("__seq"),
        coalesceUpdates = false)

      counts.toMap
    } finally {
      receipts.unpersist(); acts.unpersist(); evts.unpersist()
    }
  }
}
