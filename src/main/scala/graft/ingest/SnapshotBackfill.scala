package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Amounts
import graft.operators.MergeWriter

/** Backfill from contract-state snapshots — the engine-side equivalent of
  * the reference's `populatedata` management command
  * (indexer_app/management/commands/populatedata.py:26-547), which
  * regenerates the database from paged view-calls (`get_donations`,
  * `get_lists`, `get_registrations_for_list`, `get_applications`,
  * `get_config.payouts`).
  *
  * The HTTP fetch loop itself stays a thin out-of-engine script (SURVEY
  * §2.1 S4); the engine consumes the fetched JSON snapshots (one JSON
  * document per line or array files) and LWW-merges them into silver with
  * a synthetic ingest-seq at the snapshot's block height — so later stream
  * rows override snapshot rows and vice versa, exactly as block order
  * dictates.
  */
object SnapshotBackfill {

  /** Synthetic ingest-seq for snapshot rows: all at the snapshot height,
    * shard/receipt/action 0 — a stream row at a later height wins LWW. */
  private def withSeq(df: DataFrame, height: Long): DataFrame =
    df.withColumn("block_height", lit(height))
      .withColumn("shard_index", lit(0L))
      .withColumn("receipt_index", lit(0))
      .withColumn("action_index", lit(0))

  /** `get_donations` snapshot (direct variant: populatedata.py:121-194) or
    * a pot's `get_donations` (populatedata.py:391-453) when `pot` is set.
    * Input: JSON-lines (or array) of DonationExternal objects. */
  def donations(spark: SparkSession, path: String, snapshotHeight: Long,
      pot: Option[String] = None): DataFrame = {
    val raw = spark.read.schema(EntityTransforms.donationPayload).json(path)
      .filter(col("id").isNotNull)
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
    val raw = spark.read.schema(EntityTransforms.listPayload).json(path)
      .filter(col("id").isNotNull)
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
    val raw = spark.read.schema(EntityTransforms.registrationPayload).json(path)
      .filter(col("id").isNotNull)
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

  /** A pot's `get_applications` snapshot (populatedata.py:336-381). */
  def potApplications(spark: SparkSession, path: String, pot: String,
      snapshotHeight: Long): DataFrame = {
    val raw = spark.read.schema(EntityTransforms.applicationPayload).json(path)
      .filter(col("project_id").isNotNull)
    withSeq(raw.select(
      lit(pot).as("pot"),
      col("project_id").as("applicant"),
      col("message"),
      col("status"),
      timestamp_millis(col("submitted_at").cast("long")).as("submitted_at"),
      timestamp_millis(col("submitted_at").cast("long")).as("updated_at"),
      lit(null).cast("string").as("tx_hash")), snapshotHeight)
  }

  /** Merge snapshot DataFrames into the silver store (same natural keys and
    * LWW semantics as the stream). Re-running a backfill is a no-op. */
  def mergeInto(spark: SparkSession, silverDir: String,
      tables: Map[String, (DataFrame, Seq[String])]): Map[String, Long] = {
    val seq = Seq("block_height", "shard_index", "receipt_index", "action_index")
    tables.map { case (name, (df, keys)) =>
      name -> MergeWriter.merge(spark, df, s"$silverDir/$name", keys, seq)
    }
  }

  /** Standard key mapping for [[mergeInto]]. */
  val naturalKeys: Map[String, Seq[String]] = Map(
    "donations" -> Seq("on_chain_id", "pot"),
    "lists" -> Seq("on_chain_id"),
    "list_registrations" -> Seq("on_chain_id"),
    "pot_applications" -> Seq("pot", "applicant"))
}
