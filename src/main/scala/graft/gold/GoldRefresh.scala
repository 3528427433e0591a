package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.{Schemas, SilverStore}

/** The gold-layer refresh job — operational equivalent of the reference's
  * 5-minute Celery beat (base/celery.py:27-49): recompute USD enrichment,
  * account/pot stats and global stats from silver, writing gold tables
  * next to them. Run on a cron/trigger: `sbt "runMain graft.gold.GoldRefresh
  * <silverDir>"`. Each job is a bounded number of shuffles (SURVEY §3.3).
  */
object GoldRefresh {

  def refresh(spark: SparkSession, silverDir: String): Unit = {
    val silver = new SilverStore(spark, silverDir)
    def tableOrEmpty(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
      if (silver.exists(name)) silver.table(name)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    val donations0 = tableOrEmpty("donations", Schemas.donation)
    val payouts = tableOrEmpty("pot_payouts", Schemas.potPayout)
    val accounts = tableOrEmpty("accounts", Schemas.account)
    val tokens = tableOrEmpty("tokens", Schemas.token)
    val prices = tableOrEmpty("token_prices", Schemas.tokenHistoricalPrice)

    // 1. USD enrichment (J6/F3): as-of price join; donations lacking a
    //    price inside ±24h keep null USD (re-enriched next run — the
    //    deterministic form of the reference's backfill-on-null loop).
    val enrichedPlan =
      if (prices.isEmpty) donations0
      else Stats.enrichDonationsUsd(donations0, prices, tokens)
    write(enrichedPlan, s"$silverDir/donations_enriched")
    // Read the materialized table back: the stats jobs would otherwise each
    // re-execute the as-of-join lineage from scratch.
    val enriched = spark.read.parquet(s"$silverDir/donations_enriched")

    // 2. Stats tables. account_stats lands BUCKETED on id with the same
    //    spec as the silver accounts table (SilverStore.bucketSpec), so
    //    the query plane's accounts⋈account_stats join — the subplan
    //    behind every account embed and the donors route — is co-located
    //    and plans with zero exchange on either side.
    val (statKey, statBuckets) = SilverStore.bucketSpec("accounts")
    writeBucketed(Stats.accountStats(accounts, enriched, payouts),
      s"$silverDir/account_stats", statKey, statBuckets)
    write(Stats.potStats(enriched), s"$silverDir/pot_stats")
    write(Stats.globalStats(enriched, payouts), s"$silverDir/global_stats")
  }

  /** [[write]] with a bucketed layout: files carry bucket ids so readers
    * can re-declare the layout (BucketedLayout.registerExternal) and join
    * exchange-free on `keyCol`. Zero-row frames keep the flat write (a
    * bucketed writer emits no data files for them). */
  private def writeBucketed(df: DataFrame, path: String, keyCol: String,
      buckets: Int): Unit = {
    if (df.isEmpty) return write(df, path)
    val spark = df.sparkSession
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val tmp = path + ".tmp-" + uid
    val tmpTable = s"graft_gold_bucketed_$uid"
    df.repartition(buckets, org.apache.spark.sql.functions.col(keyCol))
      .write.format("parquet").option("path", tmp)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .mode("overwrite").saveAsTable(tmpTable)
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable") // external: files stay
    swapIn(tmp, path)
  }

  private def write(df: DataFrame, path: String): Unit = {
    // Swap pattern: write to a unique tmp, rename the live table aside,
    // atomically move the new one in, then drop the old — readers see a
    // missing table only for the instant between the two renames (a plain
    // delete-then-write left the table absent for the whole write).
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val tmp = path + ".tmp-" + uid
    df.write.mode("overwrite").parquet(tmp)
    swapIn(tmp, path)
  }

  private def swapIn(tmp: String, path: String): Unit = {
    // Through the TableIO seam so the gold plane swaps atomically on the
    // same filesystems the silver store runs on (local nio here would
    // throw on an s3a/HDFS deployment); also puts the stranded-artifact
    // naming under Maintenance.vacuum's cleanup contract.
    val uid = tmp.substring(tmp.lastIndexOf("-") + 1)
    val io = graft.operators.MergeWriter.io
    val old = path + ".old-" + uid
    if (io.exists(path)) io.atomicMove(path, old)
    io.atomicMove(tmp, path)
    io.deleteRecursively(old)
  }

  def main(args: Array[String]): Unit = {
    val silverDir = args.headOption.getOrElse(sys.error("usage: GoldRefresh <silverDir>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      // naive parquet timestamps (timestamp[us], no UTC flag) read as
      // TIMESTAMP (session-local, pinned UTC) — matching DuckDB and the
      // watermark/unix_micros surfaces, not TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    refresh(spark, silverDir)
    spark.stop()
  }
}
