package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.SilverStore
import graft.queries.QueryService

/** Bucketed silver layout: LWW merge INTO a bucketed table keeps merge
  * semantics and the bucketed file layout; reads through SilverStore
  * re-declare the bucket metadata; and the query plane's J1/J2 joins on
  * the bucket key plan WITHOUT an exchange on that key — the q_j11
  * zero-shuffle contract applied to the silver store, with a flat-layout
  * negative control proving the assertion bites. */
class BucketedSilverSpec extends SparkSpec {
  import spark.implicits._

  private val seqCols = Seq("block_height", "shard_index", "receipt_index",
    "action_index")

  private def acctRows(rows: Seq[(String, String, Long)]) =
    rows.map { case (id, profile, h) => (id, profile, h, 0L, 0L, 0L) }
      .toDF("id", "near_social_profile_data",
        "block_height", "shard_index", "receipt_index", "action_index")

  test("mergeBucketed: LWW + null-backfill hold and the layout stays bucketed") {
    val dir = tmpDir("bsilver")
    val silver = new SilverStore(spark, dir)

    SilverStore.mergeEntity(spark, dir, "accounts",
      acctRows(Seq(("alice.near", "p1", 1L), ("bob.near", null, 1L))),
      Seq("id"), seqCols)
    assert(BucketedLayout.looksBucketed(s"$dir/accounts"))

    // Second merge: alice re-keyed at a later seq with a NULL profile —
    // backfill must keep "p1"; carol is new.
    SilverStore.mergeEntity(spark, dir, "accounts",
      acctRows(Seq(("alice.near", null, 2L), ("carol.near", "p3", 2L))),
      Seq("id"), seqCols)
    assert(BucketedLayout.looksBucketed(s"$dir/accounts"))

    val out = silver.table("accounts")
    assert(out.count() == 3)
    val alice = out.filter(col("id") === "alice.near").head()
    assert(alice.getAs[String]("near_social_profile_data") == "p1")
    assert(alice.getAs[Long]("block_height") == 2L)

    // The SilverStore read comes back as a BUCKETED scan wherever an
    // operator can use the distribution (a bare scan legitimately reports
    // "disabled by query planner" — autoBucketedScan skips the bucketed
    // read when nothing benefits): a groupBy on the bucket key must scan
    // bucketed and aggregate WITHOUT an exchange on id.
    val aggPlan = out.groupBy("id").count().queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("Bucketed: true".r.findFirstIn(aggPlan).isDefined, aggPlan)
    assert("hashpartitioning\\(id#".r.findFirstIn(aggPlan).isEmpty, aggPlan)
  }

  private def donationRows(rows: Seq[(Long, String, String, String, Long)]) =
    rows.map { case (oid, pot, donor, day, h) =>
      (oid, pot, donor, java.sql.Timestamp.valueOf(s"$day 00:00:00"),
        h, 0L, 0L, 0L)
    }.toDF("on_chain_id", "pot", "donor", "donated_at",
      "block_height", "shard_index", "receipt_index", "action_index")

  test("donations: date-partitioned AND donor-bucketed — scoped merges keep both layouts") {
    val dir = tmpDir("bsilver3")
    val silver = new SilverStore(spark, dir)
    SilverStore.mergeEntity(spark, dir, "donations",
      donationRows(Seq(
        (1L, "pot1", "alice.near", "2024-06-01", 1L),
        (2L, "pot1", "bob.near", "2024-06-01", 1L),
        (3L, "pot1", "alice.near", "2024-06-02", 1L))),
      SilverStore.naturalKeys("donations"), seqCols)
    val p = s"$dir/donations"
    assert(MergeWriter.bucketedPartitionLayout(p))
    assert(new java.io.File(s"$p/__pdate=d2024-06-01").exists())

    val day1Before = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$p/__pdate=d2024-06-01"))
      .toArray.map(_.toString).sorted.toSeq

    // Batch 2 touches only 2024-06-02 (donation 3 re-merged at a later
    // seq + a new one): day-1's files must stay byte-identical — the
    // partition-scoped merge contract survives the bucketed layout.
    SilverStore.mergeEntity(spark, dir, "donations",
      donationRows(Seq(
        (3L, "pot1", "alice.near", "2024-06-02", 2L),
        (4L, "pot1", "carol.near", "2024-06-02", 2L))),
      SilverStore.naturalKeys("donations"), seqCols)
    assert(MergeWriter.bucketedPartitionLayout(p))
    val day1After = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$p/__pdate=d2024-06-01"))
      .toArray.map(_.toString).sorted.toSeq
    assert(day1After == day1Before)

    val out = silver.table("donations")
    assert(!out.columns.contains("__pdate")) // layout detail stays hidden
    assert(out.count() == 4)
    assert(out.filter(col("on_chain_id") === 3L).head()
      .getAs[Long]("block_height") == 2L) // LWW across the scoped merge
    // The read is a BUCKETED scan: a per-donor rollup aggregates with no
    // exchange on donor.
    val aggPlan = out.groupBy("donor").count().queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("Bucketed: true".r.findFirstIn(aggPlan).isDefined, aggPlan)
    assert("hashpartitioning\\(donor#".r.findFirstIn(aggPlan).isEmpty, aggPlan)
    // and the raw partitioned read still PRUNES on the date key
    val prunePlan = spark.read.parquet(p)
      .filter(col("__pdate") === "d2024-06-02")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[.*__pdate".r.findFirstIn(prunePlan).isDefined,
      prunePlan)
  }

  test("donors route over bucketed accounts/account_stats: no exchange on id; flat control exchanges") {
    val dir = tmpDir("bsilver2")
    val silver = new SilverStore(spark, dir)
    SilverStore.mergeEntity(spark, dir, "accounts",
      acctRows(Seq(("alice.near", "p1", 1L), ("bob.near", "p2", 1L),
        ("carol.near", "p3", 1L))),
      Seq("id"), seqCols)

    val stats = Seq(
      ("alice.near", BigDecimal(10), BigDecimal(4), BigDecimal(0), 2L),
      ("bob.near", BigDecimal(0), BigDecimal(9), BigDecimal(1), 0L)
    ).toDF("id", "total_donations_in_usd", "total_donations_out_usd",
      "total_matching_pool_allocations_usd", "donors_count")
    BucketedLayout.writeBucketed(stats, "b_stats_spec",
      tmpDir("bstats") + "/account_stats", "id", 16)

    // Donations through the silver store too: date-partitioned,
    // donor-bucketed — so the J2 semi-join's DONATIONS side is also
    // exchange-free.
    SilverStore.mergeEntity(spark, dir, "donations",
      donationRows(Seq(
        (1L, "pot1", "alice.near", "2024-06-01", 1L),
        (2L, "pot1", "bob.near", "2024-06-01", 1L))),
      SilverStore.naturalKeys("donations"), seqCols)
    val statsFlat = tmpDir("bstatsflat") + "/account_stats"
    stats.write.parquet(statsFlat)

    def service(flat: Boolean): QueryService = new QueryService(name =>
      name match {
        case "accounts" =>
          if (flat) spark.read.parquet(s"$dir/accounts")
          else silver.table("accounts")
        case "account_stats" =>
          if (flat) spark.read.parquet(statsFlat)
          else spark.table("b_stats_spec")
        case "donations" =>
          if (flat) spark.read.parquet(s"$dir/donations").drop("__pdate")
          else silver.table("donations")
        case other => sys.error(s"unexpected table $other")
      })

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // The production shape (broadcast disabled): the J2 semi-join needs
      // accounts by id and donations by donor, the stats join needs both
      // sides by id — the bucketed scans satisfy ALL of them, so neither
      // join key ever appears under a hashpartitioning exchange.
      val page = service(flat = false).donors(sortMostDonated = true,
        page = 1, pageSize = 10)
      val plan = page.results.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert("hashpartitioning\\(id#".r.findFirstIn(plan).isEmpty, plan)
      assert("hashpartitioning\\(donor#".r.findFirstIn(plan).isEmpty, plan)
      assert("Bucketed: true".r.findFirstIn(plan).isDefined, plan)
      // Results are layout-independent: bob first (most donated out).
      val ids = page.results.select("id").collect().map(_.getString(0)).toSeq
      assert(ids == Seq("bob.near", "alice.near"))

      // Negative control: the same route over FLAT layouts must pay the
      // exchange on id — proving the assertion above is load-bearing.
      val flatPlan = service(flat = true)
        .donors(sortMostDonated = true, page = 1, pageSize = 10)
        .results.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert("hashpartitioning\\(id#".r.findFirstIn(flatPlan).isDefined,
        flatPlan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
