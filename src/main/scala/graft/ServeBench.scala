package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.ingest.{Schemas, SilverStore}
import graft.queries.QueryService

/** Serve-plane latency bench: the REST query plane measured end-to-end —
  * filter → join → sort → paginate → nested-JSON serialize, the full
  * DRF-equivalent request path (reference accounts/api.py, pots/api.py,
  * donate/api.py) — over a silver store built by the SAME merge path
  * production ingest uses, so every route reads the production layout
  * (bucketed accounts, date-partitioned + donor-bucketed donations).
  *
  * Three measurements:
  *   1. ROUTE LATENCY: p50/p95/max wall time per route over `reps`
  *      invocations of the COMPLETE request (count + page slice +
  *      serializer expansion + JSON render), after one warm-up call that
  *      pays plan compilation and broadcast builds — the steady state of
  *      a resident API service (the loader memoizes table registration
  *      the way a long-running process would).
  *   2. DEEP-PAGE DUEL: offset pagination at page 50 (produce-and-
  *      discard — the slice must materialize 50 pages of ordered rows)
  *      vs the keyset walk's 50th page (bounded work per page at ANY
  *      depth) — the reason every paginated route has a keyset variant.
  *   3. EMPTY-ENVELOPE FLOOR: routes whose entity saw no traffic in this
  *      mix (lists) price the fixed envelope cost — count job + empty
  *      serialize — the latency floor under the whole plane.
  *
  * Usage: `runMain graft.ServeBench [reportPath] [workDir] [nBlocks]`
  * (defaults: ./SERVE_BENCH.md, /tmp/graft_serve_bench, 20000 blocks
  * ≈ 40k donations / ~5.8k accounts / 400 pots).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val reportPath = args.headOption.getOrElse("SERVE_BENCH.md")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_serve_bench"
    val nBlocks = if (args.length > 2) args(2).toInt else 20000
    val spark = HarnessSession.local()

    // ---- store build: IngestBench's traffic generator through the
    // mega-batch backfill ingest (the spot/backfill path), exact
    // production schemas and layouts.
    val base = new java.io.File(workDir)
    if (base.exists()) IngestBench.deleteRecursively(base)
    val lake = s"$workDir/lake"
    val silver = s"$workDir/silver"
    Files.createDirectories(Paths.get(lake))
    val startHeight = 100000000L
    println(s"[serve-bench] writing $nBlocks blocks to $lake …")
    (0 until nBlocks).foreach { i =>
      val h = startHeight + i
      Files.write(Paths.get(lake, f"$h%012d.json"),
        IngestBench.blockJson(h).getBytes("UTF-8")): Unit
    }
    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime(); val a = f; (a, (System.nanoTime() - s) / 1e9)
    }
    val blocks = spark.read.schema(Schemas.blockMessage).json(lake)
    val store = new SilverStore(spark, silver)
    val (_, tBuild) = timed(store.applyBatch(blocks))
    // The gold beat (USD enrichment + account/pot/global stats) is part
    // of the serving stack: donors sorting and account embeds read
    // account_stats (reference base/celery.py:27-49's 5-minute job).
    val (_, tGold) = timed(graft.gold.GoldRefresh.refresh(spark, silver))
    // The donate-contract config rides the RPC snapshot plane
    // (SnapshotBackfill), not the block stream — seed that snapshot.
    import spark.implicits._
    Seq("""{"owner":"potlock.near","protocol_fee_basis_points":250,""" +
      """"referral_fee_basis_points":100}""").toDF("config")
      .coalesce(1).write.parquet(s"$silver/donate_contract_config")
    val nDonations = store.table("donations").count()
    val nAccounts = store.table("accounts").count()
    val nPots = store.table("pots").count()
    println(f"[serve-bench] store built in $tBuild%.1f s " +
      f"(+ gold refresh $tGold%.1f s): $nDonations%,d donations, " +
      f"$nAccounts%,d accounts, $nPots%,d pots")

    // Resident-service wiring: memoized loader = registration DDL and
    // schema reads paid once per table, like a long-running API process.
    val cache = scala.collection.concurrent.TrieMap[String, DataFrame]()
    val qs = new QueryService(n => cache.getOrElseUpdate(n, store.table(n)))

    val reps = 7
    def pct(xs: Seq[Long], p: Double): Long = HarnessSession.pct(xs, p)
    final case class R(name: String, rows: Long, p50: Long, p95: Long,
        max: Long)
    // One warm-up call (plan compile + broadcast build), then `reps`
    // timed full requests. `f` returns the JSON row count so the
    // serializer render is always inside the measurement.
    def measure(name: String)(f: => Long): R = {
      f: Unit
      val samples = (1 to reps).map { _ =>
        val s = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - s) / 1000000L)
      }
      val ts = samples.map(_._2)
      R(name, samples.head._1, pct(ts, 0.50), pct(ts, 0.95), ts.max)
    }
    def pageJson(p: QueryService.Page): Long = p.toJsonRows().length.toLong
    def dfJson(df: DataFrame): Long = df.toJSON.collect().length.toLong

    // Generator id shapes: donation ids are height*10+i, so donor ids
    // are multiples of 10 (+0..2) mod 5000 and recipients mod 800 —
    // donor0/proj0 exist with real traffic.
    val donor = "donor0.near"
    val recipient = "proj0.near"
    val potId = store.table("pots").orderBy("account").head()
      .getAs[String]("account")

    val routes = Seq(
      measure("GET /v1/accounts (page 1)")(pageJson(qs.accountsList())),
      measure("GET /v1/accounts ?after= (keyset)")(
        dfJson(qs.accountsListKeyset(None))),
      measure("GET /v1/accounts/{id}")(dfJson(qs.accountDetail(donor))),
      measure("GET /v1/accounts/{id}/donations_received (page 1)")(
        pageJson(qs.accountDonationsReceived(recipient))),
      measure("GET /v1/accounts/{id}/donations_received ?after=")(
        dfJson(qs.accountDonationsReceivedKeyset(recipient, None))),
      measure("GET /v1/accounts/{id}/donations_sent (page 1)")(
        pageJson(qs.accountDonationsSent(donor))),
      measure("GET /v1/donors ?sort=most_donated_usd")(
        pageJson(qs.donors(sortMostDonated = true))),
      measure("GET /v1/donations (feed, keyset page 1)")(
        dfJson(qs.donationsFeedKeyset(None))),
      measure("GET /v1/pots (page 1)")(pageJson(qs.potsList())),
      measure("GET /v1/pots/{id}")(dfJson(qs.potDetail(potId))),
      measure("GET /v1/pots/{id}/donations (page 1)")(
        pageJson(qs.potDonations(potId))),
      measure("GET /v1/pots/{id}/sponsors (page 1)")(
        pageJson(qs.potSponsors(potId))),
      measure("GET /v1/donate_contract_config")(
        dfJson(qs.donateContractConfig())),
      measure("GET /v1/lists (page 1 — empty-envelope floor)")(
        pageJson(qs.listsList()))
    )

    // ---- result-cache tier (reference accounts/api.py:79
    // cache_page(60*5) over Redis): the rendered envelope memoized under
    // (route, params) with swap-marker freshness + the 300 s TTL outer
    // bound. Cold call fills; warm hits must not run a Spark job.
    import graft.queries.ResultCache
    val rc = new ResultCache()
    def uids(tables: String*): Seq[String] =
      ResultCache.uidsFor(silver)(tables)
    def cachedRoute(name: String, key: String, tables: Seq[String])(
        render: => Array[String]): R = {
      rc.memo(key, uids(tables: _*))(render): Unit // cold fill
      measure(name)(
        rc.memo(key, uids(tables: _*))(render).length.toLong)
    }
    val cachedRoutes = Seq(
      cachedRoute("GET /v1/accounts (page 1) [warm cache hit]",
        ResultCache.routeKey("/v1/accounts", "page" -> 1),
        Seq("accounts", "account_stats"))(qs.accountsList().toJsonRows()),
      cachedRoute(
        "GET /v1/accounts/{id}/donations_received (page 1) [warm cache hit]",
        ResultCache.routeKey("/v1/accounts/donations_received",
          "id" -> recipient, "page" -> 1),
        Seq("donations", "accounts", "tokens", "pots"))(
        qs.accountDonationsReceived(recipient).toJsonRows()),
      cachedRoute("GET /v1/donations (feed, keyset page 1) [warm cache hit]",
        ResultCache.routeKey("/v1/donations", "after" -> None),
        Seq("donations", "accounts", "tokens", "pots"))(
        qs.donationsFeedKeyset(None).toJSON.collect()))
    // A merge invalidates immediately: rotate a marker, assert recompute,
    // then RESTORE the real marker — leaving the probe uid in place would
    // put the table in the crash-suspect state (marker ≠ counts-sidecar
    // uid) for everything measured after this point.
    val preMisses = rc.misses
    val donMarker = graft.operators.MergeWriter
      .swapMarkerPath(s"$silver/donations")
    val realUid = graft.operators.MergeWriter.io.readString(donMarker)
    graft.operators.MergeWriter.io.writeStringAtomic(donMarker,
      "servebench-invalidation-probe")
    rc.memo(ResultCache.routeKey("/v1/donations", "after" -> None),
      uids("donations", "accounts", "tokens", "pots"))(
      qs.donationsFeedKeyset(None).toJSON.collect()): Unit
    val invalidated = rc.misses == preMisses + 1
    realUid match {
      case Some(u) =>
        graft.operators.MergeWriter.io.writeStringAtomic(donMarker, u)
      case None => // no marker pre-existed: remove the probe's, don't keep it
        graft.operators.MergeWriter.io.deleteRecursively(donMarker)
    }

    // ---- deep-page duel on /v1/accounts: offset page 150 vs the keyset
    // walk's 150th page (cursor = last id of page 149, found by walking —
    // the way a real consumer paginates).
    val depth = 50
    val offsetDeep = measure(s"GET /v1/accounts (offset page $depth)")(
      pageJson(qs.accountsList(page = depth)))
    var cursor: Option[String] = None
    (1 until depth).foreach { _ =>
      val rows = qs.accountsListKeyset(cursor).select("id").collect()
      if (rows.nonEmpty) cursor = Some(rows.last.getString(0))
    }
    val keysetDeep = measure(s"GET /v1/accounts ?after= (keyset page $depth)")(
      dfJson(qs.accountsListKeyset(cursor)))

    val sb = new StringBuilder
    sb ++= "# SERVE_BENCH — query-plane (REST route) latency\n\n"
    sb ++= s"`runMain graft.ServeBench` on local[32]: $nBlocks blocks " +
      "through the mega-batch backfill ingest → a production-layout " +
      f"silver store ($nDonations%,d donations, $nAccounts%,d accounts, " +
      f"$nPots%,d pots; built in $tBuild%.1f s + gold refresh " +
      f"$tGold%.1f s), then every route " +
      s"measured end-to-end ($reps reps after one warm-up): filter → " +
      "join → sort → paginate → DRF-shape nested-JSON render — the " +
      "complete request the reference serves per HTTP call.\n\n"
    sb ++= "| route | rows | p50 ms | p95 ms | max ms |\n|---|---|---|---|---|\n"
    (routes ++ cachedRoutes :+ offsetDeep :+ keysetDeep).foreach { r =>
      sb ++= f"| ${r.name} | ${r.rows}%,d | ${r.p50}%,d | ${r.p95}%,d | ${r.max}%,d |\n"
    }
    sb ++= "\n## Result cache (reference accounts/api.py:79 cache_page(60*5))\n\n"
    sb ++= "Warm-hit rows above serve the memoized rendered envelope " +
      "keyed by (route, params): a hash lookup plus one swap-marker " +
      "read per source table — no Spark job. Staleness contract: " +
      "entries expire at 300 s (the reference's cache_page TTL), but " +
      "any merge/refresh on a source table rotates its swap marker and " +
      "invalidates IMMEDIATELY — strictly fresher than the reference, " +
      "which serves stale pages for up to 5 minutes after a write. " +
      s"Invalidation probe (marker rotation → recompute): " +
      s"${if (invalidated) "PASS" else "FAIL"}. Cold rows are unchanged " +
      "by the cache tier.\n"
    sb ++= "\n## Deep pagination\n\n"
    sb ++= f"Offset page $depth%d: ${offsetDeep.p50}%,d ms p50 vs keyset " +
      f"page $depth%d: ${keysetDeep.p50}%,d ms p50. Offset slicing " +
      "produces-and-discards every earlier page's ordered rows, so its " +
      "cost grows with depth; the keyset slice stays " +
      "TakeOrderedAndProject over an index-range-equivalent filter at " +
      "any depth — the variant a 100 TB feed must serve (and the " +
      "reference's own DRF cursor pagination analogue).\n\n"
    sb ++= "## Reading the numbers\n\n"
    sb ++= "- Every row above includes the serializer (account/token/pot " +
      "embed expansion) and the JSON render — not just the scan.\n"
    sb ++= "- The empty-envelope row (lists saw no traffic in this mix) " +
      "prices the fixed per-request floor: one count job + empty page " +
      "render.\n"
    sb ++= "- Latencies are interactive-analytics grade, not OLTP: a " +
      "Spark plan per request prices in scheduler + whole-stage codegen " +
      "reuse, which a resident service amortizes (plans here are reused " +
      "across reps — the warm numbers). The reference serves the same " +
      "routes from Postgres indexes in single-digit ms at its scale; " +
      "this plane exists so the SAME store that answers 100 TB " +
      "analytics can also answer the API surface without a second " +
      "system, and so route results are oracle-verified against the " +
      "same tables the pipeline writes.\n"
    Files.writeString(Paths.get(reportPath), sb.toString)
    println(s"[serve-bench] report → $reportPath")
    spark.stop()
  }
}
