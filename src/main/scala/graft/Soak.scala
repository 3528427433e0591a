package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.{col, lit}

import graft.ingest.{Schemas, SilverStore}
import graft.queries.{QueryServer, QueryService}
import graft.streaming.StreamIngest

/** Full-system soak: ingest + gold beats + resident serving run
  * CONCURRENTLY in one process, the deployment shape of the reference
  * (gunicorn API pods + the indexer + celery beat against one Postgres).
  * All three planes are proven pairwise elsewhere (STREAM_PARITY,
  * INGEST_BENCH, SERVE_BENCH); this is the triple-point proof — client
  * traffic hammers the HTTP surface WHILE the live tail merges silver
  * micro-batches and block-cadence beats swap the gold tables, and every
  * response is checked against the serve plane's consistency contract:
  *
  *  - NO 5xx, ever: swaps are planned table rotations, not faults — a
  *    request that loses its file listing must replan against the new
  *    marker (QueryServer's stale-swap retry), not surface the loss.
  *  - MONOTONE envelope counts per route: the store only grows during
  *    the soak (LWW merges + additive beats), so a count that moves
  *    BACKWARDS between two sequential responses on one client is a
  *    stale-after-swap read — the invariant that catches serving a
  *    half-swapped table or a cache entry outliving its marker.
  *  - TERMINAL PARITY: after the tail drains and a settle beat fires,
  *    served counts and the stats document equal a from-scratch
  *    backfill + full gold rebuild over the same blocks (the no-crash,
  *    no-concurrency oracle).
  *
  * Usage: `runMain graft.Soak [reportPath] [workDir] [nBase] [nTail]`
  * (defaults ./SOAK.md, /tmp/graft_soak, 5000, 5000 — ~20k donations,
  * beats every 500 blocks → ~10 gold swaps under fire).
  */
object Soak {

  private val countRe = """"count": (\d+)""".r
  private val statsCountRe = """"total_donations_count":(\d+)""".r

  private final case class Obs(route: String, status: Int, count: Long,
      sentNs: Long, latMs: Double)

  def main(args: Array[String]): Unit = {
    val reportPath = args.headOption.getOrElse("SOAK.md")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_soak"
    val nBase = if (args.length > 2) args(2).toInt else 5000
    val nTail = if (args.length > 3) args(3).toInt else 5000
    val beatEvery = 500L
    // Pinned steady-regime latency SLA (enforced at the end of the run):
    // overridable for slower boxes, but the committed SOAK.md is the
    // default bound's proof. Tightened 5000 → 2500 ms once the prewarm
    // went production-shape (real hot ids at the default page size — the
    // synthetic page_size=1 warm left full-page materialization and
    // real-dim fetches to the first client requests, the measured
    // early-tail outliers): measured steady max fell 4355 → 1274 ms,
    // early tail 4355 → ~1100 ms.
    val steadyMaxBoundMs =
      sys.env.getOrElse("SPARK_GRAFT_SOAK_STEADY_MAX_MS", "2500").toDouble
    // DRIVER HEADROOM: in local mode the DAGScheduler's single event-loop
    // thread (which serializes a task-binary broadcast per stage
    // submission) competes with the executor task threads for cores.
    // local[nproc] leaves it ZERO headroom — measured here: with 32/32
    // cores as task slots, a 1-task canary job took up to 14 s to
    // schedule and post-swap recomputes convoyed to 39 s while executor
    // slots sat IDLE between stages; reserving 4 cores cut the canary
    // max to 4 s. On a real cluster the driver is its own machine — this
    // is the local-mode equivalent of not scheduling executors onto it.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors() - 4).toString)
    val spark = HarnessSession.local(cpus)

    val base = new java.io.File(workDir)
    if (base.exists()) IngestBench.deleteRecursively(base)
    val lake = s"$workDir/lake"
    val silver = s"$workDir/silver"
    val ckpt = s"$workDir/ckpt"
    Files.createDirectories(Paths.get(lake))
    val h0 = 100000000L

    // ---- base store through the production backfill path
    println(s"[soak] writing $nBase base blocks …")
    (0 until nBase).foreach { i =>
      val h = h0 + i
      Files.write(Paths.get(lake, f"$h%012d.json"),
        IngestBench.blockJson(h).getBytes("UTF-8")): Unit
    }
    val store = new SilverStore(spark, silver)
    store.applyBatch(spark.read.schema(Schemas.blockMessage).json(lake)): Unit

    // Token decimals + a NEAR price covering EVERY day the generator can
    // emit across base AND tail (one day per 1000 blocks), seeded before
    // any beat so enrichment prices every donation.
    val ftMeta = s"$workDir/ft_meta.json"
    Files.write(Paths.get(ftMeta),
      """{"account": "near", "name": "NEAR", "symbol": "NEAR", "decimals": 24}"""
        .getBytes("UTF-8")): Unit
    graft.ingest.SnapshotBackfill.mergeInto(spark, silver, Map(
      "tokens" -> (graft.ingest.SnapshotBackfill.tokenMetadata(
        spark, ftMeta, 1L),
        graft.ingest.SnapshotBackfill.naturalKeys("tokens"))))
    import spark.implicits._
    // The generator's donated_at day is 1718000000000 + (height/1000)·1d;
    // one price at each day's noon keeps every donation inside the ±24 h
    // as-of window.
    val days = (h0 / 1000L to (h0 + nBase + nTail) / 1000L).map { d =>
      ("near", new java.sql.Timestamp(1718000000000L + d * 86400000L + 43200000L),
        new java.math.BigDecimal("5.00"))
    }
    days.toDF("token", "timestamp", "price_usd")
      .withColumn("price_usd", col("price_usd").cast("decimal(20,2)"))
      .write.mode("overwrite").parquet(s"$silver/token_prices")
    Seq("""{"owner":"potlock.near","protocol_fee_basis_points":250}""")
      .toDF("config").coalesce(1)
      .write.parquet(s"$silver/donate_contract_config")
    println("[soak] baseline gold refresh …")
    graft.gold.GoldRefresh.refresh(spark, silver): Unit

    // ---- resident server, production wiring (memoized loader + gold
    // counters + default 300 s/marker cache); throttle lifted — the soak
    // probes consistency under load, the quota envelope has its own bench
    val qs = new QueryService(QueryServer.memoizedServingLoader(spark, silver))
    val gc = new graft.gold.GoldCounts(spark, silver)
    val srv = new QueryServer(qs, silver, goldCounts = Some(gc),
      throttlePerMin = Int.MaxValue)
    // Pre-warm BEFORE the socket opens (production startup order): the
    // first-touch plan/codegen/JIT/footer costs land while the box is
    // quiet instead of on early client requests racing the opening
    // ingest micro-batches for task slots — the measured 37-54 s
    // cold-plan outliers of the pre-warmless soaks (FAIR and GC were
    // tried and exonerated; the race is first-touch compute vs a busy
    // scheduler, and the fix is to not pay first-touch under fire).
    println("[soak] pre-warming route plans before the socket opens …")
    val tWarm0 = System.nanoTime()
    val warmed = srv.prewarm()
    val prewarmSec = (System.nanoTime() - tWarm0) / 1e9
    println(f"[soak] pre-warm: ${warmed.size} routes in $prewarmSec%.1f s " +
      f"(slowest: ${warmed.maxBy(_._3)._1} ${warmed.maxBy(_._3)._3}%.0f ms)")
    val http = srv.start(0, poolSize = 12)
    val port = http.getAddress.getPort

    // ---- swap observer: marker uids of the tables the routes read
    val swapTables = Seq("donations_enriched", "accounts", "account_stats",
      "global_stats")
    val swapEvents =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    val lastUid = scala.collection.concurrent.TrieMap[String, String]()
    val observing = new java.util.concurrent.atomic.AtomicBoolean(true)
    val observer = new Thread(() => {
      val io = graft.operators.MergeWriter.io
      while (observing.get()) {
        swapTables.foreach { t =>
          val uid = io.readString(graft.operators.MergeWriter
            .swapMarkerPath(s"$silver/$t")).getOrElse("")
          if (lastUid.put(t, uid).exists(_ != uid))
            swapEvents.add((System.nanoTime(), t)): Unit
        }
        Thread.sleep(25)
      }
    }, "soak-swap-observer")
    observer.setDaemon(true)
    observer.start()

    // ---- client traffic
    val routes: Vector[String] = Vector(
      "/api/v1/stats",
      "/api/v1/donors?page_size=10",
      "/api/v1/accounts?page_size=10",
      "/api/v1/accounts?after=&page_size=10",
      "/api/v1/accounts/proj1.near/donations_received?page_size=10",
      "/api/v1/accounts/proj2.near/donations_received?page_size=10",
      "/api/v1/accounts/proj3.near/donations_received?page_size=10",
      "/api/v1/accounts/donor1.near/donations_sent?page_size=10",
      "/api/v1/accounts/donor2.near",
      "/api/v1/pots?page_size=10",
      "/api/v1/donate_contract_config",
      "/metrics")

    def get(path: String): (Int, String) = {
      val conn = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(60000)
      conn.setReadTimeout(120000)
      val code = conn.getResponseCode
      val is = Option(
        if (code >= 400) conn.getErrorStream else conn.getInputStream)
      val body = is.map(s => new String(s.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)).getOrElse("")
      (code, body)
    }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fiveHundreds = new java.util.concurrent.atomic.AtomicLong
    val regressions = new java.util.concurrent.atomic.AtomicLong
    val transportErrors = new java.util.concurrent.atomic.AtomicLong
    val observations =
      new java.util.concurrent.ConcurrentLinkedQueue[Obs]
    // In-flight request registry + watchdog: when any request has been
    // in flight > 5 s, dump every thread stack ONCE — the outlier's
    // blocking site, caught in the act (aggregate latency tables cannot
    // distinguish task-slot queueing from a driver-side lock).
    val inFlight =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val stacksDumped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watchdog = new Thread(() => {
      while (!stop.get()) {
        Thread.sleep(500)
        val now = System.nanoTime()
        inFlight.forEach { (c, rt) =>
          if (now - rt._2 > 5000000000L && stacksDumped.compareAndSet(false, true)) {
            println(f"[soak] WATCHDOG: client $c stuck ${(now - rt._2) / 1e9}%.1f s on ${rt._1} — dumping stacks")
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
              println(s"--- thread ${t.getName} (${t.getState})")
              frames.take(25).foreach(f => println(s"    at $f"))
            }
          }
        }
        // While ANY request is stuck past 2 s, log the scheduler's view
        // every tick: active jobs/stages and the event-loop thread's
        // current frame — separates "slots busy" from "scheduler queue"
        // from "one slow broadcast" without a full dump.
        val stuck = {
          var worst = 0L
          inFlight.forEach { (_, rt) =>
            worst = math.max(worst, now - rt._2) }
          worst
        }
        if (stuck > 2000000000L) {
          val st = spark.sparkContext.statusTracker
          val active = st.getActiveJobIds()
          val stages = st.getActiveStageIds()
          val running = stages.flatMap(s => st.getStageInfo(s))
            .map(i => s"${i.stageId}:${i.numActiveTasks}/${i.numTasks}")
          import scala.jdk.CollectionConverters._
          val dag = Thread.getAllStackTraces.asScala.collectFirst {
            case (t, f) if t.getName == "dag-scheduler-event-loop" =>
              f.headOption.map(_.toString).getOrElse("(empty)")
          }.getOrElse("(gone)")
          println(f"[soak] stuck ${stuck / 1e9}%.1f s: activeJobs=${active.length} " +
            s"activeStages=[${running.mkString(",")}] dagLoop=$dag")
        }
      }
    }, "soak-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    // Scheduler canary: a 1-task job on pre-materialized data every 2 s;
    // its wall time ≈ DAGScheduler submission→completion latency. When
    // canary latency and request latency spike TOGETHER while executor
    // slots idle, the bottleneck is the scheduler path, not compute.
    val canaryLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]
    val canary = new Thread(() => {
      val one = spark.range(1).persist()
      one.count(): Unit
      while (!stop.get()) {
        Thread.sleep(2000)
        val t0 = System.nanoTime()
        one.count(): Unit
        val ms = (System.nanoTime() - t0) / 1e6
        canaryLog.add((t0, ms)): Unit
        if (ms > 1000) println(f"[soak] CANARY job took $ms%.0f ms")
      }
    }, "soak-canary")
    canary.setDaemon(true)
    canary.start()
    val nClients = 6
    val clients = (1 to nClients).map { c =>
      val t = new Thread(() => {
        val lastCount = scala.collection.mutable.Map[String, Long]()
        var i = c // stagger route phase per client
        while (!stop.get()) {
          val route = routes(i % routes.length)
          i += 1
          val sent = System.nanoTime()
          inFlight.put(c, (route, sent)): Unit
          // A transport failure (reset, timeout) must be RECORDED, not
          // kill the client thread — dead clients would leave the
          // invariants vacuously green over near-zero traffic.
          val (code, bodyStr) =
            try get(route)
            catch {
              case scala.util.control.NonFatal(e) =>
                transportErrors.incrementAndGet(): Unit
                println(s"[soak] transport error on $route: $e")
                (599, "")
            }
          inFlight.remove(c): Unit
          val lat = (System.nanoTime() - sent) / 1e6
          if (code >= 500) {
            fiveHundreds.incrementAndGet(): Unit
            println(s"[soak] 5xx on $route: ${bodyStr.take(160)}")
          }
          // Monotonicity: this client's PREVIOUS response on this route
          // completed before this one was sent, and the store only
          // grows — a backwards count is a stale read, full stop.
          val count: Long = (route match {
            case "/api/v1/stats" =>
              statsCountRe.findFirstMatchIn(bodyStr).map(_.group(1).toLong)
            case _ =>
              countRe.findFirstMatchIn(bodyStr).map(_.group(1).toLong)
          }).getOrElse(-1L)
          if (count >= 0) {
            lastCount.get(route).foreach { prev =>
              if (count < prev) {
                regressions.incrementAndGet(): Unit
                println(s"[soak] COUNT REGRESSION on $route: $prev → $count")
              }
            }
            lastCount(route) = count
          }
          observations.add(Obs(route, code, count, sent, lat)): Unit
        }
      }, s"soak-client-$c")
      t.setDaemon(true)
      t.start()
      t
    }

    // ---- live tail: write the tail blocks, then drain them through the
    // streaming ingest with block-cadence gold beats, under fire.
    println(s"[soak] writing $nTail tail blocks …")
    (0 until nTail).foreach { i =>
      val h = h0 + nBase + i
      Files.write(Paths.get(lake, f"$h%012d.json"),
        IngestBench.blockJson(h).getBytes("UTF-8")): Unit
    }
    println(s"[soak] tail ingest + beats every $beatEvery blocks, " +
      s"$nClients clients firing …")
    val t0 = System.nanoTime()
    val q = StreamIngest.startFromLake(spark,
      Map("fetcher.dir" -> lake,
        "startHeight" -> (h0 + nBase).toString,
        "maxBlocksPerTrigger" -> "250",
        "fetchPartitions" -> "8"),
      silver, ckpt, availableNow = true,
      goldBeatEveryBlocks = Some(beatEvery))
    q.awaitTermination()
    val tTail = (System.nanoTime() - t0) / 1e9
    // settle: the last partial beat bucket; counts must land exactly
    println("[soak] tail drained — settle refresh …")
    graft.gold.GoldRefresh.refresh(spark, silver): Unit
    Thread.sleep(1500) // traffic over the settled store
    stop.set(true)
    clients.foreach(_.join(10000))
    observing.set(false)

    // ---- terminal parity vs the from-scratch oracle
    println("[soak] building no-concurrency oracle …")
    val oracleDir = s"$workDir/oracle"
    val ostore = new SilverStore(spark, oracleDir)
    ostore.applyBatch(spark.read.schema(Schemas.blockMessage).json(lake)): Unit
    graft.ingest.SnapshotBackfill.mergeInto(spark, oracleDir, Map(
      "tokens" -> (graft.ingest.SnapshotBackfill.tokenMetadata(
        spark, ftMeta, 1L),
        graft.ingest.SnapshotBackfill.naturalKeys("tokens"))))
    days.toDF("token", "timestamp", "price_usd")
      .withColumn("price_usd", col("price_usd").cast("decimal(20,2)"))
      .write.mode("overwrite").parquet(s"$oracleDir/token_prices")
    graft.gold.GoldRefresh.refreshFull(spark, oracleDir): Unit

    def oneRow(dir: String): String = {
      val df = spark.read.parquet(s"$dir/global_stats")
      df.select(df.columns.sorted.map(col): _*).head().toString
    }
    val liveStats = oneRow(silver)
    val oracleStats = oneRow(oracleDir)
    val statsParity = liveStats == oracleStats

    val probeParity = Seq("proj1.near", "proj2.near", "proj3.near").map { id =>
      // The result cache serves stale-while-revalidate after a swap, so
      // the settled count may take one background recompute to surface.
      // "Holds still across two samples" would ALSO be satisfied by a
      // stale body whose revalidation outlasts the sample gap — poll
      // against the ORACLE value itself (the store is quiescent, so the
      // served count must converge to it; a count that never does is
      // exactly the parity failure the require reports).
      val oracle = spark.read.parquet(s"$oracleDir/donations_enriched")
        .filter(col("recipient") === lit(id)).count()
      def servedCount(): Long = countRe.findFirstMatchIn(
        get(s"/api/v1/accounts/$id/donations_received?page_size=1")._2)
        .map(_.group(1).toLong).getOrElse(-1L)
      var served = servedCount()
      var polls = 0
      while (served != oracle && polls < 60) {
        Thread.sleep(500)
        polls += 1
        served = servedCount()
      }
      (id, served, oracle)
    }

    // ---- classify + report
    val obs = {
      val it = observations.iterator()
      val b = Vector.newBuilder[Obs]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val swaps = {
      val it = swapEvents.iterator()
      val b = Vector.newBuilder[(Long, String)]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def isSwapAdjacent(o: Obs): Boolean = swaps.exists { case (tNs, _) =>
      tNs >= o.sentNs - 100000000L &&
        tNs <= o.sentNs + (o.latMs * 1e6).toLong + 100000000L
    }
    val (adjacent, steady) = obs.partition(isSwapAdjacent)
    def pct(v: Seq[Double], p: Double): Double =
      if (v.isEmpty) 0.0
      else v.sorted.apply(math.min(v.size - 1, (v.size * p).toInt))
    val okParity = probeParity.forall { case (_, s, o) => s == o }

    val sb = new StringBuilder
    sb ++= "# SOAK — ingest + gold beats + resident serving, one process, under fire\n\n"
    sb ++= s"`runMain graft.Soak` on local[32]: a $nBase-block store built by the " +
      s"production backfill, then a $nTail-block LIVE TAIL drained through the " +
      s"streaming ingest (micro-batches of 250) with gold beats every $beatEvery " +
      s"blocks, WHILE $nClients HTTP clients loop ${routes.length} routes against " +
      "the resident QueryServer (production wiring: memoized serving loader, " +
      "gold envelope counters, 300 s/marker cache). Every response is checked " +
      "in-flight; the settled store is then compared to a from-scratch " +
      "backfill + full gold rebuild over the same blocks.\n\n"
    sb ++= "## Invariants under fire\n\n"
    sb ++= f"| check | result |\n|---|---|\n"
    sb ++= f"| requests served during the soak | ${obs.size}%,d |\n"
    sb ++= f"| tail wall (ingest+beats under load) | $tTail%.1f s (${nTail / tTail}%.0f blocks/s) |\n"
    sb ++= f"| 5xx responses (incl. transport errors, recorded as 599) | ${fiveHundreds.get}%d |\n"
    sb ++= f"| client transport errors | ${transportErrors.get}%d |\n"
    sb ++= f"| envelope-count regressions (stale-after-swap reads) | ${regressions.get}%d |\n"
    sb ++= f"| table swaps observed while serving | ${swaps.size}%d (${swaps.map(_._2).distinct.mkString(", ")}) |\n"
    sb ++= f"| stale-swap retries (lost listing → replan, not 500) | ${srv.staleRetries}%d |\n"
    sb ++= f"| requests overlapping a swap window (±100 ms) | ${adjacent.size}%,d |\n"
    sb ++= f"| route plans pre-warmed before the socket opened | ${warmed.size}%d routes, $prewarmSec%.1f s (first-touch plan/JIT/footer cost paid OFF the request path) |\n"
    sb ++= f"| steady-regime max-latency bound (pinned, enforced) | ${steadyMaxBoundMs}%.0f ms |\n\n"
    sb ++= "## Latency: steady vs swap-adjacent\n\n"
    sb ++= "| regime | n | p50 | p95 | max |\n|---|---|---|---|---|\n"
    def lat(label: String, v: Seq[Obs]): Unit = {
      val ls = v.map(_.latMs)
      sb ++= f"| $label | ${v.size}%,d | ${pct(ls, 0.50)}%.0f ms | ${pct(ls, 0.95)}%.0f ms | ${if (ls.isEmpty) 0.0 else ls.max}%.0f ms |\n"
    }
    lat("steady", steady)
    lat("swap-adjacent", adjacent)
    // Scheduler canary percentiles: the submission-latency floor of a
    // 1-task job on cached data, sampled every 2 s through the whole
    // soak. Its max bounds how long ANY request waited on the scheduler
    // path alone.
    val canaries = {
      val it = canaryLog.iterator()
      val b = Vector.newBuilder[Double]
      while (it.hasNext) b += it.next()._2
      b.result()
    }
    if (canaries.nonEmpty)
      sb ++= f"\nScheduler canary (1-task job on cached data, every 2 s): " +
        f"n=${canaries.size}%d p50 ${pct(canaries, 0.5)}%.0f ms p95 " +
        f"${pct(canaries, 0.95)}%.0f ms max ${canaries.max}%.0f ms\n"
    // The tail, itemized: WHICH routes outlier and WHEN (offset from the
    // tail-ingest start) — aggregates can't separate a startup transient
    // from a recurring stall.
    val slowest = obs.sortBy(-_.latMs).take(12)
    if (slowest.headOption.exists(_.latMs > 1000)) {
      sb ++= "\n### Slowest requests (either regime)\n\n"
      sb ++= "| route | t+offset | latency | regime |\n|---|---|---|---|\n"
      slowest.foreach { o =>
        sb ++= f"| ${o.route} | ${(o.sentNs - t0) / 1e9}%.1f s | ${o.latMs}%.0f ms | ${if (isSwapAdjacent(o)) "swap-adj" else "steady"} |\n"
      }
    }
    sb ++= "\n## Terminal parity (settled store vs no-concurrency oracle)\n\n"
    sb ++= s"- global_stats row: ${if (statsParity) "EQUAL" else s"DIVERGED\n  live:   $liveStats\n  oracle: $oracleStats"}\n"
    probeParity.foreach { case (id, s, o) =>
      sb ++= s"- donations_received($id): served count $s vs oracle $o ${if (s == o) "EQUAL" else "DIVERGED"}\n"
    }
    sb ++= s"\nFinal /metrics: ${get("/metrics")._2}\n"
    Files.write(Paths.get(reportPath), sb.toString.getBytes("UTF-8")): Unit
    println(sb.toString)

    http.stop(0)
    // Traffic floor: the invariants are only meaningful if the clients
    // actually hammered the server through the whole tail — a soak whose
    // clients died early must fail, not pass vacuously.
    require(obs.size >= nTail.toLong,
      s"only ${obs.size} observations — client threads died early?")
    require(fiveHundreds.get == 0, s"${fiveHundreds.get} 5xx responses")
    require(regressions.get == 0, s"${regressions.get} count regressions")
    // The pinned serve SLA under concurrent ingest: with plans
    // pre-warmed before the socket opens, no steady-regime request may
    // pay a multi-second cold-plan outlier (pre-warmless soaks measured
    // 37-54 s here). Swap-adjacent requests are bounded too, more
    // loosely: a replan against a just-swapped table legitimately pays
    // a cold-request floor, not a cold-PROCESS floor.
    val steadyMax =
      if (steady.isEmpty) 0.0 else steady.map(_.latMs).max
    require(steadyMax <= steadyMaxBoundMs,
      f"steady-regime max latency $steadyMax%.0f ms exceeds the pinned " +
        f"$steadyMaxBoundMs%.0f ms bound")
    require(statsParity, "global_stats diverged from oracle")
    require(okParity, s"served counts diverged: $probeParity")
    println(s"[soak] PASS — report at $reportPath")
    spark.stop()
  }
}
