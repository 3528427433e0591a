package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gold.Stats

/** The resident serving tier over the QueryServiceSpec fixture: routing,
  * DRF-parity bodies, 404/400 documents, the 500 req/min token bucket,
  * rendered-envelope caching with swap-marker invalidation, and the JDK
  * HTTP binding end-to-end. */
class QueryServerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val silverDir = tmpDir("serve-silver")

  private lazy val tables: Map[String, DataFrame] = {
    val accounts = Seq(
      ("donor1.near", null.asInstanceOf[String]),
      ("proj1.near", null.asInstanceOf[String])
    ).toDF("id", "near_social_profile_data")
    val ts0 = java.sql.Timestamp.valueOf("2024-06-10 00:00:00")
    val donations = Seq(
      (1L, "donor1.near", "proj1.near", null.asInstanceOf[String], false, 10.0, ts0),
      (2L, "donor1.near", "proj1.near", null.asInstanceOf[String], false, 20.0, ts0)
    ).toDF("on_chain_id", "donor", "recipient", "pot", "matching_pool",
      "usd", "donated_at")
      .withColumn("total_amount_usd", col("usd").cast("decimal(20,2)"))
      .withColumn("total_amount_dec", col("usd").cast("decimal(38,0)"))
      .withColumn("ft", lit("near"))
      .drop("usd")
      // full DonationSerializer column set (the production silver shape —
      // the route render goes through Serializers.donationJson)
      .withColumn("total_amount", lit("100000000"))
      .withColumn("net_amount", lit("90000000"))
      .withColumn("net_amount_usd", col("total_amount_usd"))
      .withColumn("message", lit(null).cast("string"))
      .withColumn("protocol_fee", lit("0"))
      .withColumn("protocol_fee_usd", lit(null).cast("decimal(20,2)"))
      .withColumn("referrer", lit(null).cast("string"))
      .withColumn("referrer_fee", lit(null).cast("string"))
      .withColumn("referrer_fee_usd", lit(null).cast("decimal(20,2)"))
      .withColumn("chef", lit(null).cast("string"))
      .withColumn("chef_fee", lit(null).cast("string"))
      .withColumn("chef_fee_usd", lit(null).cast("decimal(20,2)"))
      .withColumn("tx_hash", lit("abc"))
    val payouts = Seq.empty[(String, String, java.sql.Timestamp)]
      .toDF("pot", "recipient", "paid_at")
      .withColumn("amount_paid_usd", lit(null).cast("decimal(20,2)"))
    Map(
      "accounts" -> accounts,
      "donations" -> donations,
      "tokens" -> Seq(("near", "NEAR", "NEAR", 24))
        .toDF("account", "name", "symbol", "decimals"),
      "pot_payouts" -> payouts,
      "lists" -> Seq((5L, "owner.near")).toDF("on_chain_id", "owner"),
      "list_registrations" -> Seq((11L, 5L, "proj1.near", "Approved", ts0))
        .toDF("on_chain_id", "list_id", "registrant", "status", "submitted_at"),
      "account_stats" -> Stats.accountStats(accounts, donations, payouts),
      "global_stats" -> Stats.globalStats(donations, payouts))
  }

  private lazy val qs = new QueryService(tables(_))

  private def server(throttle: Int = 500,
      clock: () => Long = () => System.currentTimeMillis()): QueryServer =
    new QueryServer(qs, silverDir, throttlePerMin = throttle, nowMs = clock)

  test("routes render DRF documents: envelope, detail, 404, 400, method guard") {
    val s = server()
    val list = s.handle("GET", "/api/v1/accounts", Map.empty)
    assert(list.status == 200)
    assert(list.body.startsWith("""{"count": 2, "next": null, "previous": null, "results": ["""))
    assert(list.body.contains(""""id":"donor1.near""""))

    val det = s.handle("GET", "/v1/accounts/donor1.near", Map.empty)
    assert(det.status == 200 && det.body.startsWith("""{"id":"donor1.near""""))

    val miss = s.handle("GET", "/api/v1/accounts/ghost.near", Map.empty)
    assert(miss.status == 404)
    assert(miss.body == """{"message": "Account with ID ghost.near not found."}""")

    val bad = s.handle("GET", "/api/v1/accounts/proj1.near/list-registrations",
      Map("status" -> "Bogus"))
    assert(bad.status == 400)
    assert(bad.body == """{"message": "Invalid status value: Bogus"}""")

    val feed = s.handle("GET", "/api/v1/accounts/proj1.near/donations_received",
      Map.empty)
    assert(feed.status == 200 && feed.body.startsWith("""{"count": 2"""))
    assert(feed.body.contains(""""total_amount_usd":"10.00""""))

    assert(s.handle("GET", "/api/v1/nope", Map.empty).status == 404)
    assert(s.handle("POST", "/api/v1/accounts", Map.empty).status == 405)
    assert(s.handle("GET", "/health", Map.empty).status == 200)
    assert(s.handle("GET", "/metrics", Map.empty).body.contains("\"requests\":"))
  }

  test("pagination envelope carries relative continuation URLs preserving params") {
    val qs31 = new QueryService(tables.updated("accounts",
      (1 to 70).map(i => (f"acct$i%03d.near", null.asInstanceOf[String]))
        .toDF("id", "near_social_profile_data"))(_))
    val s = new QueryServer(qs31, silverDir)
    val p2 = s.handle("GET", "/api/v1/accounts", Map("page" -> "2"))
    assert(p2.body.contains(""""next": "/v1/accounts?page=3""""))
    assert(p2.body.contains(""""previous": "/v1/accounts?page=1""""))
  }

  test("token bucket: the reference's 500/min envelope — burst, 429 + Retry-After, refill") {
    var t = 0L
    val s = server(throttle = 3, clock = () => t)
    (1 to 3).foreach { _ =>
      assert(s.handle("GET", "/health", Map.empty, client = "1.2.3.4").status == 200)
    }
    val over = s.handle("GET", "/health", Map.empty, client = "1.2.3.4")
    assert(over.status == 429)
    assert(over.body == """{"message": "Request was throttled."}""")
    assert(over.headers.get("Retry-After").exists(_.toLong >= 1L))
    assert(s.throttled == 1)
    // Another client has its own bucket.
    assert(s.handle("GET", "/health", Map.empty, client = "5.6.7.8").status == 200)
    // Refill: 3/min = one token per 20 s.
    t += 21000L
    assert(s.handle("GET", "/health", Map.empty, client = "1.2.3.4").status == 200)
    assert(s.handle("GET", "/health", Map.empty, client = "1.2.3.4").status == 429)
  }

  test("rendered envelopes memoize; a swap-marker rotation invalidates immediately") {
    val s = server()
    val cold = s.handle("GET", "/api/v1/stats", Map.empty)
    assert(cold.status == 200)
    val missesAfterCold = s.cacheMisses
    val warm = s.handle("GET", "/api/v1/stats", Map.empty)
    assert(warm == cold)
    assert(s.cacheHits >= 1 && s.cacheMisses == missesAfterCold)
    // Rotate the source table's swap marker (what every merge/refresh
    // does): the very next request recomputes.
    graft.operators.MergeWriter.io.writeStringAtomic(
      graft.operators.MergeWriter.swapMarkerPath(s"$silverDir/global_stats"),
      "probe-uid")
    s.handle("GET", "/api/v1/stats", Map.empty): Unit
    assert(s.cacheMisses == missesAfterCold + 1)
  }

  test("countOverride prices the envelope without a live count job") {
    // The query layer honors an external count verbatim (the serving
    // tier's gold-counter path); default None keeps the live count.
    assert(qs.accountDonationsReceived("proj1.near").count == 2L)
    assert(qs.accountDonationsReceived("proj1.near",
      countOverride = Some(42L)).count == 42L)
  }

  test("concurrent requests: parallel mixed routes stay correct and consistent") {
    // The serve tier's production shape: many clients hitting one
    // resident process. Cache stampedes double-compute (documented),
    // but every response must be correct and identical for identical
    // requests — concurrent Spark actions, memo writes and throttle
    // bookkeeping must not corrupt each other.
    val s = server()
    val paths = Seq(
      "/api/v1/accounts" -> Map("page" -> "1"),
      "/api/v1/accounts/donor1.near" -> Map.empty[String, String],
      "/api/v1/accounts/proj1.near/donations_received" -> Map("page" -> "1"),
      "/api/v1/stats" -> Map.empty[String, String],
      "/api/v1/accounts/ghost.near" -> Map.empty[String, String])
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(
        java.util.concurrent.Executors.newFixedThreadPool(12))
    val all = Await.result(Future.sequence(
      (1 to 4).flatMap(i => paths.map { case (p, prm) =>
        Future((p, s.handle("GET", p, prm, client = s"c$i")))
      })), Duration.Inf)
    // identical requests → identical responses, across all threads
    all.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2).distinct.size == 1, s"divergent responses for $p")
    }
    assert(all.count(_._2.status == 200) == 16)
    assert(all.count(_._2.status == 404) == 4) // the ghost detail route
    assert(s.requests == 20)
  }

  test("HTTP binding serves handle() verbatim: status, body, headers, metrics") {
    val s = server()
    val http = s.start(0) // ephemeral port
    try {
      val port = http.getAddress.getPort
      def get(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = new String(is.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        (code, body)
      }
      val (c1, b1) = get("/api/v1/accounts?page=1")
      assert(c1 == 200 && b1.startsWith("""{"count": 2"""))
      val (c2, b2) = get("/api/v1/accounts/ghost.near")
      assert(c2 == 404 &&
        b2 == """{"message": "Account with ID ghost.near not found."}""")
      val (c3, b3) = get("/metrics")
      assert(c3 == 200 && b3.contains("\"requests\":"))
    } finally http.stop(0)
  }
}
