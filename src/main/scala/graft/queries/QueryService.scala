package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ingest.Schemas
import graft.operators.Relational

/** The read-side query plane: every REST route of the reference
  * (api/urls.py:37-132, SURVEY §2.11) as a DataFrame query with the same
  * filter → join → sort → paginate → nested-serialize shape.
  *
  * Pagination envelope matches the reference
  * ({count, next, previous, results}; api/pagination.py:8-24, default page
  * size 30). `count` is computed alongside the slice (A4); at 100 TB
  * gold-table cached counts replace the live count (SURVEY §7.4-6).
  *
  * Serializer FK expansion (J1) uses broadcast left joins — dimension
  * tables (accounts, tokens, pots) are small relative to facts.
  */
final class QueryService(t: String => DataFrame) {

  val DefaultPageSize = 30

  final case class Page(count: Long, page: Int, pageSize: Int, results: DataFrame) {
    def hasNext: Boolean = page.toLong * pageSize < count
    def hasPrevious: Boolean = page > 1
    /** Nested-JSON rows (S8): the DRF-serializer-shaped output. */
    def toJsonRows(): Array[String] = results.toJSON.collect()
  }

  private def paginate(df: DataFrame, order: Seq[Column], page: Int, pageSize: Int): Page =
    Page(df.count(), page, pageSize,
      Relational.pageSlice(df, order, page, pageSize))

  private def accounts = t("accounts")
  private def donations = t("donations")
  private def pots = t("pots")

  /** Expand an account FK into a nested struct column (donor/recipient/…
    * embed; donations/serializers.py:44-49). */
  private def expandAccount(df: DataFrame, fk: String): DataFrame = {
    val a = accounts
    val profile =
      if (a.columns.contains("near_social_profile_data"))
        col("near_social_profile_data")
      else lit(null).cast("string").as("near_social_profile_data")
    val acct = broadcast(a
      .select(col("id"), profile)
      .withColumnRenamed("id", s"__${fk}_id"))
    df.join(acct, df(fk) === col(s"__${fk}_id"), "left")
      .withColumn(fk,
        when(df(fk).isNotNull, struct(
          df(fk).as("id"),
          col("near_social_profile_data").as("near_social_profile_data"))))
      .drop(s"__${fk}_id", "near_social_profile_data")
  }

  private def donationExpanded: DataFrame = {
    val d = donations
    Seq("donor", "recipient", "referrer", "chef")
      .filter(d.columns.contains)
      .foldLeft(d)(expandAccount)
  }

  // ---------------------------------------------------- accounts routes

  /** GET /v1/accounts (accounts/api.py:95-123): scan, order id. */
  def accountsList(page: Int = 1, pageSize: Int = DefaultPageSize): Page =
    paginate(accounts, Seq(col("id").asc), page, pageSize)

  /** GET /v1/accounts/{id} (accounts/api.py:126-160). */
  def accountDetail(id: String): DataFrame =
    accounts.filter(col("id") === id)

  /** GET /v1/accounts/{id}/active_pots [?status=live]
    * (accounts/api.py:163-217): approved applications → pots, optional
    * live-interval filter (J3 + P6). */
  def accountActivePots(id: String, live: Boolean,
      now: java.sql.Timestamp, page: Int = 1, pageSize: Int = DefaultPageSize): Page = {
    val approvedPots = t("pot_applications")
      .filter(col("applicant") === id && col("status") === "Approved")
      .select(col("pot").as("account"))
    val p = pots
    val base = Relational.semiJoin(p, approvedPots,
      p("account") === approvedPots("account"))
    val filtered = if (live)
      base.filter(col("matching_round_start") <= lit(now) &&
        col("matching_round_end") >= lit(now))
    else base
    paginate(filtered, Seq(col("account").asc), page, pageSize)
  }

  /** GET /v1/accounts/{id}/pot_applications [?status]
    * (accounts/api.py:220-272): P3 enum validation then filter. */
  def accountPotApplications(id: String, status: Option[String],
      page: Int = 1, pageSize: Int = DefaultPageSize): Either[String, Page] =
    status.filterNot(Schemas.applicationStatuses.contains) match {
      case Some(bad) => Left(s"Invalid status: $bad")
      case None =>
        val base = t("pot_applications").filter(col("applicant") === id)
        val f = status.map(s => base.filter(col("status") === s)).getOrElse(base)
        Right(paginate(f, Seq(col("submitted_at").desc, col("pot").asc), page, pageSize))
    }

  /** GET /v1/accounts/{id}/donations_received (accounts/api.py:275-313). */
  def accountDonationsReceived(id: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page =
    paginate(donationExpanded.filter(col("recipient.id") === id),
      Seq(col("donated_at").desc, col("on_chain_id").asc), page, pageSize)

  /** GET /v1/accounts/{id}/donations_sent (accounts/api.py:316-354). */
  def accountDonationsSent(id: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page =
    paginate(donationExpanded.filter(col("donor.id") === id),
      Seq(col("donated_at").desc, col("on_chain_id").asc), page, pageSize)

  /** GET /v1/accounts/{id}/payouts_received (accounts/api.py:357-395):
    * P4 null predicate on paid_at. */
  def accountPayoutsReceived(id: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page =
    paginate(
      t("pot_payouts").filter(col("recipient") === id && col("paid_at").isNotNull),
      Seq(col("paid_at").desc, col("pot").asc), page, pageSize)

  /** GET /v1/accounts/{id}/list-registrations [?status]
    * (accounts/api.py:398-443). */
  def accountListRegistrations(id: String, status: Option[String],
      page: Int = 1, pageSize: Int = DefaultPageSize): Either[String, Page] =
    status.filterNot(Schemas.registrationStatuses.contains) match {
      case Some(bad) => Left(s"Invalid status: $bad")
      case None =>
        val base = t("list_registrations").filter(col("registrant") === id)
        val f = status.map(s => base.filter(col("status") === s)).getOrElse(base)
        Right(paginate(f, Seq(col("submitted_at").desc, col("on_chain_id").asc),
          page, pageSize))
    }

  /** GET /v1/donors [?sort=most_donated_usd] (accounts/api.py:50-92):
    * J2 semi-join + optional O2 sort over the gold account_stats. */
  def donors(sortMostDonated: Boolean, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page = {
    val a = accounts
    val d = donations
    val donorsDf = Relational.semiJoin(a, d, a("id") === d("donor"))
    val withStats = donorsDf.join(
      t("account_stats").select(col("id"), col("total_donations_out_usd")),
      Seq("id"), "left")
    val order =
      if (sortMostDonated)
        Seq(col("total_donations_out_usd").desc_nulls_last, col("id").asc)
      else Seq(col("id").asc)
    paginate(withStats, order, page, pageSize)
  }

  // ---------------------------------------------------- lists routes

  /** GET /v1/lists (lists/api.py:33-61). */
  def listsList(page: Int = 1, pageSize: Int = DefaultPageSize): Page =
    paginate(t("lists"), Seq(col("on_chain_id").asc), page, pageSize)

  /** GET /v1/lists/{id} (lists/api.py:64-98). */
  def listDetail(id: Long): DataFrame =
    t("lists").filter(col("on_chain_id") === id)

  /** GET /v1/lists/{id}/registrations [?status][?category]
    * (lists/api.py:101-164): P3 enum validation + P7 regex-over-JSON
    * through the registrant join. */
  def listRegistrations(listId: Long, status: Option[String],
      category: Option[String], page: Int = 1,
      pageSize: Int = DefaultPageSize): Either[String, Page] =
    status.filterNot(Schemas.registrationStatuses.contains) match {
      case Some(bad) => Left(s"Invalid status: $bad")
      case None =>
        val base = t("list_registrations").filter(col("list_id") === listId)
        val st = status.map(s => base.filter(col("status") === s)).getOrElse(base)
        val cat = category match {
          case Some(c) =>
            // registrant.near_social_profile_data.plCategories iregex
            // '\[.*?"{cat}".*?\]' (lists/api.py:157-161)
            val joined = st.join(
              broadcast(accounts.select(col("id").as("__rid"),
                col("near_social_profile_data"))),
              col("registrant") === col("__rid"), "left")
            joined.filter(regexp_like(
              get_json_object(col("near_social_profile_data"), "$.plCategories"),
              lit("(?i)\\[.*?\"" + java.util.regex.Pattern.quote(c) + "\".*?\\]")))
              .drop("__rid", "near_social_profile_data")
          case None => st
        }
        Right(paginate(cat, Seq(col("submitted_at").desc, col("on_chain_id").asc),
          page, pageSize))
    }

  /** GET /v1/lists/{id}/random_registration [?status]
    * (lists/api.py:167-225): O5 — deterministic seeded pick (rand() in the
    * reference; we pin to an md5-ordered pick for replayability). */
  def randomRegistration(listId: Long, status: Option[String]): DataFrame = {
    val base = t("list_registrations").filter(col("list_id") === listId)
    val f = status.map(s => base.filter(col("status") === s)).getOrElse(base)
    f.orderBy(md5(col("on_chain_id").cast("string").cast("binary")).asc,
      col("on_chain_id").asc).limit(1)
  }

  // ---------------------------------------------------- pots routes

  /** GET /v1/pots (pots/api.py:48-75). */
  def potsList(page: Int = 1, pageSize: Int = DefaultPageSize): Page =
    paginate(pots, Seq(col("account").asc), page, pageSize)

  /** GET /v1/potfactories (pots/api.py:78-105). */
  def potFactoriesList(page: Int = 1, pageSize: Int = DefaultPageSize): Page =
    paginate(t("pot_factories"), Seq(col("account").asc), page, pageSize)

  /** GET /v1/pots/{id} (pots/api.py:108-139). */
  def potDetail(id: String): DataFrame =
    pots.filter(col("account") === id)

  /** GET /v1/pots/{id}/applications (pots/api.py:142-177). */
  def potApplications(potId: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page =
    paginate(t("pot_applications").filter(col("pot") === potId),
      Seq(col("submitted_at").desc, col("applicant").asc), page, pageSize)

  /** GET /v1/pots/{id}/donations (pots/api.py:180-215). */
  def potDonations(potId: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page =
    paginate(donationExpanded.filter(col("pot") === potId),
      Seq(col("donated_at").desc, col("on_chain_id").asc), page, pageSize)

  /** GET /v1/pots/{id}/sponsors (pots/api.py:218-258): J4 distinct
    * matching-pool donors → accounts. */
  def potSponsors(potId: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page = {
    val sponsorIds = donations
      .filter(col("pot") === potId && col("matching_pool"))
      .select(col("donor")).distinct()
    val a = accounts
    paginate(
      Relational.semiJoin(a, sponsorIds, a("id") === sponsorIds("donor")),
      Seq(col("id").asc), page, pageSize)
  }

  /** GET /v1/pots/{id}/payouts (pots/api.py:261-296). */
  def potPayouts(potId: String, page: Int = 1,
      pageSize: Int = DefaultPageSize): Page =
    paginate(t("pot_payouts").filter(col("pot") === potId),
      Seq(col("paid_at").desc_nulls_last, col("recipient").asc), page, pageSize)

  // ---------------------------------------------------- misc routes

  /** GET /v1/donate_contract_config (donations/api.py:25-70): config
    * passthrough minus internal keys. Config is modeled as a 1-row JSON
    * table refreshed by the enrichment jobs (RPC side-effects stay out of
    * the engine, SURVEY §2.9). */
  def donateContractConfig(excludeKeys: Seq[String] =
      Seq("owner", "protocol_fee_recipient_account", "total_donations_amount",
        "net_donations_amount", "total_donations_count")): DataFrame = {
    // Proper JSON manipulation (Jackson ships with Spark): a regex strip
    // leaves dangling commas / truncates nested values. The config is a
    // 1-row table, so driver-side parse is free.
    val spark = t("donate_contract_config").sparkSession
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = t("donate_contract_config").collect().map { r =>
      val node = mapper.readTree(r.getAs[String]("config"))
      node match {
        case obj: com.fasterxml.jackson.databind.node.ObjectNode =>
          excludeKeys.foreach(obj.remove)
        case _ => ()
      }
      mapper.writeValueAsString(node)
    }
    import spark.implicits._
    rows.toSeq.toDF("config")
  }

  /** GET /v1/stats (base/api.py:29-89): reads the gold global_stats table
    * (A1), refreshed by gold.Stats. */
  def stats(): DataFrame = t("global_stats")
}
