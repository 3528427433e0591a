package graft.queries

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** `GET /api/schema` — the OpenAPI 3 document for the query plane, the
  * engine-side equivalent of the reference's drf-spectacular schema route
  * (api/urls.py:38-47). The document is generated from a route table that
  * mirrors QueryService's surface (api/urls.py:49-132), so route/parameter
  * names can't silently drift from the implementation the way a
  * hand-maintained JSON blob would.
  */
object OpenApi {

  private final case class Param(
      name: String, in: String, tpe: String, required: Boolean)
  private final case class Route(
      path: String, summary: String, params: Seq[Param], paginated: Boolean)

  // Page-number params only — active_pots, whose rows are filtered on
  // request-time liveness (no cursor is stable across requests), serves
  // no keyset continuation and must not advertise one.
  private val pageOnly = Seq(
    Param("page", "query", "integer", required = false),
    Param("page_size", "query", "integer", required = false))
  private val page = pageOnly :+
    // Engine extension (not in the reference's schema): keyset
    // continuation cursor — the previous page's last sort-key tuple,
    // echoed by the keyset envelope's `next` URL.
    Param("after", "query", "string", required = false)
  private def path(name: String) = Param(name, "path", "string", required = true)
  private def intPath(name: String) = Param(name, "path", "integer", required = true)
  private def query(name: String) = Param(name, "query", "string", required = false)

  /** The 22 data routes of api/urls.py:49-132, in declaration order. */
  private val routes = Seq(
    Route("/api/v1/accounts", "List accounts", page, paginated = true),
    Route("/api/v1/accounts/{account_id}", "Account detail",
      Seq(path("account_id")), paginated = false),
    Route("/api/v1/accounts/{account_id}/active_pots",
      "Pots with an approved application from the account",
      path("account_id") +: query("status") +: pageOnly, paginated = true),
    Route("/api/v1/accounts/{account_id}/pot_applications",
      "The account's pot applications",
      path("account_id") +: query("status") +: page, paginated = true),
    Route("/api/v1/accounts/{account_id}/donations_received",
      "Donations to the account", path("account_id") +: page, paginated = true),
    Route("/api/v1/accounts/{account_id}/donations_sent",
      "Donations from the account", path("account_id") +: page, paginated = true),
    Route("/api/v1/accounts/{account_id}/payouts_received",
      "Paid pot payouts to the account", path("account_id") +: page,
      paginated = true),
    Route("/api/v1/accounts/{account_id}/list-registrations",
      "The account's list registrations",
      path("account_id") +: query("status") +: page, paginated = true),
    Route("/api/v1/donate_contract_config", "Donate contract configuration",
      Nil, paginated = false),
    Route("/api/v1/donors", "Accounts that have donated",
      query("sort") +: page, paginated = true),
    Route("/api/v1/lists", "List lists", page, paginated = true),
    Route("/api/v1/lists/{list_id}", "List detail", Seq(intPath("list_id")),
      paginated = false),
    Route("/api/v1/lists/{list_id}/registrations",
      "Registrations on the list",
      intPath("list_id") +: query("status") +: query("category") +: page,
      paginated = true),
    Route("/api/v1/lists/{list_id}/random_registration",
      "A random registration from the list",
      Seq(intPath("list_id"), query("status")), paginated = false),
    Route("/api/v1/pots", "List pots", page, paginated = true),
    Route("/api/v1/pots/{pot_id}", "Pot detail", Seq(path("pot_id")),
      paginated = false),
    Route("/api/v1/pots/{pot_id}/applications", "Applications to the pot",
      path("pot_id") +: page, paginated = true),
    Route("/api/v1/pots/{pot_id}/donations", "Donations to the pot",
      path("pot_id") +: page, paginated = true),
    Route("/api/v1/pots/{pot_id}/sponsors",
      "Distinct matching-pool donors to the pot", path("pot_id") +: page,
      paginated = true),
    Route("/api/v1/pots/{pot_id}/payouts", "Payouts of the pot",
      path("pot_id") +: page, paginated = true),
    Route("/api/v1/potfactories", "List pot factories", page, paginated = true),
    Route("/api/v1/stats", "Global protocol statistics", Nil,
      paginated = false))

  /** The OpenAPI 3.0.3 document as a JSON string (stable field order). */
  def schemaJson: String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("openapi", "3.0.3")
    val info = root.putObject("info")
    info.put("title", "graft query plane")
    info.put("version", "v1")
    val paths = root.putObject("paths")
    routes.foreach { r =>
      val get = paths.putObject(r.path).putObject("get")
      get.put("summary", r.summary)
      val params = get.putArray("parameters")
      r.params.foreach { pr =>
        val o = params.addObject()
        o.put("name", pr.name)
        o.put("in", pr.in)
        o.put("required", pr.required)
        o.putObject("schema").put("type", pr.tpe)
      }
      val ok = get.putObject("responses").putObject("200")
      ok.put("description", if (r.paginated) "Paginated results" else "Result")
      val schema: ObjectNode = ok.putObject("content")
        .putObject("application/json").putObject("schema")
      if (r.paginated) {
        schema.put("type", "object")
        val props = schema.putObject("properties")
        // count/next/previous are nullable: next/previous at the walk's
        // ends on the page-number surface, all three under the ?after=
        // keyset continuation (count and previous are always null there —
        // the total-count job is what keyset avoids).
        props.putObject("count").put("type", "integer")
          .put("nullable", true)
        props.putObject("next").put("type", "string")
          .put("nullable", true)
        props.putObject("previous").put("type", "string")
          .put("nullable", true)
        props.putObject("results").put("type", "array")
      } else {
        schema.put("type", "object")
      }
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private val schemaRoute = "/api/schema/"

  /** GET /api/schema/swagger-ui/ (reference api/urls.py:40-44,
    * SpectacularSwaggerView): a static HTML shell that loads the published
    * swagger-ui assets and points them at [[schemaJson]]'s route. */
  def swaggerUiHtml: String =
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |  <title>graft query plane — Swagger UI</title>
       |  <link rel="stylesheet" href="https://unpkg.com/swagger-ui-dist/swagger-ui.css"/>
       |</head>
       |<body>
       |  <div id="swagger-ui"></div>
       |  <script src="https://unpkg.com/swagger-ui-dist/swagger-ui-bundle.js"></script>
       |  <script>
       |    SwaggerUIBundle({url: "$schemaRoute", dom_id: "#swagger-ui"});
       |  </script>
       |</body>
       |</html>""".stripMargin

  /** GET /api/schema/redoc/ (reference api/urls.py:45-47,
    * SpectacularRedocView). */
  def redocHtml: String =
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |  <title>graft query plane — ReDoc</title>
       |  <meta charset="utf-8"/>
       |</head>
       |<body>
       |  <redoc spec-url="$schemaRoute"></redoc>
       |  <script src="https://cdn.redoc.ly/redoc/latest/bundles/redoc.standalone.js"></script>
       |</body>
       |</html>""".stripMargin
}
