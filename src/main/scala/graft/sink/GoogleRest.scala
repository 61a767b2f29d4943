package graft.sink

/** Maps the renderers' service DESCRIPTORS onto the public REST surface of
  * each Google marketing API, plus the per-request headers those APIs
  * require.
  *
  * The renderers emit the request shapes the reference asserts in its own
  * tests (service-call payloads driven through the Python client
  * libraries); the wire contract — URL path, verb envelope, headers — is a
  * transport concern, so it lives here and is applied by [[HttpTransport]]
  * via its `adapt` hook:
  *
  *  - `googleads://login[/customers/cid]/Service.method` → Google Ads REST
  *    (reference uses google-ads==24.1.0, API v17:
  *    `uploaders/google_ads/conversions/google_ads_offline_conversions_uploader.py:30-161`,
  *    `uploaders/google_ads/customer_match/abstract_uploader.py:33-281`).
  *    Adds the `login-customer-id` header (the MCC login the client library
  *    sets from config, `abstract_uploader.py:153-160`); `developer-token`
  *    rides as a static transport header from [[graft.model.OAuthCredentials]].
  *  - `dfareporting://profiles/{pid}/conversions/batchinsert` → CM360
  *    `dfareporting/v4` (`campaign_manager_conversion_uploader.py:44-48`
  *    builds `dfareporting v4`).
  *  - `displayvideo://advertisers/{aid}/firstAndThirdPartyAudiences[...]` →
  *    Display & Video 360 `v3` (`uploaders/display_video/
  *    customer_match/abstract_uploader.py` flow: create by advertiser,
  *    edit members by server-assigned audience id — the id is resolved
  *    through [[AudienceResolver]], live via a filtered list call).
  *  - absolute `http(s)` URLs (GA MP, GA4 MP, AppsFlyer) pass through.
  */
object GoogleRest {

  val AdsVersion = "v17"
  val AdsBase = "https://googleads.googleapis.com"
  val CmBase = "https://dfareporting.googleapis.com"
  val Dv360Base = "https://displayvideo.googleapis.com"

  /** DV360 `editCustomerMatchMembers` needs the server-assigned audience id
    * (advertiserId, displayName) — the reference retrieves it from the
    * create/search response; stateless transports look it up per batch.
    */
  type AudienceResolver = (String, String) => Option[String]

  private val Googleads = "^googleads://([^/]*)/(?:customers/([^/]+)/)?(\\w+)\\.(\\w+)$".r
  private val Dfareporting = "^dfareporting://profiles/([^/]+)/conversions/batchinsert$".r
  private val DvCreate = "^displayvideo://advertisers/([^/]+)/firstAndThirdPartyAudiences\\.create$".r
  private val DvEdit = "^displayvideo://advertisers/([^/]+)/firstAndThirdPartyAudiences/(.+)\\.editCustomerMatchMembers$".r

  private def jsonStr(body: String, field: String): Option[String] =
    ("\"" + field + "\"\\s*:\\s*\"([^\"]+)\"").r.findFirstMatchIn(body).map(_.group(1))

  /** snake_case service method → the `:restVerb` custom-method segment. */
  private def restVerb(method: String): String = {
    val parts = method.split('_')
    parts.head + parts.tail.map(_.capitalize).mkString
  }

  /** Rewrites one rendered request to its REST form and names the extra
    * per-request headers. Bodies change only where the REST envelope
    * differs from the service-call shape (mutate/create wrappers); row
    * payloads stay byte-identical to the renderer output.
    */
  def adapt(resolve: AudienceResolver = (_, _) => None)(
      req: RenderedRequest): (RenderedRequest, Map[String, String]) = req.url match {

    case Googleads(login, cidSeg, service, method) =>
      val cid = Option(cidSeg)
        .orElse(jsonStr(req.body, "customer_id"))
        .orElse(jsonStr(req.body, "resource_name")
          .collect { case r if r.startsWith("customers/") => r.split('/')(1) })
        .getOrElse(login)
      val headers = if (login.nonEmpty) Map("login-customer-id" -> login) else Map.empty[String, String]
      val mapped = (service, method) match {
        case ("ConversionUploadService", m) =>
          req.copy(url = s"$AdsBase/$AdsVersion/customers/$cid:${restVerb(m)}")
        case ("ConversionAdjustmentUploadService", m) =>
          req.copy(url = s"$AdsBase/$AdsVersion/customers/$cid:${restVerb(m)}")
        case ("UserListService", "create") =>
          // REST surface is UserListService.MutateUserLists; the renderer
          // body is one list definition → one create operation
          req.copy(
            url = s"$AdsBase/$AdsVersion/customers/$cid/userLists:mutate",
            body = s"""{"customer_id": "$cid", "operations": [{"create": ${req.body}}]}""")
        case ("OfflineUserDataJobService", "create") =>
          // CreateOfflineUserDataJobRequest{job}; `type_` is the python
          // client's keyword-collision spelling — the wire field is `type`
          req.copy(
            url = s"$AdsBase/$AdsVersion/customers/$cid/offlineUserDataJobs:create",
            body = s"""{"customer_id": "$cid", "job": ${req.body.replaceFirst("\"type_\":", "\"type\":")}}""")
        case ("OfflineUserDataJobService", "add_operations") =>
          val resource = jsonStr(req.body, "resource_name").getOrElse(
            throw new java.io.IOException(s"add_operations body carries no resource_name: ${req.body.take(120)}"))
          req.copy(url = s"$AdsBase/$AdsVersion/$resource:addOperations")
        case ("OfflineUserDataJobService", "run") =>
          val resource = jsonStr(req.body, "resource_name").getOrElse(
            throw new java.io.IOException(s"run body carries no resource_name: ${req.body.take(120)}"))
          req.copy(url = s"$AdsBase/$AdsVersion/$resource:run")
        case other =>
          throw new java.io.IOException(s"no REST mapping for googleads service $other")
      }
      (mapped, headers)

    case Dfareporting(profileId) =>
      (req.copy(url = s"$CmBase/dfareporting/v4/userprofiles/$profileId/conversions/batchinsert"),
        Map.empty)

    case DvCreate(advertiserId) =>
      (req.copy(url = s"$Dv360Base/v3/firstAndThirdPartyAudiences?advertiserId=$advertiserId"),
        Map.empty)

    case DvEdit(advertiserId, listName) =>
      val id = resolve(advertiserId, listName).getOrElse(
        throw new java.io.IOException(
          s"DV360 audience '$listName' not found for advertiser $advertiserId"))
      (req.copy(url = s"$Dv360Base/v3/firstAndThirdPartyAudiences/$id:editCustomerMatchMembers"),
        Map.empty)

    case _ => (req, Map.empty)
  }

  /** Live audience-id lookup: `GET /v3/firstAndThirdPartyAudiences?
    * advertiserId=..&filter=displayName="<name>"` with the transport's
    * auth headers; first match wins. `rewriteUrl` re-roots onto the
    * configured base (staging/mock), exactly like POSTs do.
    */
  final case class HttpAudienceResolver(
      headers: Map[String, String],
      rewriteUrl: String => String,
      tokenProvider: Option[graft.auth.OAuthTokenProvider] = None,
      timeoutMs: Long = 15000L) extends ((String, String) => Option[String]) with Serializable {

    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
        .build()

    private def get(url: String, token: Option[String]): java.net.http.HttpResponse[String] = {
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs)).GET()
      (headers ++ token.map(t => "Authorization" -> s"Bearer $t"))
        .foreach { case (k, v) => builder.header(k, v) }
      client.send(builder.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    }

    override def apply(advertiserId: String, listName: String): Option[String] = {
      val filter = java.net.URLEncoder.encode(
        "displayName=\"" + listName + "\"", java.nio.charset.StandardCharsets.UTF_8)
      val url = rewriteUrl(
        s"${Dv360Base}/v3/firstAndThirdPartyAudiences?advertiserId=$advertiserId&filter=$filter")
      val token = tokenProvider.flatMap(_.accessToken())
      var resp = get(url, token)
      // same expired-token protocol as HttpTransport POSTs: invalidate the
      // stale token, refresh once, replay — without this a mid-run token
      // expiry would fail every DV360 edit while the POSTs recover
      if (resp.statusCode() == 401 && token.isDefined &&
          tokenProvider.exists(_.canRefresh)) {
        tokenProvider.foreach(_.invalidate(token.get))
        resp = get(url, tokenProvider.flatMap(_.accessToken()))
      }
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"DV360 audience lookup HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      jsonStr(resp.body(), "firstAndThirdPartyAudienceId")
    }
  }
}
