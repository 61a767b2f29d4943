package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model._
import graft.sink.{GoogleRest, RenderedRequest, Renderers, Transport}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/** Live-API contract tests for the Google marketing transports: the REAL
  * `Main --transport http:<base>` wiring (HttpTransport + OAuthTokenProvider
  * + GoogleRest descriptor mapping) drives a local mock server, and each
  * API family's REST path, verb envelope, and headers are pinned the way
  * `HttpConfigDataSpec` pins Sheets/Firestore:
  *
  *  - Google Ads v17 (`uploaders/google_ads/conversions/
  *    google_ads_offline_conversions_uploader.py:30-161`, customer match
  *    `abstract_uploader.py:33-281`): `customers/{cid}:uploadClickConversions`,
  *    userLists:mutate / offlineUserDataJobs:create|:addOperations|:run,
  *    `developer-token` + `login-customer-id` headers;
  *  - CM360 (`campaign_manager_conversion_uploader.py:44-48` builds
  *    dfareporting v4): `dfareporting/v4/userprofiles/{pid}/conversions/
  *    batchinsert`;
  *  - DV360 v3 (display_video customer match): audiences create by
  *    advertiser, members edit by the server-assigned audience id resolved
  *    through a filtered list call.
  */
class GoogleRestSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** (method, path+query, headers-of-interest, body) per wire request. */
  final case class Hit(method: String, pathQ: String,
      auth: String, devToken: String, loginCid: String, body: String)

  private val hits = new ConcurrentLinkedQueue[Hit]()
  private var server: HttpServer = _
  private var port: Int = _
  private def base = s"http://127.0.0.1:$port"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        def h(k: String) = Option(ex.getRequestHeaders.getFirst(k)).getOrElse("")
        val uri = ex.getRequestURI
        val pathQ = uri.getPath + Option(uri.getQuery).map("?" + _).getOrElse("")
        hits.add(Hit(ex.getRequestMethod, pathQ,
          h("Authorization"), h("developer-token"), h("login-customer-id"), body))
        val resp =
          if (ex.getRequestMethod == "GET" && uri.getPath == "/v3/firstAndThirdPartyAudiences")
            """{"firstAndThirdPartyAudiences": [{"name": "firstAndThirdPartyAudiences/999888", "firstAndThirdPartyAudienceId": "999888", "displayName": "crm_list"}]}"""
          else "{}"
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  /** The exact transport `Main --transport http:<base> --access-token ...
    * --developer-token ...` constructs — contract-tested, not re-modeled.
    */
  private def transport: Transport = Main.transportFromFlags(Map(
    "--transport" -> s"http:$base",
    "--access-token" -> "tok-123",
    "--developer-token" -> "dev-456"), outputDir = "/unused")

  private def account = AccountConfig(
    googleAdsAccountId = "123-456-7890", mccTrix = true,
    campaignManagerProfileId = "5550001").normalized

  private def exec(t: DestinationType, meta: Seq[String]) = Execution(account,
    SourceSpec("s", SourceType.File, Seq("parquet", "x")),
    DestinationSpec("d", t, meta))

  private def sendAll(e: Execution, reqs: Seq[RenderedRequest]): Unit =
    reqs.foreach { r =>
      val res = Transport.sendWithRetry(transport, e, r)
      assert(res.error.isEmpty, s"${r.kind}: ${res.error}")
    }

  private def drain(): Seq[Hit] = {
    val out = Seq.newBuilder[Hit]
    var h = hits.poll()
    while (h != null) { out += h; h = hits.poll() }
    out.result()
  }

  test("Google Ads OCI: v17 uploadClickConversions path, bearer + developer-token + login-customer-id") {
    val e = exec(DestinationType.AdsOfflineConversion, Seq("Conv1", "11-22"))
    val reqs = Renderers.AdsOfflineClick.render(e, Seq(scala.collection.immutable.ListMap(
      "time" -> "2024-05-01T10:00:00.000000", "amount" -> "9.5", "gclid" -> "g1")), 1L)
    sendAll(e, reqs)
    val Seq(hit) = drain()
    assert(hit.method == "POST")
    assert(hit.pathQ == "/v17/customers/1122:uploadClickConversions") // metadata[1] cid override
    assert(hit.auth == "Bearer tok-123")
    assert(hit.devToken == "dev-456")
    assert(hit.loginCid == "1234567890") // MCC login from account config
    assert(hit.body == reqs.head.body) // wire body IS the rendered payload
    assert(hit.body.contains(""""gclid": "g1""""))
  }

  test("Google Ads conversion adjustments: v17 uploadConversionAdjustments") {
    val e = exec(DestinationType.AdsOfflineConversionAdjustmentGclid,
      Seq("Conv1", "", "RESTATEMENT"))
    val reqs = Renderers.AdsAdjustmentGclid.render(e, Seq(scala.collection.immutable.ListMap(
      "time" -> "2024-05-01T10:00:00.000000", "amount" -> "3.0",
      "gclid" -> "g9", "conversion_time" -> "2024-05-01T09:00:00.000000")), 1L)
    sendAll(e, reqs)
    val Seq(hit) = drain()
    assert(hit.pathQ == "/v17/customers/1234567890:uploadConversionAdjustments")
    assert(hit.devToken == "dev-456" && hit.loginCid == "1234567890")
    assert(hit.body.contains("conversion_adjustments"))
  }

  test("Google Ads customer match: userLists:mutate, offlineUserDataJobs create/addOperations/run") {
    val e = exec(DestinationType.AdsCustomerMatchContactInfoUpload,
      Seq("crm_list", "ADD", "", "", "1122"))
    val reqs = Renderers.AdsCustomerMatch("contact_info").render(e,
      Seq(scala.collection.immutable.ListMap("hashed_email" -> "ab12")), 1L)
    sendAll(e, reqs)
    val all = drain()
    assert(all.map(_.pathQ) == Seq(
      "/v17/customers/1122/userLists:mutate",
      "/v17/customers/1122/offlineUserDataJobs:create",
      "/v17/customers/1122/offlineUserDataJobs/crm_list:create:addOperations",
      "/v17/customers/1122/offlineUserDataJobs/crm_list:create:run"))
    assert(all.forall(h => h.devToken == "dev-456" && h.loginCid == "1234567890" &&
      h.auth == "Bearer tok-123"))
    // REST envelopes: mutate wraps the list definition in a create op; the
    // job create wraps in {"job": ...} with the python `type_` spelled as
    // the wire field `type`
    val mutate = all.head.body
    assert(mutate.startsWith("""{"customer_id": "1122", "operations": [{"create": {"""))
    assert(mutate.contains(""""upload_key_type": "CONTACT_INFO""""))
    val create = all(1).body
    assert(create.startsWith("""{"customer_id": "1122", "job": {"""))
    assert(create.contains(""""type": "CUSTOMER_MATCH_USER_LIST""""))
    assert(!create.contains("type_"))
    assert(all(2).body.contains(""""enable_partial_failure": true"""))
    assert(all(3).body.contains(""""resource_name": "customers/1122/offlineUserDataJobs/crm_list:create""""))
  }

  test("CM360: dfareporting v4 batchinsert path under the profile id") {
    val e = exec(DestinationType.CmOfflineConversion, Seq("fl-activity", "fl-config"))
    val reqs = Renderers.Cm360(nowMicros = 1714575600000000L).render(e,
      Seq(scala.collection.immutable.ListMap("gclid" -> "g1", "value" -> "2.5")), 1L)
    sendAll(e, reqs)
    val Seq(hit) = drain()
    assert(hit.pathQ == "/dfareporting/v4/userprofiles/5550001/conversions/batchinsert")
    assert(hit.auth == "Bearer tok-123")
    assert(hit.body == reqs.head.body)
    assert(hit.body.contains(""""kind": "dfareporting#customFloodlightVariable"""") ||
      !hit.body.contains("customVariables"))
  }

  test("DV360: create by advertiser id; edit resolves the audience id via filtered list") {
    val e = exec(DestinationType.DvCustomerMatchContactInfoUpload, Seq("77", "crm_list"))
    val rows = Seq(scala.collection.immutable.ListMap[String, Any]("hashedEmails" -> "ab12"))
    val create = Renderers.DvCustomerMatch("contact_info").render(e, rows, 1L)
    sendAll(e, create)
    val Seq(createHit) = drain()
    assert(createHit.method == "POST")
    assert(createHit.pathQ == "/v3/firstAndThirdPartyAudiences?advertiserId=77")
    assert(createHit.body == create.head.body)

    val edit = Renderers.DvCustomerMatch("contact_info").render(e, rows, 2L)
    sendAll(e, edit)
    val editHits = drain()
    assert(editHits.map(h => (h.method, h.pathQ)) == Seq(
      // getRequestURI.getQuery is percent-DECODED; the wire carries
      // filter=displayName%3D%22crm_list%22
      ("GET", "/v3/firstAndThirdPartyAudiences?advertiserId=77&filter=displayName=\"crm_list\""),
      ("POST", "/v3/firstAndThirdPartyAudiences/999888:editCustomerMatchMembers")))
    assert(editHits.forall(_.auth == "Bearer tok-123"))
    assert(editHits.last.body == edit.head.body)
  }

  test("non-Google absolute URLs pass through the adapter unchanged") {
    val (mapped, extra) = GoogleRest.adapt()(RenderedRequest(
      "appsflyer_s2s_event", "https://api2.appsflyer.com/inappevent/app1", "{}", Seq(0)))
    assert(mapped.url == "https://api2.appsflyer.com/inappevent/app1")
    assert(extra.isEmpty)
  }

  test("GA4 MP and AppsFlyer endpoints pass through with their query/path intact") {
    val ga4 = exec(DestinationType.Ga4MeasurementProtocol,
      Seq("secret9", "true", "false", "false", "", "G-777"))
    val ga4Reqs = Renderers.Ga4MeasurementProtocol.render(ga4,
      Seq(scala.collection.immutable.ListMap(
        "uuid" -> "u1", "client_id" -> "c1", "name" -> "purchase")), 1L)
    sendAll(ga4, ga4Reqs)
    val af = exec(DestinationType.AppsFlyerS2SEvents, Seq("com.app.one"))
    val afReqs = Renderers.AppsFlyerS2S.render(af,
      Seq(scala.collection.immutable.ListMap(
        "appsflyer_id" -> "af1", "event_eventName" -> "open")), 1L)
    sendAll(af, afReqs)
    val all = drain()
    assert(all.map(_.pathQ) == Seq(
      "/mp/collect?api_secret=secret9&measurement_id=G-777",
      "/inappevent/com.app.one"))
    assert(all.forall(_.auth == "Bearer tok-123"))
    assert(all.head.body == ga4Reqs.head.body)
    assert(all.last.body == afReqs.head.body)
  }
}
