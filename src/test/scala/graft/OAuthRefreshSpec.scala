package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.OAuthTokenProvider
import graft.model.{Execution, OAuthCredentials}
import graft.sink.{HttpTransport, RenderedRequest, Transport}

/** OAuth refresh-token grant + transparent 401 replay against a REAL local
  * HTTP server — the flow the reference delegates to
  * `google.oauth2.credentials.Credentials` (token_uri
  * `campaign_manager_conversion_uploader.py:42`), here explicit and
  * spec'd: form-encoded grant, expiry-based caching, single-refresh replay
  * on 401.
  */
class OAuthRefreshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val tokenCalls = new AtomicInteger(0)
  private val uploadCalls = new AtomicInteger(0)
  @volatile private var lastGrantBody = ""
  @volatile private var validToken = "tok_1"
  @volatile private var nextExpiresIn = 3600L

  private val creds = OAuthCredentials(clientId = "cid", clientSecret = "c secret",
    refreshToken = "rt/1+x", developerToken = "dev")

  private def respond(ex: HttpExchange, code: Int, text: String): Unit = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastGrantBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val n = tokenCalls.incrementAndGet()
        validToken = s"tok_$n"
        respond(ex, 200,
          s"""{"access_token":"$validToken","expires_in":$nextExpiresIn,"token_type":"Bearer"}""")
      }
    })
    server.createContext("/badtoken", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 400, """{"error":"invalid_grant"}""")
    })
    server.createContext("/always401", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        uploadCalls.incrementAndGet()
        respond(ex, 401, """{"error":{"code":401,"status":"UNAUTHENTICATED"}}""")
      }
    })
    server.createContext("/upload", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        uploadCalls.incrementAndGet()
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        if (auth == s"Bearer $validToken") respond(ex, 200, "{}")
        else respond(ex, 401, """{"error":{"code":401,"status":"UNAUTHENTICATED"}}""")
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private val exec = Execution(graft.model.AccountConfig(),
    graft.model.SourceSpec("s", graft.model.SourceType.File, Seq("parquet", "x")),
    graft.model.DestinationSpec("d",
      graft.model.DestinationType.AdsOfflineConversion, Seq("Conv")))
  private def req = RenderedRequest("upload", s"$base/upload", "{}", Seq(0))

  test("refresh grant is a form-encoded refresh_token POST, cached until expiry") {
    tokenCalls.set(0); nextExpiresIn = 3600L
    val p = new OAuthTokenProvider(creds, s"$base/token")
    val t1 = p.accessToken()
    assert(t1.contains("tok_1"))
    // the grant carries the four standard fields, form-encoded (in a form
    // BODY '+' IS the space encoding — unlike URL path segments)
    assert(lastGrantBody.contains("grant_type=refresh_token"), lastGrantBody)
    assert(lastGrantBody.contains("client_id=cid"), lastGrantBody)
    assert(lastGrantBody.contains("client_secret=c+secret"), lastGrantBody)
    assert(lastGrantBody.contains("refresh_token=rt%2F1%2Bx"), lastGrantBody)
    // cached: three more reads cost zero grants
    (1 to 3).foreach(_ => assert(p.accessToken() == t1))
    assert(tokenCalls.get() == 1)
  }

  test("a token at its expiry skew refreshes on the next read") {
    tokenCalls.set(0); nextExpiresIn = 30L // inside the 60s skew
    val p = new OAuthTokenProvider(creds, s"$base/token")
    assert(p.accessToken().contains("tok_1"))
    assert(p.accessToken().contains("tok_2"), "a near-expiry token must re-grant")
    assert(tokenCalls.get() == 2)
  }

  test("transport replays ONCE on 401 with a freshly refreshed token") {
    tokenCalls.set(0); uploadCalls.set(0); nextExpiresIn = 3600L
    // static token the server does NOT accept -> first send 401s, the
    // replay carries the refreshed token and succeeds
    val p = new OAuthTokenProvider(creds.copy(accessToken = "stale"), s"$base/token")
    val t = HttpTransport(tokenProvider = Some(p))
    val r = Transport.sendWithRetry(t, exec, req)
    assert(r.error.isEmpty, r.error)
    assert(uploadCalls.get() == 2, "one 401 + one replayed success")
    assert(tokenCalls.get() == 1)
    // the refreshed token is now cached: next send is a single 200
    assert(Transport.sendWithRetry(t, exec, req).error.isEmpty)
    assert(uploadCalls.get() == 3)
    assert(tokenCalls.get() == 1)
  }

  test("a second 401 after refresh is a real failure, replayed exactly once") {
    // refresh material present and the grant SUCCEEDS, but the endpoint
    // rejects every token (revoked grant): exactly one refresh + one
    // replay, then row failure — never a refresh loop
    tokenCalls.set(0); uploadCalls.set(0); nextExpiresIn = 3600L
    val p = new OAuthTokenProvider(creds.copy(accessToken = "stale"), s"$base/token")
    val t = HttpTransport(tokenProvider = Some(p))
    val r = Transport.sendWithRetry(t, exec,
      RenderedRequest("upload", s"$base/always401", "{}", Seq(0)))
    assert(r.error.exists(_.contains("HTTP 401")), r.error)
    // one post + one refresh + one replay, then the 401 is terminal for
    // the carried rows (4xx results return without sendWithRetry retrying)
    assert(uploadCalls.get() == 2, s"got ${uploadCalls.get()} posts")
    assert(tokenCalls.get() == 1, s"refresh loop: ${tokenCalls.get()} grants")
  }

  test("no refresh material: 401 cannot be replayed and fails the rows") {
    uploadCalls.set(0)
    val p = new OAuthTokenProvider(OAuthCredentials(accessToken = "stale"), s"$base/token")
    val t = HttpTransport(tokenProvider = Some(p))
    val r = Transport.sendWithRetry(t, exec, req)
    assert(r.error.exists(_.contains("HTTP 401")), r.error)
    assert(uploadCalls.get() == 1, "a 4xx returns without retry or replay")
  }

  test("freshToken refuses the unknown-expiry static token when it can refresh") {
    tokenCalls.set(0); nextExpiresIn = 3600L
    val p = new OAuthTokenProvider(creds.copy(accessToken = "stale"), s"$base/token")
    val fresh = p.freshToken()
    assert(fresh.exists(_ != "stale"), fresh)
    assert(tokenCalls.get() == 1)
    // the grant cached: the transport path reuses it with no second grant
    assert(p.accessToken() == fresh)
    assert(tokenCalls.get() == 1)
    // without refresh material the static token is all there is
    val staticOnly = new OAuthTokenProvider(
      OAuthCredentials(accessToken = "at"), s"$base/token")
    assert(staticOnly.freshToken().contains("at"))
  }

  test("a failing token endpoint surfaces as the row error, not a crash") {
    val p = new OAuthTokenProvider(creds, s"$base/badtoken")
    val t = HttpTransport(tokenProvider = Some(p))
    val r = Transport.sendWithRetry(t, exec, req)
    assert(r.error.exists(_.contains("token refresh failed")), r.error)
  }

  test("provider survives serialization with executor-side null transients") {
    tokenCalls.set(0); nextExpiresIn = 3600L
    val p = new OAuthTokenProvider(creds, s"$base/token")
    assert(p.accessToken().isDefined)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(p); oos.close(); bos.toByteArray
    }
    val p2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject()
      .asInstanceOf[OAuthTokenProvider]
    // transient cache deserializes as null: the copy must re-init and
    // re-grant rather than NPE
    p2.invalidate("whatever")
    assert(p2.accessToken().isDefined)
  }
}
