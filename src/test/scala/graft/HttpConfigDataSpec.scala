package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{FirestoreConfigSource, HttpFirestoreData, HttpSheetsData, SpreadsheetConfigSource}

/** Live config fetchers against a REAL local HTTP server speaking the
  * Google REST shapes — the SpreadsheetConfigSource / FirestoreConfigSource
  * parsers run end-to-end through HTTP exactly as they would against the
  * cloud APIs, with only the api base swapped (the same injection Main's
  * `--config-api-base` performs).
  */
class HttpConfigDataSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val firestorePages = new AtomicInteger(0)
  private val rawPaths = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private val ranges: Map[String, Seq[Seq[String]]] = Map(
    "'My Sheet'!A1:B2" -> Seq(Seq("spaced")),
    "GoogleAdsAccountId" -> Seq(Seq("123-456-7890")),
    "GoogleAdsMCC" -> Seq(Seq("Yes")),
    "AppId" -> Seq(Seq("my.app")),
    "GoogleAnalyticsAccountId" -> Seq(Seq("UA-1234-5")),
    "CampaignManagerAccountId" -> Seq(Seq("999")),
    "SourcesRange" -> Seq(
      Seq("src oci", "FILE", "parquet", "/tmp/x.parquet")),
    "DestinationsRange" -> Seq(
      Seq("dst oci", "ADS_OFFLINE_CONVERSION", "Conv_Name")),
    "SchedulesRange" -> Seq(Seq("YES", "src oci", "dst oci")))

  private def json(vs: Seq[Seq[String]]): String =
    """{"range":"x","values":[""" + vs.map(row =>
      row.map(c => "\"" + c + "\"").mkString("[", ",", "]")).mkString(",") + "]}"

  private def fsDoc(id: String, fields: Map[String, String]): String =
    s"""{"name":"projects/p1/databases/(default)/documents/coll/$id","fields":{""" +
      fields.map { case (k, v) => s""""$k":{"stringValue":"$v"}""" }.mkString(",") + "}}"

  private val docFields = Map(
    "active" -> "yes", "source_name" -> "src fs", "source" -> "BIG_QUERY",
    "bq_dataset" -> "ds", "bq_table" -> "conversions",
    "destination_name" -> "dst fs",
    "type" -> "ADS_CUSTOMER_MATCH_CONTACT_INFO_UPLOAD",
    "gads_audience_name" -> "aud", "gads_operation" -> "ADD",
    "gads_hash" -> "true", "gads_account" -> "555")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, text: String): Unit = {
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/v4/spreadsheets/sheet42/values/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        rawPaths.add(ex.getRequestURI.getRawPath)
        val name = java.net.URLDecoder.decode(
          ex.getRequestURI.getPath.split("/").last, "UTF-8")
        ranges.get(name) match {
          case Some(vs) => respond(ex, 200, json(vs))
          case None => respond(ex, 400,
            """{"error":{"code":400,"status":"INVALID_ARGUMENT"}}""")
        }
      }
    })
    server.createContext("/v1/projects/p1/databases/(default)/documents/coll",
      new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val path = ex.getRequestURI.getPath
          val query = Option(ex.getRequestURI.getQuery).getOrElse("")
          if (path.endsWith("/account_config"))
            respond(ex, 200, fsDoc("account_config",
              Map("google_ads_id" -> "123", "mcc_trix" -> "TRUE")))
          else if (query.contains("pageToken=p 2+x")) {
            // the token has a space AND a '+': only reachable if the client
            // percent-encoded it (raw `p 2+x` is an illegal URI; raw `p+2`
            // would decode as a space). getQuery returns it decoded.
            firestorePages.incrementAndGet()
            // page 2: one inactive doc (filtered) — exercises pagination
            respond(ex, 200, s"""{"documents":[${fsDoc("d2",
              docFields + ("active" -> "no") + ("destination_name" -> "dst off"))}]}""")
          } else {
            firestorePages.incrementAndGet()
            respond(ex, 200, s"""{"documents":[${fsDoc("d1", docFields)}],
              "nextPageToken":"p 2+x"}""")
          }
        }
      })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("sheets parser runs end-to-end over the REST fetch seam") {
    val src = new SpreadsheetConfigSource(new HttpSheetsData("sheet42", base))
    val execs = src.executions()
    assert(execs.map(_.key) == Seq("src oci -> dst oci"))
    assert(execs.head.account.googleAdsAccountId == "1234567890")
    assert(execs.head.account.mccTrix)
    assert(execs.head.destination.metadata == Seq("Conv_Name"))
  }

  test("sheets fetcher maps an unknown named range to rangeExists=false") {
    val data = new HttpSheetsData("sheet42", base)
    assert(!data.rangeExists("NoSuchRange"))
    assert(data.getValue("AppId").contains("my.app"))
  }

  test("range names percent-encode as path segments (space is %20, never +)") {
    rawPaths.clear()
    val data = new HttpSheetsData("sheet42", base)
    assert(data.getRange("'My Sheet'!A1:B2").contains(Seq(Seq("spaced"))))
    val raw = rawPaths.toArray(Array.empty[String]).toSeq
    assert(raw.exists(_.endsWith("/%27My%20Sheet%27%21A1%3AB2")), raw)
    assert(raw.forall(!_.contains("+")), raw)
  }

  test("a missing SPREADSHEET (404) fails loudly instead of parsing as empty") {
    // no context registered for sheet 'nope' -> the server 404s, which must
    // surface as an error, not as an empty schedule that exits 0
    val data = new HttpSheetsData("nope", base)
    val err = intercept[java.io.IOException](data.getRange("GoogleAdsAccountId"))
    assert(err.getMessage.contains("404"), err.getMessage)
  }

  test("firestore parser runs end-to-end with pagination and active filter") {
    firestorePages.set(0)
    val src = new FirestoreConfigSource(
      new HttpFirestoreData("p1", "coll", base))
    val execs = src.executions()
    // page-2 doc is inactive -> filtered; page-1 doc parses fully
    assert(execs.map(_.key) == Seq("src fs -> dst fs"))
    assert(execs.head.destination.metadata ==
      Seq("aud", "ADD", "true", "N/A", "555"))
    assert(execs.head.account.googleAdsAccountId == "123")
    assert(execs.head.account.mccTrix)
    assert(firestorePages.get() == 2, "pagination did not follow nextPageToken")
  }
}
