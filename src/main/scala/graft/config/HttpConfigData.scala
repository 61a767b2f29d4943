package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Live config fetchers over the PUBLIC Google REST surfaces — the
  * config-plane dual of the sink's `HttpTransport`: the parsers
  * ([[SpreadsheetConfigSource]], [[FirestoreConfigSource]]) stay untouched
  * and fully spec'd against in-memory data; these classes only implement the
  * fetch seams ([[SheetsData]], [[FirestoreData]]) with plain HTTPS GETs, so
  * live config is a flag (`--sheet-id` / `--firestore-*` + an access token),
  * not a code change. `apiBase` is injectable for staging or a local mock
  * server (the same pattern `HttpTransport.rewriteUrl` uses); auth headers
  * come from [[graft.model.OAuthCredentials.authHeaders]].
  *
  * Reference surfaces being replaced: the Python clients in
  * `sources/spreadsheet_execution_source.py:25-42` (Sheets values.get) and
  * `sources/firestore_execution_source.py:25-43` (collection stream).
  */
private[config] object HttpConfigData {
  final case class Response(code: Int, body: String)

  // a config load issues 10-15 GETs (range probes, account cells, pages) —
  // they all ride the one shared driver-side client ([[graft.net.Http]]);
  // per-request deadlines still apply via HttpRequest.timeout below
  def get(url: String, headers: Map[String, String], timeoutMs: Long): Response = {
    val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET()
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = graft.net.Http.client.send(builder.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    Response(resp.statusCode(), resp.body())
  }

  /** Percent-encode one URL path segment / query value. URLEncoder does
    * FORM encoding (space -> '+', which a path decoder takes literally), so
    * its '+' must become %20 for "'My Sheet'!A1:B2"-style range names and
    * opaque page tokens to survive the round trip.
    */
  def encodeSegment(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}

/** [[SheetsData]] over the Sheets v4 REST API:
  * `GET {base}/v4/spreadsheets/{id}/values/{range}` returns
  * `{"range": "...", "values": [[...]]}`; an unknown named range is a 400
  * (the API's INVALID_ARGUMENT for unparseable ranges), mapped to None so
  * `rangeExists` keeps the reference's `check_if_range_exists` semantics.
  */
final class HttpSheetsData(spreadsheetId: String,
    apiBase: String = "https://sheets.googleapis.com",
    headers: Map[String, String] = Map.empty,
    timeoutMs: Long = 15000L) extends SheetsData {

  private val mapper = new ObjectMapper
  // one fetch per named range per config load: the parser probes ranges
  // repeatedly (existence checks, account cells), and a live config read
  // should be one consistent snapshot, not N re-fetches
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Option[Seq[Seq[String]]]]()

  override def getRange(name: String): Option[Seq[Seq[String]]] =
    cache.computeIfAbsent(name, fetchRange(_))

  private def fetchRange(name: String): Option[Seq[Seq[String]]] = {
    val enc = HttpConfigData.encodeSegment(name)
    val url = s"${apiBase.stripSuffix("/")}/v4/spreadsheets/$spreadsheetId/values/$enc"
    val resp = HttpConfigData.get(url, headers, timeoutMs)
    resp.code match {
      case 200 =>
        val node = mapper.readTree(resp.body)
        // a range that exists but is empty has NO "values" key — that is
        // still an existing range (empty grid), not a missing one
        Some(Option(node.get("values")).map(_.asScala.toSeq.map(row =>
          row.asScala.toSeq.map(_.asText()))).getOrElse(Seq.empty))
      // ONLY 400 (INVALID_ARGUMENT: unparseable/unknown range) means "this
      // range doesn't exist". A 404 means the SPREADSHEET is missing — a
      // typo'd --sheet-id must fail loudly, not parse as an empty schedule
      // and exit 0 having uploaded nothing.
      case 400 => None
      case code => throw new java.io.IOException(
        s"Sheets API GET $url failed: HTTP $code: ${resp.body.take(200)}")
    }
  }
}

/** [[FirestoreData]] over the Firestore v1 REST API. Documents arrive as
  * `{"documents":[{"name": ".../{id}", "fields": {"k": {"stringValue":
  * "v"}}}]}`; fields flatten to the string map the parser consumes
  * (string/boolean/integer/double values stringified — the reference's
  * schedules are all strings). Pagination via `nextPageToken` so a
  * collection larger than one page still loads completely.
  */
final class HttpFirestoreData(project: String, collection: String,
    apiBase: String = "https://firestore.googleapis.com",
    headers: Map[String, String] = Map.empty,
    timeoutMs: Long = 15000L,
    accountDocId: String = "account_config") extends FirestoreData {

  private val mapper = new ObjectMapper
  private def docsBase =
    s"${apiBase.stripSuffix("/")}/v1/projects/$project/databases/(default)/documents"

  private def fieldsToMap(doc: JsonNode): Map[String, String] =
    Option(doc.get("fields")).map { fields =>
      fields.properties().asScala.map { e =>
        val v = e.getValue
        val s = Seq("stringValue", "booleanValue", "integerValue", "doubleValue")
          .flatMap(k => Option(v.get(k))).headOption.map(_.asText()).getOrElse("")
        e.getKey -> s
      }.toMap
    }.getOrElse(Map.empty)

  override def scheduleDocuments(): Seq[Map[String, String]] = allDocs

  // memoized: the parser reads the schedule list more than once, and a live
  // config load should see ONE collection snapshot
  private lazy val allDocs: Seq[Map[String, String]] = {
    val out = Seq.newBuilder[Map[String, String]]
    var pageToken: Option[String] = None
    var more = true
    while (more) {
      // page tokens are opaque strings with no URL-safety guarantee —
      // encode, or a '+'/'=' inside one 400s exactly when pagination matters
      val url = s"$docsBase/$collection?pageSize=300" +
        pageToken.map(t => s"&pageToken=${HttpConfigData.encodeSegment(t)}").getOrElse("")
      val resp = HttpConfigData.get(url, headers, timeoutMs)
      if (resp.code != 200) throw new java.io.IOException(
        s"Firestore API GET $url failed: HTTP ${resp.code}: ${resp.body.take(200)}")
      val node = mapper.readTree(resp.body)
      Option(node.get("documents")).foreach(_.asScala.foreach(d => out += fieldsToMap(d)))
      pageToken = Option(node.get("nextPageToken")).map(_.asText()).filter(_.nonEmpty)
      more = pageToken.isDefined
    }
    // same activation gate as the reference stream (`active == 'yes'`)
    out.result().filter(_.get("active").contains("yes"))
  }

  override def accountDocument(): Option[Map[String, String]] = accountDoc

  private lazy val accountDoc: Option[Map[String, String]] = {
    val resp = HttpConfigData.get(s"$docsBase/$collection/$accountDocId",
      headers, timeoutMs)
    resp.code match {
      case 200 => Some(fieldsToMap(mapper.readTree(resp.body)))
      case 404 => None
      case code => throw new java.io.IOException(
        s"Firestore account doc fetch failed: HTTP $code: ${resp.body.take(200)}")
    }
  }
}
