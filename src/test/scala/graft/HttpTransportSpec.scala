package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.config.JsonConfigSource
import graft.pipeline.{Pipeline, PipelineOptions}
import graft.sink.{HttpTransport, RenderedRequest, Transport}
import org.scalatest.BeforeAndAfterAll

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Validates a REAL network client against the transport seam: a local JDK
  * HttpServer stands in for the destination APIs, and the full pipeline
  * drives it — rendered payloads arrive over the wire, 5xx responses retry
  * through `safe_call_api` semantics, and 4xx responses fail the carried
  * rows permanently.
  */
class HttpTransportSpec extends SparkTestBase with BeforeAndAfterAll {

  private val received = new ConcurrentLinkedQueue[(String, String)]()
  private val flakyHits = new AtomicInteger(0)
  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def body(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    def respond(ex: HttpExchange, code: Int, text: String): Unit = {
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/upload", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.add((ex.getRequestURI.getPath, body(ex)))
        respond(ex, 200, "ok")
      }
    })
    server.createContext("/flaky", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        body(ex)
        if (flakyHits.incrementAndGet() == 1) respond(ex, 503, "transient")
        else respond(ex, 200, "ok")
      }
    })
    server.createContext("/reject", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = { body(ex); respond(ex, 400, "bad payload") }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  private def exec = graft.model.Execution(graft.model.AccountConfig(),
    graft.model.SourceSpec("s", graft.model.SourceType.File, Seq("parquet", "x")),
    graft.model.DestinationSpec("d", graft.model.DestinationType.AdsOfflineConversion, Seq("Conv")))

  private def req(path: String) =
    RenderedRequest("kind", s"http://127.0.0.1:$port$path", """{"k": 1}""", Seq(0))

  test("2xx succeeds, 5xx retries via sendWithRetry, 4xx fails rows permanently") {
    val t = HttpTransport()
    assert(Transport.sendWithRetry(t, exec, req("/upload")).error.isEmpty)
    flakyHits.set(0)
    val flaky = Transport.sendWithRetry(t, exec, req("/flaky"))
    assert(flaky.error.isEmpty, s"retry should have recovered: ${flaky.error}")
    assert(flakyHits.get() == 2) // 503 then 200
    val rejected = Transport.sendWithRetry(t, exec, req("/reject"))
    assert(rejected.error.exists(_.contains("HTTP 400")))
  }

  test("the full pipeline uploads over live HTTP with the rendered payloads") {
    received.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_http").toString
    val src = s"$dir/conversions.parquet"
    import spark.implicits._
    (1 to 7).map(i => (s"g$i", "2024-05-01T10:00:00.000000", s"$i.5"))
      .toDF("gclid", "time", "amount").write.parquet(src)
    val config = s"""{
      "GoogleAdsAccountId": "1234567890",
      "Sources": [{"Name": "s", "Type": "FILE", "Dataset": "parquet", "Table": "$src"}],
      "Destinations": [{"Name": "d", "Type": "ADS_OFFLINE_CONVERSION", "Metadata": ["Conv"]}],
      "Connections": [{"Enabled": true, "Source": "s", "Destination": "d"}]
    }"""
    val endpoint = s"http://127.0.0.1:$port/upload"
    val report = Pipeline.run(spark, JsonConfigSource.fromString(config).executions(),
      PipelineOptions(transport = HttpTransport(rewriteUrl = _ => endpoint)))
    assert(report.exitCode == 0)
    assert(report.totalUploaded == 7)
    val bodies = received.toArray(Array.empty[(String, String)]).map(_._2)
    assert(bodies.nonEmpty)
    // the wire bodies are the rendered conversion payloads
    assert(bodies.exists(_.contains(""""gclid": "g1"""")))
    assert(bodies.forall(_.contains("conversion_action")))
  }
}
