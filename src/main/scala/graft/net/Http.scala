package graft.net

/** The one driver-side `java.net.http.HttpClient` (selector thread +
  * connection pool are per-client; building one per call site leaks both).
  * Per-request deadlines belong on `HttpRequest.timeout`, so a fixed
  * connect timeout serves every caller. `HttpTransport` keeps its own
  * per-instance client on purpose: its connect timeout is a constructor
  * parameter and the instance is serialized to executors.
  */
object Http {
  lazy val client: java.net.http.HttpClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(15)).build()
}
