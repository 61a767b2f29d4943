package graft.auth

import com.fasterxml.jackson.databind.ObjectMapper

import graft.model.OAuthCredentials

/** OAuth2 refresh-token grant against the public Google token endpoint —
  * the flow the reference delegates to `google.oauth2.credentials
  * .Credentials` (each uploader passes `refresh_token` + `token_uri=
  * 'https://accounts.google.com/o/oauth2/token'`, e.g.
  * `uploaders/campaign_manager/campaign_manager_conversion_uploader.py:39-42`,
  * and the client lib refreshes transparently when the access token
  * expires). Here the same contract is explicit: [[accessToken]] returns a
  * cached token until `expires_in` (minus a safety skew) runs out, then
  * re-POSTs the grant; [[invalidate]] lets a 401-observing caller force an
  * early refresh.
  *
  * Executor model: the provider is Serializable with `@transient` cache
  * state — each executor JVM refreshes independently, exactly like the
  * reference's per-worker client objects. Within one JVM the refresh is
  * synchronized so N parallel upload tasks cost one grant, not N.
  *
  * `tokenUri` is injectable for staging or a local mock server (same
  * pattern as `HttpTransport.rewriteUrl` / `LiveConfigAccess` api bases).
  */
final class OAuthTokenProvider(
    creds: OAuthCredentials,
    tokenUri: String = "https://accounts.google.com/o/oauth2/token",
    timeoutMs: Long = 15000L,
    refreshSkewSeconds: Long = 60L) extends Serializable {

  def canRefresh: Boolean =
    creds.refreshToken.nonEmpty && creds.clientId.nonEmpty && creds.clientSecret.nonEmpty

  // (token, hard expiry epoch-millis); starts from the statically supplied
  // access token with UNKNOWN expiry (Long.MaxValue) — it is used until a
  // 401 invalidates it, matching how the reference trusts the CLI token.
  // @transient AnyRef vars deserialize as NULL (not None) on executors, so
  // every access goes through ensureInit() under the lock.
  @transient private var cached: Option[(String, Long)] = None
  @transient private var initialized = false

  private def ensureInit(): Unit =
    if (!initialized) {
      initialized = true
      cached =
        if (creds.accessToken.nonEmpty) Some((creds.accessToken, Long.MaxValue))
        else None
    }

  /** The access token to put on the wire right now, refreshing if the
    * cached one is within `refreshSkewSeconds` of expiry. None when no
    * token material exists at all (offline runs).
    */
  def accessToken(): Option[String] = synchronized {
    ensureInit()
    cached match {
      case Some((tok, exp))
          if exp - refreshSkewSeconds * 1000L > System.currentTimeMillis() =>
        Some(tok)
      case _ if canRefresh => cached = Some(refresh()); cached.map(_._1)
      case still => still.map(_._1) // static token past skew: keep using it
    }
  }

  /** Drop `stale` from the cache (no-op if a refresh already replaced it —
    * N tasks observing the same 401 trigger ONE refresh, not N).
    */
  def invalidate(stale: String): Unit = synchronized {
    ensureInit()
    if (cached.exists(_._1 == stale)) cached = None
  }

  /** A token guaranteed not to be the unknown-expiry STATIC one when a
    * refresh is possible — for one-shot call sites with no 401-replay loop
    * (the startup config fetch): a stale pasted `--access-token` would
    * otherwise be served at Long.MaxValue expiry and fail the whole fetch.
    * The grant caches, so the transport's first send reuses it (still one
    * grant per run).
    */
  def freshToken(): Option[String] = synchronized {
    ensureInit()
    if (canRefresh && cached.exists(_._2 == Long.MaxValue)) cached = None
    accessToken()
  }

  private def refresh(): (String, Long) = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val form = Seq(
      "grant_type" -> "refresh_token",
      "client_id" -> creds.clientId,
      "client_secret" -> creds.clientSecret,
      "refresh_token" -> creds.refreshToken)
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(tokenUri))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(form)).build()
    val resp = graft.net.Http.client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw new java.io.IOException(
      s"OAuth token refresh failed: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val node = new ObjectMapper().readTree(resp.body())
    val token = Option(node.get("access_token")).map(_.asText()).filter(_.nonEmpty)
      .getOrElse(throw new java.io.IOException(
        s"OAuth token response carried no access_token: ${resp.body().take(200)}"))
    val expiresIn = Option(node.get("expires_in")).map(_.asLong()).getOrElse(3600L)
    (token, System.currentTimeMillis() + expiresIn * 1000L)
  }
}

