package graft

import graft.config.JsonConfigSource
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private val sample =
    """{
      "GoogleAdsAccountId": "123-456-7890",
      "GoogleAdsMCC": true,
      "AppId": "my.app",
      "GoogleAnalyticsAccountId": "UA-1234-5",
      "CampaignManagerAccountId": "999",
      "Sources": [
        {"Name": "src oci", "Type": "BIG_QUERY", "Dataset": "ds", "Table": "conversions"},
        {"Name": "src mp", "Type": "FILE", "Dataset": "parquet", "Table": "/tmp/x.parquet"}
      ],
      "Destinations": [
        {"Name": "dst oci", "Type": "ADS_OFFLINE_CONVERSION", "Metadata": ["Conv_Name"]},
        {"Name": "dst mp", "Type": "GA_MEASUREMENT_PROTOCOL", "Metadata": ["GA_ID", 1]}
      ],
      "Connections": [
        {"Enabled": true, "Source": "src oci", "Destination": "dst oci"},
        {"Enabled": false, "Source": "src mp", "Destination": "dst mp"}
      ]
    }"""

  test("parses account config with digit normalization and CM account fallback") {
    val cfg = JsonConfigSource.fromString(sample)
    val account = cfg.accountConfig
    assert(account.googleAdsAccountId == "1234567890") // digits only
    assert(account.mccTrix)
    assert(account.googleAnalyticsAccountId == "12345")
    assert(account.campaignManagerProfileId == "999") // AccountId fallback
    assert(account.appId == "my.app")
  }

  test("CampaignManagerProfileId takes precedence over CampaignManagerAccountId") {
    val cfg = JsonConfigSource.fromString(
      """{"CampaignManagerProfileId": "111", "CampaignManagerAccountId": "222"}""")
    assert(cfg.accountConfig.campaignManagerProfileId == "111")
  }

  test("sources and destinations parse positional metadata (mixed types stringified)") {
    val cfg = JsonConfigSource.fromString(sample)
    assert(cfg.sources("src oci") ==
      SourceSpec("src oci", SourceType.BigQuery, Seq("ds", "conversions")))
    assert(cfg.destinations("dst mp").metadata == Seq("GA_ID", "1"))
  }

  test("only enabled connections become executions") {
    val execs = JsonConfigSource.fromString(sample).executions()
    assert(execs.map(_.key) == Seq("src oci -> dst oci"))
    assert(execs.head.destination.destinationType == DestinationType.AdsOfflineConversion)
  }

  test("missing sections yield empty plan") {
    assert(JsonConfigSource.fromString("{}").executions().isEmpty)
  }

  // ---- Sheets-backed source (spreadsheet_execution_source.py semantics)

  private def sheet(extra: Map[String, Seq[Seq[String]]] = Map.empty) =
    new graft.config.SpreadsheetConfigSource(graft.config.InMemorySheet(Map(
      "GoogleAdsAccountId" -> Seq(Seq("123-456-7890")),
      "GoogleAdsMCC" -> Seq(Seq("Yes")),
      "AppId" -> Seq(Seq("my.app")),
      "GoogleAnalyticsAccountId" -> Seq(Seq("UA-1234-5")),
      "CampaignManagerAccountId" -> Seq(Seq("999")),
      "SourcesRange" -> Seq(
        Seq("src oci", "BIG_QUERY", "ds", "conversions"),
        Seq("src mp", "FILE", "parquet", "/tmp/x.parquet")),
      "DestinationsRange" -> Seq(
        Seq("dst oci", "ADS_OFFLINE_CONVERSION", "Conv_Name"),
        Seq("dst mp", "GA_MEASUREMENT_PROTOCOL", "GA_ID", "1")),
      "SchedulesRange" -> Seq(
        Seq("YES", "src oci", "dst oci"),
        Seq("NO", "src mp", "dst mp"))) ++ extra))

  test("sheets source parses account cells with strtobool MCC and CM fallback") {
    val account = sheet().accountConfig
    assert(account.googleAdsAccountId == "1234567890")
    assert(account.mccTrix) // strtobool("Yes")
    assert(account.campaignManagerProfileId == "999") // AccountId fallback
    // the PROFILE range existing takes precedence even over the account id
    val withProfile = sheet(Map("CampaignManagerProfileId" -> Seq(Seq("111"))))
    assert(withProfile.accountConfig.campaignManagerProfileId == "111")
  }

  test("sheets source yields only YES-scheduled executions") {
    val execs = sheet().executions()
    assert(execs.map(_.key) == Seq("src oci -> dst oci"))
    assert(execs.head.source.metadata == Seq("ds", "conversions"))
    assert(execs.head.destination.metadata == Seq("Conv_Name"))
  }

  test("strtobool accepts the distutils truth table and rejects garbage") {
    import graft.config.ConfigValues.strtobool
    assert(Seq("y", "YES", "t", "True", "on", "1").forall(strtobool))
    assert(!Seq("n", "No", "f", "FALSE", "off", "0").exists(strtobool))
    intercept[IllegalArgumentException](strtobool("maybe"))
  }

  // ---- Firestore-backed source (firestore_execution_source.py semantics)

  private def firestoreDoc(active: String = "yes") = Map(
    "active" -> active,
    "source_name" -> "src fs",
    "source" -> "BIG_QUERY",
    "bq_dataset" -> "ds",
    "bq_table" -> "conversions",
    "destination_name" -> "dst fs",
    "type" -> "ADS_CUSTOMER_MATCH_CONTACT_INFO_UPLOAD",
    "gads_audience_name" -> "aud",
    "gads_operation" -> "ADD",
    "gads_hash" -> "true",
    "gads_account" -> "555")

  test("firestore source reconstructs positional metadata with padding") {
    val src = new graft.config.FirestoreConfigSource(graft.config.InMemoryFirestore(
      Seq(firestoreDoc()), Some(Map("google_ads_id" -> "123", "mcc_trix" -> "TRUE"))))
    val execs = src.executions()
    assert(execs.map(_.key) == Seq("src fs -> dst fs"))
    // metadata_padding fills index 3 with N/A, preserving the Sheets layout
    assert(execs.head.destination.metadata == Seq("aud", "ADD", "true", "N/A", "555"))
    assert(execs.head.source.metadata == Seq("ds", "conversions"))
    assert(execs.head.account.googleAdsAccountId == "123")
    assert(execs.head.account.mccTrix)
  }

  test("firestore source filters inactive docs and flags missing fields") {
    val inactive = new graft.config.FirestoreConfigSource(graft.config.InMemoryFirestore(
      Seq(firestoreDoc(active = "no")), Some(Map.empty)))
    assert(inactive.executions().isEmpty)
    val missing = new graft.config.FirestoreConfigSource(graft.config.InMemoryFirestore(
      Seq(firestoreDoc() - "gads_account"), Some(Map.empty)))
    val ex = intercept[IllegalArgumentException](missing.executions())
    assert(ex.getMessage.contains("gads_account"))
    val noAccount = new graft.config.FirestoreConfigSource(
      graft.config.InMemoryFirestore(Seq(firestoreDoc()), None))
    intercept[IllegalStateException](noAccount.executions())
  }

  test("live-API plug points still throw with remediation hints") {
    intercept[UnsupportedOperationException](
      graft.config.PrimaryConfigSource.select(Some("sheet1"), None, None).executions())
    intercept[UnsupportedOperationException](
      graft.config.PrimaryConfigSource.select(None, None, Some("coll")).executions())
  }

  test("CLI flags assemble the live-mode scaffold: oauth block + http transport") {
    val flags = Map(
      "--client-id" -> "cid", "--client-secret" -> "cs",
      "--access-token" -> "at", "--refresh-token" -> "rt",
      "--developer-token" -> "devtok",
      "--transport" -> "http:https://staging.example.com/v1")
    val oauth = Main.oauthFromFlags(flags)
    assert(oauth == graft.model.OAuthCredentials("cid", "cs", "at", "rt", "devtok"))
    assert(oauth.authHeaders == Map(
      "Authorization" -> "Bearer at", "developer-token" -> "devtok"))
    // no tokens → no auth headers (offline default stays clean)
    assert(Main.oauthFromFlags(Map.empty).authHeaders.isEmpty)

    Main.transportFromFlags(flags, "/tmp/unused") match {
      case t: graft.sink.HttpTransport =>
        // Authorization is OWNED by the token provider (refresh + 401
        // replay); the static headers carry the rest. With a static
        // --access-token the provider serves it without any token call.
        assert(!t.headers.contains("Authorization"))
        assert(t.tokenProvider.flatMap(_.accessToken()).contains("at"))
        assert(t.headers("developer-token") == "devtok")
        assert(t.headers("Content-Type") == "application/json")
        // the renderer's production endpoint re-roots onto the base
        assert(t.rewriteUrl("https://googleads.googleapis.com/v17/customers:run")
          == "https://staging.example.com/v1/v17/customers:run")
      case other => fail(s"expected HttpTransport, got $other")
    }
    // default stays the offline file transport
    Main.transportFromFlags(Map.empty, "/tmp/out") match {
      case f: graft.sink.FileTransport => assert(f.dir == "/tmp/out")
      case other => fail(s"expected FileTransport, got $other")
    }
    val err = intercept[RuntimeException](
      Main.transportFromFlags(Map("--transport" -> "grpc"), "/tmp/out"))
    assert(err.getMessage.contains("grpc"))
    // the natural misspelling `http://host` (a plain URL) must be rejected
    // at startup, not fail every send with a scheme-less URI
    val err2 = intercept[RuntimeException](Main.transportFromFlags(
      Map("--transport" -> "http://staging.example.com"), "/tmp/out"))
    assert(err2.getMessage.contains("base URL"), err2.getMessage)
  }

  test("config-source flags validate at startup with the missing flag named") {
    val err = intercept[RuntimeException](Main.validateConfigFlags(
      Map("--firestore-collection" -> "coll")))
    assert(err.getMessage.contains("--firestore-project"), err.getMessage)
    Main.validateConfigFlags(
      Map("--firestore-collection" -> "coll", "--firestore-project" -> "p1"))
    Main.validateConfigFlags(Map("--config" -> "/tmp/cfg.json"))
    val none = intercept[RuntimeException](Main.validateConfigFlags(Map.empty))
    assert(none.getMessage.contains("--config"), none.getMessage)
    // a refresh token that can never complete its grant must fail at
    // startup, not 401 on every row with nothing naming the missing flag
    val noClient = intercept[RuntimeException](Main.validateConfigFlags(
      Map("--config" -> "c", "--refresh-token" -> "rt", "--client-id" -> "cid")))
    assert(noClient.getMessage.contains("--client-secret"), noClient.getMessage)
    val orphanUri = intercept[RuntimeException](Main.validateConfigFlags(
      Map("--config" -> "c", "--token-uri" -> "http://x/token")))
    assert(orphanUri.getMessage.contains("--refresh-token"), orphanUri.getMessage)
    Main.validateConfigFlags(Map("--config" -> "c", "--refresh-token" -> "rt",
      "--client-id" -> "cid", "--client-secret" -> "cs",
      "--token-uri" -> "http://x/token"))
  }
  test("--bq-format validates at startup: unregistered format names the flag and the jar") {
    val conf = new org.apache.spark.sql.internal.SQLConf()
    // registered formats pass: the offline default, the bundled DSv2
    // connector, and the plain file formats
    Seq("parquet", "graft-bq", "json", "orc").foreach(Main.validateBqFormat(conf, _))
    // the real BigQuery connector jar is not bundled — the failure must
    // name the flag and the wiring, not surface as a mid-run CNFE
    val bq = intercept[RuntimeException](Main.validateBqFormat(conf, "bigquery"))
    assert(bq.getMessage.contains("--bq-format"), bq.getMessage)
    assert(bq.getMessage.contains("spark-bigquery"), bq.getMessage)
    val typo = intercept[RuntimeException](Main.validateBqFormat(conf, "parqeut"))
    assert(typo.getMessage.contains("--bq-format"), typo.getMessage)
    assert(typo.getMessage.contains("graft-bq"), typo.getMessage)
  }
}
