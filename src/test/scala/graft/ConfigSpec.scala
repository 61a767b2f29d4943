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
}
