package graft

import graft.model._
import graft.sink._
import graft.transform.TimeUtils
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.ListMap

/** Payload-rendering vectors lifted from the reference's uploader tests —
  * the exact bodies its mocks assert.
  */
class RendererSpec extends AnyFunSuite {

  private val account = AccountConfig("1234567890", mccTrix = false, "567890", "999", "app.id")
  private def exec(dt: DestinationType, meta: Seq[String]) = Execution(
    account,
    SourceSpec("orig1", SourceType.BigQuery, Seq("dt1", "buyers")),
    DestinationSpec("dest1", dt, meta))

  // ---- reference uploaders/utils_test vectors for date rendering

  test("formatDate renders Sao Paulo offset (OCI test vectors :81-85)") {
    assert(TimeUtils.formatDate("2020-04-09T14:13:55.0005") == "2020-04-09 14:13:55-03:00")
    assert(TimeUtils.formatDate("2020-04-09T13:13:55.0005") == "2020-04-09 13:13:55-03:00")
    // pre-2019 southern summer had DST: -02:00
    assert(TimeUtils.formatDate("2018-01-15T10:00:00.000000") == "2018-01-15 10:00:00-02:00")
    // pytz.localize(is_dst=False) parity on the DST edges (reference
    // uploaders/utils.py:29,50-58): the spring-forward GAP keeps its wall
    // clock with the STANDARD offset (atZone would shift it to 01:30-02:00)
    assert(TimeUtils.formatDate("2018-11-04T00:30:00.000000") == "2018-11-04 00:30:00-03:00")
    // and the fall-back AMBIGUOUS window takes the standard offset too
    assert(TimeUtils.formatDate("2018-02-17T23:30:00.000000") == "2018-02-17 23:30:00-03:00")
  }

  test("timestampMicros is epoch micros (10e5 == 1e6, not a magnitude quirk)") {
    assert(TimeUtils.timestampMicros("1970-01-01T00:00:01.000001") == 1000001L)
  }

  // ---- Ads customer match (contact_info_uploader_test.py:52-100)

  test("CM contact-info ADD renders one op per identifier in row-key order") {
    val e = exec(DestinationType.AdsCustomerMatchContactInfoUpload, Seq("user_list", "ADD"))
    val row = ListMap[String, Any](
      "hashed_email" -> "email1",
      "hashed_phone_number" -> "phone1",
      "address_info" -> ListMap(
        "hashed_first_name" -> "first1", "hashed_last_name" -> "last1",
        "country_code" -> "country1", "postal_code" -> "postal1"))
    val reqs = Renderers.AdsCustomerMatch("contact_info").render(e, Seq(row), 1L)
    assert(reqs.map(_.kind) == Seq("ensure_user_list", "create_offline_user_data_job",
      "add_offline_user_data_job_operations", "run_offline_user_data_job"))
    val ops = reqs(2).body
    val expectedOps =
      """"operations": [{"create": {"user_identifiers": [{"hashed_email": "email1"}]}}, """ +
        """{"create": {"user_identifiers": [{"address_info": {"hashed_first_name": "first1", """ +
        """"hashed_last_name": "last1", "country_code": "country1", "postal_code": "postal1"}}]}}, """ +
        """{"create": {"user_identifiers": [{"hashed_phone_number": "phone1"}]}}]"""
    assert(ops.contains(expectedOps), s"payload was: $ops")
    assert(ops.contains(""""enable_partial_failure": true"""))
  }

  test("CM REPLACE emits remove_all only on iteration 1 (abstract_uploader.py:244-249)") {
    val e = exec(DestinationType.AdsCustomerMatchContactInfoUpload, Seq("user_list", "REPLACE"))
    val row = ListMap[String, Any]("hashed_email" -> "email1")
    val it1 = Renderers.AdsCustomerMatch("contact_info").render(e, Seq(row), 1L)
      .find(_.kind == "add_offline_user_data_job_operations").get.body
    val it2 = Renderers.AdsCustomerMatch("contact_info").render(e, Seq(row), 2L)
      .find(_.kind == "add_offline_user_data_job_operations").get.body
    assert(it1.contains(""""remove_all": true"""))
    assert(!it2.contains("remove_all"))
    // REPLACE maps to create ops (abstract_uploader.py:184-190)
    assert(it1.contains(""""create""""))
  }

  test("CM mobile list definition carries app id and lifespan overrides") {
    val e = exec(DestinationType.AdsCustomerMatchMobileDeviceIdUpload,
      Seq("list", "ADD", "true", "custom.app", "", "500"))
    val body = Renderers.AdsCustomerMatch("mobile").render(e,
      Seq(ListMap("mobile_id" -> "abc")), 1L).head.body
    assert(body.contains(""""upload_key_type": "MOBILE_ADVERTISING_ID""""))
    assert(body.contains(""""app_id": "custom.app""""))
    assert(body.contains(""""membership_life_span": 500"""))
  }

  // ---- OCI click (google_ads_offline_conversions_uploader_test.py:81-135)

  test("OCI click conversions payload matches reference vectors") {
    val e = exec(DestinationType.AdsOfflineConversion, Seq("conv_name"))
    val rows = Seq(
      ListMap[String, Any]("time" -> "2020-04-09T14:13:55.0005", "amount" -> "123", "gclid" -> "456"),
      ListMap[String, Any]("time" -> "2020-04-09T13:13:55.0005", "amount" -> "234", "gclid" -> "567"))
    val reqs = Renderers.AdsOfflineClick.render(e, rows, 1L)
    assert(reqs.size == 1)
    val body = reqs.head.body
    assert(body.contains(""""customer_id": "1234567890""""))
    assert(body.contains(""""partial_failure": true"""))
    assert(body.contains(""""validate_only": false"""))
    assert(body.contains(""""conversion_date_time": "2020-04-09 14:13:55-03:00""""))
    assert(body.contains(""""conversion_date_time": "2020-04-09 13:13:55-03:00""""))
    assert(body.contains(""""conversion_value": 123.0"""))
    assert(body.contains(""""gclid": "567""""))
    assert(reqs.head.rowIdx == Seq(0, 1))
  }

  test("OCI customer id override from metadata[1], mcc login id") {
    val e = Execution(account.copy(mccTrix = true),
      SourceSpec("s", SourceType.BigQuery, Seq("d", "t")),
      DestinationSpec("d", DestinationType.AdsOfflineConversion, Seq("conv", "11-22")))
    val req = Renderers.AdsOfflineClick.render(e,
      Seq(ListMap("time" -> "2020-04-09T14:13:55.000", "amount" -> "1", "gclid" -> "g")), 1L).head
    assert(req.body.contains(""""customer_id": "1122"""")) // digits-only override
    assert(req.url.startsWith("googleads://1234567890/")) // mcc login
  }

  // ---- OCA gclid (adjustments_uploader_gclid.py:23-69)

  test("OCA gclid RESTATEMENT carries adjusted value; gclid/time pair") {
    val e = exec(DestinationType.AdsOfflineConversionAdjustmentGclid,
      Seq("conv", "", "RESTATEMENT"))
    val body = Renderers.AdsAdjustmentGclid.render(e, Seq(ListMap[String, Any](
      "gclid" -> "g1", "time" -> "2020-04-09T14:13:55.0005",
      "conversion_time" -> "2020-04-08T14:13:55.0005", "amount" -> "42.5")), 1L).head.body
    assert(body.contains(""""adjustment_type": "RESTATEMENT""""))
    assert(body.contains(""""adjusted_value": 42.5"""))
    assert(body.contains(""""gclid": "g1""""))
    assert(body.contains(""""conversion_date_time": "2020-04-08 14:13:55-03:00""""))
    // non-RESTATEMENT → null adjusted value
    val e2 = exec(DestinationType.AdsOfflineConversionAdjustmentGclid,
      Seq("conv", "", "RETRACTION"))
    val body2 = Renderers.AdsAdjustmentGclid.render(e2, Seq(ListMap[String, Any](
      "gclid" -> "g1", "time" -> "2020-04-09T14:13:55.0005",
      "conversion_time" -> "2020-04-08T14:13:55.0005", "amount" -> "42.5")), 1L).head.body
    assert(body2.contains(""""adjusted_value": null"""))
  }

  // ---- SSD (google_ads_ssd_uploader.py:84-110)

  test("SSD renders job + ops with transaction attribute, currency default BRL") {
    val e = exec(DestinationType.AdsSsdUpload, Seq("conv_name", "external_id"))
    val rows = Seq(ListMap[String, Any](
      "hashed_email" -> "he", "amount" -> "120", "time" -> "2020-04-09T14:13:55.0005"))
    val reqs = Renderers.AdsSsd.render(e, rows, 1L)
    assert(reqs.map(_.kind) == Seq("create_offline_user_data_job",
      "add_offline_user_data_job_operations", "run_offline_user_data_job"))
    assert(reqs.head.body.contains(""""type_": "STORE_SALES_UPLOAD_FIRST_PARTY""""))
    assert(reqs.head.body.contains(""""loyalty_fraction": 1.0"""))
    val ops = reqs(1).body
    assert(ops.contains(""""user_identifiers": [{"hashed_email": "he"}]"""))
    assert(ops.contains(""""currency_code": "BRL""""))
    assert(ops.contains(""""transaction_amount_micros": 120"""))
    assert(ops.contains(""""transaction_date_time": "2020-04-09 14:13:55-03:00""""))
    assert(ops.contains(""""enable_partial_failure": false"""))
  }

  // ---- CM360 (campaign_manager_conversion_uploader.py:95-140)

  test("CM360 identifier priority and custom variables") {
    val e = exec(DestinationType.CmOfflineConversion, Seq("fl_activity", "fl_config"))
    val row = ListMap[String, Any](
      "uuid" -> "u1", "gclid" -> "g1", "mobileDeviceId" -> "m1", // gclid wins
      "value" -> 5L, "quantity" -> 2L,
      "customVariables" -> Seq(ListMap("type" -> "U1", "value" -> "v1")),
      "timestamp" -> "2020-04-09T14:13:55.000")
    val body = Renderers.Cm360(nowMicros = 1000000L).render(e, Seq(row), 1L).head.body
    assert(body.contains(""""floodlightActivityId": "fl_activity""""))
    assert(body.contains(""""gclid": "g1""""))
    assert(!body.contains("mobileDeviceId"))
    assert(body.contains(""""value": 5.0"""))
    assert(body.contains(""""quantity": 2"""))
    assert(body.contains(
      """"customVariables": [{"type": "U1", "value": "v1", "kind": "dfareporting#customFloodlightVariable"}]"""))
    // row timestamp overrides timestampMicros
    assert(body.contains(s""""timestampMicros": ${TimeUtils.timestampMicros("2020-04-09T14:13:55.000")}"""))
  }

  test("CM360 golden body equals the reference test's expected_body " +
      "(campaign_manager_conversion_uploader_test.py:64-106)") {
    val e = exec(DestinationType.CmOfflineConversion,
      Seq("floodlight_activity_id", "floodlight_configuration_id"))
    val now = 1700000000000000L
    val rows = Seq(
      ListMap[String, Any]("gclid" -> "123", "timestamp" -> "2021-11-30T12:00:00.000"),
      ListMap[String, Any]("gclid" -> "456"))
    val body = Renderers.Cm360(now).render(e, rows, 1L).head.body
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val conv = root.get("conversions")
    assert(conv.size() == 2)
    val c0 = conv.get(0); val c1 = conv.get(1)
    assert(c0.get("gclid").asText() == "123")
    assert(c0.get("floodlightActivityId").asText() == "floodlight_activity_id")
    assert(c0.get("floodlightConfigurationId").asText() == "floodlight_configuration_id")
    assert(c0.get("ordinal").asText() == now.toString)
    // row timestamp overrides: micros of 2021-11-30T12:00:00 (UTC-resolved)
    assert(c0.get("timestampMicros").asLong() == 1638273600000000L)
    assert(c0.get("quantity").asLong() == 1L)
    assert(c1.get("gclid").asText() == "456")
    assert(c1.get("timestampMicros").asLong() == now)
    assert(c1.get("quantity").asLong() == 1L)
  }

  test("CM360 defaults: quantity 1, ordinal = now micros, second identifier when gclid empty") {
    val e = exec(DestinationType.CmOfflineConversion, Seq("a", "c"))
    val row = ListMap[String, Any]("uuid" -> "u1", "gclid" -> "", "encryptedUserId" -> "enc")
    val body = Renderers.Cm360(nowMicros = 77L).render(e, Seq(row), 1L).head.body
    assert(body.contains(""""encryptedUserId": "enc""""))
    assert(body.contains(""""quantity": 1"""))
    assert(body.contains(""""ordinal": "77""""))
  }

  // ---- GA MP (google_analytics_measurement_protocol.py:38-96)

  test("UA MP event hit encoding") {
    val e = exec(DestinationType.GaMeasurementProtocol, Seq("UA-1234-5", "1"))
    val row = ListMap[String, Any](
      "uuid" -> "u", "client_id" -> "c1", "event_action" -> "buy now",
      "event_category" -> "cat/1", "cd12" -> "dim")
    val body = Renderers.GaMeasurementProtocol.render(e, Seq(row), 1L).head.body
    assert(body.startsWith("v=1&tid=UA-1234-5&ni=1&t=event&ds=mp%20-%20megalista&cid=c1&"))
    assert(body.contains("cd12=dim"))
    assert(body.contains("ea=buy%20now"))
    assert(body.contains("ec=cat/1")) // '/' is safe in python quote
    assert(!body.contains("ev=")) // absent optional value omitted
  }

  // ---- GA4 MP (google_analytics_4_measurement_protocol.py:58-139)

  test("GA4 MP event payload with measurement id and param filtering") {
    val e = exec(DestinationType.Ga4MeasurementProtocol,
      Seq("secret", "true", "false", "false", "", "G-123"))
    val row = ListMap[String, Any](
      "uuid" -> "u1", "client_id" -> "c1", "name" -> "purchase",
      "value" -> "9.9", "empty_param" -> "", "timestamp_micros" -> "123456")
    val reqs = Renderers.Ga4MeasurementProtocol.render(e, Seq(row), 1L)
    assert(reqs.size == 1)
    assert(reqs.head.url ==
      "https://www.google-analytics.com/mp/collect?api_secret=secret&measurement_id=G-123")
    val body = reqs.head.body
    assert(body.contains(""""nonPersonalizedAds": false"""))
    assert(body.contains(""""events": [{"name": "purchase", "params": {"value": "9.9"}}]"""))
    assert(body.contains(""""client_id": "c1""""))
    assert(body.contains(""""timestamp_micros": 123456"""))
    assert(!body.contains("empty_param"))
    assert(!body.contains("app_instance_id"))
  }

  test("GA4 MP validations: app/web exactly-one-of") {
    val e = exec(DestinationType.Ga4MeasurementProtocol,
      Seq("secret", "true", "false", "false", "fb-app", "G-123"))
    val row = ListMap[String, Any]("client_id" -> "c1", "name" -> "n")
    assertThrows[IllegalArgumentException] {
      Renderers.Ga4MeasurementProtocol.render(e, Seq(row), 1L)
    }
  }

  // ---- DV360 (display_video/customer_match/*_uploader.py)

  test("DV360 device id list flattens scalars and lists; create vs edit by iteration") {
    val e = exec(DestinationType.DvCustomerMatchDeviceIdUpload, Seq("adv1", "list1"))
    val rows = Seq(
      ListMap[String, Any]("mobileDeviceIds" -> "d1"),
      ListMap[String, Any]("mobileDeviceIds" -> Seq("d2", "d3")))
    val create = Renderers.DvCustomerMatch("mobile").render(e, rows, 1L).head
    assert(create.kind == "create_audience")
    assert(create.body.contains(""""mobileDeviceIds": ["d1", "d2", "d3"]"""))
    assert(create.body.contains(""""audienceType": "CUSTOMER_MATCH_DEVICE_ID""""))
    val edit = Renderers.DvCustomerMatch("mobile").render(e, rows, 2L).head
    assert(edit.kind == "edit_customer_match_members")
    assert(edit.body.contains(""""advertiserId": "adv1""""))
    assert(edit.body.contains(""""addedMobileDeviceIdList""""))
  }

  // ---- AppsFlyer (appsflyer_s2s_uploader_async.py:42-60)

  test("AppsFlyer S2S event payload per row") {
    val e = exec(DestinationType.AppsFlyerS2SEvents, Seq("com.app.id"))
    val row = ListMap[String, Any](
      "uuid" -> "u", "appsflyer_id" -> "af1", "event_eventName" -> "purchase",
      "device_ids_idfa" -> "idfa1", "event_eventTime" -> "2020-04-09T14:13:55.000500")
    val reqs = Renderers.AppsFlyerS2S.render(e, Seq(row), 1L)
    assert(reqs.head.url == "https://api2.appsflyer.com/inappevent/com.app.id")
    val body = reqs.head.body
    assert(body.contains(""""appsflyer_id": "af1""""))
    assert(body.contains(""""eventName": "purchase""""))
    assert(body.contains(""""af_events_api": "true""""))
    assert(body.contains(""""idfa": "idfa1""""))
    assert(body.contains(""""eventTime": "2020-04-09 14:13:55.000500""""))
  }

  // ---- GA user list / data import

  test("GA user list CSV body and audience definition") {
    val e = exec(DestinationType.GaUserListUpload,
      Seq("wp1", "view1", "import1", "list1", "cd1", "cd2"))
    val rows = Seq(ListMap[String, Any]("user_id" -> "u1"), ListMap[String, Any]("user_id" -> "u2"))
    val reqs = Renderers.GaUserList.render(e, rows, 1L)
    assert(reqs.map(_.kind) == Seq("ensure_remarketing_audience", "upload_data"))
    assert(reqs.head.body.contains("users::condition::cd2==buyer"))
    assert(reqs.head.body.contains(""""membershipDurationDays": 365"""))
    assert(reqs(1).body == "cd1,cd2\nu1,buyer\nu2,buyer")
  }

  test("GA data import CSV with ga: headers") {
    val e = exec(DestinationType.GaDataImport, Seq("wp1", "import1"))
    val rows = Seq(
      ListMap[String, Any]("cd1" -> "v1a", "cd2" -> "v2a"),
      ListMap[String, Any]("cd1" -> "v1b", "cd2" -> null))
    val body = Renderers.GaDataImport.render(e, rows, 1L).head.body
    assert(body == "ga:cd1,ga:cd2\nv1a,v2a\nv1b,")
  }

  test("JSON double rendering: integral, fractional, and beyond-Long magnitudes") {
    assert(JDouble(2.0).render == "2.0")
    assert(JDouble(2.5).render == "2.5")
    assert(JDouble(-3.0).render == "-3.0")
    assert(JDouble(1e14).render == "100000000000000.0")
    // beyond the integral-render bound: must NOT saturate to Long.MaxValue
    assert(JDouble(1e19).render == "1.0E19")
    assert(JDouble(-1e19).render == "-1.0E19")
  }
}
