package graft

import graft.error.{EmailNotifier, Error}
import graft.model._
import graft.pipeline.UsageStats
import org.scalatest.funsuite.AnyFunSuite

class NotifierSpec extends AnyFunSuite {

  private def exec(src: String, dst: String) = Execution(AccountConfig(
    googleAdsAccountId = "123", campaignManagerProfileId = "9",
    googleAnalyticsAccountId = "77"),
    SourceSpec(src, SourceType.File, Seq("parquet", "/x")),
    DestinationSpec(dst, DestinationType.AdsOfflineConversion, Seq("Conv")))

  test("email notifier renders the reference body format verbatim") {
    val delivered = scala.collection.mutable.ListBuffer.empty[EmailNotifier.Email]
    val n = new EmailNotifier("true", " a@x.com , b@y.com ", delivered += _)
    n.notify(DestinationType.AdsOfflineConversion, Seq(
      Error(exec("src A", "dst B"), "boom")))
    assert(delivered.size == 1)
    val email = delivered.head
    assert(email.to == Seq("a@x.com", "b@y.com")) // comma-split + strip
    assert(email.subject == "[Action Required] Megalista error detected - ADS_OFFLINE_CONVERSION")
    // exact body assembly (error_handling.py:125-143), stray </b> included
    val expected =
      "<h3>Hello, Megalista user.</h3>\n" +
      "           This is an error summary for the destination: <b>ADS_OFFLINE_CONVERSION</b>." +
      "<p>\n    <b>Errors list:</b>\n    <ul>" +
      "\n      <li>Error for source <b>\"src A\"</b> and destination \n" +
      "      <b>\"dst B\"</b>: boom</b>\n      </li>" +
      "</ul>"
    assert(email.bodyHtml == expected)
  }

  test("email notifier gate: only the literal 'true' (case-insensitive) sends") {
    Seq("false", "", "1", "yes").foreach { flag =>
      val n = new EmailNotifier(flag, "a@x.com", _ => fail(s"sent with flag '$flag'"))
      n.notify(DestinationType.AdsOfflineConversion, Seq(Error(exec("s", "d"), "m")))
      assert(n.sentEmails.isEmpty)
    }
    val yes = new EmailNotifier("TRUE", "a@x.com", _ => ())
    yes.notify(DestinationType.AdsOfflineConversion, Seq(Error(exec("s", "d"), "m")))
    assert(yes.sentEmails.size == 1)
  }

  test("usage stats render ran/error records with stamp and truncation") {
    val ran = UsageStats.ranRecords(Seq(exec("s", "d")))
    assert(ran == Seq(Map("action" -> "ran", "solution" -> "ADS_OFFLINE_CONVERSION",
      "target" -> "Conv", "ads" -> "123", "cm" -> "9", "ga" -> "77")))
    val err = UsageStats.errorRecords(Seq(("megalista.LOG", "x" * 600)))
    assert(err.head("message").length == 500)
    val stamped = UsageStats.stamp("42", ran)
    assert(stamped.head("client_id") == "42")
    assert(stamped.head("name") == "Megalista")
    assert(stamped.head("version") == UsageStats.Version)
    assert(stamped.head("action") == "ran")
  }

  test("usage stats run silently: disabled, empty, and throwing collectors are no-ops") {
    var collected = 0
    UsageStats.process(collectUsageStats = false, "1",
      UsageStats.ranRecords(Seq(exec("s", "d"))), _ => collected += 1)
    UsageStats.process(collectUsageStats = true, "1", Seq.empty, _ => collected += 1)
    assert(collected == 0)
    UsageStats.process(collectUsageStats = true, "1",
      UsageStats.ranRecords(Seq(exec("s", "d"))), _ => throw new RuntimeException("down"))
    UsageStats.process(collectUsageStats = true, "1",
      UsageStats.ranRecords(Seq(exec("s", "d"))), _ => collected += 1)
    assert(collected == 1)
  }
}
