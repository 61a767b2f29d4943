package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("AccountConfig.normalized digit-filters ads, GA and CM ids") {
    // reference models/execution.py:88-93 filters all three numeric ids
    val cfg = AccountConfig(
      googleAdsAccountId = "123-456-7890",
      googleAnalyticsAccountId = "UA-12345-6",
      campaignManagerProfileId = "profile 777",
      appId = "com.example.app").normalized
    assert(cfg.googleAdsAccountId == "1234567890")
    assert(cfg.googleAnalyticsAccountId == "123456")
    assert(cfg.campaignManagerProfileId == "777")
    assert(cfg.appId == "com.example.app") // appId is NOT digit-filtered
  }

  test("DestinationType round-trips by name") {
    DestinationType.all.foreach { dt =>
      assert(DestinationType.fromName(dt.name) eq dt)
    }
    intercept[IllegalArgumentException](DestinationType.fromName("NOPE"))
  }

  test("TransactionalType key columns") {
    assert(TransactionalType.Uuid.keyColumns == Seq("uuid"))
    assert(TransactionalType.GclidTime.keyColumns == Seq("gclid", "time"))
    assert(TransactionalType.OrderIdTime.keyColumns == Seq("order_id", "time"))
    assert(TransactionalType.NotTransactional.keyColumns.isEmpty)
  }
}
