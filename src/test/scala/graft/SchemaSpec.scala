package graft

import graft.model.DestinationType._
import graft.schema.DestinationSchemas
import org.apache.spark.sql.Row

/** Mirrors the reference's pure-logic schema tests
  * (`/root/reference/megalista_dataflow/data_sources/data_schemas_test.py`).
  */
class SchemaSpec extends SparkTestBase {
  import spark.implicits._

  test("required-column validation with regex names") {
    assert(DestinationSchemas.validateDataColumns(
      Seq("gclid", "time", "amount"), AdsOfflineConversion))
    assert(!DestinationSchemas.validateDataColumns(
      Seq("gclid", "time"), AdsOfflineConversion))
    // cd\d+ regex columns
    assert(DestinationSchemas.validateDataColumns(Seq("cd1", "cd2"), GaDataImport))
    assert(!DestinationSchemas.validateDataColumns(Seq("name1"), GaDataImport))
    // wildcard destinations accept anything but still need uuid
    assert(DestinationSchemas.validateDataColumns(
      Seq("uuid", "client_id", "whatever"), Ga4MeasurementProtocol))
    assert(!DestinationSchemas.validateDataColumns(
      Seq("client_id", "whatever"), Ga4MeasurementProtocol))
  }

  test("group validation: at least one member per group") {
    // CM needs one of gclid/mobileDeviceId/encryptedUserId/matchId/dclid
    assert(DestinationSchemas.validateDataColumns(
      Seq("uuid", "gclid"), CmOfflineConversion))
    assert(!DestinationSchemas.validateDataColumns(
      Seq("uuid", "value"), CmOfflineConversion))
    val msg = DestinationSchemas.errorMessage(Seq("uuid", "value"), CmOfflineConversion)
    assert(msg.contains("One of [gclid,mobileDeviceId,encryptedUserId,matchId,dclid]"))
  }

  test("error message lists missing required columns") {
    val msg = DestinationSchemas.errorMessage(Seq("gclid"), AdsOfflineConversion)
    assert(msg == "Some columns were missing: Required: [time,amount].")
  }

  test("pruning keeps data-column order and drops unmatched") {
    val cols = Seq("zzz_extra", "time", "gclid", "amount", "junk")
    assert(DestinationSchemas.pruneColumnNames(cols, AdsOfflineConversion) ==
      Seq("time", "gclid", "amount"))
    // wildcard keeps everything
    assert(DestinationSchemas.pruneColumnNames(cols, GaUserListUpload) == cols)
  }

  test("castNonString casts CM value/quantity to long") {
    val df = Seq(("u1", "12", "3")).toDF("uuid", "value", "quantity")
    val out = DestinationSchemas.castNonString(df, CmOfflineConversion)
    assert(out.schema("value").dataType.typeName == "long")
    assert(out.schema("quantity").dataType.typeName == "long")
    assert(out.collect()(0).getAs[Long]("value") == 12L)
  }

  test("CM customVariables fold groups per uuid and dedups") {
    val df = Seq(
      ("u1", "g1", "t1", "v1"),
      ("u1", "g1", "t2", "v2"),
      ("u2", "g2", "t3", "v3"))
      .toDF("uuid", "gclid", "customVariables.type", "customVariables.value")
    val out = DestinationSchemas.joinCustomVariables(df)
    assert(out.columns.toSet == Set("uuid", "gclid", "customVariables"))
    val rows = out.collect().map(r => r.getAs[String]("uuid") -> r).toMap
    assert(rows.size == 2)
    val u1 = rows("u1").getAs[scala.collection.Seq[Row]]("customVariables")
    assert(u1.map(r => (r.getAs[String]("type"), r.getAs[String]("value"))).toSet ==
      Set(("t1", "v1"), ("t2", "v2")))
    assert(rows("u2").getAs[scala.collection.Seq[Row]]("customVariables").length == 1)
  }

  test("processByDestinationType only folds for CM") {
    val df = Seq(("u1", "x")).toDF("uuid", "gclid")
    assert(DestinationSchemas.processByDestinationType(df, AdsOfflineConversion) eq df)
  }
}
