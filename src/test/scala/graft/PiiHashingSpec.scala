package graft

import org.apache.spark.sql.Row
import graft.transform.PiiHashing

/** Reference-fidelity vectors from
  * `/root/reference/megalista_dataflow/mappers/ads_user_list_pii_hashing_mapper_test.py:39-146`.
  */
class PiiHashingSpec extends SparkTestBase {
  import spark.implicits._

  private val users = Seq(
    // (email, phone, first, last, zip, country)
    ("john@doe.com", "+551199999999", "John ", "Doe", "12345", "US"),
    ("jane@doe.com", "+551199999910", "Jane", " Doe", "12345", "US"),
    ("only@email.com", null, "", "", "", ""),
    ("", "+551199999910", "", "", "", ""),
    (null, "+551199999911", "Incomplete", "Register", null, null),
    (null, "", "Incomplete", null, null, null),
    ("ca.us@gmail.com", "+551199999999", null, null, null, null),
    ("us.ca@doe.com", "+551199999999", null, null, null, null))
    .toDF("email", "phone", "mailing_address_first_name",
      "mailing_address_last_name", "mailing_address_zip", "mailing_address_country")

  test("ads-shape hashing matches the reference SHA-256 vectors") {
    val out = PiiHashing.adsShape(users).collect()
    // 8 inputs, 1 fully-empty row dropped
    assert(out.length == 7)
    val r0 = out(0)
    assert(r0.getAs[String]("hashed_email") ==
      "d709f370e52b57b4eb75f04e2b3422c4d41a05148cad8f81776d94a048fb70af")
    assert(r0.getAs[String]("hashed_phone_number") ==
      "a58d4dce9db87c65ebb6137f91edb9bbe7f274f5b0d07eea82f756ea70532b9c")
    val addr0 = r0.getAs[Row]("address_info")
    assert(addr0.getAs[String]("hashed_first_name") ==
      "96d9632f363564cc3032521409cf22a852f2032eec099ed5967c0d000cec607a")
    assert(addr0.getAs[String]("hashed_last_name") ==
      "799ef92a11af918e3fb741df42934f3b568ed2d93ac1df74f1b8d41a27932a6f")
    assert(addr0.getAs[String]("country_code") == "US")
    assert(addr0.getAs[String]("postal_code") == "12345")
    val r1 = out(1)
    assert(r1.getAs[String]("hashed_email") ==
      "7c815580ad3844bcb627c74d24eaf700e1a711d9c23e9beb62ab8d28e8cb7954")
    assert(r1.getAs[Row]("address_info").getAs[String]("hashed_first_name") ==
      "81f8f6dde88365f3928796ec7aa53f72820b06db8664f5fe76a7eb13e24546a2")
    // only@email.com row: email hashed, everything else null
    val r2 = out(2)
    assert(r2.getAs[String]("hashed_email") ==
      "785af30a27e429e1a2dc2f5e589d59f268239db551c3af29821eb0b3f05d40af")
    assert(r2.getAs[String]("hashed_phone_number") == null)
    assert(r2.getAs[Row]("address_info") == null)
    // empty-email row: phone only
    assert(out(3).getAs[String]("hashed_email") == null)
    assert(out(3).getAs[String]("hashed_phone_number") ==
      "d9303375de7036858c05f5836dd6db59d7f66899d3c8f85fbf09a8b60c79b236")
    // incomplete address (zip/country null): no address_info
    assert(out(4).getAs[Row]("address_info") == null)
    assert(out(4).getAs[String]("hashed_phone_number") ==
      "d8d1da09dd3584315610e314b781d0b964a260e6311879930aa2ff678a897753")
    // gmail: dots stripped from local part before hashing
    assert(out(5).getAs[String]("hashed_email") ==
      "93d8aed730ac1b81df54d22efa758fc707f9f2763b59769d1f36c9ce9ff160b0")
    // non-gmail: dots preserved
    assert(out(6).getAs[String]("hashed_email") ==
      "5de5320a299a39f8c370f6940b481ce30a46ac835d11632d99220ab0a0993dbf")
  }

  test("should-hash metadata flag (reference :19-36)") {
    assert(PiiHashing.shouldHashFields(Seq("L", "O", "True")))
    assert(PiiHashing.shouldHashFields(Seq("L", "O")))
    assert(PiiHashing.shouldHashFields(Seq("L", "O", null)))
    assert(PiiHashing.shouldHashFields(Seq("L", "O", "")))
    assert(PiiHashing.shouldHashFields(Seq("L", "O", "anything")))
    assert(!PiiHashing.shouldHashFields(Seq("L", "O", "false")))
    assert(!PiiHashing.shouldHashFields(Seq("L", "O", "False")))
    assert(!PiiHashing.shouldHashFields(Seq("L", "O", "FALSE")))
  }

  test("hashing disabled passes normalized values through") {
    val out = PiiHashing.adsShape(users.limit(1), shouldHash = false).collect()(0)
    assert(out.getAs[String]("hashed_email") == "john@doe.com")
    assert(out.getAs[String]("hashed_phone_number") == "+551199999999")
  }

  test("dv-shape emits flat hashed columns") {
    val out = PiiHashing.dvShape(users).collect()
    assert(out.length == 7)
    assert(out(0).getAs[String]("hashedEmails") ==
      "d709f370e52b57b4eb75f04e2b3422c4d41a05148cad8f81776d94a048fb70af")
    assert(out(0).getAs[String]("hashedFirstName") ==
      "96d9632f363564cc3032521409cf22a852f2032eec099ed5967c0d000cec607a")
    assert(out(0).getAs[String]("countryCode") == "US")
    assert(out(0).getAs[String]("zipCodes") == "12345")
  }

  test("user_id passes through AND hashes to third_party_user_id") {
    val df = Seq(("u-1", "x@y.com")).toDF("user_id", "email")
    val out = PiiHashing.adsShape(df).collect()(0)
    assert(out.getAs[String]("user_id") == "u-1")
    assert(out.getAs[String]("third_party_user_id") != null)
    assert(out.getAs[String]("third_party_user_id").length == 64)
  }
}
