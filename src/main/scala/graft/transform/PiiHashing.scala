package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII normalization + SHA-256 hashing as pure column expressions (no UDFs —
  * everything stays inside whole-stage codegen).
  *
  * Mirrors the reference's hashing mappers:
  *  - field hashing = sha256(field.strip().lower())
  *    (`/root/reference/megalista_dataflow/mappers/abstract_list_pii_hashing_mapper.py:26-31`)
  *  - email normalization: lowercase; if the domain is gmail.com/googlemail.com,
  *    strip '.' from the local part; malformed (no '@') emails pass through
  *    UNCHANGED (assumed pre-hashed) (`abstract_list_pii_hashing_mapper.py:89-121`)
  *  - should-hash flag from destination metadata[2]: default true, only the
  *    literal (case-insensitive) "false" disables
  *    (`abstract_list_pii_hashing_mapper.py:53-63`)
  */
object PiiHashing {

  /** Keys subject to hashing (reference `_get_default_hasheable_keys`,
    * `abstract_list_pii_hashing_mapper.py:38-47`).
    */
  val hashableKeys: Set[String] = Set(
    "email", "mailing_address_first_name", "mailing_address_last_name",
    "mailing_address_country", "mailing_address_zip", "phone",
    "mobile_device_id")

  /** metadata[2] semantics (reference `:53-63`). */
  def shouldHashFields(destinationMetadata: Seq[String]): Boolean =
    if (destinationMetadata.length < 3) true
    else {
      val flag = destinationMetadata(2)
      if (flag == null || flag.isEmpty) true else flag.toLowerCase != "false"
    }

  /** Python-strip: removes ALL leading/trailing whitespace (tabs, newlines,
    * unicode spaces), not just ASCII space as Spark `trim` does.
    */
  def pyStrip(c: Column): Column = regexp_replace(c, "(?U)^\\s+|(?U)\\s+$", "")

  /** sha256 of strip().lower() — or passthrough when hashing is disabled. */
  def hashField(c: Column, shouldHash: Boolean = true): Column =
    if (shouldHash) sha2(lower(pyStrip(c)), 256) else c

  /** Gmail-rule email normalization as an expression tree (no UDF).
    * `split` with limit -1 keeps all parts, matching Python's `str.split("@")`.
    */
  def normalizeEmail(email: Column): Column = {
    val lowered = lower(email)
    val parts = split(lowered, "@", -1)
    val isGmail = element_at(parts, 2).rlike("^(gmail|googlemail)\\.com$")
    val fixedLocal = regexp_replace(element_at(parts, 1), "\\.", "")
    val rejoined = concat_ws("@",
      concat(array(fixedLocal), slice(parts, lit(2), size(parts))))
    when(size(parts) < 2, email) // malformed: assumed pre-hashed, unchanged
      .otherwise(when(isGmail, rejoined).otherwise(lowered))
  }

  private def present(c: Column): Column = c.isNotNull && c =!= ""

  private def presentIn(df: DataFrame, name: String): Option[Column] =
    if (df.columns.contains(name)) Some(col(name)) else None

  /** Google-Ads-shaped hashing (reference
    * `mappers/ads_user_list_pii_hashing_mapper.py:26-79`): emits
    * `hashed_email`, `address_info{hashed_first_name,hashed_last_name,
    * country_code,postal_code}` (all 4 address fields required),
    * `hashed_phone_number`, `mobile_id`, `third_party_user_id`; non-PII
    * columns pass through. Rows whose output would be entirely empty are
    * dropped (the reference drops falsy dicts,
    * `abstract_list_pii_hashing_mapper.py:77-81`).
    */
  def adsShape(df: DataFrame, shouldHash: Boolean = true): DataFrame = {
    def h(c: Column) = hashField(c, shouldHash)
    // user_id is NOT in hashableKeys: the reference both passes it through
    // verbatim AND emits its hash as third_party_user_id.
    val passthrough = df.columns.filterNot(hashableKeys.contains).map(col).toSeq

    val out = Seq.newBuilder[Column]
    out ++= passthrough
    presentIn(df, "email").foreach { e =>
      out += when(present(e), h(normalizeEmail(e))).as("hashed_email")
    }
    val addr = Seq("mailing_address_first_name", "mailing_address_last_name",
      "mailing_address_country", "mailing_address_zip").flatMap(presentIn(df, _))
    if (addr.length == 4) {
      val allPresent = addr.map(present).reduce(_ && _)
      out += when(allPresent, struct(
        h(addr(0)).as("hashed_first_name"),
        h(addr(1)).as("hashed_last_name"),
        addr(2).as("country_code"),
        addr(3).as("postal_code"))).as("address_info")
    }
    presentIn(df, "phone").foreach { p =>
      out += when(present(p), h(p)).as("hashed_phone_number")
    }
    presentIn(df, "mobile_device_id").foreach { m =>
      out += when(present(m), m).as("mobile_id")
    }
    presentIn(df, "user_id").foreach { u =>
      out += when(present(u), h(u)).as("third_party_user_id")
    }
    val projected = df.select(out.result(): _*)
    dropAllNullRows(projected, passthroughCount = passthrough.length)
  }

  /** DV360-shaped hashing (reference
    * `mappers/dv_user_list_pii_hashing_mapper.py:25-68`): flat columns
    * `hashedEmails`, `hashedFirstName`, `hashedLastName`, `countryCode`,
    * `zipCodes`, `hashedPhoneNumbers`, `mobileDeviceIds`.
    */
  def dvShape(df: DataFrame, shouldHash: Boolean = true): DataFrame = {
    def h(c: Column) = hashField(c, shouldHash)
    val passthrough = df.columns.filterNot(hashableKeys.contains).map(col).toSeq

    val out = Seq.newBuilder[Column]
    out ++= passthrough
    presentIn(df, "email").foreach { e =>
      out += when(present(e), h(normalizeEmail(e))).as("hashedEmails")
    }
    val addr = Seq("mailing_address_first_name", "mailing_address_last_name",
      "mailing_address_country", "mailing_address_zip").flatMap(presentIn(df, _))
    if (addr.length == 4) {
      val allPresent = addr.map(present).reduce(_ && _)
      out += when(allPresent, h(addr(0))).as("hashedFirstName")
      out += when(allPresent, h(addr(1))).as("hashedLastName")
      out += when(allPresent, addr(2)).as("countryCode")
      out += when(allPresent, addr(3)).as("zipCodes")
    }
    presentIn(df, "phone").foreach { p =>
      out += when(present(p), h(p)).as("hashedPhoneNumbers")
    }
    presentIn(df, "mobile_device_id").foreach { m =>
      out += when(present(m), m).as("mobileDeviceIds")
    }
    val projected = df.select(out.result(): _*)
    dropAllNullRows(projected, passthroughCount = passthrough.length)
  }

  /** The reference keeps a row if its processed dict is non-empty; non-PII
    * keys are always copied in, so rows can only drop when EVERY emitted
    * column is null and there were no passthrough keys.
    */
  private def dropAllNullRows(df: DataFrame, passthroughCount: Int): DataFrame =
    if (passthroughCount > 0 || df.columns.isEmpty) df
    else df.filter(df.columns.map(c => col(s"`$c`").isNotNull).reduce(_ || _))
}
