package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model._

import scala.jdk.CollectionConverters._

/** Config-plane sources (SURVEY §2.1): parse a configuration into the
  * `Seq[Execution]` plan.
  *
  * [[JsonConfigSource]] is the primary offline path, mirroring
  * `/root/reference/megalista_dataflow/sources/json_execution_source.py:25-97`
  * over the shape of `cloud_config/configuration_sample.json`:
  * account keys, `Sources` (Name/Type/Dataset/Table), `Destinations`
  * (Name/Type/Metadata), `Connections` (Enabled/Source/Destination).
  * `CampaignManagerAccountId` is the fallback for a missing
  * `CampaignManagerProfileId` (`json_execution_source.py:50-52`).
  *
  * The config is driver-side, config-scale data: plain Jackson parsing (the
  * library Spark itself ships), no distributed read needed.
  */
trait ConfigSource {
  def executions(): Seq[Execution]
}

object JsonConfigSource {
  def fromFile(path: String): JsonConfigSource = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    fromString(text)
  }

  def fromString(json: String): JsonConfigSource = new JsonConfigSource(json)
}

final class JsonConfigSource(json: String) extends ConfigSource {

  private val root: JsonNode = new ObjectMapper().readTree(json)

  private def str(node: JsonNode, field: String): String = {
    val v = node.get(field)
    if (v == null || v.isNull) "" else v.asText()
  }

  private def arr(field: String): Seq[JsonNode] = {
    val v = root.get(field)
    if (v == null || v.isNull) Seq.empty else v.elements().asScala.toSeq
  }

  def accountConfig: AccountConfig = {
    val mcc = Option(root.get("GoogleAdsMCC")).exists(n => !n.isNull && n.asBoolean(false))
    val cmProfile = {
      val p = str(root, "CampaignManagerProfileId")
      if (p.nonEmpty) p else str(root, "CampaignManagerAccountId")
    }
    AccountConfig(
      googleAdsAccountId = str(root, "GoogleAdsAccountId"),
      mccTrix = mcc,
      googleAnalyticsAccountId = str(root, "GoogleAnalyticsAccountId"),
      campaignManagerProfileId = cmProfile,
      appId = str(root, "AppId")).normalized
  }

  def sources: Map[String, SourceSpec] =
    arr("Sources").map { row =>
      val s = SourceSpec(str(row, "Name"), SourceType.fromName(str(row, "Type")),
        Seq(str(row, "Dataset"), str(row, "Table")))
      s.name -> s
    }.toMap

  def destinations: Map[String, DestinationSpec] =
    arr("Destinations").map { row =>
      val meta = Option(row.get("Metadata")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(n => if (n.isNull) "" else n.asText())
      val d = DestinationSpec(str(row, "Name"),
        DestinationType.fromName(str(row, "Type")), meta)
      d.name -> d
    }.toMap

  /** Enabled connections → executions; disabled rows are skipped
    * (`json_execution_source.py:63-70`).
    */
  override def executions(): Seq[Execution] = {
    val account = accountConfig
    val srcs = sources
    val dsts = destinations
    arr("Connections").flatMap { conn =>
      // Python truthiness, as the reference's `if schedule["Enabled"]`
      // evaluates it (json_execution_source.py:70): booleans by value,
      // numbers by non-zero, STRINGS by non-emptiness — a config shipping
      // Enabled: "yes" (or even "false") runs in the reference, so it runs
      // here; Jackson's asBoolean would silently skip it
      val enabled = Option(conn.get("Enabled")).exists { n =>
        if (n.isNull) false
        else if (n.isBoolean) n.asBoolean()
        else if (n.isNumber) n.asDouble() != 0.0
        else n.asText().nonEmpty
      }
      if (!enabled) None
      else Some(Execution(account, srcs(str(conn, "Source")), dsts(str(conn, "Destination"))))
    }
  }
}

/** Python `distutils.util.strtobool`, used by the reference for the MCC
  * flag in both the Sheets and Firestore sources
  * (`spreadsheet_execution_source.py:50`, `firestore_execution_source.py:61`).
  */
object ConfigValues {
  def strtobool(s: String): Boolean = s.trim.toLowerCase match {
    case "y" | "yes" | "t" | "true" | "on" | "1"  => true
    case "n" | "no" | "f" | "false" | "off" | "0" => false
    case other => throw new IllegalArgumentException(s"invalid truth value '$other'")
  }
}

/** Named-range access to a configuration spreadsheet — the ONLY surface
  * that touches the Sheets API (reference `models/sheets_config.py:44-60`:
  * `get_range` / `get_value` / `check_if_range_exists`). A live deployment
  * wraps the Sheets v4 client; offline/tests back it with in-memory grids.
  */
trait SheetsData {
  /** Values grid of a named range; None when the range is missing. */
  def getRange(name: String): Option[Seq[Seq[String]]]
  /** Top-left cell of a named range (`sheets_config.py` get_value). */
  def getValue(name: String): Option[String] =
    getRange(name).flatMap(_.headOption).flatMap(_.headOption)
  /** `check_if_range_exists`. */
  def rangeExists(name: String): Boolean = getRange(name).isDefined
}

final case class InMemorySheet(ranges: Map[String, Seq[Seq[String]]]) extends SheetsData {
  override def getRange(name: String): Option[Seq[Seq[String]]] = ranges.get(name)
}

/** The live-API plug point: accessing any range without a Sheets client is
  * an error with a remediation hint.
  */
final class UnavailableSheets(sheetId: String) extends SheetsData {
  override def getRange(name: String): Option[Seq[Seq[String]]] =
    throw new UnsupportedOperationException(
      s"Sheets config source requires the Sheets API (sheet $sheetId); " +
        "use JsonConfigSource offline or back SpreadsheetConfigSource with an offline SheetsData")
}

/** Sheets-backed execution source (reference
  * `spreadsheet_execution_source.py:44-133`): account cells from named
  * ranges (MCC via strtobool, CampaignManagerProfileId falling back to
  * CampaignManagerAccountId only when the PROFILE range does not exist),
  * `SourcesRange` / `DestinationsRange` rows as (name, type, metadata...),
  * `SchedulesRange` rows gated on a literal "YES" in column 0.
  */
final class SpreadsheetConfigSource(data: SheetsData) extends ConfigSource {

  def accountConfig: AccountConfig = AccountConfig(
    googleAdsAccountId = data.getValue("GoogleAdsAccountId").getOrElse(""),
    mccTrix = data.getValue("GoogleAdsMCC").exists(ConfigValues.strtobool),
    googleAnalyticsAccountId = data.getValue("GoogleAnalyticsAccountId").getOrElse(""),
    campaignManagerProfileId = (
      if (data.rangeExists("CampaignManagerProfileId")) data.getValue("CampaignManagerProfileId")
      else data.getValue("CampaignManagerAccountId")).getOrElse(""),
    appId = data.getValue("AppId").getOrElse("")).normalized

  def sources: Map[String, SourceSpec] =
    data.getRange("SourcesRange").getOrElse(Seq.empty).map { row =>
      val s = SourceSpec(row.head, SourceType.fromName(row(1)), row.drop(2))
      s.name -> s
    }.toMap

  def destinations: Map[String, DestinationSpec] =
    data.getRange("DestinationsRange").getOrElse(Seq.empty).map { row =>
      val d = DestinationSpec(row.head, DestinationType.fromName(row(1)), row.drop(2))
      d.name -> d
    }.toMap

  override def executions(): Seq[Execution] = {
    val account = accountConfig
    val srcs = sources
    val dsts = destinations
    data.getRange("SchedulesRange").getOrElse(Seq.empty).collect {
      case row if row.headOption.contains("YES") =>
        Execution(account, srcs(row(1)), dsts(row(2)))
    }
  }
}

/** Document access for the Firestore config collection — the ONLY surface
  * touching the Firestore client (reference `firestore_execution_source.py:
  * 44-55`). `scheduleDocuments` carries the reference's server-side query
  * predicate `where('active', '==', 'yes')`; `accountDocument` is the
  * special `account_config` document.
  */
trait FirestoreData {
  def scheduleDocuments(): Seq[Map[String, String]]
  def accountDocument(): Option[Map[String, String]]
}

final case class InMemoryFirestore(docs: Seq[Map[String, String]],
    account: Option[Map[String, String]]) extends FirestoreData {
  override def scheduleDocuments(): Seq[Map[String, String]] =
    docs.filter(_.get("active").contains("yes"))
  override def accountDocument(): Option[Map[String, String]] = account
}

final class UnavailableFirestore(collection: String) extends FirestoreData {
  private def unavailable = throw new UnsupportedOperationException(
    s"Firestore config source requires the Firestore API (collection $collection); " +
      "use JsonConfigSource offline or back FirestoreConfigSource with an offline FirestoreData")
  override def scheduleDocuments(): Seq[Map[String, String]] = unavailable
  override def accountDocument(): Option[Map[String, String]] = unavailable
}

object FirestoreConfigSource {
  /** Destination metadata field order per type
    * (`firestore_execution_source.py:95-126`). `metadata_padding` stands
    * for the N/A columns in the Sheets layout, preserving positional
    * metadata indexes.
    */
  val MetadataFields: Map[String, Seq[String]] = Map(
    "ADS_OFFLINE_CONVERSION" -> Seq("gads_conversion_name"),
    "ADS_ENHANCED_CONVERSION" -> Seq("gads_conversion_label",
      "gads_conversion_tracking_id", "gads_currency_code"),
    "ADS_SSD_UPLOAD" -> Seq("gads_conversion_name", "gads_external_upload_id",
      "gads_hash", "gads_currency_code", "gads_account"),
    "ADS_CUSTOMER_MATCH_CONTACT_INFO_UPLOAD" -> Seq("gads_audience_name",
      "gads_operation", "gads_hash", "metadata_padding", "gads_account"),
    "ADS_CUSTOMER_MATCH_MOBILE_DEVICE_ID_UPLOAD" -> Seq("gads_audience_name",
      "gads_operation", "metadata_padding", "gads_app_id", "gads_account"),
    "ADS_CUSTOMER_MATCH_USER_ID_UPLOAD" -> Seq("gads_audience_name",
      "gads_operation", "gads_hash", "metadata_padding", "gads_account"),
    "GA_MEASUREMENT_PROTOCOL" -> Seq("google_analytics_property_id",
      "google_analytics_non_interaction"),
    "GA_DATA_IMPORT" -> Seq("google_analytics_property_id",
      "google_analytics_data_import_name"),
    "GA_USER_LIST_UPLOAD" -> Seq("google_analytics_property_id",
      "google_analytics_view_id", "google_analytics_data_import_name",
      "google_analytics_user_id_list_name", "google_analytics_user_id_custom_dim",
      "google_analytics_buyer_custom_dim"),
    "CM_OFFLINE_CONVERSION" -> Seq("campaign_manager_floodlight_activity_id",
      "campaign_manager_floodlight_configuration_id"),
    "APPSFLYER_S2S_EVENTS" -> Seq("appsflyer_app_id"))
}

/** Firestore-backed execution source (reference
  * `firestore_execution_source.py:44-137`): account fields defaulting to
  * 'empty' (then digit-normalized like every source), mcc_trix via
  * strtobool defaulting FALSE, source metadata fixed to [bq_dataset,
  * bq_table], destination metadata reconstructed positionally from
  * [[FirestoreConfigSource.MetadataFields]] with `metadata_padding` → "N/A"
  * and missing fields raising, schedules gated on active == YES
  * (case-insensitive — the query already filtered lowercase 'yes').
  */
final class FirestoreConfigSource(data: FirestoreData) extends ConfigSource {
  import FirestoreConfigSource._

  def accountConfig: AccountConfig = {
    val acc = data.accountDocument().getOrElse(
      throw new IllegalStateException("Firestore collection is absent"))
    AccountConfig(
      googleAdsAccountId = acc.getOrElse("google_ads_id", "empty"),
      mccTrix = ConfigValues.strtobool(acc.getOrElse("mcc_trix", "FALSE")),
      googleAnalyticsAccountId = acc.getOrElse("google_analytics_account_id", "empty"),
      campaignManagerProfileId = acc.getOrElse("campaign_manager_profile_id", "empty"),
      appId = acc.getOrElse("app_id", "empty")).normalized
  }

  private def metadataFor(doc: Map[String, String]): Seq[String] = {
    val t = doc("type")
    val fields = MetadataFields.getOrElse(t,
      throw new IllegalArgumentException(s"Upload type not implemented: $t"))
    fields.map {
      case "metadata_padding" => "N/A"
      case f => doc.getOrElse(f, throw new IllegalArgumentException(
        s"Missing field in Firestore document for $t: $f"))
    }
  }

  def sources: Map[String, SourceSpec] =
    data.scheduleDocuments().map { doc =>
      val s = SourceSpec(doc("source_name"), SourceType.fromName(doc("source")),
        Seq(doc("bq_dataset"), doc("bq_table")))
      s.name -> s
    }.toMap

  def destinations: Map[String, DestinationSpec] =
    data.scheduleDocuments().map { doc =>
      val d = DestinationSpec(doc("destination_name"),
        DestinationType.fromName(doc("type")), metadataFor(doc))
      d.name -> d
    }.toMap

  override def executions(): Seq[Execution] = {
    val account = accountConfig
    val srcs = sources
    val dsts = destinations
    data.scheduleDocuments()
      .filter(_.get("active").exists(_.toUpperCase == "YES"))
      .map(doc => Execution(account, srcs(doc("source_name")), dsts(doc("destination_name"))))
  }
}

/** Dispatch by which config parameter is set (reference
  * `primary_execution_source.py:31-82`).
  */
/** Connection parameters for LIVE config fetch (Sheets / Firestore REST).
  * `headers` carries the OAuth bearer ([[graft.model.OAuthCredentials
  * .authHeaders]]); the api bases are injectable for staging/mock servers.
  */
final case class LiveConfigAccess(
    headers: Map[String, String] = Map.empty,
    sheetsApiBase: String = "https://sheets.googleapis.com",
    firestoreApiBase: String = "https://firestore.googleapis.com",
    firestoreProject: String = "")

object PrimaryConfigSource {
  /** Source dispatch (reference `main.py:57-66` precedence). With `live`
    * set, Sheets/Firestore ids resolve through the REST fetchers; without
    * it they stay offline plug points that fail with a remediation hint.
    */
  def select(sheetId: Option[String], jsonPath: Option[String],
      firestoreCollection: Option[String],
      live: Option[LiveConfigAccess] = None): ConfigSource =
    (sheetId, jsonPath, firestoreCollection) match {
      case (Some(s), _, _) => new SpreadsheetConfigSource(
        live.map(l => new HttpSheetsData(s, l.sheetsApiBase, l.headers): SheetsData)
          .getOrElse(new UnavailableSheets(s)))
      case (_, Some(j), _) => JsonConfigSource.fromFile(j)
      case (_, _, Some(f)) => new FirestoreConfigSource(
        live.map(l => new HttpFirestoreData(l.firestoreProject, f,
            l.firestoreApiBase, l.headers): FirestoreData)
          .getOrElse(new UnavailableFirestore(f)))
      case _ => throw new IllegalArgumentException(
        "One of sheet id, json path or firestore collection must be set")
    }
}
