package graft.model

/** Control-plane model of the activation engine.
  *
  * Mirrors the reference's execution model (see
  * `/root/reference/megalista_dataflow/models/execution.py:21-318`) as plain
  * Scala case classes. These are config-scale objects (tens to hundreds), so
  * they live driver-side as `Seq[Execution]`; no Dataset/shuffle is needed for
  * the control plane.
  */

/** Destination branch types (reference `models/execution.py:21-50`).
  * 22 values; 18 drive active pipeline branches, the rest describe control
  * table schemas or are schema-only legacy.
  */
sealed abstract class DestinationType(val name: String) {
  override def toString: String = name
}

object DestinationType {
  case object AdsOfflineConversion extends DestinationType("ADS_OFFLINE_CONVERSION")
  case object AdsOfflineConversionCalls extends DestinationType("ADS_OFFLINE_CONVERSION_CALLS")
  case object AdsOfflineConversionAdjustmentGclid extends DestinationType("ADS_OFFLINE_CONVERSION_ADJUSTMENT_GCLID")
  case object AdsOfflineConversionAdjustmentOrderId extends DestinationType("ADS_OFFLINE_CONVERSION_ADJUSTMENT_ORDER_ID")
  case object AdsEnhancedConversionLeads extends DestinationType("ADS_ENHANCED_CONVERSION_LEADS")
  case object AdsSsdUpload extends DestinationType("ADS_SSD_UPLOAD")
  case object AdsSsiUpload extends DestinationType("ADS_SSI_UPLOAD")
  case object AdsCustomerMatchContactInfoUpload extends DestinationType("ADS_CUSTOMER_MATCH_CONTACT_INFO_UPLOAD")
  case object AdsCustomerMatchMobileDeviceIdUpload extends DestinationType("ADS_CUSTOMER_MATCH_MOBILE_DEVICE_ID_UPLOAD")
  case object AdsCustomerMatchUserIdUpload extends DestinationType("ADS_CUSTOMER_MATCH_USER_ID_UPLOAD")
  case object AdsEnhancedConversion extends DestinationType("ADS_ENHANCED_CONVERSION") // schema-only legacy
  case object CmOfflineConversion extends DestinationType("CM_OFFLINE_CONVERSION")
  case object GaUserListUpload extends DestinationType("GA_USER_LIST_UPLOAD")
  case object GaMeasurementProtocol extends DestinationType("GA_MEASUREMENT_PROTOCOL")
  case object Ga4MeasurementProtocol extends DestinationType("GA_4_MEASUREMENT_PROTOCOL")
  case object GaDataImport extends DestinationType("GA_DATA_IMPORT")
  case object DvCustomerMatchContactInfoUpload extends DestinationType("DV_CUSTOMER_MATCH_CONTACT_INFO_UPLOAD")
  case object DvCustomerMatchDeviceIdUpload extends DestinationType("DV_CUSTOMER_MATCH_DEVICE_ID_UPLOAD")
  case object AppsFlyerS2SEvents extends DestinationType("APPSFLYER_S2S_EVENTS")
  // control-table schema descriptors only (`models/execution.py:42-44`)
  case object UploadedGclidTime extends DestinationType("UPLOADED_GCLID_TIME")
  case object UploadedUuid extends DestinationType("UPLOADED_UUID")
  case object UploadedOrderId extends DestinationType("UPLOADED_ORDER_ID")

  val all: Seq[DestinationType] = Seq(
    AdsOfflineConversion, AdsOfflineConversionCalls,
    AdsOfflineConversionAdjustmentGclid, AdsOfflineConversionAdjustmentOrderId,
    AdsEnhancedConversionLeads, AdsSsdUpload, AdsSsiUpload,
    AdsCustomerMatchContactInfoUpload, AdsCustomerMatchMobileDeviceIdUpload,
    AdsCustomerMatchUserIdUpload, AdsEnhancedConversion, CmOfflineConversion,
    GaUserListUpload, GaMeasurementProtocol, Ga4MeasurementProtocol,
    GaDataImport, DvCustomerMatchContactInfoUpload,
    DvCustomerMatchDeviceIdUpload, AppsFlyerS2SEvents,
    UploadedGclidTime, UploadedUuid, UploadedOrderId)

  private val byName: Map[String, DestinationType] =
    all.map(d => d.name -> d).toMap

  def fromName(n: String): DestinationType =
    byName.getOrElse(n, throw new IllegalArgumentException(s"Unknown destination type: $n"))
}

/** Reference `models/execution.py:53-54`. */
sealed abstract class SourceType(val name: String)
object SourceType {
  case object BigQuery extends SourceType("BIG_QUERY")
  case object File extends SourceType("FILE")
  def fromName(n: String): SourceType = n match {
    case "BIG_QUERY" => BigQuery
    case "FILE"      => File
    case other => throw new IllegalArgumentException(s"Unknown source type: $other")
  }
}

/** Which key identifies a row for transactional dedup
  * (reference `models/execution.py:57-70`).
  */
sealed abstract class TransactionalType(val name: String, val keyColumns: Seq[String])
object TransactionalType {
  case object NotTransactional extends TransactionalType("NOT_TRANSACTIONAL", Seq.empty)
  case object Uuid extends TransactionalType("UUID", Seq("uuid"))
  case object GclidTime extends TransactionalType("GCLID_TIME", Seq("gclid", "time"))
  case object OrderIdTime extends TransactionalType("ORDER_ID_TIME", Seq("order_id", "time"))
  val all = Seq(NotTransactional, Uuid, GclidTime, OrderIdTime)
}

/** Account-level configuration (reference `models/execution.py:73-160`).
  * Numeric ids are normalized to digits-only, mirroring the reference's
  * filter at `models/execution.py:88-93`.
  */
final case class AccountConfig(
    googleAdsAccountId: String = "",
    mccTrix: Boolean = false,
    googleAnalyticsAccountId: String = "",
    campaignManagerProfileId: String = "",
    appId: String = "") {
  def normalized: AccountConfig = copy(
    googleAdsAccountId = AccountConfig.digitsOnly(googleAdsAccountId),
    googleAnalyticsAccountId = AccountConfig.digitsOnly(googleAnalyticsAccountId),
    campaignManagerProfileId = AccountConfig.digitsOnly(campaignManagerProfileId))
}
object AccountConfig {
  def digitsOnly(s: String): String = s.filter(_.isDigit)
}

/** OAuth credential block for the live Google API transports (reference
  * `models/oauth_credentials.py:16-35`, populated from the
  * `--client_id/--client_secret/--access_token/--refresh_token` CLI flags
  * of `models/options.py:25-31`, plus the Ads `--developer_token` of
  * `options.py:49`). Offline transports ignore it; [[graft.Main]] threads
  * it into the HTTP transport's auth headers so cloud mode is a CONFIG
  * change, not a code change.
  */
final case class OAuthCredentials(
    clientId: String = "",
    clientSecret: String = "",
    accessToken: String = "",
    refreshToken: String = "",
    developerToken: String = "") {
  /** Headers a live Google endpoint expects on every call. The refresh
    * flow (exchanging refreshToken for a new accessToken) belongs to the
    * deployment's token service; this block carries what the wire needs.
    */
  def authHeaders: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    if (accessToken.nonEmpty) b += ("Authorization" -> s"Bearer $accessToken")
    if (developerToken.nonEmpty) b += ("developer-token" -> developerToken)
    b.result()
  }
}

/** Data source of one execution (reference `models/execution.py:163-213`).
  * `metadata` is positional: [dataset, table] for BIG_QUERY or
  * [fileType, path] for FILE.
  */
final case class SourceSpec(
    name: String,
    sourceType: SourceType,
    metadata: Seq[String])

/** Destination of one execution (reference `models/execution.py:216-267`).
  * `metadata` is positional and destination-specific.
  */
final case class DestinationSpec(
    name: String,
    destinationType: DestinationType,
    metadata: Seq[String])

/** One unit of work: (account, source, destination)
  * (reference `models/execution.py:270-318`).
  */
final case class Execution(
    account: AccountConfig,
    source: SourceSpec,
    destination: DestinationSpec) {
  def key: String = s"${source.name} -> ${destination.name}"
}

