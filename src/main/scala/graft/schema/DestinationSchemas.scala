package graft.schema

import graft.model.DestinationType
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-destination data-plane schemas and plan-time schema operations.
  *
  * Mirrors the reference's `_dtypes` table and its operations
  * (`/root/reference/megalista_dataflow/data_sources/data_schemas.py:25-413`):
  * column names are ANCHORED REGEXES (e.g. `cd\d+`, `.*`), `required` flags,
  * and `groups` = at-least-one-of column sets.
  *
  * All operations here are plan-time (driver-side, against `df.columns`) —
  * the actual projection/cast goes through Catalyst so pruning reaches the
  * parquet scan.
  */
final case class ColumnSpec(pattern: String, required: Boolean, dataType: String) {
  // reference matches with re.match(f'^{pattern}$', col)
  private[schema] val regex = ("^" + pattern + "$").r
  def matches(col: String): Boolean = regex.findFirstIn(col).isDefined
}

final case class DestinationSchema(columns: Seq[ColumnSpec], groups: Seq[Seq[String]])

object DestinationSchemas {
  import DestinationType._

  private def c(p: String, req: Boolean = false, dt: String = "string") =
    ColumnSpec(p, req, dt)

  private val contactInfoCols = Seq(
    c("email"), c("phone"),
    c("mailing_address_first_name"), c("mailing_address_last_name"),
    c("mailing_address_country"), c("mailing_address_zip"))

  private val ssdCols = contactInfoCols ++ Seq(c("time", req = true), c("amount", req = true))

  /** The schema table (reference `data_schemas.py:25-286`). */
  val table: Map[DestinationType, DestinationSchema] = Map(
    CmOfflineConversion -> DestinationSchema(
      Seq(c("uuid", req = true), c("gclid"), c("mobileDeviceId"),
        c("encryptedUserId"), c("matchId"), c("dclid"),
        c("value", dt = "int"), c("quantity", dt = "int"),
        c("timestamp"), c("customVariables"),
        c("customVariables\\.type"), c("customVariables\\.value"), c("ordinal")),
      Seq(Seq("gclid", "mobileDeviceId", "encryptedUserId", "matchId", "dclid"))),
    AdsOfflineConversion -> DestinationSchema(
      Seq(c("gclid", req = true), c("time", req = true), c("amount", req = true),
        c("external_attribution_credit"), c("external_attribution_model"),
        c("consent_ad_user_data"), c("consent_ad_personalization")),
      Seq.empty),
    AdsOfflineConversionAdjustmentGclid -> DestinationSchema(
      Seq(c("gclid", req = true), c("time", req = true),
        c("conversion_time", req = true), c("amount")),
      Seq.empty),
    AdsOfflineConversionAdjustmentOrderId -> DestinationSchema(
      Seq(c("order_id", req = true), c("time", req = true), c("amount")),
      Seq.empty),
    AdsEnhancedConversionLeads -> DestinationSchema(
      Seq(c("uuid", req = true), c("time", req = true), c("amount", req = true),
        c("email"), c("phone"),
        c("external_attribution_credit"), c("external_attribution_model"),
        c("consent_ad_user_data"), c("consent_ad_personalization")),
      Seq(Seq("email", "phone"))),
    AdsOfflineConversionCalls -> DestinationSchema(
      Seq(c("caller_id", req = true), c("call_time", req = true),
        c("time", req = true), c("amount", req = true),
        c("consent_ad_user_data"), c("consent_ad_personalization")),
      Seq.empty),
    AdsSsdUpload -> DestinationSchema(ssdCols,
      Seq(Seq("email", "phone", "mailing_address_first_name"))),
    AdsSsiUpload -> DestinationSchema(
      ssdCols ++ Seq(c("currency_code", req = true), c("custom_value")),
      Seq(Seq("email", "phone", "mailing_address_first_name"))),
    AdsEnhancedConversion -> DestinationSchema(Seq(c(".*")), Seq.empty),
    AdsCustomerMatchContactInfoUpload -> DestinationSchema(contactInfoCols, Seq.empty),
    AdsCustomerMatchMobileDeviceIdUpload -> DestinationSchema(
      Seq(c("mobile_device_id", req = true)), Seq.empty),
    AdsCustomerMatchUserIdUpload -> DestinationSchema(
      Seq(c("user_id", req = true)), Seq.empty),
    GaUserListUpload -> DestinationSchema(Seq(c(".*")), Seq.empty),
    AppsFlyerS2SEvents -> DestinationSchema(
      Seq(c("uuid", req = true), c("appsflyer_id", req = true),
        c("customer_user_id"), c("ip"), c("device_ids_idfa"),
        c("device_ids_advertising_id"), c("device_ids_amazon_aid"),
        c("device_ids_oaid"), c("device_ids_imei"),
        c("event_eventName", req = true), c("event_eventCurrency"),
        c("event_eventTime"), c("event_eventValue")),
      Seq.empty),
    GaMeasurementProtocol -> DestinationSchema(
      Seq(c("uuid", req = true), c("client_id"), c("user_id"),
        c("event_category", req = true), c("event_action", req = true),
        c("event_label"), c("event_value"), c("cm\\d+"), c("cd\\d+"),
        c("campaign_source"), c("campaign_medium")),
      Seq(Seq("client_id", "user_id"))),
    GaDataImport -> DestinationSchema(
      Seq(c("cd\\d+", req = true), c("cd\\d+", req = true), c("cd\\d+")),
      Seq.empty),
    Ga4MeasurementProtocol -> DestinationSchema(
      Seq(c("uuid", req = true), c("app_instance_id"), c("client_id"),
        c("name"), c("user_id"), c(".*")),
      Seq(Seq("app_instance_id", "client_id"))),
    DvCustomerMatchContactInfoUpload -> DestinationSchema(
      Seq(c("email"), c("phone"),
        c("mailing_address_first_name"), c("mailing_address_last_name"),
        c("mailing_address_country_name"), c("mailing_address_zip_name")),
      Seq.empty),
    DvCustomerMatchDeviceIdUpload -> DestinationSchema(
      Seq(c("mobile_device_id", req = true)), Seq.empty),
    UploadedGclidTime -> DestinationSchema(
      Seq(c("timestamp", req = true), c("gclid", req = true), c("time", req = true)),
      Seq.empty),
    UploadedUuid -> DestinationSchema(
      Seq(c("timestamp", req = true), c("uuid", req = true)), Seq.empty),
    UploadedOrderId -> DestinationSchema(
      Seq(c("timestamp", req = true), c("order_id", req = true), c("time", req = true)),
      Seq.empty)
  )

  /** Required columns with no matching data column
    * (reference `data_schemas.py:291-307`).
    */
  def missingRequired(dataCols: Seq[String], dt: DestinationType): Seq[String] =
    // reuse the table's PRECOMPILED specs (no per-call Pattern.compile),
    // and NO .distinct: the reference reports a duplicated required
    // pattern once per occurrence (data_schemas.py:291-307)
    table(dt).columns.filter(_.required)
      .filterNot(spec => dataCols.exists(spec.matches))
      .map(_.pattern)

  /** Column groups with no member present (reference `data_schemas.py:312-330`). */
  def missingGroups(dataCols: Seq[String], dt: DestinationType): Seq[Seq[String]] = {
    val specs = table(dt).columns.map(s => s.pattern -> s).toMap
    table(dt).groups.filterNot(g =>
      g.exists(p => specs.get(p) match {
        case Some(spec) => dataCols.exists(spec.matches)
        case None => dataCols.exists(dc => ColumnSpec(p, required = false, "string").matches(dc))
      }))
  }

  /** Reference `validate_data_columns` (`data_schemas.py:334-341`). */
  def validateDataColumns(dataCols: Seq[String], dt: DestinationType): Boolean =
    missingRequired(dataCols, dt).isEmpty && missingGroups(dataCols, dt).isEmpty

  /** Reference `get_error_message` (`data_schemas.py:344-354`). */
  def errorMessage(dataCols: Seq[String], dt: DestinationType): String = {
    val parts = Seq.newBuilder[String]
    val mr = missingRequired(dataCols, dt)
    if (mr.nonEmpty) parts += s"Required: [${mr.mkString(",")}]"
    missingGroups(dataCols, dt).foreach(g => parts += s"One of [${g.mkString(",")}]")
    s"Some columns were missing: ${parts.result().mkString("; ")}."
  }

  /** Column pruning: keep data columns matching any declared pattern,
    * preserving DATA column order, deduped — mirrors the reference's loop
    * shape (`data_schemas.py:359-371`).
    */
  def pruneColumnNames(dataCols: Seq[String], dt: DestinationType): Seq[String] = {
    val specs = table(dt).columns
    dataCols.filter(dc => specs.exists(_.matches(dc))).distinct
  }

  /** Plan-time projection: `.select` of the pruned columns so Catalyst pushes
    * the pruning down to the scan.
    */
  def prune(df: DataFrame, dt: DestinationType): DataFrame = {
    val keep = pruneColumnNames(df.columns.toSeq, dt)
    df.select(keep.map(col): _*)
  }

  /** Cast declared non-string columns (reference `data_schemas.py:376-387`;
    * only `int` appears, CM value/quantity).
    */
  def castNonString(df: DataFrame, dt: DestinationType): DataFrame =
    table(dt).columns.filter(_.dataType != "string").foldLeft(df) { (acc, spec) =>
      // non-string specs in the table are literal names, not regexes
      if (acc.columns.contains(spec.pattern)) {
        val target = spec.dataType match {
          case "int" => "long"
          case other => other
        }
        acc.withColumn(spec.pattern, col(spec.pattern).cast(target))
      } else acc
    }

  /** CM_OFFLINE_CONVERSION customVariables fold
    * (reference `_join_custom_variables`, `data_schemas.py:401-413`):
    * flat `customVariables.type`/`.value` columns are folded into one
    * per-`uuid` array-of-structs column, then duplicates are dropped.
    *
    * Spark-first: `collect_list(struct(...)) over (partition by uuid)` is a
    * single shuffle-free-if-pre-partitioned window; the reference's pandas
    * groupby+transform+drop_duplicates becomes window + dropDuplicates.
    */
  def joinCustomVariables(df: DataFrame): DataFrame = {
    val tpe = col("`customVariables.type`")
    val value = col("`customVariables.value`")
    if (!df.columns.contains("customVariables.type")) df
    else {
      import org.apache.spark.sql.expressions.Window
      // array_sort makes the fold order-deterministic across partitionings
      // (the reference preserves pandas row order, which is itself an
      // artifact of input file order — documented divergence).
      val folded = df
        .withColumn("customVariables",
          array_sort(collect_list(struct(tpe.as("type"), value.as("value")))
            .over(Window.partitionBy(col("uuid")))))
        .drop("customVariables.type", "customVariables.value")
      folded.dropDuplicates(folded.columns.filterNot(_ == "customVariables"))
    }
  }

  /** Reference `process_by_destination_type` (`data_schemas.py:392-396`). */
  def processByDestinationType(df: DataFrame, dt: DestinationType): DataFrame =
    dt match {
      case DestinationType.CmOfflineConversion => joinCustomVariables(df)
      case _ => df
    }
}
