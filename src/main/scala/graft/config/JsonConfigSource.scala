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
      val enabled = Option(conn.get("Enabled")).exists(n => !n.isNull && n.asBoolean(false))
      if (!enabled) None
      else Some(Execution(account, srcs(str(conn, "Source")), dsts(str(conn, "Destination"))))
    }
  }
}

/** Interface stubs for the Sheets / Firestore config paths (reference
  * `spreadsheet_execution_source.py:25-133`, `firestore_execution_source.py:
  * 25-137`): external-API surfaces, out of scope offline — the trait seam is
  * what the engine depends on.
  */
final class SpreadsheetConfigSource(sheetId: String) extends ConfigSource {
  override def executions(): Seq[Execution] =
    throw new UnsupportedOperationException(
      s"Sheets config source requires the Sheets API (sheet $sheetId); use JsonConfigSource offline")
}

final class FirestoreConfigSource(collection: String) extends ConfigSource {
  override def executions(): Seq[Execution] =
    throw new UnsupportedOperationException(
      s"Firestore config source requires the Firestore API (collection $collection); use JsonConfigSource offline")
}

/** Dispatch by which config parameter is set (reference
  * `primary_execution_source.py:31-82`).
  */
object PrimaryConfigSource {
  def select(sheetId: Option[String], jsonPath: Option[String],
      firestoreCollection: Option[String]): ConfigSource =
    (sheetId, jsonPath, firestoreCollection) match {
      case (Some(s), _, _) => new SpreadsheetConfigSource(s)
      case (_, Some(j), _) => JsonConfigSource.fromFile(j)
      case (_, _, Some(f)) => new FirestoreConfigSource(f)
      case _ => throw new IllegalArgumentException(
        "One of sheet id, json path or firestore collection must be set")
    }
}
