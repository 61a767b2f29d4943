package graft.pipeline

import graft.model._
import graft.sink._
import graft.transform.PiiHashing
import org.apache.spark.sql.DataFrame

/** The 18+1 destination-branch registry — batch sizes, transactional types,
  * hashers, renderers — lifted from
  * `/root/reference/megalista_dataflow/steps/processing_steps.py:89-673` and
  * `third_party/steps.py:20-51` (cited per row below).
  *
  * `readTransactional` drives the anti-join at source read;
  * `writebackTransactional` drives the `_uploaded` append after upload.
  * They differ only for OCI calls, where the reference loads
  * NOT_TRANSACTIONAL but wires a GCLID_TIME writer
  * (`processing_steps.py:353,369`) — an inconsistency; calls rows carry no
  * gclid, so this rebuild performs no writeback for that branch
  * (documented divergence).
  */
final case class BranchSpec(
    destinationType: DestinationType,
    batchSize: Int,
    readTransactional: TransactionalType,
    writebackTransactional: Option[TransactionalType],
    hasher: Option[(DataFrame, Seq[String]) => DataFrame],
    renderer: Long => PayloadRenderer, // nowMicros => renderer
    rateLimitPerSec: Option[Int] = None,
    /** True when the renderer's output depends on the GLOBAL 1-based batch
      * iteration (CM REPLACE remove_all / ensure-list on iteration 1, GA
      * data-import erase-before-first, DV create-vs-edit). Only these
      * branches pay the per-partition row-count pass that precomputes global
      * batch offsets; all others take a partition-local index the renderer
      * never reads.
      */
    needsIteration: Boolean = false)

object Branches {
  import DestinationType._
  import TransactionalType._

  private def adsHash(df: DataFrame, metadata: Seq[String]): DataFrame =
    PiiHashing.adsShape(df, PiiHashing.shouldHashFields(metadata))

  private def dvHash(df: DataFrame, metadata: Seq[String]): DataFrame =
    PiiHashing.dvShape(df, PiiHashing.shouldHashFields(metadata))

  val all: Seq[BranchSpec] = Seq(
    // processing_steps.py:89-113
    BranchSpec(AdsSsdUpload, 5000, NotTransactional, None, Some(adsHash),
      _ => Renderers.AdsSsd),
    // processing_steps.py:115-139
    BranchSpec(AdsSsiUpload, 5000, NotTransactional, None, Some(adsHash),
      _ => Renderers.AdsSsi),
    // processing_steps.py:141-167
    BranchSpec(AdsCustomerMatchMobileDeviceIdUpload, 5000, NotTransactional, None,
      Some(adsHash), _ => Renderers.AdsCustomerMatch("mobile"), needsIteration = true),
    // processing_steps.py:170-196
    BranchSpec(AdsCustomerMatchContactInfoUpload, 5000, NotTransactional, None,
      Some(adsHash), _ => Renderers.AdsCustomerMatch("contact_info"), needsIteration = true),
    // processing_steps.py:199-225
    BranchSpec(AdsCustomerMatchUserIdUpload, 5000, NotTransactional, None,
      Some(adsHash), _ => Renderers.AdsCustomerMatch("user_id"), needsIteration = true),
    // processing_steps.py:228-261
    BranchSpec(AdsOfflineConversion, 2000, GclidTime, Some(GclidTime), None,
      _ => Renderers.AdsOfflineClick),
    // processing_steps.py:264-299
    BranchSpec(AdsOfflineConversionAdjustmentGclid, 2000, GclidTime, Some(GclidTime),
      None, _ => Renderers.AdsAdjustmentGclid),
    // processing_steps.py:302-337
    BranchSpec(AdsOfflineConversionAdjustmentOrderId, 2000, OrderIdTime, Some(OrderIdTime),
      None, _ => Renderers.AdsAdjustmentOrderId),
    // processing_steps.py:340-375 (writer inconsistency — see scaladoc)
    BranchSpec(AdsOfflineConversionCalls, 2000, NotTransactional, None, None,
      _ => Renderers.AdsOfflineCalls),
    // processing_steps.py:378-415
    BranchSpec(AdsEnhancedConversionLeads, 2000, Uuid, Some(Uuid), Some(adsHash),
      _ => Renderers.AdsECLeads),
    // processing_steps.py:418-440
    BranchSpec(GaUserListUpload, 5000000, NotTransactional, None, None,
      _ => Renderers.GaUserList),
    // processing_steps.py:443-474 (eraser runs before upload, same branch)
    BranchSpec(GaDataImport, 1000000, NotTransactional, None, None,
      _ => new PayloadRenderer {
        override def render(e: Execution, rows: Seq[Map[String, Any]], it: Long): Seq[RenderedRequest] = {
          val erase = if (it == 1L) Renderers.GaDataImportEraser.render(e, rows, it)
            .map(_.copy(rowIdx = Seq.empty)) else Seq.empty
          erase ++ Renderers.GaDataImport.render(e, rows, it)
        }
      }, needsIteration = true),
    // processing_steps.py:477-508
    BranchSpec(GaMeasurementProtocol, 20, Uuid, Some(Uuid), None,
      _ => Renderers.GaMeasurementProtocol),
    // processing_steps.py:511-544
    BranchSpec(Ga4MeasurementProtocol, 20, Uuid, Some(Uuid), None,
      _ => Renderers.Ga4MeasurementProtocol),
    // processing_steps.py:547-579
    BranchSpec(CmOfflineConversion, 1000, Uuid, Some(Uuid), None,
      now => Renderers.Cm360(now)),
    // processing_steps.py:611-637
    BranchSpec(DvCustomerMatchContactInfoUpload, 5000, NotTransactional, None,
      Some(dvHash), _ => Renderers.DvCustomerMatch("contact_info"), needsIteration = true),
    // processing_steps.py:582-608
    BranchSpec(DvCustomerMatchDeviceIdUpload, 5000, NotTransactional, None,
      Some(dvHash), _ => Renderers.DvCustomerMatch("mobile"), needsIteration = true),
    // third_party/steps.py:20-51; 500 events/s rate limit
    // (appsflyer_s2s_uploader_async.py:135-139)
    BranchSpec(AppsFlyerS2SEvents, 1000, Uuid, Some(Uuid), None,
      _ => Renderers.AppsFlyerS2S, rateLimitPerSec = Some(500))
  )

}
