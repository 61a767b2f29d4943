package graft.pipeline

import graft.model.Execution

/** Usage-stats step (reference `steps/last_step.py:59-129`:
  * `PrintResultsDoFn.check_stats` feeding the Tadau measurement-protocol
  * client): one "ran" record per executed execution and one "error" record
  * per recorded error (message truncated to 500 chars), each stamped with
  * client_id / name / version. Stats run "silently" — any failure is
  * swallowed (the reference wraps everything in a bare try/except), and
  * nothing is collected unless `collectUsageStats` is on and there is at
  * least one record. The wire client is the `collect` seam; offline the
  * rendered records are what tests assert.
  */
object UsageStats {

  val Name = "Megalista"

  /** Reference `config/version.py`: stamped during deployment. */
  val Version = "[megalista_version]"

  /** `check_stats` ran-records (`last_step.py:100-113`). */
  def ranRecords(executions: Seq[Execution]): Seq[Map[String, String]] =
    executions.map { ex =>
      Map(
        "action" -> "ran",
        "solution" -> ex.destination.destinationType.name,
        "target" -> ex.destination.metadata.headOption.getOrElse(""),
        "ads" -> ex.account.googleAdsAccountId,
        "cm" -> ex.account.campaignManagerProfileId,
        "ga" -> ex.account.googleAnalyticsAccountId)
    }

  /** `check_stats` error-records (`last_step.py:114-126`): (logger name,
    * message) pairs, message truncated to 500 chars.
    */
  def errorRecords(errors: Seq[(String, String)]): Seq[Map[String, String]] =
    errors.map { case (name, message) =>
      Map("action" -> "error", "solution" -> name, "message" -> message.take(500))
    }

  /** The per-batch stamp merged over every record (`last_step.py:71-79`). */
  def stamp(clientId: String, records: Seq[Map[String, String]]): Seq[Map[String, String]] =
    records.map(r => Map("client_id" -> clientId, "name" -> Name, "version" -> Version) ++ r)

  /** The silent gate + send (`last_step.py:63-84`): no-op unless enabled and
    * non-empty; a throwing collector is swallowed.
    */
  def process(collectUsageStats: Boolean, clientId: String,
      records: Seq[Map[String, String]], collect: Seq[Map[String, String]] => Unit): Unit =
    try {
      if (collectUsageStats && records.nonEmpty) collect(stamp(clientId, records))
    } catch {
      // the contract is SILENT failure (the reference wraps the whole step
      // in a bare try/except): a LinkageError from a missing wire-client
      // jar must not kill a run whose uploads all succeeded
      case _: LinkageError => ()
      case scala.util.control.NonFatal(_) => ()
    }
}
