package graft.error

import graft.model.{DestinationType, Execution}

/** Error accumulation + notification (reference
  * `/root/reference/megalista_dataflow/error/error_handling.py:27-185`).
  *
  * Semantics preserved:
  *  - one [[ErrorHandler]] per destination-type branch;
  *  - at most ONE recorded error per Execution (later errors overwrite, as
  *    the reference's dict assignment does);
  *  - adding an error for a different destination type is a programming
  *    error and throws;
  *  - `notifyErrors` is a no-op when empty;
  *  - any error anywhere flips the process exit code to 1 without aborting
  *    other branches (`main.py:106-121`) — surfaced via [[hasErrors]].
  */
final case class Error(execution: Execution, errorMessage: String)

trait ErrorNotifier {
  def notify(destinationType: DestinationType, errors: Iterable[Error]): Unit
}

/** Offline stand-in for the reference's GmailNotifier: collects + logs.
  * (The Gmail transport is an external API; the notification CONTENT
  * contract — one notification per destination type carrying its errors —
  * is what matters and is testable.)
  */
final class LogNotifier extends ErrorNotifier {
  // one notifier is shared by all (concurrently running) branches
  private val buf = scala.collection.mutable.ListBuffer.empty[(DestinationType, Seq[Error])]
  override def notify(destinationType: DestinationType, errors: Iterable[Error]): Unit = {
    buf.synchronized { buf += destinationType -> errors.toSeq }
    errors.foreach(e => System.err.println(
      s"[graft] $destinationType error on ${e.execution.key}: ${e.errorMessage}"))
  }
  def notifications: Seq[(DestinationType, Seq[Error])] = buf.synchronized(buf.toSeq)
}

object EmailNotifier {
  /** A rendered notification; `from` is the authenticated user ("me" in the
    * Gmail API), recipients joined by the transport.
    */
  final case class Email(to: Seq[String], from: String, subject: String, bodyHtml: String)
}

/** The reference GmailNotifier's CONTENT contract
  * (`error/error_handling.py:63-143`) with delivery seamed out: the
  * should-notify gate, comma-split/stripped recipients, subject line, and
  * the HTML body format are replicated verbatim (including the reference's
  * stray `</b>` and line breaks — the format IS the observable behavior);
  * `deliver` is where the Gmail send plugs in. The offline default records
  * the rendered email and logs, so tests and operators can assert content.
  */
final class EmailNotifier(shouldNotifyParam: String, emailDestinations: String,
    deliver: EmailNotifier.Email => Unit) extends ErrorNotifier {
  import EmailNotifier.Email

  private val sent = scala.collection.mutable.ListBuffer.empty[Email]
  def sentEmails: Seq[Email] = sent.synchronized(sent.toSeq)

  /** `_should_notify` (error_handling.py:87-91). */
  def shouldNotify: Boolean =
    shouldNotifyParam != null && shouldNotifyParam.toLowerCase == "true"

  /** Comma-split + strip (error_handling.py:117-123). */
  def recipients: Seq[String] = emailDestinations.split(",").toSeq.map(_.trim)

  /** `_build_email_body` (error_handling.py:125-143) — byte-identical to the
    * reference's f-string concatenation.
    */
  def buildBody(destinationType: DestinationType, errors: Iterable[Error]): String = {
    val sb = new StringBuilder
    sb.append(s"""<h3>Hello, Megalista user.</h3>
           This is an error summary for the destination: <b>${destinationType.name}</b>.""")
    sb.append("""<p>
    <b>Errors list:</b>
    <ul>""")
    errors.foreach { error =>
      // the reference line ends in "destination " + newline (trailing space
      // included) — appended explicitly so no editor strips it
      sb.append("\n      <li>Error for source <b>\"")
        .append(error.execution.source.name)
        .append("\"</b> and destination \n      <b>\"")
        .append(error.execution.destination.name)
        .append("\"</b>: ").append(error.errorMessage).append("</b>\n      </li>")
    }
    sb.append("</ul>")
    sb.toString
  }

  override def notify(destinationType: DestinationType, errors: Iterable[Error]): Unit = {
    if (!shouldNotify) {
      System.err.println(
        s"[graft] Skipping sending emails notifying of errors: ${errors.mkString(", ")}")
      return
    }
    val email = Email(recipients, "me",
      s"[Action Required] Megalista error detected - ${destinationType.name}",
      buildBody(destinationType, errors))
    sent.synchronized(sent += email)
    deliver(email)
  }
}

final class ErrorHandler(val destinationType: DestinationType, notifier: ErrorNotifier) {
  private val errorMap = scala.collection.mutable.LinkedHashMap.empty[Execution, Error]

  def addError(execution: Execution, message: String): Unit = {
    require(execution.destination.destinationType == destinationType,
      s"Received a error of destination type: ${execution.destination.destinationType}" +
        s" but this error handler is initialized with $destinationType destination type")
    errorMap(execution) = Error(execution, message)
  }

  def errors: Map[Execution, Error] = errorMap.toMap

  def hasErrors: Boolean = errorMap.nonEmpty

  def notifyErrors(): Unit =
    if (errorMap.nonEmpty) notifier.notify(destinationType, errorMap.values.toSeq)
}
