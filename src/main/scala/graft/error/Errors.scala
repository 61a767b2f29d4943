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
