package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guard against oversized EXPLICIT broadcasts — a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]).
  *
  * A `broadcast(df)` hint is an unconditional order: Spark ships the whole
  * side to every executor even when it has grown to tens of GB since the
  * hint was written (the classic slow-creep OOM — the dimension table that
  * was 10 MB at launch and 40 GB two years later). The guard runs in the
  * operator-optimization batch — after `EliminateResolvedHint` has moved
  * hints onto the `Join` nodes — and clears a side's BROADCAST hint when
  * that side's plan-time size estimate exceeds
  * `graft.broadcastGuard.maxBytes` (default 1 GiB), letting the planner
  * fall back to a shuffle join; AQE can still re-broadcast at runtime if
  * the TRUE size turns out small. Call sites keep their own size gates
  * (e.g. the transactional anti-join) — this rule is the backstop for the
  * ones that forget.
  *
  * Disable per session with `graft.broadcastGuard.enabled=false`;
  * stripped hints are logged with both sizes so the regression is
  * visible, not silent.
  */
case class BroadcastGuard(spark: SparkSession) extends Rule[LogicalPlan] with Logging {

  private def conf(key: String, default: String): String =
    spark.conf.getOption(key).getOrElse(default)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf("graft.broadcastGuard.enabled", "true").toBoolean) return plan
    val maxBytes = BigInt(conf("graft.broadcastGuard.maxBytes",
      (1L << 30).toString))
    def guard(side: String, h: Option[HintInfo], p: LogicalPlan): Option[HintInfo] =
      h match {
        case Some(info) if info.strategy.contains(BROADCAST) &&
            p.stats.sizeInBytes > maxBytes =>
          logWarning(s"graft.broadcastGuard: clearing BROADCAST hint on the " +
            s"$side side — estimated ${p.stats.sizeInBytes} bytes > $maxBytes")
          val stripped = info.copy(strategy = None)
          if (stripped == HintInfo()) None else Some(stripped)
        case other => other
      }
    plan.transformUp {
      case j @ Join(l, r, _, _, JoinHint(lh, rh))
          if lh.exists(_.strategy.contains(BROADCAST)) ||
            rh.exists(_.strategy.contains(BROADCAST)) =>
        j.copy(hint = JoinHint(guard("left", lh, l), guard("right", rh, r)))
    }
  }
}
