package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.SparkPlanInfo
import org.apache.spark.sql.execution.ui.{SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionStart}

/** Structural BNLJ/cartesian audit for the rows the blanket PlanSpec
  * audit cannot PLAN side-effect-free: streaming drains, the pipeline
  * fixpoint, index/table writes. PlanSpec skips them because calling the
  * query function already executes work; here that's the point — every
  * SQL execution each row actually RUNS (micro-batches, writes, the
  * returned frame) is captured from the listener bus as its
  * [[SparkPlanInfo]] tree and held to the same standard: no
  * CartesianProduct anywhere, and a BroadcastNestedLoopJoin only with a
  * broadcast-scalar build side (IdentityBroadcastMode over a
  * no-grouping-key aggregate — the corpus-scalar append). This retires
  * the name-list failure mode for the side-effecting registry slice.
  */
class ExecutedPlanAuditSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  private def flatten(p: SparkPlanInfo): Seq[SparkPlanInfo] =
    p +: p.children.flatMap(flatten)

  /** SparkPlanInfo mirror of PlanSpec.scalarBuild: some child subtree of
    * the BNLJ starts (through row-preserving wrappers) with a
    * BroadcastExchange in IdentityBroadcastMode whose payload is a
    * no-grouping-key aggregate — <=1 row by construction. Generate/Expand
    * above the aggregate would multiply rows and fails.
    */
  private def scalarBuild(j: SparkPlanInfo): Boolean =
    j.children.exists(side => flatten(side).exists { n =>
      n.nodeName == "BroadcastExchange" &&
        n.simpleString.contains("IdentityBroadcastMode") &&
        n.children.headOption.exists(scalarTop)
    })

  private def scalarTop(p: SparkPlanInfo): Boolean = p.nodeName match {
    case n if n.contains("Aggregate") => p.simpleString.contains("keys=[]")
    case "Generate" | "Expand" => false
    case _ if p.children.size == 1 => scalarTop(p.children.head)
    case _ => false
  }

  test("side-effecting rows: every EXECUTED plan passes the structural join audit") {
    // The PlanSpec skip list minus the documented brute-force baselines
    // (e_cosine_topk-class exact references) and the two planning-level
    // exemptions (t_kmv_jaccard sketch-grain inequality join,
    // q_mondrian_anon round-1 constant-folded grouped-scalar broadcast).
    val rows = Seq(
      "s_rollup_stream", "s_sessionize_stream", "s_dedup_stream",
      "s_interval_join_stream", "s_sliding_stream", "s_asof_stream",
      "s_anti_join_stream", "s_transitions_stream", "s_topk_stream",
      "s_outer_interval_stream", "s_session_window_stream",
      "s_ingest_dedup_stream", "s_quality_monitor_stream", "s_hll_stream",
      "s_f2_stream", "s_psi_stream", "s_cusum_stream", "s_ewma_stream",
      "s_srm_stream", "p_pipeline_idempotence", "d_incremental_dedup",
      "e_ivf_index_topk", "e_pq_index_topk", "d_lsh_index_pairs",
      "q_orc_roundtrip", "q_jsonl_roundtrip", "q_csv_roundtrip",
      "q_partitioned_prune", "q_time_travel", "q_snapshot_diff",
      "q_schema_evolution", "q_bucket_join", "q_rtbf_delete",
      "q_delete_vectors", "q_dpp_prune", "q_runtime_filter")
    // Attribution, exact where possible: each row runs under
    // setJobDescription(<row name>), and SQLExecutionStart carries that
    // description AT POST TIME — a late-delivered event still lands on the
    // right row, which the old wall-clock bus-drain heuristic could not
    // guarantee. Streaming micro-batches OVERWRITE the description (the
    // stream thread sets "... batch = N"), so those fall back to the
    // run-order `current` — still drained per query, and flagged in any
    // failure message so a misattributed assertion points at itself.
    // Adaptive updates carry no description; they join their start event
    // through the executionId map.
    val plans = scala.collection.mutable.Buffer
      .empty[(String, Boolean, SparkPlanInfo)] // (row, exactAttribution, plan)
    val execToRow = new java.util.concurrent.ConcurrentHashMap[Long, (String, Boolean)]()
    @volatile var current = ""
    val rowSet = rows.toSet
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        // start events catch the static plan, adaptive updates the
        // re-planned stages — both are audited (strictly stronger)
        case e: SparkListenerSQLExecutionStart =>
          val attr =
            if (rowSet.contains(e.description)) (e.description, true)
            else (current, false)
          execToRow.put(e.executionId, attr)
          plans.synchronized { plans += ((attr._1, attr._2, e.sparkPlanInfo)) }
        case e: SparkListenerSQLAdaptiveExecutionUpdate =>
          val attr = Option(execToRow.get(e.executionId))
            .getOrElse((current, false))
          plans.synchronized { plans += ((attr._1, attr._2, e.sparkPlanInfo)) }
        case _ =>
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      rows.foreach { q =>
        current = q
        spark.sparkContext.setJobDescription(q)
        try SparkEntry.queries(q)(spark, dir).count()
        finally spark.sparkContext.setJobDescription(null)
        // drain the async listener bus before moving to the next row so
        // the `current` FALLBACK (micro-batch executions) stays correct:
        // poll until no new plan arrives for 200 ms (bounded)
        var last = -1
        var stable = 0
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (stable < 2 && System.nanoTime() < deadline) {
          val n = plans.synchronized(plans.size)
          if (n == last) stable += 1 else { stable = 0; last = n }
          Thread.sleep(100)
        }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val byRow = plans.synchronized(plans.toVector).groupBy(_._1)
    val missing = rows.filterNot(byRow.contains)
    assert(missing.isEmpty,
      s"listener captured no executions for: ${missing.mkString(", ")}")
    for ((q, ps) <- byRow.toSeq.sortBy(_._1); (_, exact, info) <- ps) {
      val via = if (exact) "" else
        " (attributed by run order — a late listener event may belong to" +
          " the previous row)"
      val nodes = flatten(info)
      assert(!nodes.exists(_.nodeName == "CartesianProduct"),
        s"$q executed a cartesian product$via")
      nodes.filter(_.nodeName == "BroadcastNestedLoopJoin").foreach { j =>
        assert(scalarBuild(j),
          s"$q executed a non-scalar nested loop join$via:\n${j.simpleString}")
      }
    }
  }
}
