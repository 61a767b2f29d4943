package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-respecting quantity allocation — the FIFO lot-matching primitive
  * behind inventory consumption, cost-basis (tax-lot) accounting, and
  * capacity back-filling: demands drain supply lots strictly in order, a
  * demand may split across lots and a lot across demands.
  *
  * The classic formulation is a sequential loop; the distributed shape here
  * is the RUNNING-INTERVAL intersection: demand row i owns the half-open
  * quantity interval [Σq_<i, Σq_≤i) on its key's demand axis, lot j owns
  * its interval on the supply axis, and the allocation of lot j to demand
  * i is exactly the overlap of the two intervals — nonzero only where they
  * intersect, so the per-key join OUTPUT is linear in (demands + lots),
  * never quadratic: each demand touches only the contiguous lots its
  * interval spans.
  *
  * COMPUTE is kept near-linear too: the overlap match is a (key, bin)
  * equi-join on a quantized cumulative-quantity axis (the
  * [[Temporal.pointInIntervalJoin]] device, interval×interval form), not
  * a bare key-join — a bare `join(key).where(overlap)` streams every
  * (demand, lot) pair of a key through the filter, so ONE hot SKU with
  * 10⁶ demands and 10⁶ lots would evaluate 10¹² pairs in one task. Bin
  * width adapts per key to the EFFECTIVE axis — overlaps exist only in
  * [0, min(demand total, supply total)), so
  * `w = max(1, 2·min(dtot, stot) / (demands + lots))` — and each interval
  * explodes only into the bins it covers, clipped to the other side's
  * total, beyond which no match exists. Each side's intervals are
  * DISJOINT on their axis, so their clipped widths sum to ≤ min(dtot,
  * stot) per side and exploded rows are ≤ 1.5·(demands + lots) per side
  * REGARDLESS of width skew: a 10¹²-quantity outlier lot cannot inflate
  * the width (its effective width is the clipped one), where the old
  * `(dtot + stot)/(nd + nl)` mean let that one lot widen the bins until
  * every unit-quantity interval of both sides pooled into one bin
  * (the round-11 documented caveat — now closed; `Round10OpsSpec` plants
  * exactly that corpus). For near-uniform EFFECTIVE widths per-bin
  * occupancy is O(1) per side; the narrower residual is BOTH sides
  * dominated by outliers with many sub-mean intervals inside the
  * effective axis, which pools sub-mean intervals into shared bins —
  * bounded by (w/w_min)² per bin, orders below all-pairs. Each
  * overlapping pair is emitted exactly once, in the bin holding its
  * overlap start (no post-join distinct).
  *
  * Input contract: quantities must be ≥ 0 (zero-width intervals can
  * never overlap and are dropped; a NEGATIVE quantity would shift every
  * later row's cumulative interval, silently diverging from the
  * sequential-loop semantics — enforced with raise_error, mirroring the
  * oracle's plain cumsum which has no such row to disagree on).
  *
  * Scale shape: two window cumsums + one key-grain stats join (each one
  * shuffle keyed by `key`) + the (key, bin) equi-join; quantities are
  * exact longs, so results are bit-identical on any engine.
  */
object Allocate {

  /** FIFO-allocate demand rows against supply lots per key.
    *
    * @param demand (key, demand id, qty) — drained in `dOrd` order
    * @param supply (key, lot id, qty) — consumed in `sOrd` order
    * @return (key, did, lot, qty) — one row per (demand, lot) overlap;
    *         demands beyond the total supply (and lots beyond total
    *         demand) simply get no rows
    */
  def fifo(demand: DataFrame, dKey: String, dId: String, dQty: String,
      dOrd: Seq[String], supply: DataFrame, sKey: String, sId: String,
      sQty: String, sOrd: Seq[String]): DataFrame = {
    val wd = Window.partitionBy(col("key"))
      .orderBy(dOrd.map(col) :+ col("did"): _*)
    val ws = Window.partitionBy(col("key"))
      .orderBy(sOrd.map(col) :+ col("lot"): _*)
    // zero-quantity rows are zero-width intervals: they can never yield
    // qty > 0 (the final filter), so dropping them up front preserves the
    // output and keeps them out of the explode. Negative quantities are a
    // CONTRACT violation (they would shift every later interval) and
    // raise instead of silently diverging from the sequential semantics.
    def nonneg(q: Column, side: String): Column =
      when(q >= 0L, q).otherwise(raise_error(concat(
        lit(s"Allocate.fifo requires nonnegative $side quantities (a " +
          "negative quantity shifts every later row's cumulative " +
          "interval); got "), q.cast("string"))))
    val d = demand.select(Seq(col(dKey).as("key"), col(dId).as("did"),
        nonneg(col(dQty).cast("long"), "demand").as("dq")) ++ dOrd.map(col): _*)
      .where(col("dq") > 0)
      .withColumn("dhi", sum(col("dq")).over(wd))
      .withColumn("dlo", col("dhi") - col("dq"))
      .select(col("key"), col("did"), col("dlo"), col("dhi"))
    val s = supply.select(Seq(col(sKey).as("key"), col(sId).as("lot"),
        nonneg(col(sQty).cast("long"), "supply").as("sq")) ++ sOrd.map(col): _*)
      .where(col("sq") > 0)
      .withColumn("shi", sum(col("sq")).over(ws))
      .withColumn("slo", col("shi") - col("sq"))
      .select(col("key"), col("lot"), col("slo"), col("shi"))
    // key-grain stats (inner: a key missing either side yields no pairs):
    // per-key bin width = mean interval width over the EFFECTIVE axis
    // [0, min(dtot, stot)) — the only region where overlaps exist — so a
    // width outlier beyond the other side's total cannot inflate the bins
    // (see the object docstring's skew analysis), floor 1
    val stats = d.groupBy(col("key"))
      .agg(count(lit(1)).as("nd"), max(col("dhi")).as("dtot"))
      .join(s.groupBy(col("key"))
        .agg(count(lit(1)).as("nl"), max(col("shi")).as("stot")), Seq("key"))
      .select(col("key"), col("dtot"), col("stot"),
        greatest(lit(1L),
          expr("(2 * least(dtot, stot)) div (nd + nl)")).as("w"))
    // explode each interval into the bins it covers, clipped to the other
    // side's total (no overlap can start at or beyond it)
    val db = d.join(stats, Seq("key"))
      .where(col("dlo") < col("stot"))
      .withColumn("bin",
        explode(expr("sequence(dlo div w, least(dhi - 1, stot - 1) div w)")))
      .select(col("key"), col("bin"), col("did"), col("dlo"), col("dhi"),
        col("w"))
    val sb = s.join(stats, Seq("key"))
      .where(col("slo") < col("dtot"))
      .withColumn("bin",
        explode(expr("sequence(slo div w, least(shi - 1, dtot - 1) div w)")))
      .select(col("key"), col("bin"), col("lot"), col("slo"), col("shi"))
    db.join(sb, Seq("key", "bin"))
      .where(col("dlo") < col("shi") && col("slo") < col("dhi") &&
        // canonical bin: the one holding the overlap start — each
        // overlapping pair shares it exactly once, so no pair-grain dedup
        expr("greatest(dlo, slo) div w") === col("bin"))
      .select(col("key"), col("did"), col("lot"),
        (least(col("dhi"), col("shi")) -
          greatest(col("dlo"), col("slo"))).as("qty"))
      // positive-width inputs guarantee a positive overlap here, but keep
      // the contract filter as the last line of defense
      .where(col("qty") > 0)
  }
}
