package graft.operators

import org.apache.spark.sql.DataFrame
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
  * intersect, so the per-key join output is linear in (demands + lots),
  * never quadratic: each demand touches only the contiguous lots its
  * interval spans.
  *
  * Scale shape: two window cumsums (each one shuffle keyed by `key`) + one
  * equi-join on `key` with the overlap filter; quantities are exact longs,
  * so results are bit-identical on any engine.
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
    val d = demand.select(Seq(col(dKey).as("key"), col(dId).as("did"),
        col(dQty).cast("long").as("dq")) ++ dOrd.map(col): _*)
      .withColumn("dhi", sum(col("dq")).over(wd))
      .withColumn("dlo", col("dhi") - col("dq"))
      .select(col("key"), col("did"), col("dlo"), col("dhi"))
    val s = supply.select(Seq(col(sKey).as("key"), col(sId).as("lot"),
        col(sQty).cast("long").as("sq")) ++ sOrd.map(col): _*)
      .withColumn("shi", sum(col("sq")).over(ws))
      .withColumn("slo", col("shi") - col("sq"))
      .select(col("key"), col("lot"), col("slo"), col("shi"))
    d.join(s, Seq("key"))
      .where(col("dlo") < col("shi") && col("slo") < col("dhi"))
      .select(col("key"), col("did"), col("lot"),
        (least(col("dhi"), col("shi")) -
          greatest(col("dlo"), col("slo"))).as("qty"))
      // a zero-quantity demand/lot is a zero-WIDTH interval; one sitting
      // strictly inside the other side's interval still satisfies the
      // strict overlap test and would emit a spurious qty=0 row
      .where(col("qty") > 0)
  }
}
