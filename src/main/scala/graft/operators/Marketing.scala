package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-analytics operators over the event stream and order history —
  * the measurement side of the reference's domain (the reference UPLOADS
  * conversions to ad platforms; these operators answer what those
  * conversions were worth and which touches earned them).
  *
  * Both operators are single-pass window/aggregate compositions: no
  * driver-side iteration, no cross joins, shuffles only on the analysis
  * keys (user for attribution, customer for RFM).
  */
object Marketing {

  /** Position-based (U-shaped) multi-touch attribution.
    *
    * Each conversion event is credited to the touch events that preceded
    * it — a touch belongs to the NEXT conversion of the same user after
    * it (strictly later timestamp), so the user's timeline is segmented
    * by conversions and no touch is double-counted. Within a conversion's
    * touch set, ordered by time: a single touch takes full credit, two
    * touches split evenly, otherwise first and last take 40% each and the
    * middle shares the remaining 20% equally (the standard U-shape).
    *
    * Plan: one union of touches and conversions, one descending-time
    * window pass per user computes each touch's owning conversion (a
    * running min over conversion timestamps — O(timeline) per user, no
    * join), one window pass ranks touches within their conversion, one
    * aggregation folds credit per channel. Two shuffles total (user key,
    * then channel key); at 100 TB both keys are high-cardinality and
    * skew-bounded by per-user timeline length.
    *
    * @param events      (userCol, tsCol µs, idCol, typeCol)
    * @param touchTypes  event types that can earn credit
    * @param convType    the conversion event type
    * @return (channel, n_touches, credit) — credit rounded 1e-4
    */
  def attributeU(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    val base = events.select(col(userCol).as("u"), col(tsCol).as("t"),
      col(idCol).as("eid"), col(typeCol).as("ch"))
    val tagged = base
      .filter(col("ch").isin(touchTypes: _*) || col("ch") === convType)
      // side 0 = conversion, 1 = touch: in the DESCENDING time walk below,
      // a touch at the same timestamp as a conversion must come FIRST so
      // the running min has not yet seen that conversion (strict "touch
      // before conversion" semantics).
      .withColumn("side", when(col("ch") === convType, 0).otherwise(1))
    val wDesc = Window.partitionBy(col("u"))
      .orderBy(col("t").desc, col("side").desc, col("eid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withConv = tagged
      .withColumn("conv_t",
        min(when(col("side") === 0, col("t"))).over(wDesc))
      .filter(col("side") === 1 && col("conv_t").isNotNull)
    val wSeg = Window.partitionBy(col("u"), col("conv_t"))
      .orderBy(col("t"), col("eid"))
    val credited = withConv
      .withColumn("pos", row_number().over(wSeg))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("u"), col("conv_t"))))
      .withColumn("credit",
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("pos") === 1 || col("pos") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2)))
    credited.groupBy(col("ch").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("credit")), 4).as("credit"))
  }

  /** RFM segmentation: per-customer Recency (most recent order day),
    * Frequency (order count), Monetary (total spend), each scored into
    * quintiles, rolled up to segment cells.
    *
    * Determinism: monetary is rounded to cents BEFORE ranking so the
    * quintile order is identical cross-engine (double summation order
    * differs between engines at the 1e-12 level — ranking raw sums would
    * flicker); every ntile order carries the customer key as final
    * tiebreak, making the quintile assignment a total order.
    *
    * Scale note: the three ntile windows are UNPARTITIONED — a global
    * sort over one row per customer. That is |customers|, not |orders|
    * (the orders table is pre-aggregated first), so the window input is
    * the small frame; at extreme customer counts swap exact ntile for
    * approx-quantile cutpoints (the segment semantics tolerate it — the
    * oracle here pins the exact variant).
    *
    * @return (r_score, f_score, m_score, n_customers, avg_monetary,
    *         total_monetary) — one row per populated RFM cell
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    val perCust = orders.groupBy(col(custCol).as("cust"))
      .agg(max(col(dateCol).cast("date")).as("last_day"),
        count(lit(1)).as("freq"),
        round(sum(col(amountCol)), 2).as("monetary"))
    val scored = perCust
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("last_day").desc, col("cust"))).cast("long"))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("freq").desc, col("cust"))).cast("long"))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("monetary").desc, col("cust"))).cast("long"))
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("monetary")), 2).as("avg_monetary"),
        round(sum(col("monetary")), 2).as("total_monetary"))
  }
}
