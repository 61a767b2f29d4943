package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums (inclusive scan) without a global window.
  *
  * A running total ordered over the whole frame is usually written as
  * `sum(x).over(Window.orderBy(key))` — which Spark executes as a SINGLE
  * partition holding every row, the classic scale cliff. This operator is
  * the two-pass scan that keeps the data distributed:
  *
  *  1. range-partition by the sort key and pre-aggregate per-partition
  *     totals — at most `numPartitions` rows ever leave the executors;
  *  2. broadcast each partition's starting offset (the exclusive scan of
  *     the totals, computed on ≤ numPartitions rows) back and add it to a
  *     partition-LOCAL running sum.
  *
  * The per-partition window never crosses partition boundaries, so no
  * task materializes more than its slice. Where partition boundaries land
  * (the range sampler) does not affect the result because keys are
  * required unique: every prefix is a prefix of the same global order.
  *
  * Contract: `keyCol` must be unique per row (aggregate to one row per
  * key first — that is also what keeps the scan's input at distinct-key
  * scale rather than raw-row scale).
  */
object Scan {

  /** Adds an inclusive running `sum(valCol)` ordered by `keyCol` as
    * column `cumCol`, plus running sums for any `moreVals` as
    * `cum_<name>`. One range shuffle + one metadata-sized collect.
    */
  def prefixSum(df: DataFrame, keyCol: String, valCol: String,
      cumCol: String, moreVals: Seq[String] = Nil,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val vals = valCol +: moreVals
    // localCheckpoint pins ONE materialized range partitioning: the range
    // sampler re-draws boundaries per execution, so without it pass 1's
    // collected offsets and pass 2's final plan could see DIFFERENT
    // partition assignments and the offsets would misalign.
    val ranged = df.repartitionByRange(n, col(keyCol))
      .withColumn("_scan_pid", spark_partition_id())
      .localCheckpoint()
    // Pass 1: per-partition totals — ≤ n rows reach the driver.
    val totals = ranged.groupBy(col("_scan_pid"))
      .agg(vals.map(v => sum(col(v)).as(v)).head,
        vals.map(v => sum(col(v)).as(v)).tail: _*)
      .collect()
      .map(r => r.getInt(0) -> vals.map(v => r.getAs[Long](v)))
      .sortBy(_._1)
    // Exclusive scan of the totals = each partition's starting offsets.
    val offsets = totals.scanLeft(0 -> vals.map(_ => 0L)) {
      case ((_, acc), (pid, t)) => pid -> acc.lazyZip(t).map(_ + _)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
      .toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.map { case (pid, os) => org.apache.spark.sql.Row.fromSeq(pid +: os) }, 1),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_scan_pid_o",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
        vals.map(v => org.apache.spark.sql.types.StructField(s"_off_$v",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // Pass 2: partition-local running sum + the broadcast offset. The
    // join is INNER on purpose — every non-empty partition has exactly
    // one offsets row, so a missing offset is a logic error that must
    // surface as dropped rows (loud), not be masked as a 0 offset.
    val w = Window.partitionBy(col("_scan_pid")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val named = (v: String) => if (v == valCol) cumCol else s"cum_$v"
    val withCum = vals.foldLeft(
        ranged.join(broadcast(offDf), col("_scan_pid") === col("_scan_pid_o"))) {
      (acc, v) => acc.withColumn(named(v),
        sum(col(v)).over(w) + col(s"_off_$v"))
    }
    withCum.drop("_scan_pid", "_scan_pid_o").drop(vals.map(v => s"_off_$v"): _*)
  }
}
