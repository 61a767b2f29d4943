package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operators don't express directly: as-of
  * (latest-state lookup) and keyless point-in-interval, both shaped so the
  * physical plan is a single hash shuffle — never a range/theta join that
  * Spark would execute as BroadcastNestedLoopJoin.
  */
object Temporal {

  /** As-of join: for every left row, the payload of the LATEST right row
    * with the same key and `rightTs` <= `leftTs` (nulls when no right row
    * precedes the left row).
    *
    * Plan shape: instead of an inequality join (which Catalyst can only
    * execute as a nested loop when the equi-key is paired with a range
    * predicate it can't hash on), both sides are UNIONED and resolved with
    * one window pass — `last(payload, ignoreNulls)` over (key ORDER BY ts,
    * side) — so the whole operator is ONE shuffle on the key plus a sort
    * within partitions, the same cost as a regular sort-merge join. At
    * 100 TB the shuffle is keyed by `key` alone; a skewed key (one user
    * with millions of events) is bounded by the per-key sort, and AQE's
    * skew-split applies to the exchange as usual.
    *
    * Right rows must be UNIQUE per (key, rightTs) — pre-aggregate ties
    * first (their resolution order within the window would otherwise be
    * unspecified). Timestamps must be mutually comparable numeric columns.
    *
    * @param payloadCols right-side columns carried onto left rows
    * @return left columns + payloadCols (null where no right row precedes)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"))
    val r = right.select(
      (col(key).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__side") +:
        payloadCols.map(col)): _*)
    // allowMissingColumns types the left side's absent payloads (and the
    // right side's absent __l) as typed nulls — no manual cast bookkeeping
    val u = l.unionByName(r, allowMissingColumns = true)
    // right (__side=0) sorts before left at equal ts => "<=" semantics;
    // all last() calls share one WindowSpec => a single Window exec
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++ payloadCols.map(col): _*)
  }

  /** Native whole-operator as-of join
    * ([[org.apache.spark.sql.graft.AsofJoinExec]]): the same backward
    * semantics as [[asofJoin]] plus what the union+window encoding cannot
    * express — a staleness `toleranceUs` bound, the FORWARD direction
    * (nearest right row at-or-after the left time), and the matched right
    * row's own columns (e.g. its timestamp) in the output. Physical plan:
    * co-partitioned exchanges on the keys + per-partition (key, time) sort
    * + ONE merge scan holding a single buffered right row — sort-merge-join
    * cost, no window state. Time columns must be LongType (epoch micros).
    */
  def asofJoinNative(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String, toleranceUs: Long = -1L,
      forward: Boolean = false): DataFrame =
    org.apache.spark.sql.graft.AsofJoinDF.asofJoin(
      left, right, leftKeys, rightKeys, leftTs, rightTs, toleranceUs, forward)

  /** Keyless point-in-interval join: every (point, interval) pair with
    * `startCol` <= `pointTs` < `endCol` — the batch analog of a stream-
    * stream interval join, without any equi-key to hash on.
    *
    * Plan shape: time is quantized into `binWidth` bins; each interval
    * EXPLODES to the bins it covers, each point lands in exactly one bin,
    * and the product becomes a plain equi-join on the bin id with the
    * precise containment predicate applied AFTER the hash match. Because a
    * point belongs to one bin, every qualifying pair emerges exactly once —
    * no dedup pass. At 100 TB: shuffle volume is points + intervals ×
    * (len/binWidth + 1) rows, so `binWidth` should sit near the typical
    * interval length; a degenerate bin (all points in one hour) is an AQE
    * skew-split case, not a plan change.
    *
    * Intervals are half-open [start, end). Column names of the two inputs
    * must be disjoint.
    */
  def pointInIntervalJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$startCol` div $binWidth"),
        expr(s"(`$endCol` - 1) div $binWidth"))))
    val pt = points.withColumn("__pbin", expr(s"`$pointTs` div $binWidth"))
    pt.join(iv, col("__pbin") === col("__bin") &&
        col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin", "__pbin")
  }
}
