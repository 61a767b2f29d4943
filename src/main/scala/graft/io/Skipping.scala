package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping (the Delta/Iceberg min-max stats role): a
  * layout writer that clusters rows into range-ordered files and records a
  * per-file min/max stats manifest, and a reader that prunes files by
  * predicate interval BEFORE Spark ever lists them as scan input.
  *
  * Partition pruning (`q_partitioned_prune`) skips by directory value;
  * this skips WITHIN a partition by clustering stats — the complement
  * that makes point/range lookups on a sort key touch O(matching files)
  * of a 100 TB table instead of every file in the partition. The manifest
  * is file-count-sized (metadata scale): reading it on the driver is the
  * same contract as a lakehouse table's transaction-log scan.
  *
  * The pruning is an OPTIMIZATION ONLY: the residual predicate is still
  * applied to the surviving files, so a stale/lost manifest degrades to a
  * full scan, never to wrong answers.
  */
object Skipping {

  private def statsPath(path: String) = s"$path/_stats"
  private def dataPath(path: String) = s"$path/data"

  /** Write `df` as `numFiles` files range-clustered on `sortCol`, plus a
    * per-file min/max manifest over `statsCols`. One range shuffle (the
    * same sort a z-order/compaction pass already pays) + one
    * metadata-scale aggregation over the written files.
    */
  def writeWithStats(df: DataFrame, path: String, sortCol: String,
      statsCols: Seq[String], numFiles: Int): Unit = {
    require(statsCols.nonEmpty, "writeWithStats: no stats columns")
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dataPath(path))
    val spark = df.sparkSession
    val written = spark.read.parquet(dataPath(path))
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    written.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath(path))
  }

  /** All data files currently under the layout (no pruning). */
  def allFiles(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(dataPath(path)).inputFiles.toSeq

  /** Files whose [min, max] interval on `column` overlaps [lo, hi]
    * (inclusive). Metadata-scale driver work, exactly like a transaction-
    * log scan; falls back to every file when the manifest is missing.
    */
  def candidateFiles(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(statsPath(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(statsPath(path))))
      return allFiles(spark, path)
    spark.read.parquet(statsPath(path))
      .filter(col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Range read with file skipping: prune by manifest, scan only the
    * surviving files, and re-apply the exact predicate (pruning is an
    * optimization, never the correctness carrier). Empty candidate set →
    * empty frame with the layout's schema.
    */
  def readRange(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, path, column, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(dataPath(path)).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
