package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location (the 100 TB "pre-partition big joins" path):
  * writing both sides of a recurring join bucketed AND sorted by the join
  * key lets every subsequent join/aggregation on that key run with ZERO
  * shuffle exchanges — each task zig-zag merges bucket files pairwise. The
  * one-time bucketed write amortizes across every downstream consumer; this
  * is the difference between shuffling 100 TB per query and never shuffling
  * it again.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * Both join sides must use the SAME `numBuckets` for exchange-free joins.
    * A stale managed-table LOCATION (dir left behind by a crashed run after
    * the catalog entry was dropped) is cleared first — overwrite mode only
    * replaces tables the catalog still knows about.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      // resolve the MANAGED location through the catalog (current database
      // + db-qualified names included) — a hand-built warehouse/<name> path
      // is wrong outside the default database and could delete another
      // table's live data
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Layout maintenance: rewrite a dataset as `numFiles` RANGE-partitioned,
    * internally sorted parquet files on a clustering key — the compaction
    * pass that fixes the small-files problem (a day of streaming output is
    * thousands of KB-scale files; scans pay per-file open cost) while
    * making the key's parquet min/max footers DISJOINT across files, so a
    * point/range predicate on the clustering key prunes to one file's row
    * groups instead of sampling every file. Run periodically over landing
    * zones; at 100 TB this is the difference between a key lookup touching
    * one file and touching all of them.
    */
  def compactSorted(df: DataFrame, sortCols: Seq[String], numFiles: Int,
      path: String): Unit = {
    import org.apache.spark.sql.functions.col
    // `path` must differ from df's own source (Spark refuses to overwrite
    // a path it is reading); for the true in-place pass use
    // [[compactSortedInPlace]], which stages + swaps.
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** IN-PLACE [[compactSorted]]: stage the compacted layout next to the
    * directory, then delete + rename — the read-own-path collision Spark
    * (rightly) refuses is sidestepped by never overwriting what is being
    * read. The swap window is delete→rename (not atomic on all
    * filesystems); run from the single maintenance writer like every other
    * layout pass.
    */
  def compactSortedInPlace(spark: org.apache.spark.sql.SparkSession,
      path: String, sortCols: Seq[String], numFiles: Int): Unit = {
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    compactSorted(spark.read.parquet(path), sortCols, numFiles, tmp)
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.delete(p, true), s"failed to remove $path for the swap")
    require(fs.rename(t, p), s"failed to publish $tmp over $path")
  }

  /** Two-dimensional layout maintenance: [[compactSorted]] on the Morton
    * z-value of two clustering columns instead of a lexicographic key. A
    * lexicographic (x, y) sort makes x-predicates prunable but scatters y
    * across every file; the z-curve keeps BOTH columns' parquet min/max
    * footers tight per file, so a box predicate (x range AND y range) skips
    * the files whose z-range misses the box — the standard selective-scan
    * layout for two-key access patterns at 100 TB (Delta/Iceberg OPTIMIZE
    * ZORDER does exactly this). Columns must be non-negative integers that
    * fit `bits` bits — quantize first (the z-value is a layout key only;
    * the data columns are untouched).
    */
  def compactZOrder(df: DataFrame, xCol: String, yCol: String, numFiles: Int,
      path: String, bits: Int = 21): Unit = {
    import org.apache.spark.sql.functions.col
    val z = graft.functions.KernelExpressions.zValue2(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
