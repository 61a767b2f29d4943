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
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}
