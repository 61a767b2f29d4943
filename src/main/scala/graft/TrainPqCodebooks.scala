package graft

import org.apache.spark.sql.SparkSession

/** Dev-time generator for [[graft.operators.TrainedPq]]: trains the PQ
  * sub-quantizer codebooks ([[graft.operators.Pq.trainCodebooks]]) over an
  * embeddings table and prints the literals to paste into
  * `TrainedPq.scala`. Same freeze-and-replay contract as
  * [[TrainIvfCentroids]]: compile-time Double literals round-trip through
  * any correctly-rounded parser, so the DuckDB oracle replays the exact
  * encode/ADC arithmetic, and a cluster run ships codebooks as a tiny
  * versioned artifact instead of retraining per job.
  *
  * Usage: runMain graft.TrainPqCodebooks /root/testdata/sf0.01
  */
object TrainPqCodebooks {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
      // --residual: train on (vector - nearest trained centroid) — the
      // codebooks for Pq.ivfPqResidualTopK (pasted into TrainedPqResidual)
      val emb =
        if (args.contains("--residual"))
          emb0.select(graft.operators.Pq.residualExpr(
            org.apache.spark.sql.functions.col("embedding"),
            graft.operators.TrainedCentroids.sf001).as("embedding"))
        else emb0
      val books = graft.operators.Pq.trainCodebooks(
        emb, "embedding", numSub = 4, ksub = 8, dim = 64, iters = 5)
      println("  val sf001: Seq[Seq[Seq[Double]]] = Seq(")
      println(books.map(book =>
        "    Seq(\n" + book.map(c =>
          "      Seq(" + c.mkString(", ") + ")").mkString(",\n") + ")")
        .mkString(",\n"))
      println("  )")
    } finally spark.stop()
  }
}
