package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Persisted read schema for materialized index directories (IVF / PQ /
  * LSH bands).
  *
  * Index reads need an explicit schema because a `partitionBy` write of
  * an EMPTY corpus leaves no data files and inference fails the read;
  * deriving the schema from the QUERY frame instead (the round-10 fix)
  * made a NONEMPTY index unreadable whenever its stored types differ
  * from the query's — e.g. an array<float> corpus searched with
  * array<double> queries, a mix the scorers deliberately tolerate. The
  * durable answer: the WRITER records the frame's actual schema in an
  * underscore-prefixed JSON sidecar (invisible to Spark's data-file
  * listing, like `_SUCCESS`) and readers use it verbatim, falling back
  * to the caller-synthesized schema only for indexes written before the
  * sidecar existed.
  */
object IndexSchema {

  private def sidecar(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_graft_schema.json")

  def write(spark: SparkSession, dir: String, schema: StructType): Unit = {
    val p = sidecar(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): Option[StructType] = {
    val p = sidecar(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          Iterator.continually(in.read(chunk)).takeWhile(_ >= 0)
            .foreach(n => buf.write(chunk, 0, n))
          buf.toByteArray
        } finally in.close()
      Some(DataType
        .fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[StructType])
    }
  }
}
