package graft.tools

/** Dumps [[graft.SparkEntry.oracleSql]] as JSON without starting Spark —
  * the fast path for iterating on oracle-SQL rewrites against DuckDB
  * (tools/parity_check.py consumes the same shape from Verify).
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    val sb = new StringBuilder("{")
    m.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((k, v), i) =>
      if (i > 0) sb.append(",")
      sb.append("\"").append(k).append("\":")
      sb.append(com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(v))
    }
    sb.append("}")
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      sb.toString.getBytes("UTF-8"))
    println("wrote " + args(0))
  }
}
