package graft

import graft.io.Skipping
import org.apache.spark.sql.functions._

/** Min-max file skipping: pruning must shrink the scanned file set while
  * never changing the answer — including at window boundaries, on empty
  * windows, and with the manifest gone.
  */
class SkippingSpec extends SparkTestBase {
  import spark.implicits._

  private def layout(): String = {
    val path = java.nio.file.Files.createTempDirectory("skip_spec").toString
    val df = (0 until 80).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    Skipping.writeWithStats(df, path, "k", Seq("k"), numFiles = 8)
    path
  }

  test("range read prunes files and matches the exact filter, boundaries inclusive") {
    val path = layout()
    val all = Skipping.allFiles(spark, path)
    assert(all.size >= 6, s"range clustering produced ${all.size} files")
    val cand = Skipping.candidateFiles(spark, path, "k", 12L, 27L)
    assert(cand.size < all.size && cand.size <= 3,
      s"16-row window touched ${cand.size} of ${all.size} files")
    val out = Skipping.readRange(spark, path, "k", 12L, 27L)
    assert(out.inputFiles.toSet.subsetOf(cand.toSet))
    val ks = out.select("k").as[Long].collect().sorted
    assert(ks.toSeq == (12L to 27L), s"got ${ks.mkString(",")}")
  }

  test("empty window returns no rows; out-of-range window touches no files") {
    val path = layout()
    assert(Skipping.candidateFiles(spark, path, "k", 500L, 900L).isEmpty)
    assert(Skipping.readRange(spark, path, "k", 500L, 900L).count() == 0)
  }

  test("missing manifest degrades to a full scan, never a wrong answer") {
    val path = layout()
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
    }
    rm(new java.io.File(s"$path/_stats"))
    val out = Skipping.readRange(spark, path, "k", 12L, 27L)
    assert(out.count() == 16)
    assert(out.inputFiles.length >= 6) // fell back to every file
  }
}
