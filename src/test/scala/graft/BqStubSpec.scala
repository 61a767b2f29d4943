package graft

import graft.config.JsonConfigSource
import graft.pipeline.{Pipeline, PipelineOptions}
import graft.sink.RecordingTransport
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterEach

/** The `graft-bq` DataSource V2 connector: the offline stand-in for the
  * BigQuery transport with the reference's 20 000-row pagination as
  * InputPartitions and explain-visible column pruning + filter pushdown.
  */
class BqStubSpec extends SparkTestBase with BeforeAndAfterEach {

  override def beforeEach(): Unit = RecordingTransport.reset()

  private def writeJsonl(dir: String, n: Int): String = {
    val path = s"$dir/rows.json"
    val lines = (1 to n).map(i =>
      s"""{"gclid": "g$i", "time": "2024-05-01T10:00:00.000000", "amount": "$i"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes)
    path
  }

  test("reads JSONL with an inferred all-string schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bqstub").toString
    val path = writeJsonl(dir, 7)
    val df = spark.read.format("graft-bq").load(path)
    assert(df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSet ==
      Set(("gclid", "string"), ("time", "string"), ("amount", "string")))
    assert(df.count() == 7)
    assert(df.filter(col("gclid") === "g3").select("amount")
      .collect().map(_.getString(0)).toSeq == Seq("3"))
  }

  test("pages become InputPartitions (the reference's 20k-row pagination)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bqstub_p").toString
    val path = writeJsonl(dir, 25)
    val df = spark.read.format("graft-bq").option("pageSize", "10").load(path)
    assert(df.rdd.getNumPartitions == 3) // ceil(25 / 10)
    assert(df.count() == 25)
    // page boundaries lose no rows and duplicate none
    assert(df.select("gclid").collect().map(_.getString(0)).toSet ==
      (1 to 25).map(i => s"g$i").toSet)
  }

  test("filter pushdown and column pruning reach the v2 scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bqstub_f").toString
    val path = writeJsonl(dir, 9)
    val df = spark.read.format("graft-bq").load(path)
      .filter(col("gclid") === "g4").select("amount")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(gclid,g4)"), plan)
    assert(plan.contains("ReadSchema: struct<amount:string>"), plan)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("4"))
    // a pushed range filter actually filters inside the reader
    val ranged = spark.read.format("graft-bq").load(path)
      .filter(col("gclid") > "g7").select("gclid")
    assert(ranged.collect().map(_.getString(0)).toSet == Set("g8", "g9"))
  }

  test("BigQuery-typed source runs the full pipeline through graft-bq") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bqstub_e2e").toString
    writeJsonl(dir, 5)
    val config = s"""{
      "GoogleAdsAccountId": "1234567890",
      "Sources": [{"Name": "s", "Type": "BIG_QUERY", "Dataset": "ds1", "Table": "rows"}],
      "Destinations": [{"Name": "d", "Type": "ADS_OFFLINE_CONVERSION", "Metadata": ["Conv"]}],
      "Connections": [{"Enabled": true, "Source": "s", "Destination": "d"}]
    }"""
    val executions = JsonConfigSource.fromString(config).executions()
    val opts = PipelineOptions(
      transport = RecordingTransport(),
      bqPathFor = (_, t) => s"$dir/$t.json",
      bqFormat = "graft-bq")
    val run1 = Pipeline.run(spark, executions, opts)
    assert(run1.exitCode == 0 && run1.totalUploaded == 5)
    // transactional anti-join + writeback compose with the v2 source
    val run2 = Pipeline.run(spark, executions, opts)
    assert(run2.exitCode == 0 && run2.totalUploaded == 0)
  }

  test("append write chunks rows like the reference's 20k-row inserts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bqstub_w").toString
    val tbl = s"$dir/uploaded"
    val df = (1 to 45).map(i => (s"g$i", s"$i")).toDF("gclid", "amount")
    df.coalesce(1).write.format("graft-bq").option("pageSize", "20")
      .mode("append").save(tbl)
    val chunks = new java.io.File(tbl).listFiles().filter(_.getName.endsWith(".json"))
    assert(chunks.length == 3) // ceil(45 / 20) from one task
    chunks.foreach { f =>
      val n = scala.io.Source.fromFile(f).getLines().size
      assert(n <= 20, s"${f.getName} has $n rows")
    }
    // round-trip through the directory-reading side
    val back = spark.read.format("graft-bq").load(tbl)
    assert(back.count() == 45)
    assert(back.select("gclid").collect().map(_.getString(0)).toSet ==
      (1 to 45).map(i => s"g$i").toSet)
    // a second append accumulates (at-least-once writeback contract)
    df.limit(5).coalesce(1).write.format("graft-bq").option("pageSize", "20")
      .mode("append").save(tbl)
    assert(spark.read.format("graft-bq").load(tbl).count() == 50)
  }
}
