package graft

/** In-process end-to-end CLI smoke — the one user-facing surface no
  * oracle row covers (config load → file source read → transactional
  * anti-join → batch → render → writeback → consolidation), pinned in
  * `sbt test` via the [[Main.run]] seam (same code path as the CLI minus
  * session lifecycle and `sys.exit`). Mirrors the verify skill's shell
  * recipe: 7 click conversions, `upload_click_conversions` JSONL with the
  * São Paulo offset, `_uploaded` control table, idempotent second run.
  */
class MainSmokeSpec extends SparkTestBase {
  import spark.implicits._

  private def readTree(root: java.io.File): Seq[java.io.File] = {
    val entries = Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    entries.filter(_.isFile) ++ entries.filter(_.isDirectory).flatMap(readTree)
  }

  test("CLI pipeline end-to-end: render, control-table writeback, idempotent rerun") {
    val dir = java.nio.file.Files.createTempDirectory("graft_main_smoke").toString
    Seq.tabulate(7)(i =>
        (s"g${i + 1}", "2024-05-01T10:00:00.000000", s"${i + 1}"))
      .toDF("gclid", "time", "amount")
      .coalesce(1).write.parquet(s"$dir/c.parquet")
    val cfg =
      s"""{"GoogleAdsAccountId":"1234567890",
         |"Sources":[{"Name":"s","Type":"FILE","Dataset":"parquet","Table":"$dir/c.parquet"}],
         |"Destinations":[{"Name":"d","Type":"ADS_OFFLINE_CONVERSION","Metadata":["Conv1"]}],
         |"Connections":[{"Enabled":true,"Source":"s","Destination":"d"}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/cfg.json"), cfg)
    val opts = Map("--config" -> s"$dir/cfg.json", "--output" -> s"$dir/out")

    val r1 = Main.run(spark, opts)
    assert(r1.exitCode === 0, r1.results.flatMap(_.error).mkString("; "))
    assert(r1.totalUploaded === 7,
      r1.results.map(r => s"${r.executionKey}: ${r.succeeded}/${r.attempted}"))

    // rendered payload: upload_click_conversions JSONL, gclids present,
    // conversion time rendered in the account timezone (São Paulo -03:00)
    val rendered = readTree(new java.io.File(s"$dir/out"))
      .filter(_.getName.endsWith(".jsonl"))
      .map(f => java.nio.file.Files.readString(f.toPath)).mkString("\n")
    assert(rendered.contains("upload_click_conversions"), rendered.take(400))
    assert((1 to 7).forall(i => rendered.contains(s"g$i")), rendered.take(400))
    assert(rendered.contains("-03:00"), rendered.take(400))

    // `_uploaded` control table written as the source's sibling
    val ctl = new java.io.File(s"$dir/c_uploaded_ADS_OFFLINE_CONVERSION.parquet")
    assert(ctl.exists(), s"control table missing at $ctl")
    assert(spark.read.parquet(ctl.toString).count() === 7)

    // second run: the transactional anti-join drops every already-uploaded
    // row — the idempotence fixpoint, exit code still 0
    val r2 = Main.run(spark, opts)
    assert(r2.exitCode === 0)
    assert(r2.totalUploaded === 0,
      r2.results.map(r => s"${r.executionKey}: ${r.succeeded}/${r.attempted}"))
  }
}
