package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.streaming.Streaming
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Restart coverage for the KEYED-STATE streaming shapes: each test runs
  * a query to a checkpoint boundary (Trigger.AvailableNow termination —
  * the same durable commit a mid-drain kill lands on), lands more data,
  * restarts against the SAME checkpoint + sink, and asserts the final
  * drained output equals the batch semantics over ALL the data — which
  * is only possible if the state store (dedup keys / open sessions /
  * buffered join rows) survived the restart.
  *
  * Ingest-dedup and CDC already had restart specs (StreamingSpec); these
  * close the round-8 gap for dropDuplicates, flatMapGroupsWithState
  * sessionization, and the stream-stream interval join.
  */
class StreamingRestartSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Land `df` as ONE parquet file with a pinned mod-time (the file
    * source orders batches by mod-time; tests must control it).
    */
  private def land(dir: Path, name: String, df: DataFrame, mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-land")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = dir.resolve(name)
    Files.copy(part.toPath, dst)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeMs))
  }

  private def fresh(): (Path, String, String) = {
    val root = Files.createTempDirectory("graft-restart")
    val landing = root.resolve("in"); Files.createDirectories(landing)
    (landing, root.resolve("out").toString, root.resolve("ckpt").toString)
  }

  test("dedupStream: duplicate keys from before the restart still drop") {
    val (landing, out, ckpt) = fresh()
    val t0 = System.currentTimeMillis()
    def ev(ids: Seq[Long]) = ids.map(i =>
      (i, i % 3, ts(f"2024-05-01 10:${i % 50}%02d:00"), i * 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    land(landing, "p1.parquet", ev(1L to 10L), t0)
    def run(): Unit = {
      val q = Streaming.writeParquetStream(
        Streaming.dedupStream(
          Streaming.readParquetStream(spark, landing.toString),
          Seq("event_id"), "ts", "1 day"),
        out, ckpt).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // phase 1 commits keys 1..10 into the dedup state, then stops
    // phase 2: full REDELIVERY of 1..10 plus genuinely-new 11..15
    land(landing, "p2.parquet", ev(1L to 15L), t0 + 1000)
    run() // restart: state must remember 1..10
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (1L to 15L),
      "restart lost dedup state: redelivered keys re-emitted or new keys missing")
  }

  test("sessionize: an OPEN session spans the restart and closes as one") {
    val (landing, out, ckpt) = fresh()
    val t0 = System.currentTimeMillis()
    def ev(rows: Seq[(Long, Long, String, String, Double)]) = rows
      .map { case (eid, uid, t, typ, v) => (eid, uid, ts(t), typ, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    // phase 1: user 1 has an open 2-event session; user 2 one event
    land(landing, "p1.parquet", ev(Seq(
      (1L, 1L, "2024-05-01 10:00:00", "view", 1.0),
      (2L, 1L, "2024-05-01 10:05:00", "view", 2.0),
      (3L, 2L, "2024-05-01 10:00:00", "view", 5.0))), t0)
    def run(maxFiles: String): Unit = {
      val in = Streaming.readParquetStream(spark, landing.toString,
          Map("maxFilesPerTrigger" -> maxFiles))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value")).as[Streaming.Event]
      val q = Streaming.writeParquetStream(
        Streaming.sessionize(in, gapMinutes = 30, watermark = "0 minutes").toDF(),
        out, ckpt).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run("10") // phase 1: nothing closes (watermark at 10:05), state holds
    // phase 2: user 1 continues WITHIN the gap (10:10, 10:20), then two
    // sentinel users push the watermark past every timeout — sequential
    // batches (maxFilesPerTrigger=1) so timeouts fire after the advance
    land(landing, "p2.parquet", ev(Seq(
      (4L, 1L, "2024-05-01 10:10:00", "click", 3.0),
      (5L, 1L, "2024-05-01 10:20:00", "click", 4.0))), t0 + 1000)
    land(landing, "p3.parquet", ev(Seq(
      (6L, -1L, "2024-05-01 13:00:00", "z", 0.0))), t0 + 2000)
    land(landing, "p4.parquet", ev(Seq(
      (7L, -2L, "2024-05-01 13:00:01", "z", 0.0))), t0 + 3000)
    run("1")
    val rows = spark.read.parquet(out).filter(col("user_id") >= 0L)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(rows === Seq(
      (1L, "2024-05-01 10:00:00.0", "2024-05-01 10:20:00.0", 4L, 10.0),
      (2L, "2024-05-01 10:00:00.0", "2024-05-01 10:00:00.0", 1L, 5.0)),
      s"restart split or lost open sessions: $rows")
  }

  test("interval join: a buffered left row matches a right row arriving after restart") {
    val root = Files.createTempDirectory("graft-restart-ij")
    val lDir = root.resolve("l"); Files.createDirectories(lDir)
    val rDir = root.resolve("r"); Files.createDirectories(rDir)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val t0 = System.currentTimeMillis()
    def side(rows: Seq[(String, String, Long)]) = rows
      .map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "ts", "id")
    // phase 1: two clicks buffered, one old unmatched conversion
    land(lDir, "l1.parquet", side(Seq(
      ("k1", "2024-05-01 10:00:00", 100L),
      ("k2", "2024-05-01 10:01:00", 101L))), t0)
    land(rDir, "r0.parquet", side(Seq(
      ("k9", "2024-05-01 09:00:00", 900L))), t0)
    def run(): Unit = {
      val q = Streaming.writeParquetStream(
        Streaming.intervalJoin(
          Streaming.readParquetStream(spark, lDir.toString),
          Streaming.readParquetStream(spark, rDir.toString),
          "k", "ts", windowSeconds = 600L, watermark = "1 hour"),
        out, ckpt).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // no pairs yet; left rows live only in join state now
    // phase 2: k1's conversion arrives inside its 600 s window; k3 is noise
    land(rDir, "r1.parquet", side(Seq(
      ("k1", "2024-05-01 10:05:00", 500L),
      ("k3", "2024-05-01 10:06:00", 501L))), t0 + 1000)
    run() // restart: the buffered k1 click must still be probeable
    val pairs = spark.read.parquet(out)
      .select(col("k"), col("id"), col("r_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq(("k1", 100L, 500L)),
      s"restart lost the buffered left row (or emitted spurious pairs): $pairs")
  }
}
